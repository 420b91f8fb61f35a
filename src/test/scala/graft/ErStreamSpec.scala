package graft

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.operators.Dedup
import graft.streaming.ErStream

/** Streaming ER ingest contract: a two-batch streamed ingest equals
  * the batch two-append closure, survives a checkpointed restart
  * without double-absorbing, ignores deletes, and takes the latest
  * in-batch name per id. */
class ErStreamSpec extends SparkSpec {
  import spark.implicits._

  private var off = 0L
  private def ev(op: String, key: Long, name: String): Row = {
    off += 1
    Row(op, key, if (name == null) null else Row(name), "graft", "customer",
      java.sql.Timestamp.valueOf(s"2024-01-01 00:00:${off % 60}"), off)
  }

  private def writeEvents(src: String, rows: Row*): Unit =
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), ErStream.schema)
      .coalesce(1).write.mode("append").json(src)

  private def clusters(storeDir: String): Set[(Long, Long, String)] =
    Dedup.entityClustersFromStore(spark, storeDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("streamed two-batch ingest equals the batch two-append closure across a restart") {
    val src = Files.createTempDirectory("graft_erstream_src").toString
    val store = Files.createTempDirectory("graft_erstream_store").toString
    val ckpt = Files.createTempDirectory("graft_erstream_ckpt").toString
    // batch 1: a within-batch pair + a delete (ignored) + an
    // in-batch name CHANGE for id 6 (latest offset wins: "carol")
    writeEvents(src,
      ev("insert", 1L, "alice"), ev("insert", 2L, "alicx"),
      ev("delete", 9L, null),
      ev("insert", 6L, "bob"), ev("update", 6L, "carol"))
    val q1 = ErStream.start(spark, src, store, ckpt)
    try q1.awaitTermination() finally q1.stop()
    assert(clusters(store) == Set((1L, 2L, "alice")))
    val storedNames = spark.read
      .parquet(graft.operators.Atomic.resolve(spark, store, "names"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(storedNames(6L) == "carol", "latest in-batch name must win")
    // batch 2 lands after a restart from the same checkpoint: the
    // cross-batch chain 2~3 must close through the stored labels
    writeEvents(src,
      ev("insert", 3L, "alicxe"), ev("insert", 4L, "alicxz"))
    val q2 = ErStream.start(spark, src, store, ckpt)
    try q2.awaitTermination() finally q2.stop()
    val got = clusters(store)
    val want = Dedup.entityClustersOf(
      Seq((1L, "alice"), (2L, "alicx"), (6L, "carol"),
        (3L, "alicxe"), (4L, "alicxz")).toDF("id", "name"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    graft.operators.PlanCache.release()
    assert(got == want)
    assert(got == Set((1L, 4L, "alice")))
    // a third start with nothing new: checkpoint + ingest_log make it
    // a no-op — no duplicate names, same closure
    val q3 = ErStream.start(spark, src, store, ckpt)
    try q3.awaitTermination() finally q3.stop()
    assert(clusters(store) == got)
    val nameIds = spark.read
      .parquet(graft.operators.Atomic.resolve(spark, store, "names"))
      .collect().map(_.getLong(0)).toSeq
    assert(nameIds.sorted == Seq(1L, 2L, 3L, 4L, 6L), s"got $nameIds")
  }
}
