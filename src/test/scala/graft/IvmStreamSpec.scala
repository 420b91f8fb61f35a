package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.IvmStream

/** The streaming IVM face lands on the batch recompute's exact
  * integers: change batches flow through (across a checkpointed
  * restart), and the live view must equal a from-scratch LWW + rollup
  * over everything delivered. Also pins the two hostile orderings the
  * state machine exists for — a stale update after a delete must NOT
  * resurrect the key, and a replayed foreachBatch must not
  * double-count — plus the delta-sized emission contract. */
class IvmStreamSpec extends SparkSpec {
  import spark.implicits._

  // (op, key, value, k, tsSec, offset)
  private def rows(rs: Seq[(String, Long, java.lang.Double, java.lang.Long, Long, Long)]): DataFrame =
    rs.toDF("op", "key", "value", "k", "tssec", "offset")
      .select(col("op"), col("key"), col("value"), col("k"),
        col("tssec").cast("timestamp").as("ts"), col("offset"))

  private def recompute(all: DataFrame): Set[(Long, Long, Long)] = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts").desc, col("offset").desc)
    all.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "delete")
      .select(coalesce(pmod(col("k"), lit(8L)), lit(-1L)).as("bucket"),
        coalesce(floor(col("value") * 100).cast("long"), lit(0L)).as("cents"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private val batch1: Seq[(String, Long, java.lang.Double, java.lang.Long, Long, Long)] = Seq(
    ("insert", 1L, 10.0, 0L, 100L, 1L),
    ("insert", 2L, 30.0, 1L, 300L, 2L), // will out-timestamp its delta
    ("insert", 3L, 50.0, 2L, 100L, 3L),
    ("insert", 6L, 80.0, null, 100L, 4L)) // null bucket key
  private val batch2: Seq[(String, Long, java.lang.Double, java.lang.Long, Long, Long)] = Seq(
    ("update", 1L, 20.0, 0L, 200L, 5L),
    ("update", 2L, 40.0, 1L, 250L, 6L), // stale: batch-1 winner holds
    ("delete", 3L, null, 2L, 400L, 7L), // empties bucket 2
    ("update", 3L, 99.0, 2L, 350L, 8L), // stale after delete: stays dead
    ("insert", 4L, 60.0, 3L, 100L, 9L),
    ("update", 6L, null, null, 200L, 10L)) // null payload → 0 cents

  test("streamed view equals the batch recompute across a restart; tombstones hold") {
    val src = Files.createTempDirectory("ivm-src").toString
    val store = Files.createTempDirectory("ivm-store").toString
    val ckpt = Files.createTempDirectory("ivm-ckpt").toString
    rows(batch1).write.json(s"$src/b1")
    IvmStream.start(spark, s"$src/*", store, ckpt).awaitTermination()
    val mid = IvmStream.currentView(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(mid == recompute(rows(batch1)))
    // restart picks the per-key LWW state back up from the checkpoint
    rows(batch2).write.json(s"$src/b2")
    IvmStream.start(spark, s"$src/*", store, ckpt).awaitTermination()
    val got = IvmStream.currentView(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == recompute(rows(batch1 ++ batch2)))
    // the delete emptied bucket 2 and the stale update didn't revive it
    assert(!got.exists(_._1 == 2L))
    // the out-of-order base winner (key 2, 30.00) held against the
    // stale delta update
    assert(got.contains((1L, 1L, 3000L)))
  }

  test("a replayed foreachBatch is absorbed once, not twice") {
    val store = Files.createTempDirectory("ivm-replay").toString
    val d1 = Seq((0L, 1L, 1000L)).toDF("bucket", "dn", "dcents")
    IvmStream.applyDeltas(d1, store, batchId = 0L)
    IvmStream.applyDeltas(d1, store, batchId = 0L) // crash replay
    val once = IvmStream.currentView(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(once == Set((0L, 1L, 1000L)))
    // the next batch still lands
    IvmStream.applyDeltas(d1, store, batchId = 1L)
    val twice = IvmStream.currentView(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(twice == Set((0L, 2L, 2000L)))
  }

  test("delta emission is bounded by changed keys, not state size") {
    // batch-mode run of the same fold: only key 1 changes, so only
    // key 1's retraction pair comes out
    val changes = rows(Seq(
      ("insert", 1L, 10.0, 0L, 100L, 1L),
      ("update", 1L, 20.0, 0L, 200L, 2L)))
    val deltas = IvmStream.deltaStream(changes).collect()
    // within one batch the fold emits the WINNER's contribution only
    // (no prior state): a single +1 row
    assert(deltas.toSeq == Seq(IvmStream.DeltaRow(0L, 1L, 2000L)))
  }
}
