package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.ChecksumStream

class ChecksumStreamSpec extends SparkSpec {

  private def orderEvents(op: String) =
    Tables(spark, sf, "orders").withColumn("op", lit(op))
      .select("op", "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")

  test("stream-maintained checksums equal the batch scan bit-for-bit across a restart") {
    val dir = Files.createTempDirectory("cks-src").toString
    val out = Files.createTempDirectory("cks-out").toString
    val ckpt = Files.createTempDirectory("cks-ckpt").toString
    val inserts = orderEvents("insert")
    inserts.filter(col("o_orderkey") % 2 === 0).write.json(s"$dir/batch1")
    ChecksumStream.start(spark, s"$dir/*", out, ckpt).awaitTermination()
    inserts.filter(col("o_orderkey") % 2 === 1).write.json(s"$dir/batch2")
    ChecksumStream.start(spark, s"$dir/*", out, ckpt).awaitTermination()

    val streamed = ChecksumStream.currentChecksums(spark, out).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val batch = graft.operators.Relational.monthlyChecksums(spark, sf).collect()
      .map(r => r.getDate(0).toString -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(streamed.keySet == batch.keySet && batch.nonEmpty)
    batch.foreach { case (m, want) =>
      assert(streamed(m) == want, s"$m: ${streamed(m)} != $want")
    }
  }

  test("a delete cancels its insert exactly: state returns to the pre-insert checksum") {
    // fold a full insert pass, then insert+delete one extra row — the
    // month's (n, checksum) must equal the insert-only fold
    val base = ChecksumStream.deltasOf(orderEvents("insert"))
    val victim = orderEvents("insert").limit(1)
    val extra = ChecksumStream.deltasOf(
      victim.union(victim.withColumn("op", lit("delete"))))
    val once = ChecksumStream.checksumStream(base).collect()
      .map(s => s.month -> ((s.n_rows, s.checksum))).toMap
    val roundTrip = ChecksumStream.checksumStream(base.union(extra)).collect()
      .map(s => s.month -> ((s.n_rows, s.checksum))).toMap
    assert(once == roundTrip && once.nonEmpty)
  }
}
