package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.DataQuality
import graft.streaming.DriftStream

/** The streaming drift watch lands on the batch operator's exact
  * integers: freeze the first time half as the reference, stream the
  * second half through (across a checkpointed restart), and the
  * latest row per type must equal q253's TVD bit for bit. */
class DriftStreamSpec extends SparkSpec {

  test("streamed drift equals the batch TVD bit-for-bit after a checkpointed restart") {
    val dir = Files.createTempDirectory("drift-src").toString
    val out = Files.createTempDirectory("drift-out").toString
    val ckpt = Files.createTempDirectory("drift-ckpt").toString
    val ev = Tables(spark, sf, "events")
    // the batch operator's own split: midpoint of the observed range
    val mm = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    val mid = (mm.getLong(0) + mm.getLong(1)) / 2
    val ref = DriftStream.referenceOf(ev.filter(unix_micros(col("ts")) < mid))
    assert(ref.nonEmpty)
    val cur = ev.filter(unix_micros(col("ts")) >= mid)
      .select("event_id", "ts", "event_type", "value")
    // two deliveries with a restart between: the second run resumes
    // the bucket counts from the checkpoint
    cur.filter(col("event_id") % 2 === 0).write.json(s"$dir/batch1")
    DriftStream.start(spark, s"$dir/*", out, ckpt, ref).awaitTermination()
    cur.filter(col("event_id") % 2 === 1).write.json(s"$dir/batch2")
    DriftStream.start(spark, s"$dir/*", out, ckpt, ref).awaitTermination()

    val streamed = DriftStream.currentDrift(spark, out, ref).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val batch = DataQuality.valueDrift(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(streamed.keySet == batch.keySet && batch.nonEmpty)
    batch.foreach { case (t, want) =>
      assert(streamed(t) == want, s"$t: ${streamed(t)} != $want")
    }
    // a reference type the stream never delivered is the LOUDEST
    // drift, not a missing row: the read face synthesizes it
    val refPlus = ref + ("vanished_type" -> Map(0L -> 4L))
    val withGone = DriftStream.currentDrift(spark, out, refPlus).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(withGone("vanished_type") == 500000L,
      s"vanished type read ${withGone.get("vanished_type")}")
  }

  test("an all-reference stream reads zero drift; a disjoint-bucket stream reads full drift") {
    import spark.implicits._
    // identical distribution → every bucket's rates cancel exactly
    val sameRef = Map("a" -> Map(0L -> 3L, 1L -> 1L))
    val same = Seq(("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 5.0))
      .toDF("event_type", "value")
    val zero = DriftStream.driftStream(same, sameRef).collect()
    assert(zero.map(s => s.event_type -> s.tvd_micro).toMap == Map("a" -> 0L))
    // disjoint buckets → TVD = (1e6 + 1e6) / 2
    val far = DriftStream.driftStream(same, Map("a" -> Map(9L -> 4L))).collect()
    assert(far.map(s => s.event_type -> s.tvd_micro).toMap == Map("a" -> 1000000L))
  }
}
