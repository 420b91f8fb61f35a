package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.SketchStream

class SketchStreamSpec extends SparkSpec {

  test("streaming sketch equals the batch sketch bit-for-bit after a checkpointed restart") {
    val dir = Files.createTempDirectory("hll-src").toString
    val out = Files.createTempDirectory("hll-out").toString
    val ckpt = Files.createTempDirectory("hll-ckpt").toString
    // the corpus splits into two stream deliveries; the second run
    // resumes registers from the checkpoint, so the final estimate
    // must equal the batch sketch over the WHOLE corpus
    val docs = Tables(spark, sf, "documents").select("doc_id", "text", "source")
    docs.filter(col("doc_id") % 2 === 0).write.json(s"$dir/batch1")
    SketchStream.start(spark, s"$dir/*", out, ckpt).awaitTermination()
    docs.filter(col("doc_id") % 2 === 1).write.json(s"$dir/batch2")
    SketchStream.start(spark, s"$dir/*", out, ckpt).awaitTermination()

    val streamed = SketchStream.currentEstimates(spark, out).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    val batch = graft.operators.Sketches.hllDistinctTokens(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(streamed.keySet == batch.keySet && batch.nonEmpty)
    batch.foreach { case (src, (mHit, est)) =>
      assert(streamed(src) == ((mHit, est)), s"$src: ${streamed(src)} != ($mHit, $est)")
    }
  }

  test("replayed batch cannot inflate the sketch: register max-merge is idempotent") {
    val regs = graft.operators.Sketches.registerRows(
      Tables(spark, sf, "documents").select("doc_id", "text", "source"))
    val once = SketchStream.sketchStream(regs).collect()
      .map(s => s.source -> ((s.m_hit, s.est_distinct))).toMap
    // the same rows folded twice in one group: state path via union
    val twice = SketchStream.sketchStream(regs.union(regs)).collect()
      .map(s => s.source -> ((s.m_hit, s.est_distinct))).toMap
    assert(once == twice && once.nonEmpty)
  }
}
