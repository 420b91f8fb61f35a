package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.QuantileStream

class QuantileStreamSpec extends SparkSpec {

  test("streaming quantiles equal the batch sketch bit-for-bit after a checkpointed restart") {
    val dir = Files.createTempDirectory("lq-src").toString
    val out = Files.createTempDirectory("lq-out").toString
    val ckpt = Files.createTempDirectory("lq-ckpt").toString
    // two stream deliveries; the second run resumes histograms from the
    // checkpoint, so the final rows must equal the batch sketch over
    // the WHOLE corpus
    val docs = Tables(spark, sf, "documents").select("doc_id", "text", "source")
    docs.filter(col("doc_id") % 2 === 0).write.json(s"$dir/batch1")
    QuantileStream.start(spark, s"$dir/*", out, ckpt).awaitTermination()
    docs.filter(col("doc_id") % 2 === 1).write.json(s"$dir/batch2")
    QuantileStream.start(spark, s"$dir/*", out, ckpt).awaitTermination()

    val streamed = QuantileStream.currentQuantiles(spark, out).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val batch = graft.operators.Sketches.logQuantiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(batch.nonEmpty && streamed == batch)
  }

  test("count folds are order-independent: swapped delivery halves land on the same rows") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text", "source")
    val even = graft.operators.Sketches.bucketRows(docs.filter(col("doc_id") % 2 === 0))
    val odd = graft.operators.Sketches.bucketRows(docs.filter(col("doc_id") % 2 === 1))
    def finalRows(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      QuantileStream.quantileStream(a.unionByName(b)).collect()
        .map(s => (s.source, s.p, s.bucket, s.est_tokens)).toSet
    assert(finalRows(even, odd) == finalRows(odd, even))
  }
}
