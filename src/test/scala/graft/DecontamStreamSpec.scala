package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.DecontamStream

/** Streaming decontamination must flag exactly the documents the q56
  * batch sweep flags, and a restart must not re-score committed
  * batches. */
class DecontamStreamSpec extends SparkSpec {

  test("stream scoring matches the batch decontaminate; restart never rescores") {
    val src = Files.createTempDirectory("graft_decontam_src").toString
    val out = Files.createTempDirectory("graft_decontam_out").toString
    val ckpt = Files.createTempDirectory("graft_decontam_ckpt").toString

    val train = Tables(spark, sf, "documents")
      .filter(col("doc_id") % 10 =!= 0)
      .select("doc_id", "source", "text")

    // first half of the crawl, then stop mid-stream
    train.filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.mode("append").json(src)
    val q1 = DecontamStream.start(spark, sf, src, out, ckpt)
    try q1.awaitTermination() finally q1.stop()

    // restart from the same checkpoint with the rest appended
    train.filter(col("doc_id") % 2 === 1)
      .coalesce(1).write.mode("append").json(src)
    val q2 = DecontamStream.start(spark, sf, src, out, ckpt)
    try q2.awaitTermination() finally q2.stop()

    val log = spark.read.parquet(out)
    // every train doc scored exactly once across the restart
    assert(log.count() == train.count())
    assert(log.select("doc_id").distinct().count() == train.count())

    // contaminated slice ≡ the q56 batch operator's rows (doc_id, n_hits)
    val got = log.filter(col("contaminated"))
      .select("doc_id", "n_hits").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup.decontaminate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.operators.PlanCache.release()
    assert(want.nonEmpty)
    assert(got == want, "stream quarantine must equal the batch sweep")

    // clean documents carry their evidence too: n_hits below the bar
    assert(log.filter(!col("contaminated") && col("n_hits") >= 2).count() == 0)
  }
}
