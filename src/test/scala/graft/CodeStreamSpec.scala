package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.CodeStream

/** Streaming code ingest — a streamed code index must probe exactly
  * like the in-process Hamming path, and a restart must not
  * double-sign. */
class CodeStreamSpec extends SparkSpec {

  test("streamed codes probe exactly like in-process hamming ann; restart never double-signs") {
    val emb = Tables(spark, sf, "embeddings")
    val src = Files.createTempDirectory("graft_codestream_src").toString
    val idx = Files.createTempDirectory("graft_codestream_idx").toString
    val ckpt = Files.createTempDirectory("graft_codestream_ckpt").toString

    emb.filter(col("vec_id") % 2 === 0).select("vec_id", "embedding")
      .coalesce(1).write.mode("append").json(src)
    val q1 = CodeStream.start(spark, src, idx, ckpt)
    try q1.awaitTermination() finally q1.stop()

    emb.filter(col("vec_id") % 2 =!= 0).select("vec_id", "embedding")
      .coalesce(1).write.mode("append").json(src)
    val q2 = CodeStream.start(spark, src, idx, ckpt)
    try q2.awaitTermination() finally q2.stop()

    val codes = spark.read.parquet(s"$idx/codes")
    assert(codes.count() == emb.count(), "every vector signed exactly once")
    assert(codes.select("vec_id").distinct().count() == emb.count())

    val got = Similarity.hammingTopKAgainstStoredCodes(spark, idx,
        emb.filter(col("vec_id") < 10), emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val want = Similarity.hammingTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    graft.operators.PlanCache.release()
    assert(want.nonEmpty)
    assert(got == want, "JSON float round-trip + streamed signing must replay the batch index")
  }
}
