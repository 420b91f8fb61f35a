package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.IvfStream

/** Streaming IVF ingest — a streamed index must answer probes exactly
  * like one built in batch, and a restart must not double-assign. */
class IvfStreamSpec extends SparkSpec {

  test("streamed cells probe exactly like the in-process ivf; restart never double-assigns") {
    val emb = Tables(spark, sf, "embeddings")
    val src = Files.createTempDirectory("graft_ivfstream_src").toString
    val idx = Files.createTempDirectory("graft_ivfstream_idx").toString
    val ckpt = Files.createTempDirectory("graft_ivfstream_ckpt").toString

    // found the codebook only — the stream owns `cells`
    Similarity.foundCodebook(emb, idx)

    // first half of the corpus, then stop mid-stream
    emb.filter(col("vec_id") % 2 === 0).select("vec_id", "embedding")
      .coalesce(1).write.mode("append").json(src)
    val q1 = IvfStream.start(spark, src, idx, ckpt)
    try q1.awaitTermination() finally q1.stop()

    // restart from the same checkpoint with the rest appended: the
    // first half is committed, only the new files process
    emb.filter(col("vec_id") % 2 === 1).select("vec_id", "embedding")
      .coalesce(1).write.mode("append").json(src)
    val q2 = IvfStream.start(spark, src, idx, ckpt)
    try q2.awaitTermination() finally q2.stop()

    val cells = spark.read.parquet(s"$idx/cells")
    assert(cells.count() == emb.count(), "every vector assigned exactly once")
    assert(cells.select("vec_id").distinct().count() == emb.count())

    val got = Similarity.ivfTopKAgainstStoredIndex(spark, idx,
        emb.filter(col("vec_id") < 10)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val want = Similarity.ivfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    graft.operators.PlanCache.release()
    assert(got == want, "JSON float round-trip + streamed assignment must replay the batch index")
    assert(want.nonEmpty)
  }
}
