package graft

import graft.operators.Similarity

/** PQ codebook training: the trained quantizer must beat the first-64
  * convention in recall, and serving from the PERSISTED codebook must
  * replay the in-process result bit-for-bit (the train-once /
  * serve-from-literals deployment contract). */
class PqTrainSpec extends SparkSpec {

  test("trained PQ beats the first-64 baseline; stored-codebook replay is bit-exact") {
    val exact = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(rows: Array[org.apache.spark.sql.Row]): Double =
      rows.map(r => (r.getLong(0), r.getLong(1))).count(exact.contains).toDouble / exact.size

    val baseline = recall(Similarity.pqTopK(spark, sf).collect())

    val emb = Tables(spark, sf, "embeddings")
    val cents = Similarity.trainPqCodebooks(emb)
    val trainedRows = Similarity.pqTopKWithCodebook(emb, cents).collect()
    val trained = recall(trainedRows)
    info(s"recall@5: baseline $baseline trained $trained")
    assert(trained > baseline,
      s"training must lift recall: baseline $baseline trained $trained")

    // persisted replay: store, load, re-serve — identical rows
    val dir = java.nio.file.Files.createTempDirectory("graft_pq_cb").toString
    Similarity.storePqCodebook(spark, cents, dir)
    val loaded = Similarity.loadPqCodebook(spark, dir)
    assert(loaded.length == cents.length &&
      loaded.zip(cents).forall { case (a, b) =>
        a.zip(b).forall { case (x, y) => x.toSeq == y.toSeq } },
      "stored codebook must round-trip exactly")
    val replayed = Similarity.pqTopKWithCodebook(emb, loaded).collect()
    assert(replayed.map(_.toSeq).toSet == trainedRows.map(_.toSeq).toSet,
      "serving from the stored codebook must equal the in-process run")
  }

  test("iteration zero reproduces the untrained baseline exactly") {
    // init = first-64 subvectors, so iters=0 IS pqTopK — the anchor
    // that makes every trained iteration a refinement of the baseline
    val emb = Tables(spark, sf, "embeddings")
    val zero = Similarity.pqTopKWithCodebook(emb,
      Similarity.trainPqCodebooks(emb, iters = 0)).collect()
    val base = Similarity.pqTopK(spark, sf).collect()
    assert(zero.map(_.toSeq).toSet == base.map(_.toSeq).toSet)
  }
}
