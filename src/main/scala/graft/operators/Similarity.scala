package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Vectors

/** Approximate-nearest-neighbor search and embedding near-dup detection
  * over the `embeddings` table (64-dim unit-norm Array[Float]).
  *
  * Two paths, per the scale playbook:
  *  - brute-force cosine top-k: the correctness baseline. The query set
  *    is broadcast, so the candidate scan streams once with no shuffle
  *    until the final per-query top-k.
  *  - LSH-bucketed ANN: random-hyperplane signatures bucket the
  *    candidates; only same-bucket pairs are scored. At 100 TB the
  *    bucket join replaces the O(Q·N) cross product.
  */
object Similarity {

  /** Brute-force cosine top-k for query vectors (vec_id < 10).
    * Ranking key is (rounded sim desc, vec_id) so ordering is stable
    * across engines for the oracle compare. */
  def bruteForceTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val scored = emb.select(col("vec_id").as("cand_id"), col("embedding").as("cv"))
      .join(broadcast(queries), col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        round(Vectors.dot(col("qv"), col("cv")), 6).as("sim")) // unit-norm: dot = cosine
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "sim", "rank")
  }

  /** Embedding near-dup pairs: same-label blocking, cosine ≥ threshold.
    * Label blocking stands in for the coarse quantizer of an IVF index;
    * the pair count is bounded per block. */
  def embeddingNearDups(spark: SparkSession, dir: String, threshold: Double = 0.4): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"))
    emb.as("x").join(emb.as("y"),
        col("x.label") === col("y.label") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"), col("x.label").as("label"),
        round(Vectors.dot(col("x.embedding"), col("y.embedding")), 6).as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** LSH-bucketed ANN (scale path): 16-bit hyperplane signature, then
    * multi-probe via 4-bit bands — only same-band candidates are
    * scored, then per-query top-k. Approximate by design (rows-only
    * check; recall is asserted against brute force in the spec). */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"),
        Vectors.hyperplaneSignature(col("embedding")).as("sig"))
      .persist() // signature feeds the band explode on both sides
    def bands(df: DataFrame, idCol: String, vCol: String): DataFrame =
      df.select(col("vec_id").as(idCol), col("embedding").as(vCol),
        posexplode(transform(sequence(lit(0), lit(3)),
          j => call_function("shiftright", col("sig"), j * 4).bitwiseAND(lit(0xFL)))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val q = bands(emb.filter(col("vec_id") < 10), "query_id", "qv")
    val c = bands(emb, "cand_id", "cv")
    val scored = q.join(c,
        Seq("band", "bucket")).filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), col("qv"), col("cv"))
      .dropDuplicates("query_id", "cand_id")
      .select(col("query_id"), col("cand_id"),
        round(Vectors.dot(col("qv"), col("cv")), 6).as("sim"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "cand_id", "sim", "rank")
  }
}
