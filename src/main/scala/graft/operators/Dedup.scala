package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** Deduplication suite for training-data pipelines: exact keyed dedup,
  * MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale design: every near-dup variant is banded/bucketed so the only
  * shuffles are (1) explode→groupBy on band keys and (2) the bucket
  * self-join — never an all-pairs cross join. At 100 TB the band join
  * keys are uniformly distributed by construction (hash buckets), so
  * no skew salting is needed; AQE handles residual imbalance.
  */
object Dedup {

  /** Exact keyed dedup (hash-groupBy): latest event per
    * (user_id, event_type) — the reference's upsert key semantics
    * (reference mongodb.go:1152-1161) as a batch dedup. */
  def exactLatestEvents(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables(spark, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ts", "value")
  }

  // ---- MinHash + LSH ------------------------------------------------

  val NumPerms = 32
  val BandRows = 4 // 8 bands × 4 rows
  private val P = 2147483647L // 2^31 - 1

  /** Deterministic affine-permutation parameters (LCG-expanded seed —
    * fixed across runs so checkpoint/restart of a dedup job is stable). */
  private val perms: Seq[(Long, Long)] = {
    var s = 42L
    def next(): Long = { s = (s * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; s % (P - 1) + 1 }
    Seq.fill(NumPerms)((next(), next()))
  }

  /** MinHash signature (array of NumPerms longs) over k-token shingles:
    * h_i(s) = (a_i·x + b_i) mod p with x = xxhash64(shingle) mod p. */
  def minhashSignature(text: Column, k: Int = 3): Column = {
    val xs = transform(Text.shingles(text, k), s => pmod(xxhash64(s), lit(P)))
    val ab = array(perms.map { case (a, b) => struct(lit(a).as("a"), lit(b).as("b")) }: _*)
    transform(ab, p =>
      array_min(transform(xs, x => pmod(p.getField("a") * x + p.getField("b"), lit(P)))))
  }

  /** Candidate near-dup pairs via LSH banding + signature-similarity
    * estimate + exact shingle-set Jaccard on the candidates only. */
  def minhashPairs(spark: SparkSession, dir: String, threshold: Double = 0.2): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), Text.tokens(col("text")).as("toks"),
        minhashSignature(col("text")).as("mh"))
      // signature reused by the band explode AND both join sides
      .persist()
    val bands = docs.select(col("doc_id"), col("mh"),
      posexplode(transform(sequence(lit(0), lit(NumPerms / BandRows - 1)),
        b => concat_ws("-", slice(col("mh"), b * BandRows + 1, lit(BandRows))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val cand = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        col("x.mh").as("mha"), col("y.mh").as("mhb"))
      .dropDuplicates("doc_a", "doc_b")
    val est = cand.withColumn("est_jaccard",
      size(filter(zip_with(col("mha"), col("mhb"), (a, b) => a === b), x => x))
        .cast("double") / NumPerms)
      .filter(col("est_jaccard") >= threshold)
      .select("doc_a", "doc_b", "est_jaccard")
    // exact verify on candidates only (the LSH contract: cheap candidate
    // generation, exact check on the tiny candidate set)
    val sh = docs.select(col("doc_id"), array_distinct(col("toks")).as("tokset"))
    est
      .join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("tokset", "set_a"), "doc_a")
      .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("tokset", "set_b"), "doc_b")
      .withColumn("token_jaccard",
        round(size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          size(array_union(col("set_a"), col("set_b"))).cast("double"), 4))
      .select("doc_a", "doc_b", "est_jaccard", "token_jaccard")
  }

  // ---- SimHash -------------------------------------------------------

  /** 64-bit SimHash from token hashes, as pure expressions: per-bit
    * majority vote folded back into one long. */
  def simhash(text: Column): Column = {
    val hashes = transform(Text.tokens(text), t => xxhash64(t))
    val votes = aggregate(hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          i => when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L))),
        (a, v) => a + v))
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, bit) => acc.bitwiseOR(bit))
  }

  /** Near-dup pairs with Hamming distance ≤ maxHamming, banded on four
    * 16-bit chunks (a pair within distance 3 must agree on ≥1 chunk;
    * wider distances trade recall, like any banding scheme). */
  def simhashPairs(spark: SparkSession, dir: String, maxHamming: Int = 16): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), simhash(col("text")).as("sh"))
      .persist() // reused by the chunk explode and both join sides
    val chunks = docs.select(col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(3)),
        j => call_function("shiftright", col("sh"), j * 16).bitwiseAND(lit(0xFFFFL)))))
      .withColumnRenamed("pos", "chunk_id").withColumnRenamed("col", "chunk")
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk_id") === col("y.chunk_id") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        bit_count(col("x.sh").bitwiseXOR(col("y.sh"))).as("hamming"))
      .dropDuplicates("doc_a", "doc_b")
      .filter(col("hamming") <= maxHamming)
  }

  // ---- n-gram / token-set Jaccard -------------------------------------

  /** Exact token-set Jaccard near-dups within a blocking key (source).
    * Blocking bounds the pair count; jaccard = |∩|/|∪| is integer
    * division → bit-identical across engines (oracle-checkable). */
  def tokenJaccardPairs(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    val docs = Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), array_distinct(Text.tokens(col("text"))).as("tokset"))
    docs.as("x").join(docs.as("y"),
        col("x.source") === col("y.source") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"),
        round(size(array_intersect(col("x.tokset"), col("y.tokset"))).cast("double") /
          size(array_union(col("x.tokset"), col("y.tokset"))).cast("double"), 4).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
