package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text

/** Corpus-level text analysis queries over the `documents` table. */
object TextOps {

  /** Token statistics per document (whitespace + regex word tokens +
    * mean token length). */
  def tokenStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      Text.tokenCount(col("text")).as("n_ws_tokens"),
      size(Text.wordTokens(col("text"))).as("n_word_tokens"),
      round(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks).cast("double"), 4).as("avg_token_len"))
  }

  /** Per-document quality scores with components. */
  def qualityScores(spark: SparkSession, dir: String): DataFrame = {
    val toks = Text.tokens(col("text"))
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      round(size(array_distinct(toks)).cast("double") / size(toks).cast("double"), 4)
        .as("distinct_ratio"),
      Text.qualityScore(col("text")).as("quality"))
  }

  /** Language-ID guess + corpus rollup: docs and mean stopword ratio
    * per (lang label, guess). */
  def langIdRollup(spark: SparkSession, dir: String): DataFrame = {
    val ratio = Text.stopwordCount(col("text")).cast("double") /
      Text.tokenCount(col("text")).cast("double")
    Tables(spark, dir, "documents")
      .select(col("lang"), Text.langId(col("text")).as("guess"), ratio.as("ratio"))
      .groupBy(col("lang"), col("guess"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("ratio")), 4).as("avg_stopword_ratio"))
  }

  /** Winnowing fingerprints; grouping by fingerprint is content-level
    * dedup resilient to local edits. */
  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      Text.fingerprint(col("text")).as("fingerprint"))

  /** Within-document repetition signal (the Gopher-rules "repeated
    * n-gram fraction"): the share of a document's k-token shingles that
    * duplicate an earlier shingle in the SAME document — loops,
    * boilerplate, and template spam score high and get filtered before
    * training. Pure per-row expression: fuses into the scan, no
    * shuffle, whole-stage codegen. */
  def repetitionScores(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val shs = Text.shingles(col("text"), k)
    Tables(spark, dir, "documents").select(
      col("doc_id"),
      size(shs).as("n_shingles"),
      round(lit(1.0) -
        size(array_distinct(shs)).cast("double") / size(shs).cast("double"), 4)
        .as("dup_shingle_frac"))
  }

  /** Per-source corpus report — the health summary a curation pipeline
    * emits after each build: volume, token mass, mean quality, and
    * language mix per source. One scan, one partial-aggregated
    * hash-agg on `source`; every metric is algebraic (sum/count/avg),
    * so the map-side combine ships one row per (task, source). */
  def corpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("source"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"),
        Text.qualityScore(col("text")).as("quality"),
        (Text.langId(col("text")) === "en").cast("int").as("is_en"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        round(avg(col("n_tokens")), 2).as("avg_tokens"),
        round(avg(col("quality")), 4).as("avg_quality"),
        round(avg(col("is_en")), 4).as("en_frac"))

  // ---- corpus curation ------------------------------------------------

  /** End-to-end curation — the composed filter chain a training-data
    * pipeline runs before mixing: keep documents that (1) clear the
    * quality bar, (2) language-ID as English, and (3) survive near-dup
    * clustering (a document in a cluster is kept only if it is the
    * cluster's canonical member; documents with no near-dup are
    * implicitly canonical and never enter the cluster list).
    *
    * Scale: (1) and (2) are per-row expressions fused into the scan;
    * (3) is an anti-join against the cluster LOSERS only — a set that
    * is small relative to the corpus (near-dup victims), broadcast-able
    * in practice, and Catalyst picks that up from stats/AQE. */
  def curate(spark: SparkSession, dir: String, minQuality: Double = 0.66): DataFrame = {
    val losers = Dedup.dedupClusters(spark, dir)
      .filter(!col("is_canonical")).select(col("doc_id"))
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        Text.qualityScore(col("text")).as("quality"),
        Text.langId(col("text")).as("guess"))
      .filter(col("quality") >= minQuality && col("guess") === "en")
      .join(losers, Seq("doc_id"), "left_anti")
      .select("doc_id", "source", "quality")
  }

  /** Per-source quality cap: the best `n` documents of each source by
    * quality score (ties broken by doc_id for cross-engine
    * determinism) — the "keep the best K per domain" curation rule.
    * One window partitioned by source; at scale partition count =
    * source count, so pair with a salted pre-aggregation if a single
    * source dominates the corpus. */
  def topQualityPerSource(spark: SparkSession, dir: String, n: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("quality").desc, col("doc_id").asc)
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), Text.qualityScore(col("text")).as("quality"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= n)
  }

  /** Vocabulary mining — term frequency + document frequency for the
    * top-k corpus tokens (count desc, token asc for deterministic
    * ties): the stats a tokenizer-training / idf-weighting step reads.
    * One explode + hash-agg (map-side combined; distinct-doc count
    * expands to the usual two-phase agg) and a TakeOrdered top-k —
    * never a global sort. */
  def vocabulary(spark: SparkSession, dir: String, topK: Int = 100): DataFrame =
    Tables(spark, dir, "documents")
      .select(col("doc_id"), explode(Text.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("tf"), count_distinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("token").asc)
      .limit(topK)

  // ---- dataset mixing -------------------------------------------------

  /** Default mix for the 20-source testdata: rates cycle ¼, ½, ¾, 1 by
    * numeric source suffix — exercises every rate class incl. keep-all. */
  val DefaultMixRates: Map[String, Double] =
    (0 until 20).map(i => s"src$i" -> ((i % 4) + 1) * 0.25).toMap

  /** Deterministic per-row sampling decision in basis points (0..9999):
    * a 60-bit md5 of the salted doc id, mod 10⁴. Pure function of the
    * id — re-running the mixer on a grown corpus keeps every previously
    * selected document selected (stable training mixes), unlike
    * `rand()`-based `DataFrame.sample`. */
  private def mixHash(docId: Column, salt: String): Column =
    pmod(Text.md5Hash60(concat(lit(salt), docId.cast("string"))), lit(10000))

  /** Weighted dataset mixer — stratified downsampling by source with
    * per-source keep rates, the "data mixture" step of a training-data
    * pipeline (e.g. upweight curated sources, downweight crawl).
    *
    * Scale: a pure per-row filter — no shuffle, no per-source pass; the
    * rate lookup folds into a CASE expression so one scan handles any
    * number of sources, and the parquet scan prunes to the 3 used
    * columns. Deterministic hash sampling also makes the mix
    * REPRODUCIBLE across runs and engines (the DuckDB oracle replays
    * the same md5 decision bit-for-bit). */
  def weightedSample(spark: SparkSession, dir: String,
      rates: Map[String, Double] = DefaultMixRates,
      salt: String = "mix-"): DataFrame = {
    // unknown source ⇒ rate 0 (drop): a mixer must never silently pass
    // through a source the mix spec doesn't mention. round, don't
    // truncate: 0.29 * 10000 is 2899.999… in binary — .toInt would
    // under-sample every binary-unrepresentable rate by a basis point
    val rateBp = rates.foldLeft(lit(0)) { case (acc, (src, r)) =>
      when(col("source") === src, lit(math.round(r * 10000).toInt)).otherwise(acc) }
    Tables(spark, dir, "documents")
      .select(col("doc_id"), col("source"), mixHash(col("doc_id"), salt).as("mix_bp"))
      .filter(col("mix_bp") < rateBp)
  }

  // ---- sequence packing ----------------------------------------------

  val PackGroups = 8

  /** Sequence packing — assign documents to fixed-capacity training
    * sequences by concatenation order (GPT-style "concat then chop"):
    * documents are laid head-to-tail in deterministic (group, doc_id)
    * order; a document starting at running offset `o` with `n` tokens
    * occupies chunk ⌊o/capacity⌋ and spans a boundary iff
    * o mod capacity + n > capacity.
    *
    * Scale: the running sum is a window per PACK GROUP, and groups are
    * assigned by document hash — so parallelism is `PackGroups` (set ∝
    * cluster size in production; 8 here), never one global sort. Each
    * group's window sorts only its own partition; no stage sees the
    * whole corpus in one task. */
  def packSequences(spark: SparkSession, dir: String, capacity: Int = 512): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pack_group")).orderBy(col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables(spark, dir, "documents")
      .select(col("doc_id"),
        pmod(Text.md5Hash60(concat(lit("pack-"), col("doc_id").cast("string"))),
          lit(PackGroups)).as("pack_group"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .select(col("doc_id"), col("pack_group"), col("n_tokens"),
        ((col("_cum") - col("n_tokens")) / capacity).cast("long").as("chunk_id"),
        (pmod(col("_cum") - col("n_tokens"), lit(capacity.toLong)) + col("n_tokens")
          > capacity).as("spans_boundary"))
  }
}
