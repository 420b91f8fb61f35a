package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
}
