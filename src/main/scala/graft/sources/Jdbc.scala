package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** S4/S6 — JDBC snapshot source and W4 batched-insert sink.
  *
  * The reference's initial full sync pages `SELECT *` through one
  * connection and applies 100-row insert batches
  * (reference mysql.go:154-263, postgresql.go snapshot path). The
  * Spark re-expression is `spark.read.jdbc`: column pruning and
  * filters push into the remote SQL, and a numeric partition column
  * turns the single-cursor page loop into N parallel range-bounded
  * cursors — the difference between one connection streaming 100 TB
  * and a thousand executors each pulling a bounded slice.
  *
  * The engine's parquet stand-ins elsewhere in the repo model these
  * semantics for the oracle; this adapter is the thin real-database
  * edge, exercised in tests against embedded Derby (the only JDBC
  * engine in the sandbox).
  */
object Jdbc {

  final case class JdbcConfig(
      url: String,
      table: String,                        // table name or "(subquery) alias"
      properties: Map[String, String] = Map.empty, // driver/user/password
      partitionColumn: Option[String] = None,      // numeric column for parallel read
      numPartitions: Int = 8,
      fetchSize: Int = 1000,                // cursor page size (≙ reference batchSize)
      batchSize: Int = 1000)                // write-side insert batch

  private def props(cfg: JdbcConfig): java.util.Properties = {
    val p = new java.util.Properties()
    cfg.properties.foreach { case (k, v) => p.setProperty(k, v) }
    p.setProperty("fetchsize", cfg.fetchSize.toString)
    p
  }

  /** Probe MIN/MAX of the partition column so the range read can split
    * evenly — one tiny bounds query, like Spark's own JDBC relation
    * requires the caller to supply. Returns None for an empty table. */
  def bounds(spark: SparkSession, cfg: JdbcConfig, column: String): Option[(Long, Long)] = {
    val q = s"(SELECT MIN($column) lo, MAX($column) hi FROM ${cfg.table}) b"
    val row = spark.read.jdbc(cfg.url, q, props(cfg)).head()
    if (row.isNullAt(0)) None
    else Some((row.get(0).toString.toLong, row.get(1).toString.toLong))
  }

  /** S4/S6: snapshot read. With a configured numeric partition column
    * the scan runs as `numPartitions` parallel range cursors; without
    * one it is a single cursor (correct, not scalable — exactly the
    * reference's shape). */
  def snapshot(spark: SparkSession, cfg: JdbcConfig): DataFrame =
    cfg.partitionColumn.flatMap(c => bounds(spark, cfg, c).map((c, _))) match {
      case Some((c, (lo, hi))) =>
        spark.read.jdbc(cfg.url, cfg.table, c, lo, hi, cfg.numPartitions, props(cfg))
      case None =>
        spark.read.jdbc(cfg.url, cfg.table, props(cfg))
    }

  /** W4: batched append — executors write `batchSize`-row insert
    * batches in parallel (the reference's 100-row batches,
    * mysql.go:232-251, minus the driver-side loop). */
  def writeAppend(df: DataFrame, cfg: JdbcConfig): Unit = {
    val p = props(cfg)
    p.setProperty("batchsize", cfg.batchSize.toString)
    df.write.mode(SaveMode.Append).jdbc(cfg.url, cfg.table, p)
  }
}
