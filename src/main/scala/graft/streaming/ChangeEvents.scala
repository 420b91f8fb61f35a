package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Canonical change-event model — the Spark re-expression of the
  * reference's per-engine CDC records (SURVEY §1.1 #3):
  * Mongo `streamEvent` (reference mongodb.go:97-112), canal RowsEvent
  * (mysql.go:475-521), pgoutput messages (postgresql.go:671-723).
  *
  * All engines collapse onto one schema; `op` is the operation type the
  * reference dispatches on (insert/update/replace/delete,
  * mongodb.go:1139-1177), `offset` is the engine's resume position
  * (resume token / binlog pos / LSN / stream id).
  */
object ChangeEvents {

  val payloadSchema: StructType = StructType(Seq(
    StructField("value", DoubleType),
    StructField("k", LongType)))

  val schema: StructType = StructType(Seq(
    StructField("op", StringType, nullable = false),
    StructField("key", LongType, nullable = false),
    StructField("after", payloadSchema),
    StructField("sourceDb", StringType),
    StructField("sourceTable", StringType),
    StructField("ts", TimestampType, nullable = false),
    StructField("offset", LongType, nullable = false)))

  /** P2 — the watch $match stage (mongodb.go:550-556): namespace
    * equality plus the operation whitelist. In Mongo this filter runs
    * server-side inside the change stream; here it sits directly on
    * the stream scan, so Catalyst pushes it into the source read. */
  def matchStage(df: DataFrame, db: String, table: String): DataFrame =
    df.filter(col("sourceDb") === db && col("sourceTable") === table &&
      col("op").isin("insert", "update", "replace", "delete"))

  /** P3 — binlog include-table regexes (mysql.go:52-58): keep events
    * whose `db.table` matches ANY configured pattern (canal's
    * IncludeTableRegex semantics). Empty pattern list = include all. */
  def includeTables(df: DataFrame, patterns: Seq[String]): DataFrame =
    if (patterns.isEmpty) df
    else {
      val ns = concat(col("sourceDb"), lit("."), col("sourceTable"))
      df.filter(patterns.map(ns.rlike).reduce(_ || _))
    }

  /** Deterministic change stream derived from the `events` table:
    * signup→insert, error→delete, purchase/view/click→update. The
    * event's `props.k` and `value` become the row payload; `event_id`
    * is the monotone offset (like an LSN). */
  def fromEvents(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").select(
      when(col("event_type") === "signup", "insert")
        .when(col("event_type") === "error", "delete")
        .otherwise("update").as("op"),
      col("user_id").as("key"),
      struct(
        col("value"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k")).as("after"),
      lit("graft").as("sourceDb"),
      lit("events").as("sourceTable"),
      col("ts"),
      col("event_id").as("offset"))
}
