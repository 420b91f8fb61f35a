package graft.operators

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Conditions, TimeWindows}
import graft.model.CountCondition

/** JST-window counting/export queries (P4–P6, A2) — anchored at fixed
  * instants so results are deterministic for the oracle (the reference
  * anchors at wall-clock now(), query_counter.go:96).
  *
  * The window bounds fold to literals at plan time, so they push down
  * to the parquet scan (row-group pruning at scale).
  */
object Windows {

  /** Fixed anchors over the 2024-01 events data. */
  val CountAnchor: LocalDateTime = LocalDateTime.parse("2024-01-15T00:00:00")
  val ExportAnchor: LocalDateTime = LocalDateTime.parse("2024-01-20T00:00:00")

  /** A2 + P6: conditional count with compiled conditions — numeric
    * comparison, equality, and a weekly JST dateRange (inclusive end,
    * count semantics). */
  def conditionalCount(spark: SparkSession, dir: String): DataFrame = {
    val conds = Seq(
      CountCondition("events", "value", ">", "50"),
      CountCondition("events", "event_type", "=", "purchase"),
      CountCondition("events", "ts", "dateRange", "weekly"),
      CountCondition("other_table", "value", "<", "0")) // routed away (query_counter.go:88-91)
    Tables(spark, dir, "events")
      .filter(Conditions.compile(conds, "events", CountAnchor))
      .agg(count(lit(1)).as("cnt"))
      .select(lit("events").as("table_name"), col("cnt"))
  }

  /** P4 export-window slice: JST day-offset window with EXCLUSIVE end
    * (export semantics, external_simple.go:573-580), offsets -3..-1. */
  def exportWindowSlice(spark: SparkSession, dir: String): DataFrame = {
    val w = TimeWindows.jstDayWindow(ExportAnchor, -3, -1)
    // nanos-pushdown scan: the window bounds reach the parquet reader
    Tables.tsWindowScan(spark, dir, "events", "ts", w, inclusiveEnd = false)
      .select("event_id", "ts", "user_id", "event_type")
  }
}
