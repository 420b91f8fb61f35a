package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader over the driver-provided TESTDATA layout
  * (`<sfDir>/<table>.parquet`). All queries read through here so that
  * column pruning / filter pushdown reach the parquet scans uniformly.
  *
  * Timestamp columns have shipped in two vintages: TIMESTAMP(NANOS)
  * (read as Long under `spark.sql.legacy.parquet.nanosAsLong=true`,
  * normalized to microsecond TimestampType here — lossless, the data
  * has no sub-microsecond components) and, currently, timestamp[us]
  * with isAdjustedToUTC=false (read directly as TimestampType because
  * [[graft.GraftSession]] disables NTZ inference; the normalization
  * below is then a no-op). Both session flags stay set so either
  * vintage reads identically.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == LongType && (f.name == "ts" || f.name.endsWith("date")))
        // integral `div`, not `/`: double division loses precision above
        // 2^53 and epoch-nanos (~1.7e18) would round to the wrong micro.
        d.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
      else d
    }
  }

  /** Time-window scan with REAL parquet pushdown for a nanos-Long
    * timestamp column: a range predicate on the CONVERTED timestamp
    * cannot cross the conversion expression (only IsNotNull reaches
    * the scan), so this filters the raw epoch-nanos Long first — the
    * bounds reach the parquet reader and prune row groups — and
    * converts after. Bounds are UTC LocalDateTimes; end inclusive per
    * count semantics or exclusive per export semantics (SURVEY §7.5).
    * Falls back to a post-conversion filter for real timestamp
    * columns, where pushdown works natively. */
  def tsWindowScan(spark: SparkSession, sfDir: String, name: String, tsCol: String,
      window: (java.time.LocalDateTime, java.time.LocalDateTime),
      inclusiveEnd: Boolean): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    def nanos(t: java.time.LocalDateTime): Long =
      t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000000L + t.getNano
    raw.schema.fields.find(_.name == tsCol).map(_.dataType) match {
      case Some(LongType) =>
        val lo = nanos(window._1); val hi = nanos(window._2)
        val bounded = raw.filter(
          col(tsCol) >= lo && (if (inclusiveEnd) col(tsCol) <= hi else col(tsCol) < hi))
        // same conversion as apply(), on the pruned scan
        bounded.schema.fields.foldLeft(bounded) { (d, f) =>
          if (f.dataType == LongType && (f.name == "ts" || f.name.endsWith("date")))
            d.withColumn(f.name, timestamp_micros(expr(s"${f.name} div 1000")))
          else d
        }
      case _ =>
        val df = apply(spark, sfDir, name)
        val w = (window._1, window._2)
        df.filter(if (inclusiveEnd)
          graft.functions.TimeWindows.countPredicate(col(tsCol), w)
        else graft.functions.TimeWindows.exportPredicate(col(tsCol), w))
    }
  }

  /** Calendar-year predicate AS A RANGE: `year(c) = y` wraps the
    * column in a function and pushes nothing but IsNotNull to parquet;
    * the equivalent `[Jan 1 y, Jan 1 y+1)` range pushes both bounds
    * and prunes row groups on the column's min/max stats. Literals
    * parse in the session time zone (pinned UTC), matching what
    * `year()` would have grouped. */
  def inYear(c: org.apache.spark.sql.Column, y: Int): org.apache.spark.sql.Column =
    c >= lit(s"$y-01-01 00:00:00") && c < lit(s"${y + 1}-01-01 00:00:00")
}
