package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming daily-anomaly monitor — the online face of
  * [[graft.operators.EventFlow.dailyAnomalies]] (q90): per event type,
  * each calendar day's integer-cent value mass finalizes when the
  * watermark passes it, is scored against the PRIOR finalized history
  * of its type, and fires a `value_anomaly` alert when |z| crosses the
  * threshold — data drift caught the day it lands, not at the next
  * batch sweep.
  *
  * Semantics, stated plainly: the batch operator scores every day
  * against ALL days (retrospective); this stream scores each day
  * against the days finalized BEFORE it (online, the only causal
  * option). A day needs ≥ `minHistory` prior days or it only joins the
  * history. The z math is the batch operator's exactly: integer cents
  * and integer moments, variance from (n·Σx² − (Σx)²).
  *
  * Shape: watermarked tumbling-day aggregation in append mode (a day
  * emits once, finalized) → `foreachBatch`: idempotent history append
  * (anti-join on (type, day), so a replayed batch cannot duplicate a
  * day or re-alert it) + per-type moment fold (≤ types rows collected
  * — metadata-bounded, the monitor convention) + alerts through the
  * pluggable [[Alerts.Sink]]. State is bounded by open days × types
  * under the watermark. */
object AnomalyStream {

  /** Finalized (day, type, cents) rows from a watermarked tumbling-day
    * aggregation — cents are floor(value·100), the tie-free money
    * convention the batch twin uses. */
  def dailyTotals(stream: DataFrame, late: String = "1 day"): DataFrame =
    stream
      .withWatermark("ts", late)
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
      .select(to_date(col("w.start")).as("day"), col("event_type"), col("cents"))

  /** One finalized micro-batch against the history: append the new
    * (type, day) rows idempotently, then score each NEW day against
    * the history that preceded it. Returns the alerts to fire. */
  private[streaming] def scoreBatch(spark: SparkSession, batch: DataFrame,
      historyDir: String, threshold: Double, minHistory: Int): Seq[Alerts.Alert] = {
    val hPath = new org.apache.hadoop.fs.Path(historyDir)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val history: Option[DataFrame] =
      if (fs.exists(hPath))
        Some(spark.read.schema("day DATE, event_type STRING, cents LONG")
          .parquet(historyDir))
      else None
    val fresh = history match {
      case Some(h) => batch.join(h.select("day", "event_type"),
        Seq("day", "event_type"), "left_anti")
      case None => batch
    }
    // metadata-bounded: a micro-batch finalizes at most types × days-
    // since-last-trigger rows
    val freshRows = fresh.select("day", "event_type", "cents").collect()
      .map(r => (r.getDate(0), r.getString(1), r.getLong(2)))
    if (freshRows.isEmpty) return Nil
    // prior moments per type (≤ types rows)
    val moments: Map[String, (Long, Long, BigInt)] = history match {
      case Some(h) => h.groupBy(col("event_type")).agg(
          count(lit(1)).as("n"), sum(col("cents")).as("sx"),
          sum(col("cents").cast(org.apache.spark.sql.types.DecimalType(38, 0)) *
            col("cents").cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("sxx"))
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), BigInt(r.getDecimal(3).toBigInteger))))
        .toMap
      case None => Map.empty
    }
    fresh.write.mode("append").parquet(historyDir)
    freshRows.toSeq.flatMap { case (day, tpe, x) =>
      moments.get(tpe) match {
        case Some((n, sx, sxx)) if n >= minHistory =>
          // the batch twin's formula on the PRIOR history: sample
          // variance from exact moments, z as the one double step
          val nD = n.toDouble
          val varNum = nD * sxx.toDouble - sx.toDouble * sx.toDouble
          val sd = math.sqrt(varNum / (nD * (nD - 1.0)))
          if (sd > 0 && math.abs((x.toDouble - sx.toDouble / nD) / sd) >= threshold)
            Some(Alerts.Alert("value_anomaly", tpe,
              s"day $day cents $x z=${math.round((x.toDouble - sx.toDouble / nD) / sd * 100) / 100.0}"))
          else None
        case _ => None
      }
    }
  }

  /** JSON event stream → durable daily history + threshold alerts.
    * Restart-safe: the checkpoint replays unfinished batches, and the
    * (type, day) anti-join makes the replay a no-op — no duplicate
    * history rows, no duplicate alerts. */
  def start(spark: SparkSession, sourceDir: String, historyDir: String,
      checkpoint: String, alerts: Alerts.Sink = Alerts.Log,
      threshold: Double = 2.0, minHistory: Int = 3,
      late: String = "1 day", availableNow: Boolean = true): StreamingQuery =
    startFrom(spark,
      spark.readStream.schema(RateStream.schema)
        .option("timestampFormat", SessionStream.TsFormat).json(sourceDir),
      historyDir, checkpoint, alerts, threshold, minHistory, late, availableNow)

  /** Engine face (the `anomalyMonitor` config opt-in): daily OP-COUNT
    * z-scores over a change-event stream — each op kind plays the
    * event type with unit value, so the daily cent mass is 100·count
    * and the z-score (scale-invariant) is the op-count z-score. This
    * is the delete-storm / update-surge alarm: a day whose op volume
    * breaks from its type's history fires `value_anomaly` while the
    * sibling CDC pipeline keeps applying. Rides the same source;
    * owns only its history + checkpoint. */
  def startChangeEvents(spark: SparkSession, sourceDir: String,
      historyDir: String, checkpoint: String,
      alerts: Alerts.Sink = Alerts.Log, threshold: Double = 2.0,
      minHistory: Int = 3, availableNow: Boolean = true): StreamingQuery =
    startFrom(spark,
      spark.readStream.schema(ChangeEvents.schema).json(sourceDir)
        .select(col("op").as("event_type"), col("ts"), lit(1.0).as("value")),
      historyDir, checkpoint, alerts, threshold, minHistory,
      late = "1 day", availableNow = availableNow)

  private def startFrom(spark: SparkSession, stream: DataFrame,
      historyDir: String, checkpoint: String, alerts: Alerts.Sink,
      threshold: Double, minHistory: Int, late: String,
      availableNow: Boolean): StreamingQuery =
    dailyTotals(stream, late)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        scoreBatch(spark, batch, historyDir, threshold, minHistory)
          .foreach(alerts.send)
      }
      .trigger(if (availableNow) Trigger.AvailableNow()
               else Trigger.ProcessingTime("1 second"))
      .start()

  /** Read face over the durable daily history. */
  def currentHistory(spark: SparkSession, historyDir: String): DataFrame =
    spark.read.schema("day DATE, event_type STRING, cents LONG")
      .parquet(historyDir)
}
