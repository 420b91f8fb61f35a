package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{ChangeEvents, DailyRollup}

/** A6 — streaming daily windowed aggregation with watermarked state. */
class DailyRollupSpec extends SparkSpec {

  test("streaming daily counts equal the batch JST-day rollup") {
    val src = Files.createTempDirectory("graft_roll").toString
    ChangeEvents.fromEvents(spark, sf).coalesce(1).write.mode("append").json(src)

    DailyRollup.start(spark, src, "daily_rollup_test").awaitTermination()
    val streamed = spark.sql("SELECT day_start, event_type, n FROM daily_rollup_test")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    // batch equivalent: JST calendar-day buckets (15:00 UTC window start)
    val batch = ChangeEvents.fromEvents(spark, sf)
      .select(col("ts"), col("op").as("event_type"))
      .groupBy(window(col("ts"), "1 day", "1 day", DailyRollup.JstDayStartOffset).as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start"), col("event_type"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    assert(streamed.nonEmpty && streamed == batch)
    // windows align to JST midnight: start hour is 15:00 UTC
    assert(streamed.forall { case (ts, _, _) =>
      ts.toInstant.atZone(java.time.ZoneOffset.UTC).getHour == 15 })
  }
}
