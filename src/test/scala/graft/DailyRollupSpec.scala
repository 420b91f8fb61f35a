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

  private def writeEventsTo(src: String)(ts: String*): Unit = {
    import org.apache.spark.sql.{Row, SaveMode}
    spark.createDataFrame(
      java.util.Arrays.asList(ts.map(t => Row("update", 1L,
        Row(1.0, 1L), "graft", "events",
        java.sql.Timestamp.valueOf(t), 1L)): _*),
      ChangeEvents.schema)
      .coalesce(1).write.mode(SaveMode.Append).json(src)
  }

  test("currentCounts reads the live value per key from the multi-trigger update log") {
    val src = Files.createTempDirectory("graft_roll_cur").toString
    val q = DailyRollup.start(spark, src, "roll_cur", availableNow = false)
    try {
      writeEventsTo(src)("2024-02-01 10:00:00", "2024-02-01 11:00:00")
      q.processAllAvailable()
      writeEventsTo(src)("2024-02-01 12:00:00") // same day, second trigger
      q.processAllAvailable()
    } finally q.stop()
    // the raw memory table is an update LOG: day counted once per trigger
    val raw = spark.sql("SELECT n FROM roll_cur").collect().map(_.getLong(0)).toSet
    assert(raw == Set(2L, 3L))
    // the snapshot face resolves to the live value
    val cur = DailyRollup.currentCounts(spark, "roll_cur")
      .collect().map(r => (r.getString(1), r.getLong(2)))
    assert(cur.toSeq == Seq(("update", 3L)))
  }

  test("A5: accumulating op counters are a stateful streaming agg matching the batch totals") {
    val src = Files.createTempDirectory("graft_opctr").toString
    ChangeEvents.fromEvents(spark, sf).coalesce(1).write.mode("append").json(src)
    val q = graft.streaming.Metrics.startOpCounters(spark, src, "op_ctr",
      availableNow = false)
    try {
      q.processAllAvailable()
      val mid = graft.streaming.Metrics.currentOpCounters(spark, "op_ctr")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = ChangeEvents.fromEvents(spark, sf)
        .groupBy("sourceTable", "op").count()
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(mid.nonEmpty && mid == batch)
      // counters ACCUMULATE across triggers (the reference's `+=`,
      // monitor.go:96-110): new input adds to the running totals
      writeEventsTo(src)("2024-02-01 10:00:00", "2024-02-01 11:00:00")
      q.processAllAvailable()
      val after = graft.streaming.Metrics.currentOpCounters(spark, "op_ctr")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(after(("events", "update")) == batch(("events", "update")) + 2)
      assert((after - (("events", "update"))) == (batch - (("events", "update"))))
    } finally q.stop()
  }

  test("watermark evicts finalized day windows: late events are dropped, not re-counted") {
    val src = Files.createTempDirectory("graft_roll_evict").toString
    def writeEvents(ts: String*): Unit = writeEventsTo(src)(ts: _*)

    // day A (two events), then day A+9 — after this batch the watermark
    // (max ts − 1 day) is far past day A's window end, so day A's state
    // is evicted from the store
    writeEvents("2024-01-01 10:00:00", "2024-01-01 11:00:00", "2024-01-10 10:00:00")
    val q = DailyRollup.start(spark, src, "roll_evict", availableNow = false)
    try {
      q.processAllAvailable()
      // a late straggler for the evicted day A: dropped by the watermark —
      // no updated row for day A may appear (in the pre-fix complete mode
      // the state was still live and the count would have grown to 3)
      writeEvents("2024-01-01 12:00:00")
      q.processAllAvailable()
    } finally q.stop()

    val updates = spark.sql("SELECT day_start, n FROM roll_evict")
      .collect().map(r => (r.getTimestamp(0).toInstant.toString, r.getLong(1)))
    val dayA = updates.filter(_._1.startsWith("2023-12-31")) // JST day A = [12-31 15:00Z, …)
    assert(dayA.toSet == Set(("2023-12-31T15:00:00Z", 2L))) // count 2 emitted once, never 3
    assert(updates.exists(_._1.startsWith("2024-01-09")))   // the live day landed
  }
}
