package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{RateStream, SessionStream}

/** Sliding-window streaming rates — overlap semantics, parity with a
  * driver-side window replay, durability, and watermark finalization.
  * Append mode emits a window only once the watermark passes its end,
  * so tests flush the tail with far-future sentinel events (the
  * SessionStreamSpec two-write pattern). */
class RateStreamSpec extends SparkSpec {

  private val Sentinel = "sentinel"

  private def writeEvents(src: String)(rows: (String, String, Double)*): Unit = {
    import org.apache.spark.sql.{Row, SaveMode}
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (et, t, v) =>
        Row(et, java.sql.Timestamp.valueOf(t), v) }: _*),
      RateStream.schema)
      .coalesce(1).write.mode(SaveMode.Append)
      .option("timestampFormat", SessionStream.TsFormat).json(src)
  }

  private def flush(src: String, q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    writeEvents(src)((Sentinel, "2030-01-01 00:00:00", 0.0))
    q.processAllAvailable()
    writeEvents(src)((Sentinel, "2030-01-02 00:00:00", 0.0))
    q.processAllAvailable()
  }

  /** Driver-side sliding-window replay over the testdata events: each
    * event lands in width/slide epoch-aligned overlapping windows. */
  private def replay(widthUs: Long, slideUs: Long): Map[(Long, String), (Long, Long)] =
    Tables(spark, sf, "events").select("event_type", "ts", "value").collect()
      .flatMap { r =>
        val ts = r.getTimestamp(1)
        val us = ts.getTime * 1000 + ts.getNanos / 1000 % 1000
        val cents = math.floor(r.getDouble(2) * 100).toLong
        val first = math.floorDiv(us, slideUs) * slideUs
        (0L until widthUs / slideUs).map { k =>
          (first - k * slideUs, r.getString(0)) -> cents
        }
      }
      .groupBy(_._1)
      .map { case (k, vs) => k -> ((vs.length.toLong, vs.map(_._2).sum)) }

  test("durable sliding windows equal the driver replay; each event counted width/slide times") {
    val src = Files.createTempDirectory("graft_rate_src").toString
    val out = Files.createTempDirectory("graft_rate_out").toString
    val ckpt = Files.createTempDirectory("graft_rate_ckpt").toString
    Tables(spark, sf, "events").select("event_type", "ts", "value")
      .coalesce(1).write.mode("append")
      .option("timestampFormat", SessionStream.TsFormat).json(src)

    val q = RateStream.startDurable(spark, src, out, ckpt)
    try { q.processAllAvailable(); flush(src, q) } finally q.stop()

    val streamed = RateStream.currentRates(spark, out)
      .filter(col("event_type") =!= Sentinel).collect()
      .map(r => (r.getTimestamp(0).getTime * 1000, r.getString(2)) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    val expected = replay(3600L * 1000000L, 900L * 1000000L)
    assert(streamed.nonEmpty && streamed == expected)
    // overlap really happened: total window-rows = 4x the event count
    val events = Tables(spark, sf, "events").count()
    assert(streamed.valuesIterator.map(_._1).sum == 4L * events)
    // and window_end - window_start is the full width on every row
    val widths = RateStream.currentRates(spark, out)
      .filter(col("event_type") =!= Sentinel)
      .select((unix_micros(col("window_end")) - unix_micros(col("window_start"))).as("w"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(widths == Set(3600L * 1000000L))
  }

  test("watermark finalizes quiet windows; a late straggler is dropped, never re-counted") {
    val src = Files.createTempDirectory("graft_rate_late").toString
    // two purchases in one window-slide neighborhood, then an event 3
    // days ahead: the watermark (max ts - 1h) passes every window
    // containing them -> all four overlapping windows finalize
    writeEvents(src)(("purchase", "2024-03-01 10:00:00", 1.0),
      ("purchase", "2024-03-01 10:10:00", 2.0),
      ("view", "2024-03-04 10:00:00", 0.0))
    val q = RateStream.start(spark, src, "rate_late")
    try {
      q.processAllAvailable()
      // straggler inside the finalized span: below the watermark,
      // dropped — no finalized window may re-emit or grow
      writeEvents(src)(("purchase", "2024-03-01 10:05:00", 4.0))
      q.processAllAvailable()
      flush(src, q)
    } finally q.stop()
    val purchase = spark.sql(
        "SELECT window_start, n_events, cents FROM rate_late WHERE event_type = 'purchase'")
      .collect()
      .map(r => (r.getTimestamp(0).toInstant.toString, r.getLong(1), r.getLong(2))).toSet
    // 10:00 lands in starts 09:15..10:00; 10:10 in 09:15..10:00 too
    // (same four windows: 09:15, 09:30, 09:45, 10:00) — both events in
    // all four, 100 + 200 cents each, and the dropped straggler's 400
    // cents appear nowhere
    assert(purchase == Set(
      ("2024-03-01T09:15:00Z", 2L, 300L),
      ("2024-03-01T09:30:00Z", 2L, 300L),
      ("2024-03-01T09:45:00Z", 2L, 300L),
      ("2024-03-01T10:00:00Z", 2L, 300L)))
  }
}
