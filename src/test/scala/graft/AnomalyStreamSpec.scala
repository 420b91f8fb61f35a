package graft

import java.nio.file.Files

import graft.streaming.{Alerts, AnomalyStream, RateStream, SessionStream}

/** Streaming daily anomalies: a spike day alerts exactly once against
  * its prior history, calm days stay silent, and neither a checkpoint
  * replay nor a from-scratch reprocess can duplicate history rows or
  * re-fire an alert. */
class AnomalyStreamSpec extends SparkSpec {

  private def writeEvents(src: String)(rows: (String, String, Double)*): Unit = {
    import org.apache.spark.sql.{Row, SaveMode}
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (et, t, v) =>
        Row(et, java.sql.Timestamp.valueOf(t), v) }: _*),
      RateStream.schema)
      .coalesce(1).write.mode(SaveMode.Append)
      .option("timestampFormat", SessionStream.TsFormat).json(src)
  }

  test("spike day alerts once vs prior history; replays and reprocesses stay silent") {
    val src = Files.createTempDirectory("graft_anom_src").toString
    val hist = Files.createTempDirectory("graft_anom_hist").toString + "/history"
    val ckpt = Files.createTempDirectory("graft_anom_ckpt").toString
    val buf = new Alerts.Buffer

    // four VARIED calm days (variance must be nonzero or sd-guard
    // suppresses everything), plus a pusher whose own day stays open
    writeEvents(src)(
      ("purchase", "2024-03-01 12:00:00", 100.0),
      ("purchase", "2024-03-02 12:00:00", 110.0),
      ("purchase", "2024-03-03 12:00:00", 90.0),
      ("purchase", "2024-03-04 12:00:00", 105.0),
      ("purchase", "2024-03-20 12:00:00", 100.0))
    val q1 = AnomalyStream.start(spark, src, hist, ckpt, buf)
    try q1.awaitTermination() finally q1.stop()
    // the first finalized cohort has no prior history: joins, no alert
    assert(spark.read.parquet(hist).count() == 4)
    assert(buf.drain().isEmpty)

    // the spike lands on an open day; a later pusher finalizes it
    // (and the old pusher's calm day 03-20)
    writeEvents(src)(
      ("purchase", "2024-03-21 12:00:00", 5000.0),
      ("purchase", "2024-03-24 12:00:00", 100.0))
    val q2 = AnomalyStream.start(spark, src, hist, ckpt, buf)
    try q2.awaitTermination() finally q2.stop()
    val fired = buf.drain()
    assert(fired.map(_.kind) == Seq("value_anomaly"))
    assert(fired.head.source == "purchase")
    assert(fired.head.message.contains("2024-03-21"), fired.head.message)
    assert(spark.read.parquet(hist).count() == 6) // +03-20 calm, +03-21 spike

    // from-scratch reprocess (fresh checkpoint, same history): the
    // (type, day) anti-join makes every day a no-op — no dup rows,
    // no re-alert
    val ckpt2 = Files.createTempDirectory("graft_anom_ckpt2").toString
    val q3 = AnomalyStream.start(spark, src, hist, ckpt2, buf)
    try q3.awaitTermination() finally q3.stop()
    assert(buf.drain().isEmpty)
    assert(spark.read.parquet(hist).count() == 6)
    assert(spark.read.parquet(hist)
      .select("day", "event_type").distinct().count() == 6)

    // from-scratch EVERYTHING (fresh checkpoint AND fresh history):
    // AvailableNow collapses all days into one batch, and the
    // incremental same-batch fold must still score day k against days
    // 1..k−1 — the spike alerts exactly as the day-at-a-time run did
    val hist2 = Files.createTempDirectory("graft_anom_hist2").toString + "/history"
    val ckpt3 = Files.createTempDirectory("graft_anom_ckpt3").toString
    val q4 = AnomalyStream.start(spark, src, hist2, ckpt3, buf)
    try q4.awaitTermination() finally q4.stop()
    val refired = buf.drain()
    assert(refired.map(_.kind) == Seq("value_anomaly"), refired)
    assert(refired.head.message.contains("2024-03-21"), refired.head.message)
  }
}
