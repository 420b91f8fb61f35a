package graft

import java.nio.file.Files
import java.time.LocalDate

import graft.streaming.{Alerts, AnomalyStream, ForecastAnomalyStream,
  RateStream, SessionStream}

/** The seasonality-aware alert contract: on a weekly-cycled series
  * (every Friday 3× baseline) the plain causal z pages on every
  * Friday, while the Holt-Winters-residual scorer stays silent on the
  * cycle — and still pages on a GENUINE anomaly (a Tuesday at Friday
  * volume). Both run end-to-end through their streaming faces and the
  * pluggable alert sink. */
class ForecastAnomalySpec extends SparkSpec {

  // 9 weeks from Monday 2024-01-01: baseline 1000 + (i%3)·25 cents
  // (dyadic quarters, so value·100 round-trips exactly through the
  // double), Fridays 3000 + jitter, and one genuine anomaly — the
  // Tuesday 2024-02-27 at Friday volume
  private val AnomalyDay = "2024-02-27"
  private def fixtureRows: Seq[(String, String, Double)] =
    (0 until 63).map { i =>
      val d = LocalDate.of(2024, 1, 1).plusDays(i.toLong)
      val cents =
        if (d.toString == AnomalyDay) 3000
        else if (d.getDayOfWeek == java.time.DayOfWeek.FRIDAY)
          3000 + (i % 3) * 25
        else 1000 + (i % 3) * 25
      ("purchase", s"$d 12:00:00", cents / 100.0)
    } :+ (("purchase", "2024-03-20 12:00:00", 10.0)) // watermark pusher

  private def writeEvents(src: String): Unit = {
    import org.apache.spark.sql.{Row, SaveMode}
    spark.createDataFrame(
      java.util.Arrays.asList(fixtureRows.map { case (et, t, v) =>
        Row(et, java.sql.Timestamp.valueOf(t), v) }: _*),
      RateStream.schema)
      .coalesce(1).write.mode(SaveMode.Append)
      .option("timestampFormat", SessionStream.TsFormat).json(src)
  }

  test("weekly cycle: plain z pages every Friday, HW residual pages the true anomaly only") {
    val src = Files.createTempDirectory("graft_fa_src").toString
    writeEvents(src)

    // plain causal z: the cycle reads as a weekly page storm
    val plainBuf = new Alerts.Buffer
    val q1 = AnomalyStream.start(spark, src,
      Files.createTempDirectory("graft_fa_h1").toString + "/history",
      Files.createTempDirectory("graft_fa_c1").toString, plainBuf)
    try q1.awaitTermination() finally q1.stop()
    val plain = plainBuf.drain()
    val plainDays = plain.map(_.message.split(" ")(1))
    val fridays = plainDays.count(d =>
      LocalDate.parse(d).getDayOfWeek == java.time.DayOfWeek.FRIDAY)
    assert(fridays >= 8, s"expected the Friday page storm, got $plainDays")

    // HW residual: the cycle is absorbed by the seasonal slots; only
    // the Tuesday at Friday volume pages
    val hwBuf = new Alerts.Buffer
    val hist = Files.createTempDirectory("graft_fa_h2").toString + "/history"
    val q2 = ForecastAnomalyStream.start(spark, src, hist,
      Files.createTempDirectory("graft_fa_c2").toString, hwBuf)
    try q2.awaitTermination() finally q2.stop()
    val hw = hwBuf.drain()
    assert(hw.map(_.kind) == Seq("forecast_anomaly"), s"got $hw")
    assert(hw.head.source == "purchase")
    assert(hw.head.message.contains(AnomalyDay), hw.head.message)
    // history landed exactly once per finalized (type, day)
    assert(ForecastAnomalyStream.currentHistory(spark, hist).count() == 63)

    // from-scratch reprocess on the committed history: the (type, day)
    // anti-join makes every day a no-op — no dup rows, no re-alert
    val q3 = ForecastAnomalyStream.start(spark, src, hist,
      Files.createTempDirectory("graft_fa_c3").toString, hwBuf)
    try q3.awaitTermination() finally q3.stop()
    assert(hwBuf.drain().isEmpty)
    assert(ForecastAnomalyStream.currentHistory(spark, hist).count() == 63)
  }

  test("CDC cent mass: plain z pages the revenue cycle, the HW value face pages the true break only") {
    import graft.streaming.ChangeEvents
    val src = Files.createTempDirectory("graft_fav_src").toString
    var off = 0L
    def ev(ts: String, v: Double): org.apache.spark.sql.Row = {
      off += 1
      org.apache.spark.sql.Row("insert", off, org.apache.spark.sql.Row(v, off),
        "graft", "events", java.sql.Timestamp.valueOf(ts), off)
    }
    // one op per day (flat count series) with the weekly revenue
    // cycle riding the after-image value — q90/q155's failure mode
    // transplanted onto the change stream
    val rows = (0 until 63).map { i =>
      val d = LocalDate.of(2024, 1, 1).plusDays(i.toLong)
      val v =
        if (d.toString == AnomalyDay) 30.0
        else if (d.getDayOfWeek == java.time.DayOfWeek.FRIDAY)
          30.0 + (i % 3) * 0.25
        else 10.0 + (i % 3) * 0.25
      ev(s"$d 10:00:00", v)
    } :+ ev("2024-03-20 10:00:00", 10.0)
    spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), ChangeEvents.schema)
      .coalesce(1).write.mode("append").json(src)

    // plain causal z on the cent mass: the cycle is a page storm
    val plainBuf = new Alerts.Buffer
    val q1 = AnomalyStream.startChangeValues(spark, src,
      Files.createTempDirectory("graft_fav_h1").toString + "/history",
      Files.createTempDirectory("graft_fav_c1").toString, plainBuf)
    try q1.awaitTermination() finally q1.stop()
    val plainDays = plainBuf.drain().map(_.message.split(" ")(1))
    assert(plainDays.count(d =>
      LocalDate.parse(d).getDayOfWeek == java.time.DayOfWeek.FRIDAY) >= 8,
      s"expected the Friday revenue page storm, got $plainDays")

    // HW residual on the same series: only the true break pages,
    // under its own alert kind
    val hwBuf = new Alerts.Buffer
    val q2 = ForecastAnomalyStream.startChangeValues(spark, src,
      Files.createTempDirectory("graft_fav_h2").toString + "/history",
      Files.createTempDirectory("graft_fav_c2").toString, hwBuf)
    try q2.awaitTermination() finally q2.stop()
    val hw = hwBuf.drain()
    assert(hw.map(_.kind) == Seq("value_forecast_anomaly"), s"got $hw")
    assert(hw.head.message.contains(AnomalyDay), hw.head.message)
  }
}
