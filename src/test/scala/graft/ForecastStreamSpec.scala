package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.streaming.ForecastStream

/** The streaming forecaster lands on the batch Holt fold's exact
  * integers: stream the daily revenue spine through in two deliveries
  * with a checkpointed restart between, and the freshest state must
  * equal q264's (level, trend) bit for bit; replayed / stale days
  * must not double-smooth. */
class ForecastStreamSpec extends SparkSpec {

  test("streamed Holt equals the batch fold bit-for-bit across a restart") {
    val dir = Files.createTempDirectory("fc-src").toString
    val out = Files.createTempDirectory("fc-out").toString
    val ckpt = Files.createTempDirectory("fc-ckpt").toString
    val daily = Tables(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      .select(lit("revenue").as("series_key"), col("day"), col("cents"))
    val mid = daily.agg(min(col("day")), max(col("day"))).head()
    val cut = new java.sql.Date((mid.getDate(0).getTime +
      mid.getDate(1).getTime) / 2)
    // first half, run to drain, then the second half + a STALE
    // re-delivery of the first half against the same checkpoint
    daily.filter(col("day") <= lit(cut)).write.json(s"$dir/batch1")
    ForecastStream.start(spark, s"$dir/*", out, ckpt).awaitTermination()
    daily.filter(col("day") > lit(cut)).write.json(s"$dir/batch2")
    daily.filter(col("day") <= lit(cut)).write.json(s"$dir/batch3_stale")
    ForecastStream.start(spark, s"$dir/*", out, ckpt).awaitTermination()

    val got = ForecastStream.currentForecast(spark, out).collect()
    assert(got.length == 1)
    val r = got.head
    val batch = Relational.holtForecast(spark, sf).collect()
      .filter(_.getLong(0) == 1L).head // h = 1 row: level, trend, forecast
    assert(r.getLong(2) == batch.getLong(1), "n_days diverged")
    assert(r.getLong(3) == batch.getLong(2), "level diverged")
    assert(r.getLong(4) == batch.getLong(3), "trend diverged")
    assert(r.getLong(5) == batch.getLong(4), "one-step forecast diverged")
  }

  test("streamed Holt-Winters equals the batch q269 fold bit-for-bit across a restart") {
    val dir = Files.createTempDirectory("hw-src").toString
    val out = Files.createTempDirectory("hw-out").toString
    val ckpt = Files.createTempDirectory("hw-ckpt").toString
    val daily = Tables(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("day"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("day")).agg(sum(col("cents")).as("cents"))
      .select(lit("revenue").as("series_key"), col("day"), col("cents"))
    val mid = daily.agg(min(col("day")), max(col("day"))).head()
    val cut = new java.sql.Date((mid.getDate(0).getTime +
      mid.getDate(1).getTime) / 2)
    daily.filter(col("day") <= lit(cut)).write.json(s"$dir/batch1")
    ForecastStream.startHw(spark, s"$dir/*", out, ckpt).awaitTermination()
    daily.filter(col("day") > lit(cut)).write.json(s"$dir/batch2")
    daily.filter(col("day") <= lit(cut)).write.json(s"$dir/batch3_stale")
    ForecastStream.startHw(spark, s"$dir/*", out, ckpt).awaitTermination()

    val got = ForecastStream.currentHwForecast(spark, out).collect()
    assert(got.length == 1)
    val r = got.head
    // q269's h = 1 row: (h, n_days, level, trend, seasonal, forecast) —
    // the stream's next-day forecast is exactly that ladder rung
    val batch = Relational.holtWintersForecast(spark, sf).collect()
      .filter(_.getLong(0) == 1L).head
    assert(r.getLong(2) == batch.getLong(1), "n_days diverged")
    assert(r.getLong(3) == batch.getLong(2), "level diverged")
    assert(r.getLong(4) == batch.getLong(3), "trend diverged")
    assert(r.getLong(5) == batch.getLong(4), "next-day seasonal diverged")
    assert(r.getLong(6) == batch.getLong(5), "one-step forecast diverged")
  }

  test("batch-mode HW fold: founding day, seasonal slots, truncation") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    // 2024-01-01 is a Monday; days since 1995-01-02 (also a Monday)
    // ≡ 0 mod 7, so the three days land in slots 0, 1, 2
    val rows = Seq(
      ("a", d("2024-01-01"), 100L), ("a", d("2024-01-02"), 120L),
      ("a", d("2024-01-03"), 80L))
      .toDF("series_key", "day", "cents")
    val got = ForecastStream.hwForecastStream(rows).collect()
      .sortBy(_.n_days)
    // hand fold (s starts 0⁷, so lv/tr walk like plain Holt until a
    // slot repeats): day1 lv=100,tr=0,s=0⁷; day2 w=1:
    // lv=(120-0+300)/4=105, tr=(5+0)/4=1, s1=(120-105+0)/4=3;
    // day3 w=2: lv=(80-0+318)/4=99, tr=(99-105+3)/4=0,
    // s2=(80-99+0)/4=(-19)/4=-4 (trunc toward 0)
    assert(got.map(f => (f.n_days, f.level_cents, f.trend_cents)).toSeq ==
      Seq((1L, 100L, 0L), (2L, 105L, 1L), (3L, 99L, 0L)))
    // next day after day3 is slot 3 (still 0): forecast = lv + tr
    assert(got.last.seasonal_next_cents == 0L)
    assert(got.last.next_cents == 99L)
    // day2's next-day seasonal reads the slot day3 will land in —
    // still founding-zero at that point
    assert(got(1).seasonal_next_cents == 0L)
  }

  test("batch-mode fold: founding day and the truncating recursion") {
    import spark.implicits._
    def d(s: String) = java.sql.Date.valueOf(s)
    // day-grain contract: one row per (series, day) per delivery; the
    // cross-delivery stale-redelivery skip is the streaming test's job
    val rows = Seq(
      ("a", d("2024-01-01"), 100L), ("a", d("2024-01-02"), 120L),
      ("a", d("2024-01-03"), 80L))
      .toDF("series_key", "day", "cents")
    val got = ForecastStream.forecastStream(rows).collect()
      .sortBy(_.n_days)
    // hand fold: lv=100,tr=0; day2: lv=(120+300)/4=105, tr=(5+0)/4=1;
    // day3: lv=(80+318)/4=99, tr=(99-105+3)/4=(-3)/4=0 (trunc toward 0)
    assert(got.map(f => (f.n_days, f.level_cents, f.trend_cents)).toSeq ==
      Seq((1L, 100L, 0L), (2L, 105L, 1L), (3L, 99L, 0L)))
    assert(got.last.next_cents == 99L)
  }
}
