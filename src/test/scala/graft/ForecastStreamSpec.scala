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
