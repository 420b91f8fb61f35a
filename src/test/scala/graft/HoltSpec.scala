package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Hand-fold replay of the Holt recursion — Java `/` truncates toward
  * zero exactly like Spark's `div` and the oracle's `//`, so all three
  * walks must be bit-equal, including any negative-trend stretch. */
class HoltSpec extends SparkSpec {

  test("holt forecast: sequential hand fold replays bit-equal") {
    val got = Relational.holtForecast(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val daily = Tables(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("d")).agg(sum(col("cents")).as("cents"))
      .collect().map(r => (r.getDate(0), r.getLong(1)))
      .sortBy(_._1.getTime).map(_._2)
    var lv = daily.head
    var tr = 0L
    daily.tail.foreach { x =>
      val nl = (x + 3 * (lv + tr)) / 4
      tr = (nl - lv + 3 * tr) / 4
      lv = nl
    }
    val want = (0 to 7).map(h =>
      (h.toLong, daily.length.toLong, lv, tr, lv + h * tr))
    assert(got.toSeq == want)
    assert(lv > 0L, "a revenue level can't smooth to nonpositive")
  }
}
