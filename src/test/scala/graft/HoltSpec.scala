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

  /** (date-sorted daily cents, weekday slot) — the shared spine. */
  private def dailySpine(): Array[(Long, Long)] = {
    val monday = java.time.LocalDate.parse("1995-01-02")
    Tables(spark, sf, "orders")
      .select(to_date(col("o_orderdate")).as("d"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("d")).agg(sum(col("cents")).as("cents"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .sortBy(_._1.toEpochDay)
      .map { case (d, c) =>
        val dow = ((java.time.temporal.ChronoUnit.DAYS.between(monday, d)
          % 7) + 7) % 7
        (dow, c)
      }
  }

  test("holt-winters: seasonal hand fold replays bit-equal") {
    val got = Relational.holtWintersForecast(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val spine = dailySpine()
    var lv = spine.head._2
    var tr = 0L
    val s = Array.fill(7)(0L)
    spine.tail.foreach { case (w, x) =>
      val nl = (x - s(w.toInt) + 3 * (lv + tr)) / 4
      val nt = (nl - lv + 3 * tr) / 4
      s(w.toInt) = (x - nl + 3 * s(w.toInt)) / 4
      lv = nl; tr = nt
    }
    val wLast = spine.last._1
    val want = (1 to 7).map { h =>
      val sw = s(((wLast + h) % 7).toInt)
      (h.toLong, spine.length.toLong, lv, tr, sw, lv + h * tr + sw)
    }
    assert(got.toSeq == want)
    assert(s.exists(_ != 0L), "a revenue series must show SOME weekday shape")
  }

  test("stl decomposition: parts recompose exactly; trend/seasonal replay") {
    val got = Relational.stlDecompose(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    graft.operators.PlanCache.release()
    // exact recomposition is the operator's contract
    got.foreach { case (_, cents, tr, se, res) =>
      assert(cents == tr + se + res)
    }
    // replay: centered 7-row window with shorter edges, floored means
    val xs = got.map(x => (x._1, x._2)).sortBy(_._1.toEpochDay)
    val monday = java.time.LocalDate.parse("1995-01-02")
    val trend = xs.indices.map { i =>
      val lo = math.max(0, i - 3); val hi = math.min(xs.length - 1, i + 3)
      val win = (lo to hi).map(j => xs(j)._2)
      win.sum / win.length // all-positive: / == div
    }
    val detr = xs.indices.map(i => xs(i)._2 - trend(i))
    val byDow = xs.indices.groupBy { i =>
      (((java.time.temporal.ChronoUnit.DAYS.between(monday, xs(i)._1)
        % 7) + 7) % 7).toInt
    }
    val seas = byDow.map { case (dw, idxs) =>
      val s = idxs.map(detr).sum
      // truncation toward zero, matching div
      dw -> (BigInt(s) / idxs.length).toLong
    }
    got.zipWithIndex.foreach { case ((d, _, tr, se, _), i) =>
      assert(tr == trend(i), s"trend diverged at $d")
      val dw = (((java.time.temporal.ChronoUnit.DAYS.between(monday, d)
        % 7) + 7) % 7).toInt
      assert(se == seas(dw), s"seasonal diverged at $d")
    }
  }

  test("holt backtest: error fold replays; skill is consistent with the maes") {
    val got = Relational.holtBacktest(spark, sf).collect()
    assert(got.length == 1)
    val r = got.head
    val xs = dailySpine().map(_._2)
    var lv = xs.head; var tr = 0L; var he = 0L; var ne = 0L; var px = xs.head
    xs.tail.foreach { x =>
      he += math.abs(x - (lv + tr)); ne += math.abs(x - px)
      val nl = (x + 3 * (lv + tr)) / 4
      tr = (nl - lv + 3 * tr) / 4; lv = nl; px = x
    }
    val n = xs.length.toLong
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (n, he / (n - 1), ne / (n - 1),
        (BigInt(ne - he) * 1000000 / math.max(ne, 1L)).toLong))
    // the smoother must beat persistence on a trending revenue series
    assert(r.getLong(3) > 0L, "holt should beat the naive baseline here")
  }

  test("acf ladder: floored-mean BigInt replay, lag-0 sanity, bounded") {
    val got = Relational.autocorrelation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val xs = dailySpine().map(_._2)
    val n = xs.length.toLong
    val m = xs.sum / n // positive sum: / == div == floor here
    val dev = xs.map(x => BigInt(x - m))
    val den = dev.map(d => d * d).sum
    val want = (1 to 14).map { lag =>
      val num = (0 until xs.length - lag)
        .map(i => dev(i) * dev(i + lag)).sum
      // BigInt / truncates toward zero — matches div and //
      (lag.toLong, n, (num * 1000000 / den).toLong)
    }
    assert(got.toSeq == want)
    got.foreach { case (_, _, acf) =>
      assert(acf.abs <= 1000000L, "|acf| is bounded by 1 by Cauchy-Schwarz")
    }
  }
}
