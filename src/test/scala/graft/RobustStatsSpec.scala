package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Hand-fold replays for the round's robust-statistics pair: the
  * Theil–Sen medians walk the exact BigInt grid (BigInt `/` truncates
  * toward zero exactly like Spark's `div` and DuckDB's `//`), and the
  * CCF ladder is sanity-pinned against a driver-computed Pearson at
  * lag 0 plus the |r| ≤ 1 bound across all lags. */
class RobustStatsSpec extends SparkSpec {

  test("theil-sen: BigInt hand fold over the collected daily series") {
    val got = Relational.theilSen(spark, sf).collect()(0)
    val daily = Tables(spark, sf, "orders")
      .select(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
          .cast("long").as("t"),
        floor(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("t")).agg(sum(col("cents")).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val slopes = (for {
      i <- daily.indices
      j <- (i + 1) until daily.length
    } yield (BigInt(daily(j)._2) - daily(i)._2) * 1000000 /
        (daily(j)._1 - daily(i)._1)).sorted.toIndexedSeq
    def med(v: IndexedSeq[BigInt]): BigInt = {
      val n = v.length
      (v((n + 1) / 2 - 1) + v((n + 2) / 2 - 1)) / 2
    }
    val slope = med(slopes)
    val resid = daily.map { case (t, y) => BigInt(y) * 1000000 - slope * t }
      .sorted.toIndexedSeq
    val medR = med(resid)
    val mad = med(resid.map(r => (r - medR).abs).sorted.toIndexedSeq)
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4)) ==
      (daily.length.toLong, slopes.length.toLong, slope.toLong,
        (medR / 1000000).toLong, (mad / 1000000).toLong))
  }

  test("trimmed/winsorized segment means: hand fold over sorted cents") {
    val got = Relational.trimmedSegmentStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val rows = Tables(spark, sf, "customer")
      .select(col("c_mktsegment"),
        floor(col("c_acctbal") * 100).cast("long").as("cents"),
        col("c_custkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(_._1).map { case (seg, rs) =>
      val v = rs.sortBy(r => (r._2, r._3)).map(_._2)
      val n = v.length
      val lo = n * 5 / 100
      val kept = v.slice(lo, n - lo)
      val wsum = kept.sum + lo.toLong * kept.head + lo.toLong * kept.last
      (seg, n.toLong, v.sum / n, kept.sum / math.max(n - 2 * lo, 1),
        wsum / n)
    }.toSet
    assert(got == want)
  }

  test("kaplan-meier: BigInt product-limit hand fold with censoring") {
    val got = Relational.kaplanMeier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val orders = Tables(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDate(2).toLocalDate))
    val horizon = orders.map(_._3).max
    val spans = orders.groupBy(_._1).toSeq.flatMap { case (_, os) =>
      val sorted = os.sortBy(o => (o._3.toEpochDay, o._2)).toList
      val gaps = sorted.sliding(2).collect { case List(a, b) =>
        (b._3.toEpochDay - a._3.toEpochDay, 1L)
      }.toSeq
      gaps :+ ((horizon.toEpochDay - sorted.last._3.toEpochDay, 0L))
    }
    val counts = spans.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, ss) =>
      (t, ss.count(_._2 == 1L).toLong, ss.count(_._2 == 0L).toLong)
    }
    val total = spans.length.toLong
    var gone = 0L
    var s = BigInt(1000000)
    val want = counts.map { case (t, d, c) =>
      val n = total - gone
      gone += d + c
      s = s * (n - d) / n
      (t, n, d, c, s.toLong)
    }
    assert(got.toSeq == want)
  }

  test("seasonal strength: BigInt moment fold over the decomposition") {
    val got = Relational.seasonalStrength(spark, sf).collect()(0)
    val stl = Relational.stlDecompose(spark, sf).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    def varN(xs: Seq[Long]): BigInt = {
      val n = BigInt(xs.length)
      val s = xs.map(BigInt(_)).sum
      val q = xs.map(x => BigInt(x) * x).sum
      n * q - s * s
    }
    val r = stl.toSeq.map(x => x._3 / 100)
    val sr = stl.toSeq.map(x => (x._2 + x._3) / 100)
    val tr = stl.toSeq.map(x => (x._1 + x._3) / 100)
    def f(denom: BigInt): Long =
      (BigInt(1000000) - varN(r) * 1000000 / denom.max(1)).max(0).toLong
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      (stl.length.toLong, f(varN(sr)), f(varN(tr))))
    // the corpus carries a genuine weekly cycle: seasonality should
    // explain a visible share
    assert(got.getLong(1) > 0L)
  }

  test("ccf: lag 0 matches direct Pearson; ladder bounded and complete") {
    val rows = Relational.crossCorrelation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    assert(rows.map(_._1).toSeq == (-12L to 12L))
    assert(rows.forall(_._3.forall(r => math.abs(r) <= 1000000L)))
    val hourly = Tables(spark, sf, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(expr("unix_timestamp(ts) div 3600").as("h"),
        col("event_type"))
      .groupBy(col("h"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val n = hourly.length.toDouble
    val (sx, sy) = (hourly.map(_._1).sum.toDouble, hourly.map(_._2).sum.toDouble)
    val sxx = hourly.map(p => p._1.toDouble * p._1).sum
    val syy = hourly.map(p => p._2.toDouble * p._2).sum
    val sxy = hourly.map(p => p._1.toDouble * p._2).sum
    val r0 = (n * sxy - sx * sy) /
      math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    val got0 = rows.find(_._1 == 0L).get._3.get / 1e6
    assert(math.abs(got0 - r0) < 1e-3)
  }
}
