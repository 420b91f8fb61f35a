package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("pricing summary groups by flag+status and counts all rows") {
    val rows = Relational.pricingSummary(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp")).count()
    assert(total == expected)
  }

  test("revenue by nation covers every nation with orders") {
    val df = Relational.revenueByNation(spark, sf)
    assert(df.count() > 0 && df.count() <= 25)
    assert(df.filter(col("revenue") <= 0).count() == 0)
  }

  test("top orders is sorted desc and limited") {
    val rows = Relational.topOrders(spark, sf).collect()
    assert(rows.length == 100)
    val prices = rows.map(_.getAs[Double]("o_totalprice"))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("source/target diff equals the error count per day") {
    val rows = Relational.sourceTargetDiff(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("diff") >= 0))
    val totalDiff = rows.map(_.getAs[Long]("diff")).sum
    val errors = Tables(spark, sf, "events").filter(col("event_type") === "error").count()
    assert(totalDiff == errors)
  }

  test("trend daily delta is null only on each type's first day") {
    val df = Relational.trendDaily(spark, sf)
    val nullDeltas = df.filter(col("delta").isNull).count()
    val types = Tables(spark, sf, "events").select("event_type").distinct().count()
    assert(nullDeltas == types)
  }

  test("events.ts nanos->micros conversion yields sane timestamps") {
    val r = Tables(spark, sf, "events")
      .agg(min(col("ts")).cast("string").as("lo"), max(col("ts")).cast("string").as("hi"))
      .head()
    assert(r.getAs[String]("lo").startsWith("2024-01-01"))
    assert(r.getAs[String]("hi").startsWith("2024-01-3"))
  }

  test("anti-join finds parts never shipped in 1996") {
    val df = Relational.partsNotShipped1996(spark, sf)
    assert(df.columns.toSeq == Seq("p_partkey", "p_name", "p_brand"))
    assert(df.count() > 0) // sf0.001 has 2 such parts
  }

  test("union merge only contains 1996/1997 rows over the quantity floor") {
    val df = Relational.mergedYearExport(spark, sf)
    assert(df.filter(!year(col("l_shipdate")).isin(1996, 1997)).count() == 0)
    assert(df.filter(col("l_quantity") <= 25.0).count() == 0)
  }

  test("mismatch alert fires once per offending comparison row, silent under threshold") {
    val alerts = new graft.streaming.Alerts.Buffer
    val diff = Relational.sourceTargetDiff(spark, sf)
    val offending = diff.filter(abs(col("diff")) > 5).count()
    assert(offending > 0) // the fixture drops 'error' rows target-side every day
    assert(Relational.alertOnMismatch(diff, 5, alerts, "events") == offending)
    val fired = alerts.drain()
    assert(fired.size == offending)
    assert(fired.forall(a => a.kind == "count_mismatch" && a.source == "events"
      && a.message.contains("diff=")))
    // below-threshold: nothing fires
    assert(Relational.alertOnMismatch(diff, Long.MaxValue, alerts, "events") == 0)
    assert(alerts.drain().isEmpty)
    // A7 yesterday summary plugs into the same hook
    assert(Relational.alertOnMismatch(Relational.yesterdayDiff(spark, sf), 0, alerts, "yesterday") == 1)
    assert(alerts.drain().map(_.source) == Seq("yesterday"))
  }

  test("order cube: margins add up — every rollup level conserves count and revenue") {
    val rows = Relational.orderCube(spark, sf).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2), r.getLong(3)))
    val detail = rows.filter(r => r._1.isDefined && r._2.isDefined)
    val byStatus = rows.filter(r => r._1.isDefined && r._2.isEmpty)
    val byPrio = rows.filter(r => r._1.isEmpty && r._2.isDefined)
    val grand = rows.filter(r => r._1.isEmpty && r._2.isEmpty)
    assert(detail.nonEmpty && grand.length == 1)
    assert(grand.head._3 == detail.map(_._3).sum && grand.head._4 == detail.map(_._4).sum)
    byStatus.foreach { case (s, _, n, rev) =>
      val d = detail.filter(_._1 == s)
      assert(n == d.map(_._3).sum && rev == d.map(_._4).sum, s"status $s margin")
    }
    byPrio.foreach { case (_, p, n, rev) =>
      val d = detail.filter(_._2 == p)
      assert(n == d.map(_._3).sum && rev == d.map(_._4).sum, s"priority $p margin")
    }
  }

  test("top customer revenue: integer cent-percents track the double formula within rounding") {
    val rows = Relational.topCustomerRevenue(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val revs = rows.map(_.getLong(3))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "not descending")
    // cent-percent units: cents·(100−pct) ⇒ /10000 ≈ discounted dollars
    val want = Tables(spark, sf, "lineitem")
      .filter(year(col("l_shipdate")) === 1996)
      .join(Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    rows.foreach { r =>
      val approx = want(r.getLong(0)) * 10000
      assert(math.abs(r.getLong(3) - approx) < 1e4, s"cust ${r.getLong(0)}")
    }
  }

  test("event pivot: one row per day, column mass equals raw type counts") {
    val rows = Relational.eventPivot(spark, sf).collect()
    val raw = Tables(spark, sf, "events").groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    Relational.EventTypes.zipWithIndex.foreach { case (t, i) =>
      assert(rows.map(_.getLong(i + 1)).sum == raw.getOrElse(t, 0L), t)
    }
  }

  test("table profile: one row per column, counts and normalized extremes replay") {
    val got = Relational.profileTable(spark, sf, "orders").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    val orders = Tables(spark, sf, "orders")
    assert(got.keySet == orders.schema.fieldNames.toSet)
    val n = orders.count()
    val keys = orders.select("o_orderkey").collect().map(_.getLong(0))
    assert(got("o_orderkey") ==
      ((n, 0L, keys.distinct.length.toLong, keys.min.toString, keys.max.toString)))
    val prices = orders.select("o_totalprice").collect()
      .map(r => math.floor(r.getDouble(0) * 100).toLong)
    assert(got("o_totalprice")._4 == prices.min.toString)
    assert(got("o_totalprice")._5 == prices.max.toString)
    val statuses = orders.select("o_orderstatus").collect().map(_.getString(0))
    assert(got("o_orderstatus")._3 == statuses.distinct.length.toLong)
    assert(got("o_orderstatus")._4 == statuses.min && got("o_orderstatus")._5 == statuses.max)
    // every profile row reports the same total row count
    assert(got.valuesIterator.forall(_._1 == n))
  }

  test("daily spine: contiguous calendar × type grid, observed counts kept, gaps zero") {
    val got = graft.operators.Relational.dailySpineCounts(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1)) -> r.getLong(2)).toMap
    val observed = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(to_date(col("ts")).as("day"), col("event_type")).count().collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1)) -> r.getLong(2)).toMap
    val days = observed.keysIterator.map(_._1).toSeq
    val (lo, hi) = (days.min, days.max)
    val span = java.time.temporal.ChronoUnit.DAYS.between(lo, hi) + 1
    // the grid is complete: every (day, type) cell present exactly once
    assert(got.size == span * graft.operators.Relational.EventTypes.length)
    got.foreach { case (k, n) => assert(n == observed.getOrElse(k, 0L)) }
    observed.foreach { case (k, n) => assert(got(k) == n) }
    // the testdata is calendar-dense; prove the ZERO-fill on a sparse
    // fixture with a one-day hole and a type that never occurs
    val dir = java.nio.file.Files.createTempDirectory("graft_spine").toString
    import spark.implicits._
    Seq((1L, java.sql.Timestamp.valueOf("2024-03-01 10:00:00"), "view"),
        (2L, java.sql.Timestamp.valueOf("2024-03-03 10:00:00"), "view"))
      .toDF("event_id", "ts", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val sparse = graft.operators.Relational.dailySpineCounts(spark, dir).collect()
      .map(r => (r.getDate(0).toLocalDate.toString, r.getString(1)) -> r.getLong(2)).toMap
    assert(sparse.size == 3 * graft.operators.Relational.EventTypes.length)
    assert(sparse(("2024-03-02", "view")) == 0L, "the hole day fills with zero")
    assert(sparse(("2024-03-01", "purchase")) == 0L, "an absent type fills with zero")
    assert(sparse(("2024-03-01", "view")) == 1L && sparse(("2024-03-03", "view")) == 1L)
  }

  test("revenue trend: mass conserved, delta chains, growth replays the floor division") {
    val got = graft.operators.Relational.revenueTrend(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.nonEmpty)
    // total revenue mass equals the raw lineitem sum (no month lost)
    val raw = spark.read.parquet(s"$sf/lineitem.parquet")
      .select((round(col("l_extendedprice") * 100, 0).cast("long") *
        (lit(100L) - round(col("l_discount") * 100, 0).cast("long"))).as("cp"))
      .agg(sum("cp")).head().getLong(0)
    assert(got.map(_._3).sum == raw)
    got.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._2.toEpochDay)
      ordered.headOption.foreach { h =>
        assert(h._4 == h._3 && h._5.isEmpty) // first month: delta = revenue, no growth
      }
      ordered.sliding(2).foreach { w =>
        if (w.length == 2) {
          val (prev, cur) = (w(0), w(1))
          assert(cur._4 == cur._3 - prev._3)
          assert(cur._5.contains(cur._3 * 1000000L / prev._3))
        }
      }
    }
  }

  test("drift psi: terms replay the smoothed micro-unit formula, identical versions score zero") {
    val got = graft.operators.Relational.driftPsi(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5)))
    assert(got.length == 10)
    val (totOld, totNew) = (got.map(_._2).sum, got.map(_._3).sum)
    got.foreach { case (_, nOld, nNew, pU, qU, term) =>
      assert(pU == (nOld + 1) * 1000000L / (totOld + 10))
      assert(qU == (nNew + 1) * 1000000L / (totNew + 10))
      val ln6 = BigDecimal(math.log(qU.toDouble / pU))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expect = BigDecimal((qU - pU).toDouble / 1e6 * ln6)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(term == expect)
    }
    // PSI is a divergence: the bucket terms sum nonnegative
    assert(got.map(_._6).sum >= 0.0)
  }

  test("dq report: clean data passes every rule; an injected corruption is counted exactly") {
    val clean = graft.operators.Relational.dqReport(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(clean.keySet == Set("null_custkey", "negative_price", "duplicate_orderkey",
      "bad_status", "date_out_of_window"))
    assert(clean.values.forall { case (v, p) => v == 0L && p })
    // corrupt fixture: one violation of each kind, plus one clean row
    val dir = java.nio.file.Files.createTempDirectory("graft_dq").toString
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    Seq(
      (1L, Some(10L), "O", 100.0, ts("1995-06-01 00:00:00"), "1-URGENT"),
      (2L, None: Option[Long], "O", 100.0, ts("1995-06-01 00:00:00"), "1-URGENT"),
      (3L, Some(11L), "O", -5.0, ts("1995-06-01 00:00:00"), "1-URGENT"),
      (3L, Some(12L), "O", 100.0, ts("1995-06-01 00:00:00"), "1-URGENT"),
      (4L, Some(13L), "X", 100.0, ts("1995-06-01 00:00:00"), "1-URGENT"),
      (5L, Some(14L), "O", 100.0, ts("2005-06-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$dir/orders.parquet")
    val bad = graft.operators.Relational.dqReport(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(bad("null_custkey") == ((1L, false)))
    assert(bad("negative_price") == ((1L, false)))
    assert(bad("duplicate_orderkey") == ((1L, false)))
    assert(bad("bad_status") == ((1L, false)))
    assert(bad("date_out_of_window") == ((1L, false)))
  }

  test("snapshot diff classifies every key against a driver replay of both versions") {
    val got = graft.operators.Relational.corpusSnapshotDiff(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val ids = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0))
    val expected = ids.flatMap { id =>
      val inOld = id % 11 != 3
      val inNew = id % 13 != 5
      val revised = id % 17 == 2
      (inOld, inNew) match {
        case (false, false) => None
        case (false, true)  => Some(id -> "added")
        case (true, false)  => Some(id -> "removed")
        case (true, true)   => Some(id -> (if (revised) "changed" else "unchanged"))
      }
    }.toMap
    assert(got == expected)
    assert(Set("added", "removed", "changed", "unchanged").subsetOf(got.values.toSet))
  }

  test("yoy seasonality: shares sum to 1e6 per year, growth compares same months, mass conserved") {
    val got = graft.operators.Relational.yoySeasonality(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))).toMap
    assert(got.nonEmpty)
    // revenue mass conserved vs the raw fold
    val raw = spark.read.parquet(s"$sf/orders.parquet")
      .select(floor(col("o_totalprice") * 100).cast("long").as("c"))
      .agg(sum("c")).head().getLong(0)
    assert(got.values.map(_._2).sum == raw)
    // within-year shares sum to ~1e6 (floor slack per month)
    got.keys.groupBy(_._1).foreach { case (yr, ks) =>
      val tot = ks.toSeq.map(k => got(k)._3).sum
      assert(tot <= 1000000L && tot >= 1000000L - ks.size, s"year $yr shares $tot")
    }
    // growth replays: same month, previous observed year
    got.foreach { case ((yr, mo), (_, rev, _, yoy)) =>
      val priorYears = got.keys.filter(k => k._2 == mo && k._1 < yr)
      if (priorYears.isEmpty) assert(yoy.isEmpty, s"$yr-$mo")
      else {
        val py = priorYears.maxBy(_._1)
        assert(yoy.contains(rev * 1000000L / got(py)._2), s"$yr-$mo")
      }
    }
  }

  test("repeat revenue share: rank-2+ mass replays, first orders never repeat, mass conserved") {
    val got = graft.operators.Relational.repeatRevenueShare(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.nonEmpty)
    val orders = Tables(spark, sf, "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime, r.getDouble(3)))
    // driver replay: lifetime rank per customer by (date, key)
    val ranked = orders.groupBy(_._1).values.flatMap { os =>
      os.sortBy(o => (o._3, o._2)).zipWithIndex.map { case (o, i) => (o, i + 1) }
    }
    def yearOf(millis: Long): Int =
      java.time.Instant.ofEpochMilli(millis)
        .atZone(java.time.ZoneOffset.UTC).getYear
    val want = ranked.groupBy(r => yearOf(r._1._3)).map { case (yr, rs) =>
      val cents = rs.map(r => math.floor(r._1._4 * 100).toLong)
      val rep = rs.zip(cents).filter(_._1._2 >= 2).map(_._2)
      (yr, rs.size.toLong, rs.count(_._2 >= 2).toLong, cents.sum, rep.sum,
        rep.sum * 1000000L / cents.sum)
    }.toSet
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5, r._6)).toSet == want)
    // totals conserve the raw revenue; repeat never exceeds total
    assert(got.map(_._4).sum == orders.map(o => math.floor(o._4 * 100).toLong).sum)
    got.foreach { r => assert(r._5 <= r._4 && r._3 <= r._2) }
  }

  test("frequent triples: a-priori prune, within-basket combos, and exact lift on a hand fixture") {
    import spark.implicits._
    // baskets: {1,2,3} three times, {1,2,4} once, {5,6,7} once.
    // Items 4..7 have support 1 → pruned BEFORE expansion; the only
    // surviving triple is (1,2,3) with support 3 out of N = 5 baskets
    val dir = java.nio.file.Files.createTempDirectory("graft_tri").toString
    val rows = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 3L),
      (4L, 1L), (4L, 2L), (4L, 4L),
      (5L, 5L), (5L, 6L), (5L, 7L))
    rows.toDF("l_orderkey", "l_partkey").write.parquet(s"$dir/lineitem.parquet")
    val got = Relational.frequentTriples(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    graft.operators.PlanCache.release()
    // support = 3/5 = 600000u; lift = 3·5²·10⁶ / (4·4·3) = 1562500u
    assert(got.toSeq == Seq((1L, 2L, 3L, 3L, 600000L, 1562500L)))
  }
}
