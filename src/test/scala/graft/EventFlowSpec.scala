package graft

import org.apache.spark.sql.functions._

import graft.operators.EventFlow

class EventFlowSpec extends SparkSpec {

  private lazy val events: Array[(Long, Long, java.sql.Timestamp, String)] =
    Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))

  private def key(ts: java.sql.Timestamp, id: Long) = (ts.getTime * 1000 + ts.getNanos / 1000 % 1000, id)

  test("as-of join matches a per-user sequential replay") {
    val got = EventFlow.asofViewBeforePurchase(spark, sf).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val byUser = events.filter(e => e._4 == "purchase" || e._4 == "view").groupBy(_._1)
    val expected = byUser.values.flatMap { evs =>
      val ordered = evs.sortBy(e => key(e._3, e._2))
      var lastView: Option[Long] = None
      ordered.flatMap { e =>
        if (e._4 == "view") { lastView = Some(e._2); None }
        else Some(e._2 -> lastView)
      }
    }.toMap
    assert(got == expected)
    assert(got.valuesIterator.exists(_.isEmpty), "fixture has view-less purchases")
    assert(got.valuesIterator.exists(_.nonEmpty))
  }

  test("sessionization matches a per-user gap replay") {
    val gapUs = EventFlow.DefaultGapUs
    val got = EventFlow.sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getTimestamp(3), r.getTimestamp(4)))).toMap
    val expected = events.groupBy(_._1).flatMap { case (uid, evs) =>
      val ordered = evs.sortBy(e => key(e._3, e._2))
      var seq = 0L
      var prevUs = Long.MinValue
      val bySession = ordered.map { e =>
        val us = key(e._3, e._2)._1
        if (prevUs == Long.MinValue || us - prevUs > gapUs) seq += 1
        prevUs = us
        (seq, e._3)
      }.groupBy(_._1)
      bySession.map { case (s, rows) =>
        val ts = rows.map(_._2)
        (uid, s) -> ((rows.length.toLong,
          ts.minBy(t => (t.getTime, t.getNanos)), ts.maxBy(t => (t.getTime, t.getNanos))))
      }
    }
    assert(got == expected)
    assert(got.valuesIterator.exists(_._1 > 1), "fixture has multi-event sessions")
  }

  test("conversion funnel: stage timestamps are ordered, stage matches reached depth, scala replay agrees") {
    val got = graft.operators.EventFlow.conversionFunnel(spark, sf).collect()
      .map(r => (r.getLong(0),
        Option(r.getTimestamp(1)), Option(r.getTimestamp(2)), Option(r.getTimestamp(3)),
        r.getInt(4))).toSeq
    // ordering invariant: signup <= view <= purchase when present
    got.foreach { case (u, t0, t1, t2, stage) =>
      for (a <- t0; b <- t1) assert(!b.before(a), s"user $u view before signup")
      for (a <- t1; b <- t2) assert(!b.before(a), s"user $u purchase before view")
      val depth = Seq(t0, t1, t2).takeWhile(_.isDefined).length
      assert(stage == depth, s"user $u stage")
      // a later stage requires the earlier one
      assert(!(t1.isDefined && t0.isEmpty) && !(t2.isDefined && t1.isEmpty))
    }
    // scala replay over the raw events
    val raw = Tables(spark, sf, "events")
      .select("user_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
    val want = raw.groupBy(_._1).map { case (u, evs) =>
      def tsKey(t: java.sql.Timestamp) = (t.getTime, t.getNanos)
      def minAfter(tpe: String, from: Option[java.sql.Timestamp]) =
        from.flatMap { f =>
          evs.filter(e => e._3 == tpe && !e._2.before(f)).map(_._2)
            .sortBy(tsKey).headOption
        }
      val t0 = evs.filter(_._3 == "signup").map(_._2).sortBy(tsKey).headOption
      val t1 = minAfter("view", t0)
      val t2 = minAfter("purchase", t1)
      u -> (t0, t1, t2)
    }
    assert(got.map(r => r._1 -> (r._2, r._3, r._4)).toMap == want)
    // dense fixture: every user has events of all types, so full
    // conversion dominates; partial depths are covered by the replay
    assert(got.map(_._5).contains(3) && got.nonEmpty)
  }

  test("retention cohorts: offsets nonnegative, day-0 row per cohort, user-day mass conserved") {
    val got = graft.operators.EventFlow.retentionCohorts(spark, sf).collect()
      .map(r => (r.getDate(0), r.getInt(1), r.getLong(2)))
    assert(got.forall(_._2 >= 0))
    // every cohort has its day-0 row (the first-seen day itself)
    val cohorts = got.map(_._1).distinct
    assert(cohorts.forall(c => got.exists(r => r._1 == c && r._2 == 0)))
    // total user-day mass equals distinct (user, day) pairs in the raw data
    val want = Tables(spark, sf, "events")
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct().count()
    assert(got.map(_._3).sum == want)
  }

  test("event trigrams: counts replay a per-user sequential scan, ordering deterministic") {
    val got = graft.operators.EventFlow.eventTrigrams(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.nonEmpty && got.length <= 20)
    val ns = got.map(_._4)
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, "not count-descending")
    // driver-side replay over (ts, event_id)-ordered per-user sequences
    val seqs = Tables(spark, sf, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).map(_._4).toSeq)
    val want = seqs.values.flatMap(_.sliding(3).filter(_.length == 3))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (a, b, c, n) => assert(want(Seq(a, b, c)) == n, s"($a,$b,$c)") }
  }

  test("daily anomalies: z-scores replay the integer-moment formula, mass centers on zero") {
    val got = graft.operators.EventFlow.dailyAnomalies(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    // driver-side replay from the same daily integer cents
    val daily = Tables(spark, sf, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"),
        floor(col("value") * 100).cast("long").as("c"))
      .groupBy("event_type", "day").agg(sum("c").as("x")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    val byType = daily.groupBy(_._1)
    got.foreach { case (et, day, x, zU) =>
      val xs = byType(et).map(_._3)
      val n = xs.length.toDouble
      val sx = xs.sum.toDouble
      val sxx = xs.map(v => BigDecimal(v) * BigDecimal(v)).sum.toDouble
      val z = (x.toDouble - sx / n) / math.sqrt((n * sxx - sx * sx) / (n * (n - 1.0)))
      val z6 = BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val want = BigDecimal(z6 * 1000000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(zU == want, s"($et, $day)")
      assert(daily.contains((et, day, x)))
    }
    // z-scores sum to ~0 within each type (mean-centering identity)
    got.groupBy(_._1).foreach { case (et, rs) =>
      assert(math.abs(rs.map(_._4).sum) < rs.length * 2L, s"$et z mass off-center")
    }
  }

  test("rolling rates match a per-user range-frame replay at 1h and 24h") {
    val full = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), key(r.getTimestamp(2), r.getLong(1))._1,
        r.getString(3), math.floor(r.getDouble(4) * 100).toLong))
    def replay(horizonUs: Long): Map[Long, (Long, Long)] =
      full.groupBy(_._1).values.flatMap { evs =>
        evs.filter(_._4 == "purchase").map { p =>
          // RANGE frame = pure value window on event time: every event
          // (any type) within [t - horizon, t], peers included
          val frame = evs.filter(e => e._3 >= p._3 - horizonUs && e._3 <= p._3)
          p._2 -> ((frame.length.toLong, frame.map(_._5).sum))
        }
      }.toMap
    for (hours <- Seq(1, 24)) {
      val got = graft.operators.EventFlow.rollingRates(spark, sf, windowHours = hours)
        .collect().map(r => r.getLong(1) -> ((r.getLong(3), r.getLong(4)))).toMap
      assert(got == replay(hours * 3600L * 1000000L), s"window ${hours}h")
      assert(got.nonEmpty)
      if (hours == 24)
        assert(got.valuesIterator.exists(_._1 > 1L),
          "24h frames must aggregate more than the purchase row itself")
    }
  }

  test("scd2 versions tile each user's timeline; pit join probes the version in force") {
    val dim = graft.operators.EventFlow.scd2Versions(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getTimestamp(3), Option(r.getTimestamp(4))))
    assert(dim.nonEmpty)
    dim.groupBy(_._1).foreach { case (_, vs) =>
      val ordered = vs.sortBy(_._2)
      // seqs are 1..n; intervals chain: valid_to == next valid_from; open tail
      assert(ordered.map(_._2).toSeq == (1 to vs.length))
      ordered.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0)._5.contains(w(1)._4))
      }
      assert(ordered.last._5.isEmpty)
    }
    // probe replay: value at a view = the version whose interval holds its ts
    val got = graft.operators.EventFlow.pitJoin(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3), r.getInt(4))))
    val byUser = dim.groupBy(_._1)
    val views = spark.read.parquet(s"$sf/events.parquet")
      .filter(org.apache.spark.sql.functions.col("event_type") === "view")
      .select("event_id", "user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val expected = views.flatMap { case (vid, uid, ts) =>
      byUser.getOrElse(uid, Array.empty).collect {
        case (_, seq, value, from, to)
            if !from.after(ts) && to.forall(t => ts.before(t)) =>
          vid -> ((uid, value, seq))
      }
    }.toMap
    assert(got.toMap == expected)
    // inner PIT semantics: some views predate any version and drop
    assert(got.length < views.length && got.nonEmpty)
  }

  test("conversion latency: percentiles rank the funnel's converted users exactly") {
    val rows = EventFlow.conversionLatency(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(25, 50, 75, 90))
    assert(rows.map(_._2).distinct.length == 1) // one shared n_conv
    // monotone non-decreasing by percentile, strictly positive
    assert(rows.forall(_._3 > 0))
    assert(rows.map(_._3).toSeq == rows.map(_._3).sorted.toSeq)
    // driver replay: the ranked latencies of stage-3 funnel users
    val lat = EventFlow.conversionFunnel(spark, sf).filter(col("stage") === 3)
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(3).getTime * 1000 + r.getTimestamp(3).getNanos / 1000 % 1000
          - (r.getTimestamp(1).getTime * 1000 + r.getTimestamp(1).getNanos / 1000 % 1000)))
      .sortBy(x => (x._2, x._1)).map(_._2)
    assert(rows.head._2 == lat.length.toLong)
    rows.foreach { case (pct, n, v) =>
      assert(v == lat(math.ceil(pct * n / 100.0).toInt - 1), s"pct $pct")
    }
  }

  test("co-occurrence lift replays exactly from the distinct (user, type) sets") {
    val got = EventFlow.cooccurrenceLift(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val ut = Tables(spark, sf, "events")
      .select("user_id", "event_type").distinct()
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val nUsers = ut.map(_._1).distinct.length.toLong
    val byType = ut.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val pairCounts = ut.groupBy(_._1).values.flatMap { xs =>
      val ts = xs.map(_._2).distinct.sorted
      for (i <- ts.indices; j <- (i + 1) until ts.length) yield (ts(i), ts(j))
    }.groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    assert(got.keySet == pairCounts.keySet)
    got.foreach { case ((a, b), (nAb, support, lift)) =>
      assert(a < b, s"pair ($a,$b) not ordered")
      assert(nAb == pairCounts((a, b)))
      assert(nAb <= math.min(byType(a), byType(b)))
      assert(support == nAb * 1000000L / nUsers)
      assert(lift == nAb * nUsers * 1000000L / (byType(a) * byType(b)))
    }
    graft.operators.PlanCache.release()
  }

  test("session entry stats: conserves q60's session mass, entry is each session's first event") {
    val sessions = EventFlow.sessionize(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    val got = EventFlow.sessionStatsByEntry(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.nonEmpty)
    // session mass conserved across the rollup
    assert(got.values.map(_._1).sum == sessions.length)
    // entry types replay: first event of each session by (ts, event_id)
    val gapUs = EventFlow.DefaultGapUs
    def us(ts: java.sql.Timestamp) = ts.getTime * 1000 + ts.getNanos / 1000 % 1000
    val entries = events.groupBy(_._1).values.flatMap { evs =>
      val ordered = evs.sortBy(e => (us(e._3), e._2))
      var seq = 0L
      var prev = Long.MinValue
      val out = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]() // (seq, entry, n)
      ordered.foreach { e =>
        if (prev == Long.MinValue || us(e._3) - prev > gapUs) { seq += 1; out += ((seq, e._4, 0L)) }
        val i = out.length - 1
        out(i) = (out(i)._1, out(i)._2, out(i)._3 + 1)
        prev = us(e._3)
      }
      out.map(s => (s._2, s._3))
    }.toSeq
    val wantByEntry = entries.groupBy(_._1).map { case (t, ss) =>
      t -> (ss.length.toLong,
        ss.count(_._2 == 1).toLong * 1000000L / ss.length,
        ss.map(_._2).sum * 1000000L / ss.length)
    }
    wantByEntry.foreach { case (t, (n, bounce, avgEv)) =>
      val (gn, gb, ga, _) = got(t)
      assert(gn == n && gb == bounce && ga == avgEv, s"entry $t")
    }
  }

  test("session co-occurrence replays from the session-keyed distinct type sets") {
    val gapUs = EventFlow.DefaultGapUs
    def us(ts: java.sql.Timestamp) = ts.getTime * 1000 + ts.getNanos / 1000 % 1000
    val sessionTypes = events.groupBy(_._1).values.flatMap { evs =>
      val ordered = evs.sortBy(e => (us(e._3), e._2))
      var seq = 0L
      var prev = Long.MinValue
      ordered.map { e =>
        if (prev == Long.MinValue || us(e._3) - prev > gapUs) seq += 1
        prev = us(e._3)
        (s"${e._1}-$seq", e._4)
      }
    }.toSeq.distinct
    val nSessions = sessionTypes.map(_._1).distinct.length.toLong
    val byType = sessionTypes.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val pairCounts = sessionTypes.groupBy(_._1).values.flatMap { xs =>
      val ts = xs.map(_._2).distinct.sorted
      for (i <- ts.indices; j <- (i + 1) until ts.length) yield (ts(i), ts(j))
    }.groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    val got = EventFlow.sessionCooccurrenceLift(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    graft.operators.PlanCache.release()
    assert(got.keySet == pairCounts.keySet)
    got.foreach { case ((a, b), (nAb, support, lift)) =>
      assert(nAb == pairCounts((a, b)))
      assert(support == nAb * 1000000L / nSessions)
      assert(lift == nAb * nSessions * 1000000L / (byType(a) * byType(b)))
    }
  }

  test("repurchase gaps: percentiles pick the exact rank positions of the driver replay") {
    def us(ts: java.sql.Timestamp) = ts.getTime * 1000 + ts.getNanos / 1000 % 1000
    val gaps = events.filter(_._4 == "purchase").groupBy(_._1).values.flatMap { evs =>
      val ordered = evs.sortBy(e => (us(e._3), e._2))
      ordered.zip(ordered.drop(1)).map { case (a, b) => (b._2, us(b._3) - us(a._3)) }
    }.toSeq
    val sorted = gaps.sortBy(g => (g._2, g._1)).map(_._2)
    val got = EventFlow.repurchaseGaps(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(25, 50, 75, 90))
    got.foreach { case (pct, n, gap) =>
      assert(n == gaps.length.toLong)
      val pos = math.ceil(pct * gaps.length / 100.0).toInt
      assert(gap == sorted(pos - 1), s"pct $pct")
    }
    // percentiles are monotone
    assert(got.map(_._3).toSeq == got.map(_._3).sorted.toSeq)
  }

  test("funnel summary: three-stage spine, survival monotone, rates replay the funnel") {
    val funnel = EventFlow.conversionFunnel(spark, sf).collect()
      .map(_.getInt(4))
    val got = EventFlow.funnelSummary(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1, 2, 3))
    val reached = (1 to 3).map(k => funnel.count(_ >= k).toLong)
    assert(got.map(_._2).toSeq == reached)
    // survival monotone nonincreasing; rates replay
    assert(got.head._3 == 1000000L && got.head._4 == 1000000L)
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2)
      assert(b._3 == b._2 * 1000000L / a._2)
      assert(b._4 == b._2 * 1000000L / got.head._2)
    }
  }

  test("robust anomalies: lower median/MAD replay driver-side, score truncates both signs") {
    val got = EventFlow.robustAnomalies(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got.nonEmpty)
    def lowerMedian(xs: Seq[Long]): Long = xs.sorted.apply((xs.length + 1) / 2 - 1)
    got.groupBy(_._1).foreach { case (tpe, rows) =>
      val med = lowerMedian(rows.map(_._3))
      val mad = lowerMedian(rows.map(r => math.abs(r._3 - med)))
      rows.foreach { case (_, day, cnt, gm, gmad, score) =>
        assert(gm == med && gmad == mad, s"$tpe $day")
        if (mad > 0) assert(score.contains((cnt - med) * 1000000L / mad), s"$tpe $day")
        else assert(score.isEmpty)
      }
    }
    // robustness: one wild outlier day leaves the median/MAD of the
    // REST untouched (a mean/σ score would shift for every day)
    val base = (1 to 30).map(d => (s"d$d", d.toLong % 3 + 10L))
    val withOutlier = base :+ ("dX", 100000L)
    val m1 = lowerMedian(base.map(_._2)); val m2 = lowerMedian(withOutlier.map(_._2))
    assert(m1 == m2)
    val mad1 = lowerMedian(base.map(x => math.abs(x._2 - m1)))
    val mad2 = lowerMedian(withOutlier.map(x => math.abs(x._2 - m2)))
    assert(mad1 == mad2)
  }

  test("cohort ltv: revenue mass conserved, curves monotone, cohort sizes bound activity") {
    val got = EventFlow.cohortLtv(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.nonEmpty)
    // total revenue conserved vs a direct fold
    val totalCents = Tables(spark, sf, "orders")
      .select(floor(col("o_totalprice") * 100).cast("long").as("c"))
      .agg(sum("c")).head().getLong(0)
    assert(got.map(_._5).sum == totalCents)
    got.groupBy(_._1).foreach { case (cohort, rows) =>
      val ordered = rows.sortBy(_._2)
      // offset 0 exists and its active set IS the cohort
      assert(ordered.head._2 == 0L && ordered.head._4 == ordered.head._3, s"$cohort")
      // cumulative revenue and ltv are nondecreasing; cum replays sum
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._6 >= a._6 && b._7 >= a._7, s"$cohort offset ${b._2}")
        case _ =>
      }
      assert(ordered.map(_._5).sum == ordered.last._6, s"$cohort cum")
      // activity never exceeds cohort size; ltv replays floor division
      rows.foreach { r =>
        assert(r._4 <= r._3 && r._7 == r._6 / r._3, s"$cohort offset ${r._2}")
      }
    }
  }

  test("dow-adjusted anomalies: per-(type,dow) residual mass ~0, z replays the moment fold") {
    val got = EventFlow.dowAdjustedAnomalies(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    // residuals sum to ~0 within each (type, dow) cell (rounding slack)
    got.groupBy(r => (r._1, r._2.getDayOfWeek)).foreach { case (cell, rows) =>
      assert(math.abs(rows.map(_._4).sum) <= rows.length, s"cell $cell")
    }
    // z replays from the exact residual moments
    got.groupBy(_._1).foreach { case (tpe, rows) =>
      val n = rows.length.toLong
      val sr = rows.map(_._4).sum
      val srr = rows.map(r => BigInt(r._4) * BigInt(r._4)).sum.toDouble
      rows.foreach { case (_, day, _, rmu, z) =>
        val varNum = n.toDouble * srr - sr.toDouble * sr.toDouble
        val want = math.round(BigDecimal(
          (rmu - sr.toDouble / n) / math.sqrt(varNum / (n.toDouble * (n - 1))))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble * 1000000)
        assert(z == want, s"$tpe $day")
      }
    }
  }

  test("multi-touch attribution replays the 40/20/40 fold; per-conversion credit never overshoots") {
    val horizonUs = 7L * 86400L * 1000000L
    def us(ts: java.sql.Timestamp) = ts.getTime * 1000 + ts.getNanos / 1000 % 1000
    val convs = events.filter(_._4 == "purchase")
      .map(e => (e._1, e._2, us(e._3)))
    val touches = events.filter(e => e._4 == "view" || e._4 == "click")
    val credits = convs.flatMap { case (uid, convId, convUs) =>
      val mine = touches
        .filter(t => t._1 == uid && us(t._3) < convUs && us(t._3) >= convUs - horizonUs)
        .sortBy(t => (us(t._3), t._2))
      val n = mine.length
      mine.zipWithIndex.map { case (t, i) =>
        val credit =
          if (n == 1) 1000000L
          else if (n == 2) 500000L
          else if (i == 0 || i == n - 1) 400000L
          else 200000L / (n - 2)
        (t._4, convId, credit)
      }
    }
    // per conversion: floor credits never overshoot 1e6
    credits.groupBy(_._2).foreach { case (cid, cs) =>
      assert(cs.map(_._3).sum <= 1000000L, s"conversion $cid overshoots")
    }
    val want = credits.groupBy(_._1).map { case (t, cs) =>
      t -> (cs.length.toLong, cs.map(_._2).distinct.length.toLong, cs.map(_._3).sum)
    }
    val got = EventFlow.multiTouchAttribution(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }
}
