package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{DataQuality, EventFlow, TextOps}

/** The round-9 audit/eval additions: n-gram duplication coverage and
  * decontamination (q205/q210), l-diversity (q206), activity gaps
  * (q207), and the label-agreement metrics kappa/AUC (q208/q209). */
class AuditMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft_audit_docs").toString
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("dupNgramCoverage counts cross-doc duplicated 5-gram positions") {
    // docs 1 and 2 share the exact run "p q r s t"; doc 3 is unique;
    // doc 4 is under 5 tokens and must contribute no rows at all
    val dir = writeDocs(Seq(
      (1L, "a b c p q r s t d e"),   // 6 grams, 1 dup position
      (2L, "x p q r s t y z w v"),   // 6 grams, 1 dup position
      (3L, "k l m n o kk ll mm"),    // 4 grams, 0 dup
      (4L, "tiny doc here")))        // too short: absent
    val got = TextOps.dupNgramCoverage(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      1L -> ((6L, 1L, 166666L)),
      2L -> ((6L, 1L, 166666L)),
      3L -> ((4L, 0L, 0L))))
  }

  test("dupNgramCoverage counts REPEATED in-doc positions per occurrence") {
    // the shared gram occurs twice in doc 1: both positions are
    // covered once the gram is cross-doc duplicated
    val dir = writeDocs(Seq(
      (1L, "p q r s t p q r s t"),   // grams at pos 1 and 6 both = "p q r s t"
      (2L, "z p q r s t z z y x")))
    val got = TextOps.dupNgramCoverage(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(1L) == 2L)
  }

  test("dupNgramCoverage joins pre-aggregated (doc, gram) counts, not raw positions") {
    val opt = TextOps.dupNgramCoverage(spark, sf)
      .queryExecution.optimizedPlan.toString
    // the join-back's left side folds positions to occurrence counts
    assert(opt.linesIterator.exists(l =>
      l.contains("Aggregate [doc_id") && l.contains(", h#")), opt)
  }

  test("ngramDecontaminate flags eval docs sharing any 5-gram with train") {
    // doc 0 (eval: 0 % 97 = 0) shares "p q r s t" with train doc 1;
    // doc 97 (eval) is disjoint from every train doc
    val dir = writeDocs(Seq(
      (0L, "a b p q r s t c d e"),
      (97L, "q1 q2 q3 q4 q5 q6 q7"),
      (1L, "x y p q r s t z w v"),
      (2L, "k l m n o kk ll mm nn")))
    val got = TextOps.ngramDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      0L -> ((6L, 1L, true)),
      97L -> ((3L, 0L, false))))
  }

  test("ngramDecontaminate broadcasts the eval gram set") {
    val dir = writeDocs(Seq(
      (0L, "a b c d e f"), (1L, "a b c d e g"), (2L, "h i j k l m")))
    val plan = TextOps.ngramDecontaminate(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval-gram semi filter should broadcast:\n$plan")
  }

  test("lDiversityProfile histograms distinct-sensitive counts per QI group") {
    // group (g1): sensitive {x, y}   → l = 2
    // group (g2): sensitive {x}      → l = 1 (homogeneous: at risk at any l ≥ 2)
    // group (g3): sensitive {x, y, z}→ l = 3
    val df = Seq(
      ("g1", "x"), ("g1", "y"), ("g1", "x"),
      ("g2", "x"), ("g2", "x"),
      ("g3", "x"), ("g3", "y"), ("g3", "z"))
      .toDF("qi", "sens")
    val got = DataQuality.lDiversityProfile(df, Seq("qi"), "sens", l = 2)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    assert(got == Map(
      1L -> ((1L, 2L, true, 250000L)),
      2L -> ((1L, 3L, false, 375000L)),
      3L -> ((1L, 3L, false, 375000L))))
  }

  test("activityGaps islands per-user presence and histograms longest gaps") {
    val dir = Files.createTempDirectory("graft_audit_events").toString
    def ev(id: Long, user: Long, day: Int) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), user,
        "view", 1.0, "{}")
    // user 1: days 1,2,5     → one gap of 2
    // user 2: days 3,4,5     → continuously active: longest 0
    // user 3: days 1,4,6     → gaps 2 and 1: longest 2, 2 runs, 3 days
    // user 1 has a second event on day 1 (dedup must collapse it)
    Seq(ev(1, 1, 1), ev(2, 1, 1), ev(3, 1, 2), ev(4, 1, 5),
      ev(5, 2, 3), ev(6, 2, 4), ev(7, 2, 5),
      ev(8, 3, 1), ev(9, 3, 4), ev(10, 3, 6))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = EventFlow.activityGaps(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == Map(
      0L -> ((1L, 0L, 0L)),           // user 2
      2L -> ((2L, 3L, 5L))))          // users 1 and 3: 1+2 runs, 2+3 days
  }

  test("agreementKappa replays the integer formula over the published labels") {
    // labels from the two independently-oracled paths: q71's gate and
    // q21's quality — the kappa must equal the driver-side integer fold
    val keep = TextOps.qualityClassifier(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val pos = TextOps.qualityScores(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3) >= 0.66)).toMap
    val n = keep.size.toLong
    val n11 = keep.count { case (d, a) => a && pos(d) }.toLong
    val n10 = keep.count { case (d, a) => a && !pos(d) }.toLong
    val n01 = keep.count { case (d, a) => !a && pos(d) }.toLong
    val n00 = keep.count { case (d, a) => !a && !pos(d) }.toLong
    // Spark `div` truncates toward zero (like Java /), not floor
    def fdiv(a: Long, b: Long) = a / b
    val po = fdiv((n11 + n00) * 1000000L, n)
    val pe = fdiv(
      fdiv((n11 + n10) * 1000000L, n) * fdiv((n11 + n01) * 1000000L, n) +
        fdiv((n01 + n00) * 1000000L, n) * fdiv((n10 + n00) * 1000000L, n),
      1000000L)
    val kappa = fdiv((po - pe) * 1000000L, 1000000L - pe)
    val row = TextOps.agreementKappa(spark, sf).head()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4)) == ((n, n11, n10, n01, n00)))
    assert(row.getLong(5) == po && row.getLong(6) == pe)
    assert(row.getLong(7) == kappa)
    // agreement beats chance on this corpus (the two labels share terms)
    assert(kappa > 0L)
  }

  test("revenueTrendOls recovers an exactly linear series with r2 = 1") {
    val dir = Files.createTempDirectory("graft_audit_ols").toString
    // nation 0: revenue = 100.00 + 25.00 * monthIndex (exactly linear)
    // nation 1: constant revenue (zero variance → NULL slope and r2)
    val orders = (1 to 12).flatMap { mth =>
      Seq((mth.toLong, 1L, f"2020-$mth%02d-15", 100.0 + 25.0 * (240 + mth)),
        (100L + mth, 2L, f"2020-$mth%02d-20", 77.0))
    }
    orders.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
      .withColumn("o_orderstatus", lit("O"))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 0L), (2L, 1L)).toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((0L, "LINEAR"), (1L, "FLAT")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val got = graft.operators.Relational.revenueTrendOls(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(got("LINEAR")._1 == 12L)
    assert(got("LINEAR")._2.contains(2500.0))   // cents per month
    assert(got("LINEAR")._3.contains(1000000L)) // perfect fit
    assert(got("FLAT")._2.contains(0.0) && got("FLAT")._3.isEmpty)
  }

  test("classifierCalibration bins conserve mass and replay the micro rates") {
    val rows = TextOps.classifierCalibration(spark, sf).collect()
    val total = rows.map(_.getLong(1)).sum
    val corpus = Tables(spark, sf, "documents").count()
    assert(total == corpus)
    rows.foreach { r =>
      val (bin, n, np, conf, acc, gap) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(bin >= 0L && bin <= 9L)
      assert(conf >= 0L && conf <= 1000000L && acc >= 0L && acc <= 1000000L)
      assert(acc == np * 1000000L / n)
      assert(gap == math.abs(conf - acc))
      // a bin's mean confidence must sit inside the bin's own range
      // (bin 9 also absorbs the tick-10000 edge)
      assert(conf >= bin * 100000L && conf < (bin + 1) * 100000L + 1L)
    }
  }

  test("qualityKsDrift equals the brute-force CDF sweep") {
    val scored = TextOps.qualityScores(spark, sf).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(3) * 10000))
    val srcOf = Tables(spark, sf, "documents").select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ticksAll = scored.map(_._2).distinct.sorted
    val bySrc = scored.groupBy { case (d, _) => srcOf(d) }
      .map { case (s, xs) => s -> xs.map(_._2) }
    val n = scored.length.toLong
    val expect = bySrc.map { case (s, mine) =>
      val ns = mine.length.toLong
      val d = ticksAll.map { t =>
        val cs = mine.count(_ <= t).toLong
        val cr = scored.count(_._2 <= t).toLong - cs
        math.abs(cs * 1000000L / ns - cr * 1000000L / (n - ns))
      }.max
      s -> ((ns, n - ns, d))
    }
    val got = TextOps.qualityKsDrift(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expect)
  }

  test("revenueAcf pins a strictly weekly series: lag-7 correlation is 1") {
    val dir = Files.createTempDirectory("graft_audit_acf").toString
    // 35 consecutive days of revenue that is an exact function of the
    // weekday — every lag-7 pair is identical (acf = 1e6), lag 1..6 not
    val orders = (0 until 35).map { d =>
      val day = java.time.LocalDate.of(2024, 3, 1).plusDays(d)
      (d.toLong, 1L, java.sql.Date.valueOf(day),
        100.0 + 50.0 * (d % 7))
    }
    orders.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = graft.operators.Relational.revenueAcf(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(7L) == ((28L, 1000000L)))
    (1 to 6).foreach(k => assert(got(k.toLong)._2 < 1000000L, s"lag $k"))
    // n_pairs shrinks by one per extra lag day
    (1 to 7).foreach(k => assert(got(k.toLong)._1 == (35 - k).toLong))
  }

  test("cusumChangepoints finds a clean level shift at its true day") {
    val dir = Files.createTempDirectory("graft_audit_cusum").toString
    // 'view': 2/day for days 1..10, then 8/day for days 11..20 — the
    // CUSUM peak must land on day 10 with exact before/after means;
    // 'click': flat 3/day — zero peak mass, peak at the earliest day
    def evs(tpe: String, day: Int, n: Int): Seq[(Long, java.sql.Timestamp, Long, String, Double, String)] =
      (1 to n).map(i => ((day * 100 + i).toLong,
        java.sql.Timestamp.valueOf(f"2024-02-$day%02d 0$i:00:00"),
        1L, tpe, 1.0, "{}"))
    val rows = (1 to 10).flatMap(d => evs("view", d, 2)) ++
      (11 to 20).flatMap(d => evs("view", d, 8)) ++
      (1 to 20).flatMap(d => evs("click", d, 3))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventFlow.cusumChangepoints(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDate(2).toString,
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long]),
        Option(r.get(5)).map(_.asInstanceOf[Long])))).toMap
    // view: T=20, total=100; peak day 10: cum=20, s_abs=|20·20−10·100|=600
    // cusum = 600e6/(20·100) = 300000; before 20·1000/10=2000; after 8000
    assert(got("view") ==
      ((20L, "2024-02-10", Some(300000L), Some(2000L), Some(8000L))))
    // click: flat — zero mass everywhere, earliest day wins the tie
    assert(got("click")._3.contains(0L) && got("click")._2 == "2024-02-01")
    // types with no events at all report NULL mass, not crashes
    assert(got.contains("signup") && got("signup")._3.isEmpty)
  }

  test("customerRevenuePercentiles: deterministic ranks, exact endpoints") {
    val rows = graft.operators.Relational.customerRevenuePercentiles(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    // global percentiles span exactly [0, 1e6] and are unique per rank
    assert(rows.flatMap(_._5).min == 0L && rows.flatMap(_._5).max == 1000000L)
    // the globally richest customer is also p100 in their own nation
    val top = rows.maxBy(r => (r._3, -r._2))
    assert(top._4.contains(1000000L) || rows.count(_._1 == top._1) == 1)
    // within every multi-customer nation: endpoints 0 and 1e6, and the
    // percentile order matches the (revenue, key) order exactly
    rows.groupBy(_._1).filter(_._2.length > 1).foreach { case (_, rs) =>
      val ps = rs.flatMap(_._4)
      assert(ps.min == 0L && ps.max == 1000000L)
      val byRank = rs.sortBy(r => (r._3, r._2)).flatMap(_._4)
      assert(byRank.sorted.sameElements(byRank))
    }
  }

  test("churnHazardCurve: censoring at the horizon, exact Nelson-Aalen folds") {
    val dir = Files.createTempDirectory("graft_audit_hazard").toString
    def ev(id: Long, user: Long, day: Int) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), user,
        "view", 1.0, "{}")
    // corpus ends day 20; churn bar = last_day <= day 13
    // A: days 1-3   → lifetime 3,  churned
    // B: days 1-10  → lifetime 10, churned
    // C: day 15     → lifetime 1,  censored (still recent)
    // D: days 11-20 → lifetime 10, censored (active at the end)
    val rows = Seq(ev(1, 1, 1), ev(2, 1, 2), ev(3, 1, 3),
      ev(4, 2, 1), ev(5, 2, 10),
      ev(6, 3, 15),
      ev(7, 4, 11), ev(8, 4, 20))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventFlow.churnHazardCurve(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == Map(
      1L -> ((4L, 0L, 1L, 0L, 0L)),
      3L -> ((3L, 1L, 0L, 333333L, 333333L)),
      10L -> ((2L, 1L, 1L, 500000L, 833333L))))
  }

  test("distinctNgramProfile separates looped text from diverse text") {
    val dir2 = Files.createTempDirectory("graft_audit_distinctn").toString
    Seq((1L, "a a a a a a a a a a", "looped"),
      (2L, "b1 b2 b3 b4 b5 b6 b7 b8", "diverse"))
      .toDF("doc_id", "text", "source")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    val got = graft.operators.TextOps.distinctNgramProfile(spark, dir2).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("looped", 1L)) == ((10L, 1L, 100000L)))
    assert(got(("looped", 2L)) == ((9L, 1L, 111111L)))
    assert(got(("looped", 4L)) == ((7L, 1L, 142857L)))
    (1 to 4).foreach { n =>
      val (pos, dis, micro) = got(("diverse", n.toLong))
      assert(pos == (8 - n + 1).toLong && dis == pos && micro == 1000000L)
    }
  }

  test("benfordDigits: literal expectations sum to exactly 1e6; missing digits zero-fill") {
    import graft.operators.DataQuality
    assert(DataQuality.BenfordMicro.map(_._2).sum == 1000000L)
    val dir = Files.createTempDirectory("graft_audit_benford").toString
    // totals with first digits 1 (×3) and 2 (×1) only — digits 3..9
    // must still report, carrying the full expectation as deviation
    Seq((1L, 1L, "1995-01-01", 150.0), (2L, 1L, "1995-01-02", 12.5),
      (3L, 1L, "1995-01-03", 1999.0), (4L, 1L, "1995-01-04", 25.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = DataQuality.benfordDigits(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(4)))).toMap
    assert(got.keySet == (1L to 9L).toSet)
    assert(got(1L) == ((3L, 750000L, 750000L - 301030L)))
    assert(got(2L) == ((1L, 250000L, 250000L - 176091L)))
    (3L to 9L).foreach { d =>
      val (n, obs, dev) = got(d)
      assert(n == 0L && obs == 0L &&
        dev == DataQuality.BenfordMicro.find(_._1 == d).get._2)
    }
  }

  test("holdoutPerplexity scores the holdout against the train-only LM with an OOV floor") {
    // train: "a a b" + "b c"  → T=5, V=3; add-one probs over T+V=8:
    // a,b → 3/8; c → 2/8; OOV → 1/8. eval doc 0: "a z" (z unseen)
    val dir = writeDocs(Seq(
      (0L, "a z"), (1L, "a a b"), (2L, "b c")))
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def r(x: Double, s: Int) = java.math.BigDecimal.valueOf(x)
      .setScale(s, java.math.RoundingMode.HALF_UP).doubleValue()
    val avg = r((r6(math.log(3.0 / 8)) + r6(math.log(1.0 / 8))) / 2, 4)
    val row = TextOps.holdoutPerplexity(spark, dir).collect()
    assert(row.length == 1)
    val got = row.head
    assert(got.getLong(0) == 0L && got.getLong(1) == 2L && got.getLong(2) == 1L)
    assert(got.getDouble(3) == avg)
    assert(got.getDouble(4) == r(math.exp(-avg), 2))
    // perplexity is bounded below by the best single-token prob's inverse
    assert(got.getDouble(4) > 8.0 / 3)
  }

  test("embeddingAudit: zero-norm census and exact rank percentiles") {
    val dir = Files.createTempDirectory("graft_audit_emb").toString
    // norms 0, 1, 2 in one label: ticks 0 / 1e6 / 2e6; rank positions
    // ceil(p·3/100) = 1, 2, 3 → p10/p50/p90 hit each value exactly
    Seq(
      (1L, Array(0f, 0f, 0f, 0f), 0),
      (2L, Array(1f, 0f, 0f, 0f), 0),
      (3L, Array(0f, 2f, 0f, 0f), 0),
      (4L, Array(0f, 0f, 1f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.Similarity.embeddingAudit(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8))))
      .toMap
    assert(got(0L) == ((3L, 1L, 1000000L, 0L, 2000000L,
      0L, 1000000L, 2000000L)))
    assert(got(1L) == ((1L, 0L, 1000000L, 1000000L, 1000000L,
      1000000L, 1000000L, 1000000L)))
  }

  test("langConflicts surfaces only fingerprint groups spanning languages") {
    val dir = Files.createTempDirectory("graft_audit_langs").toString
    val shared = (1 to 12).map(i => s"w$i").mkString(" ")
    val other = (21 to 32).map(i => s"v$i").mkString(" ")
    Seq(
      (1L, shared, "en"), (2L, shared, "fr"),          // cross-lang dup
      (3L, other, "de"), (4L, other, "de"),            // same-lang dup: hidden
      (5L, "u1 u2 u3 u4 u5 u6 u7 u8 u9", "es"))        // unique: hidden
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.langConflicts(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == Seq((2L, 2L, "en,fr")))
  }

  test("orderAmountReconciliation buckets drift by log-decade, incl. boundary and orphans") {
    val dir = Files.createTempDirectory("graft_audit_recon").toString
    Seq((1L, 1L, "1995-01-01", 100.0),   // exact match        → bucket 0
      (2L, 1L, "1995-01-02", 100.0),     // 0.5% drift          → bucket 1
      (3L, 1L, "1995-01-03", 100.0),     // exactly 0.1% = 1000u → bucket 1 (not < 1000)
      (4L, 1L, "1995-01-04", 100.0),     // 50% drift           → bucket 3
      (5L, 1L, "1995-01-05", 100.0))     // no lines            → bucket -1
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .withColumn("o_orderdate", to_date(col("o_orderdate")))
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    def line(ok: Long, ln: Int, price: Double) =
      (ok, 1L, 1L, ln, 1.0, price, 0.0, 0.0, "N", "O",
        java.sql.Timestamp.valueOf("1995-02-01 00:00:00"))
    Seq(line(1, 1, 60.0), line(1, 2, 40.0),
      line(2, 1, 100.50),
      line(3, 1, 100.10),
      line(4, 1, 150.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.operators.DataQuality.orderAmountReconciliation(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(
      -1L -> ((1L, 0L)),
      0L -> ((1L, 0L)),
      1L -> ((2L, 60L)),   // 50 + 10 cents
      3L -> ((1L, 5000L))))
  }

  test("subject access export: frames equal direct filters, manifest matches, rerun idempotent") {
    import graft.operators.Subject
    // sf0.001's customer table holds 150 keys — pick in-range subjects
    val keys = Seq(50L, 100L, 150L)
    val frames = Subject.subjectFrames(spark, sf, keys)
    val wantCust = Tables(spark, sf, "customer")
      .filter(col("c_custkey").isin(keys.map(lit): _*)).count()
    val wantOrd = Tables(spark, sf, "orders")
      .filter(col("o_custkey").isin(keys.map(lit): _*)).count()
    assert(frames("customer").count() == wantCust && wantCust > 0)
    assert(frames("orders").count() == wantOrd && wantOrd > 0)
    // every exported line item belongs to one of the subject's orders
    val ordKeys = frames("orders").select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    val lineKeys = frames("lineitem").select("l_orderkey").collect()
      .map(_.getLong(0)).toSet
    assert(lineKeys.nonEmpty && lineKeys.subsetOf(ordKeys))
    val out = Files.createTempDirectory("graft_subject_out").toString
    val manifest = Subject.accessExport(spark, sf, keys, out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(manifest("customer") == wantCust && manifest("orders") == wantOrd)
    assert(manifest("lineitem") == frames("lineitem").count())
    // a retry overwrites, never doubles
    val again = Subject.accessExport(spark, sf, keys, out).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == manifest)
    assert(spark.read.parquet(s"$out/orders").count() == wantOrd)
  }

  test("qualityQqDeciles equals the brute-force per-source quantile sweep") {
    val scored = TextOps.qualityScores(spark, sf).collect()
      .map(r => r.getLong(0) -> math.round(r.getDouble(3) * 10000))
    val srcOf = Tables(spark, sf, "documents").select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val all = scored.map { case (d, t) => (srcOf(d), t) }
    def quantile(ticks: Seq[Long], pct: Int): Long = {
      val sorted = ticks.sorted
      sorted(math.ceil(pct * sorted.length / 100.0).toInt - 1)
    }
    val expect = all.groupBy(_._1).flatMap { case (s, xs) =>
      val mine = xs.map(_._2).toSeq
      val rest = all.filter(_._1 != s).map(_._2).toSeq
      (1 to 9).map(_ * 10).map { p =>
        val (qs, qr) = (quantile(mine, p) * 100, quantile(rest, p) * 100)
        (s, p.toLong) -> ((qs, qr, qs - qr))
      }
    }
    val got = TextOps.qualityQqDeciles(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == expect)
    // quantiles are monotone in the percentile within every source
    got.groupBy(_._1._1).foreach { case (_, rows) =>
      val byP = rows.toSeq.sortBy(_._1._2).map(_._2._1)
      assert(byP.sorted.sameElements(byP))
    }
  }

  test("samplingMixPlan: uniform target, min-source anchor, exact rates") {
    val counts = Tables(spark, sf, "documents")
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (nMin, nTot) = (counts.values.min, counts.values.sum)
    val got = TextOps.samplingMixPlan(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet == counts.keySet)
    got.foreach { case (s, (n, nat, tgt, rate, kept)) =>
      assert(n == counts(s))
      assert(nat == n * 1000000L / nTot)
      assert(tgt == 1000000L / counts.size)
      assert(rate == nMin * 1000000L / n && rate <= 1000000L)
      assert(kept == nMin)
    }
    // the anchor source keeps everything (rate exactly 1)
    assert(got(counts.minBy(_._2)._1)._4 == 1000000L)
  }

  test("lengthQualityHistogram conserves corpus mass across the joint cells") {
    val rows = TextOps.lengthQualityHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val corpus = Tables(spark, sf, "documents").count()
    assert(rows.map(_._3).sum == corpus)
    rows.foreach { case (ld, qd, n, share) =>
      assert(ld >= 0 && qd >= 0 && qd <= 9)
      assert(share == n * 1000000L / corpus)
    }
    // the cells replay the per-doc bucketing exactly
    val docs = TextOps.qualityScores(spark, sf).collect()
      .map(r => (r.getInt(1).toLong / 10,
        math.min(math.round(r.getDouble(3) * 10000) / 1000, 9L)))
    val expect = docs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(rows.map(r => (r._1, r._2) -> r._3).toMap == expect)
  }

  test("dailyFano: a constant series is sub-Poisson at exactly (1 - mean)-ish; replay exact") {
    val dir = Files.createTempDirectory("graft_audit_fano").toString
    def ev(id: Long, day: Int, n: Int, tpe: String) =
      (1 to n).map(i => ((day * 1000 + i + id * 100000).toLong,
        java.sql.Timestamp.valueOf(f"2024-04-$day%02d 0$i:00:00"), 1L, tpe, 1.0, "{}"))
    // 'view': constant 3/day over 4 days → variance 0 → VMR 0
    // 'click': counts 1,1,1,5 over the same span → overdispersed
    val rows = (1 to 4).flatMap(d => ev(1, d, 3, "view")) ++
      (1 to 3).flatMap(d => ev(2, d, 1, "click")) ++ ev(2, 4, 5, "click")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.operators.EventFlow.dailyFano(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long])))).toMap
    assert(got("view") == ((4L, 3000L, Some(0L))))
    // click: T=4, sx=8, sxx=28: VMR = (4·28 − 64)·1e6 / (4·8) = 1500000
    assert(got("click") == ((4L, 2000L, Some(1500000L))))
  }

  test("labelSeparation equals the brute-force pairwise means on the tick grid") {
    val vecs = Tables(spark, sf, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0).toLong,
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1000000)).toArray))
    def dot(a: Array[Long], b: Array[Long]): Double =
      a.indices.map(i => a(i).toDouble * b(i)).sum
    val byLabel = vecs.groupBy(_._1).map { case (l, xs) => l -> xs.map(_._2) }
    val expect = byLabel.map { case (l, mine) =>
      val others = vecs.filterNot(_._1 == l).map(_._2)
      val intra = (for (i <- mine.indices; j <- mine.indices if i != j)
        yield dot(mine(i), mine(j))).sum /
        (mine.length.toDouble * (mine.length - 1)) / 1000000.0
      val inter = (for (a <- mine; b <- others) yield dot(a, b)).sum /
        (mine.length.toDouble * others.length) / 1000000.0
      l -> ((mine.length.toLong, math.round(intra), math.round(inter)))
    }
    val got = graft.operators.Similarity.labelSeparation(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // brute force sums floats in a different order than the exact
    // integer identity; means land within one micro tick
    assert(got.keySet == expect.keySet)
    expect.foreach { case (l, (n, intra, inter)) =>
      val (gn, gIntra, gInter) = got(l)
      assert(gn == n)
      assert(math.abs(gIntra - intra) <= 1L, s"label $l intra")
      assert(math.abs(gInter - inter) <= 1L, s"label $l inter")
    }
  }

  test("labelSeparation pins a perfectly separated fixture") {
    val dir = Files.createTempDirectory("graft_audit_sep").toString
    // label 0: three copies of e1; label 1: two copies of e2 — intra
    // is exactly 1, inter exactly 0, gap exactly 1e6 micro
    Seq(
      (1L, Array(1f, 0f, 0f, 0f), 0), (2L, Array(1f, 0f, 0f, 0f), 0),
      (3L, Array(1f, 0f, 0f, 0f), 0),
      (4L, Array(0f, 1f, 0f, 0f), 1), (5L, Array(0f, 1f, 0f, 0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.Similarity.labelSeparation(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    assert(got(0L) == ((3L, 1000000L, 0L, 1000000L)))
    assert(got(1L) == ((2L, 1000000L, 0L, 1000000L)))
  }

  test("classifierAuc equals the brute-force pairwise count") {
    // ticks and labels exactly as the operator builds them
    val logit = TextOps.qualityClassifier(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val pos = TextOps.qualityScores(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3) >= 0.66)).toMap
    def tick(x: Double): Long =
      java.math.BigDecimal.valueOf(x * 10000)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
    val scored = logit.toSeq.map { case (d, l) => (tick(l), pos(d)) }
    val ps = scored.filter(_._2).map(_._1)
    val ns = scored.filterNot(_._2).map(_._1)
    // concordant pairs ×2 + ties, over all pos×neg pairs
    val num = (for (p <- ps; q <- ns) yield {
      if (p > q) 2L else if (p == q) 1L else 0L
    }).sum
    val expect = num * 1000000L / (2L * ps.size * ns.size)
    val row = TextOps.classifierAuc(spark, sf).head()
    assert(row.getLong(0) == ps.size.toLong && row.getLong(1) == ns.size.toLong)
    assert(row.getLong(2) == expect)
    // the logit was built to predict this label: AUC must beat a coin
    assert(row.getLong(2) > 500000L)
  }
}
