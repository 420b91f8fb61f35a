package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Sketch behavior that the oracle replay can't judge: estimation
  * error against the HLL error bound, the Bloom filter's
  * no-false-negative guarantee, and the quantile sketch's bucket
  * error bound + histogram mergeability. */
class SketchesSpec extends SparkSpec {

  test("hll estimate lands within sketch error of the true distinct count") {
    val rows = Sketches.hllDistinctTokens(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (mHit, est, truth) = (r.getLong(1), r.getDouble(2), r.getLong(3))
      assert(mHit > 0 && mHit <= Sketches.HllRegisters)
      // standard error is 1.04/√m ≈ 6.5% at m=256; 4σ guard against
      // flakiness on small sources
      val rel = math.abs(est - truth) / truth.toDouble
      assert(rel <= 0.26, s"source ${r.getString(0)}: est $est truth $truth rel $rel")
    }
  }

  test("approx profiler tracks the exact profiler within sketch error") {
    // q136's accuracy claim, judged against q99 on the same table:
    // metadata columns identical, est_distinct within the HLL bound
    import graft.operators.Relational
    val exact = Relational.profileTable(spark, sf, "orders").collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Relational.profileTableApprox(spark, sf, "orders").collect()
    assert(approx.length == exact.size)
    approx.foreach { a =>
      val e = exact(a.getString(0))
      assert(a.getLong(1) == e.getLong(1) && a.getLong(2) == e.getLong(2),
        s"${a.getString(0)}: exact metadata drifted")
      assert(a.getString(4) == e.getString(4) && a.getString(5) == e.getString(5),
        s"${a.getString(0)}: min/max drifted")
      val (est, truth) = (a.getDouble(3), e.getLong(3).toDouble)
      val rel = math.abs(est - truth) / math.max(truth, 1.0)
      assert(rel <= 0.26, s"${a.getString(0)}: est $est truth $truth rel $rel")
    }
  }

  test("hll registers merge by max: union sketch equals sketch of union") {
    // the per-source registers of a SPLIT corpus, merged by max,
    // must equal the registers over the whole corpus — the property
    // that makes partial aggregation (and cross-executor combine) safe
    val docs = Tables(spark, sf, "documents")
    val m = Sketches.HllRegisters
    val h = graft.functions.Text.md5Hash60(concat(lit("hll-"), col("token")))
    def regs(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(graft.functions.Text.tokens(col("text"))).as("token"))
      .select(pmod(h, lit(m)).as("reg"),
        call_function("shiftright", h, lit(Sketches.HllRegisterBits)).as("rest"))
      .withColumn("rho", when(col("rest") === 0, lit(Sketches.HllRestBits + 1))
        .otherwise(lit(Sketches.HllRestBits + 1) - length(bin(col("rest")))))
      .groupBy("reg").agg(max("rho").as("mrho"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val whole = regs(docs)
    val even = regs(docs.filter(col("doc_id") % 2 === 0))
    val odd = regs(docs.filter(col("doc_id") % 2 === 1))
    val merged = (even.keySet ++ odd.keySet).map(k =>
      k -> math.max(even.getOrElse(k, 0), odd.getOrElse(k, 0))).toMap
    assert(merged == whole)
  }

  test("bloom prefilter never drops a true match and over-admits only a bounded fraction") {
    val r = Sketches.bloomPrefilterReport(spark, sf).collect().head
    val (nOrders, nPass, nTrue, nFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nTrue > 0 && nPass >= nTrue, "bloom dropped a true match")
    assert(nFp == nPass - nTrue && nFp >= 0)
    // k=3, m=4096: fp rate stays far below an unfiltered scan
    assert(nPass < nOrders, "filter admitted everything")
  }

  test("log-quantile estimates stay within the bucket bound of exact percentiles") {
    val docs = Tables(spark, sf, "documents")
    val exact = docs
      .select(col("source"), size(graft.functions.Text.tokens(col("text"))).cast("long").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).map { case (s, rs) => s -> rs.map(_._2).sorted }
    val est = Sketches.logQuantiles(spark, sf).collect()
    assert(est.length == exact.size * Sketches.QuantilePs.length,
      "expected exactly one row per (source, probe)")
    est.foreach { r =>
      val (src, p, e) = (r.getString(0), r.getInt(1), r.getLong(3))
      val ns = exact(src)
      // percentile_disc twin of the sketch's rank: ceil(p·n/100)-th value
      val truth = ns(((p.toLong * ns.length + 99) / 100).toInt - 1)
      // the answer bucket CONTAINS the true value, so the midpoint is
      // within 2x either way
      assert(e >= truth / 2 && e <= truth * 2,
        s"$src p$p: est $e truth $truth outside bucket bound")
    }
  }

  test("log histograms merge by count-sum: quantiles of merged halves equal the whole") {
    val docs = Tables(spark, sf, "documents")
    val whole = Sketches.quantilesFromHistogram(Sketches.logHistogram(docs))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    val merged = Sketches.logHistogram(docs.filter(col("doc_id") % 2 === 0))
      .unionByName(Sketches.logHistogram(docs.filter(col("doc_id") % 2 === 1)))
      .groupBy(col("source"), col("b")).agg(sum(col("c")).as("c"))
    val got = Sketches.quantilesFromHistogram(merged)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getLong(3))).toSet
    assert(got == whole)
  }

  test("daily active users: sketch tracks the exact count per day within sketch error") {
    val rows = Sketches.dailyActiveUsers(spark, sf).collect()
    assert(rows.nonEmpty)
    val exact = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(org.apache.spark.sql.functions.to_date(
        org.apache.spark.sql.functions.col("ts")).as("day"))
      .agg(org.apache.spark.sql.functions.countDistinct("user_id").as("n"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    assert(rows.length == exact.size)
    rows.foreach { r =>
      val (day, est, truth) = (r.getDate(0).toLocalDate, r.getDouble(2), r.getLong(3))
      assert(truth == exact(day))
      val rel = math.abs(est - truth) / truth.toDouble
      assert(rel <= 0.26, s"day $day: est $est truth $truth rel $rel")
    }
  }

  test("cumulative dau: both curves monotone, exact first-seen fold, day-1 equals the daily report") {
    val rows = Sketches.cumulativeActiveUsers(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1.toEpochDay)
    assert(rows.nonEmpty)
    // running-max registers ⇒ both est and truth never decrease
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3 && b._4 >= a._4, s"curve decreased at ${b._1}")
    }
    // final cumulative = total distinct users; per-day truth replays
    // the first-seen fold
    val events = spark.read.parquet(s"$sf/events.parquet")
      .select(org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")).as("day"),
        org.apache.spark.sql.functions.col("user_id"))
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1))
    assert(rows.last._4 == events.map(_._2).distinct.length)
    rows.foreach { case (day, _, est, truth) =>
      val want = events.filter(!_._1.isAfter(day)).map(_._2).distinct.length
      assert(truth == want, s"day $day")
      assert(math.abs(est - truth) / truth.toDouble <= 0.26, s"day $day est $est")
    }
    // day 1: cumulative ≡ daily (same registers, same salt)
    val daily1 = Sketches.dailyActiveUsers(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDouble(2))).minBy(_._1.toEpochDay)
    assert(rows.head._1 == daily1._1 && rows.head._3 == daily1._2)
  }

  test("vocab overlap: every source pair, estimate within sketch error of exact") {
    val rows = Sketches.vocabOverlap(spark, sf).collect()
    assert(rows.length == 190) // C(20,2) source pairs
    rows.foreach { r =>
      val (exact, est) = (r.getLong(2), r.getDouble(3))
      // inclusion–exclusion stacks three ~6.5%-σ estimates; measured
      // max |err| is 2.6 tokens on exact ≈ 30 here — 6 is 2× headroom
      assert(math.abs(est - exact) <= 6.0,
        s"${r.getString(0)}↔${r.getString(1)}: est $est exact $exact")
    }
    graft.operators.PlanCache.release()
  }

  test("persisted sketch store: found+append max-merges to the whole-corpus registers; reports replay") {
    val store = java.nio.file.Files.createTempDirectory("graft_sketchstore").toString
    val docs = Tables(spark, sf, "documents")
    // split on %40 so BOTH halves cover every source (source is
    // doc_id%20 in the synthetic data — a %2 split would separate the
    // sources entirely and leave nothing for the max-merge to merge)
    Sketches.foundSketchStore(docs.filter(col("doc_id") % 40 < 20), store)
    Sketches.appendToSketchStore(docs.filter(col("doc_id") % 40 >= 20), store)
    // append-then-max ≡ sketching the union: merged store registers
    // equal the whole-corpus registers bit for bit
    val got = Sketches.storedRegisters(spark, store).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val want = Sketches.registerRows(docs)
      .groupBy(col("source"), col("reg")).agg(max(col("rho")).as("mrho"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want && want.nonEmpty)
    // the zero-corpus-scan reports equal the batch operators' estimates
    val gotD = Sketches.distinctFromStore(spark, store).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSet
    val wantD = Sketches.hllDistinctTokens(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSet
    assert(gotD == wantD)
    val gotO = Sketches.overlapFromStore(spark, store).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val wantO = Sketches.vocabOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(3))).toSet
    graft.operators.PlanCache.release()
    assert(gotO == wantO)
    // compaction: raw row count drops to the merged set, reports unchanged
    val rawBefore = spark.read.parquet(s"$store/registers").count()
    Sketches.compactSketchStore(spark, store)
    val rawAfter = spark.read
      .parquet(graft.operators.Atomic.resolve(spark, store, "registers")).count()
    assert(rawAfter == got.size.toLong && rawAfter < rawBefore)
    val gotD2 = Sketches.distinctFromStore(spark, store).collect()
      .map(r => (r.getString(0), r.getDouble(2))).toSet
    graft.operators.PlanCache.release()
    assert(gotD2 == wantD)
  }

  test("vocab overlap union derivation equals a physically max-merged union sketch") {
    // the operator derives the union's (m_hit, Σ2^(53−rho)) from the
    // per-source sums plus the common-register join:
    //   sp_u = sp_a + sp_b − Σ_common 2^(53−min(rho_a, rho_b))
    // — that must equal the sums of the registers merged by max, the
    // identity the inclusion–exclusion leans on. Verified exactly
    // (integer equality) for every source pair.
    val regRows = Sketches.registerRows(Tables(spark, sf, "documents"))
      .groupBy(col("source"), col("reg")).agg(max(col("rho")).as("mrho"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val bySrc: Map[String, Map[Long, Int]] = regRows.groupBy(_._1)
      .map { case (s, xs) => s -> xs.map(x => x._2 -> x._3).toMap }
    def sumpow(m: Map[Long, Int]): Long =
      m.values.map(rho => 1L << (53 - rho)).sum
    val srcs = bySrc.keys.toSeq.sorted
    for (a <- srcs; b <- srcs if a < b) {
      val (ma, mb) = (bySrc(a), bySrc(b))
      val common = ma.keySet intersect mb.keySet
      val derivedMh = ma.size + mb.size - common.size
      val derivedSp = sumpow(ma) + sumpow(mb) -
        common.toSeq.map(r => 1L << (53 - math.min(ma(r), mb(r)))).sum
      val union = (ma.keySet union mb.keySet).map { r =>
        r -> math.max(ma.getOrElse(r, 0), mb.getOrElse(r, 0))
      }.toMap
      assert(derivedMh == union.size, s"$a↔$b m_hit")
      assert(derivedSp == sumpow(union), s"$a↔$b sumpow")
    }
  }
}
