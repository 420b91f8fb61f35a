package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventFlow, Relevance}

/** Behavioral checks the oracle replay can't express: driver-side
  * replays of scores/quantiles/transitions on small slices. */
class RelevanceSpec extends SparkSpec {

  test("tfidf: <=3 terms per doc, scores replay the ln(N/df) formula") {
    val rows = Relevance.tfIdf(spark, sf).collect()
    val perDoc = rows.groupBy(_.getLong(0))
    assert(perDoc.nonEmpty && perDoc.values.forall(_.length <= Relevance.TfIdfTopK))
    // independent replay of one doc's scores
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks")).collect()
    val nDocs = docs.length.toDouble
    val dfMap = docs.flatMap(r => r.getSeq[String](1).distinct.map(_ -> 1))
      .groupBy(_._1).view.mapValues(_.length).toMap
    val someDoc = docs.head
    val tfMap = someDoc.getSeq[String](1).groupBy(identity).view.mapValues(_.length).toMap
    val expected = tfMap.map { case (t, tf) =>
      val idf6 = BigDecimal(math.log(nDocs / dfMap(t)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      t -> BigDecimal(tf.toDouble * idf6 * 1000000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    perDoc(someDoc.getLong(0)).foreach { r =>
      assert(expected(r.getString(1)) == r.getLong(3),
        s"score mismatch for token ${r.getString(1)}")
    }
  }

  test("pmi: all pairs meet the min count; ordering is deterministic desc") {
    val rows = Relevance.pmiCollocations(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty && rows.length <= Relevance.PmiTopK)
    assert(rows.forall(_._2 >= Relevance.PmiMinCount))
    val keys = rows.map(t => (-t._3, t._1))
    assert(keys.sameElements(keys.sortBy(identity)), "not sorted by (pmi desc, bigram asc)")
  }

  test("token percentiles: 4 cut points per source, monotone, exact for one source") {
    val rows = Relevance.tokenPercentiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val bySource = rows.groupBy(_._1)
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_._2).sorted.sameElements(Relevance.Percentiles), src)
      val v = rs.sortBy(_._2).map(_._3)
      assert(v.zip(v.tail).forall { case (a, b) => a <= b }, s"$src not monotone")
    }
    // exact replay: sorted token counts, value at ceil(p*n/100)
    val (src, rs) = bySource.head
    val counts = Tables(spark, sf, "documents").filter(col("source") === src)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(_.getLong(0)).sorted
    rs.foreach { case (_, pct, got) =>
      val pos = math.ceil(pct * counts.length / 100.0).toInt
      assert(got == counts(pos - 1), s"$src p$pct")
    }
  }

  test("quality quartiles: balanced buckets, best quality in quartile 1") {
    val rows = Relevance.qualityQuartiles(spark, sf).collect()
      .map(r => (r.getString(1), r.getDouble(2), r.getInt(3)))
    assert(rows.nonEmpty && rows.forall(r => r._3 >= 1 && r._3 <= 4))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val sizes = rs.groupBy(_._3).view.mapValues(_.length).toMap
      assert(sizes.values.max - sizes.values.min <= 1, s"$src buckets unbalanced")
      // quartile boundaries are monotone in quality
      val worstQ1 = rs.filter(_._3 == 1).map(_._2).min
      val bestQ4 = rs.filter(_._3 == 4).map(_._2).max
      assert(worstQ1 >= bestQ4, s"$src quartile order inverted")
    }
  }

  test("markov transitions: totals consistent, probabilities floor-sum to <=1e6 per row source") {
    val rows = EventFlow.markovTransitions(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (prev, rs) =>
      val tot = rs.map(_._3).sum
      // floor division: per-row prob_u = n*1e6 div tot
      rs.foreach { case (_, _, n, p) => assert(p == n * 1000000L / tot, s"$prev") }
      val s = rs.map(_._4).sum
      assert(s <= 1000000L && s > 1000000L - rs.length, s"$prev prob sum $s")
    }
  }

  test("quality percentiles: endpoints pin to 0 and 1e6, order tracks quality within source") {
    val got = graft.operators.Relevance.qualityPercentiles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.groupBy(_._2).foreach { case (src, rows) =>
      val ordered = rows.sortBy(r => (r._3, r._1))
      assert(ordered.head._4 == 0L && ordered.last._4 == 1000000L, src)
      // percentile replays the rank formula and is monotone in rank
      ordered.zipWithIndex.foreach { case (r, i) =>
        assert(r._4 == i.toLong * 1000000L / (rows.length - 1), s"$src rank $i")
      }
    }
  }

  test("bm25: scores replay the okapi formula driver-side, ranks dense") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size
    val avgdl = docs.values.map(_.length.toLong).sum.toDouble / n
    val terms = Relevance.Bm25Query
    val dfm = terms.map(t => t -> docs.values.count(_.contains(t)).toLong).toMap
    val want = docs.map { case (id, toks) =>
      id -> terms.map { t =>
        val tf = toks.count(_ == t).toLong
        if (tf == 0 || dfm(t) == 0) 0L
        else {
          val idf6 = BigDecimal(math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1.0))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          val part = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * toks.length / avgdl))
          math.round(idf6 * part * 1000000.0)
        }
      }.sum
    }.filter(_._2 != 0L)
    val wantTop = want.toSeq.sortBy { case (id, s) => (-s, id) }.take(20)
    val got = Relevance.bm25Retrieval(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.map(_._1).toSeq == (1 to 20))
    assert(got.map(r => (r._2, r._3)).toSeq == wantTop)
  }

  test("hybrid rrf: fused score is exactly the two legs' reciprocal sum, ranks dense") {
    val lex = Relevance.bm25Retrieval(spark, sf, k = 100).collect()
      .map(r => r.getLong(1) -> r.getInt(0).toLong).toMap
    val got = Relevance.hybridRrf(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getInt(2).toLong),
        if (r.isNullAt(3)) None else Some(r.getInt(3).toLong),
        r.getLong(4)))
    assert(got.map(_._1).sorted.toSeq == (1 to 20))
    got.foreach { case (_, id, rl, rv, rrf) =>
      // lexical leg consistent with a direct bm25 run
      assert(rl == lex.get(id), s"id $id lex rank mismatch")
      val wantRrf = rl.map(r => 1000000L / (60 + r)).getOrElse(0L) +
        rv.map(r => 1000000L / (60 + r)).getOrElse(0L)
      assert(rrf == wantRrf, s"id $id rrf")
      assert(rl.isDefined || rv.isDefined)
    }
    // at this sf doc_id⇄vec_id pair 1:1 — some fused row must carry
    // BOTH legs (the fusion actually fuses)
    assert(got.exists(r => r._3.isDefined && r._4.isDefined),
      "no doubly-ranked id in the top 20")
  }

  test("quality z-scores: per-source mean ~0, replay from exact moments, degenerate NULL") {
    val got = Relevance.qualityZScores(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.nonEmpty)
    got.groupBy(_._2).foreach { case (src, rows) =>
      val q4s = rows.map(_._3)
      val n = q4s.length.toLong
      val s1 = q4s.sum
      val s2 = q4s.map(x => x * x).sum
      rows.foreach { case (_, _, q4, z) =>
        if (n > 1 && n * s2 > s1 * s1) {
          val want = math.round(
            (q4 * n - s1).toDouble / math.sqrt((n * s2 - s1 * s1).toDouble) * 1000000.0)
          assert(z.contains(want), s"$src doc z")
        } else assert(z.isEmpty, s"$src degenerate source must be NULL")
      }
      if (n > 1 && n * s2 > s1 * s1) {
        // standardization: z sums to ~0 (floor rounding slack per row)
        val total = rows.flatMap(_._4).sum
        assert(math.abs(total) <= n, s"$src z-sum $total")
      }
    }
  }

  test("curriculum: balanced quality-ordered phases, dense per-phase positions") {
    val got = graft.operators.Relevance.curriculumOrder(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    val byPhase = got.groupBy(_._2)
    assert(byPhase.keySet == Set(1, 2, 3, 4))
    // ntile balance: phase sizes differ by at most one
    val sizes = byPhase.values.map(_.length)
    assert(sizes.max - sizes.min <= 1)
    // phases are quality-ordered (ties may straddle a boundary)
    (1 to 3).foreach { p =>
      assert(byPhase(p).map(_._4).min >= byPhase(p + 1).map(_._4).max)
    }
    // positions are a dense 1..n permutation within each phase
    byPhase.values.foreach { rs =>
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length))
    }
    // the shuffle shuffles: positions do not follow doc_id order
    val p1 = byPhase(1).sortBy(_._3).map(_._1).toSeq
    assert(p1 != p1.sorted)
  }

  test("prf expansion: zero expansion terms replays plain BM25 exactly; expansion changes the ranking") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    val base = rows(Relevance.bm25Retrieval(spark, sf, k = 20))
    val noExp = rows(Relevance.prfExpansion(spark, sf, expTerms = 0, k = 20))
    graft.operators.PlanCache.release()
    assert(noExp == base,
      "the frame-filtered scoring core must equal the literal-filtered path")
    val expanded = rows(Relevance.prfExpansion(spark, sf, k = 20))
    graft.operators.PlanCache.release()
    assert(expanded.length == 20)
    // three expansion terms joined the query: scores strictly grow for
    // any doc containing them, so the score profile must differ
    assert(expanded.map(_._3).sum > base.map(_._3).sum,
      "expanded query adds non-negative term mass and the feedback docs score higher")
  }

  test("spearman: a strictly monotone length→quality corpus scores exactly 1e6; bounded everywhere") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_spear").toString
    // all-distinct non-stopword tokens, lengths 2..21 (< the length
    // saturation point), so quality strictly increases with length
    val docs = (2 to 21).map(n =>
      ("mono", n.toLong, (1 to n).map(i => s"tok${n}x$i").mkString(" ")))
    docs.toDF("source", "doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.lengthQualitySpearman(spark, dir).collect()
    assert(got.length == 1 && got.head.getLong(2) == 1000000L)
    // real corpus: every source bounded, none degenerate
    val corpus = graft.operators.TextOps.lengthQualitySpearman(spark, sf).collect()
    assert(corpus.nonEmpty)
    corpus.foreach { r =>
      assert(!r.isNullAt(2) && math.abs(r.getLong(2)) <= 1000000L)
    }
  }

  test("conformal: a constant source yields a zero radius with full coverage; bounds hold corpus-wide") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_conf").toString
    val constDoc = "alpha beta gamma delta epsilon"
    val docs = (1 to 60).map(i => ("const", i.toLong, constDoc)) ++
      (1 to 60).map(i => ("mixed", 100L + i,
        Seq.fill(i % 9 + 2)("the word list grows here").mkString(" ")))
    docs.toDF("source", "doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.conformalQualityIntervals(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(5))).toMap
    graft.operators.PlanCache.release()
    val (cQhat, cCov) = got("const")
    assert(cQhat == 0L && cCov == 1000000L,
      "identical docs: zero residuals, everything covered")
    val (mQhat, mCov) = got("mixed")
    assert(mQhat >= 0L && mCov >= 0L && mCov <= 1000000L)
    // the 1−α conformal guarantee, observed on this deterministic split
    assert(mCov >= 800000L, s"coverage $mCov below the nominal band")
  }

  test("bootstrap CI: constant source collapses to a zero-width interval; varied source brackets its mean") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_boot").toString
    val constDoc = "alpha beta gamma delta epsilon"
    val varied = (1 to 40).map(i => ("mixed", 100L + i,
      Seq.fill(i % 7 + 2)("the word list grows here").mkString(" ")))
    val docs = (1 to 40).map(i => ("const", i.toLong, constDoc)) ++ varied
    docs.toDF("source", "doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.operators.TextOps.bootstrapQualityCi(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (cMean, cLo, cHi, cW) = got("const")
    assert(cLo == cMean && cHi == cMean && cW == 0L,
      "identical docs: every replica mean equals the point estimate")
    val (mMean, mLo, mHi, mW) = got("mixed")
    assert(mLo <= mMean && mMean <= mHi && mW > 0L)
    // deterministic replay: same corpus, same interval
    val again = graft.operators.TextOps.bootstrapQualityCi(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(again == got)
  }
}
