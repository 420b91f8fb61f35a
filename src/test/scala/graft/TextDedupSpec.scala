package graft

import org.apache.spark.sql.functions._

import graft.functions.{Text, Vectors}
import graft.operators.{Dedup, Similarity}

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("token count and shingles") {
    val df = Seq("a b c d e").toDF("text")
    assert(df.select(Text.tokenCount(col("text"))).head().getInt(0) == 5)
    val sh = df.select(Text.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(sh == Seq("a b c", "b c d", "c d e"))
    // short doc falls back to a single whole-text shingle
    val short = Seq("a b").toDF("text").select(Text.shingles(col("text"), 3)).head().getSeq[String](0)
    assert(short == Seq("a b"))
  }

  test("fingerprint is stable under an edit far from the minimal shingle") {
    val base = (1 to 50).map(i => s"w$i").mkString(" ")
    val df = Seq(base).toDF("text")
    val fp1 = df.select(Text.fingerprint(col("text"))).head().getString(0)
    // find where the minimal shingle is NOT, then edit elsewhere:
    // appending a tail changes only trailing shingles
    val edited = Seq(base + " zzz").toDF("text")
    val fp2 = edited.select(Text.fingerprint(col("text"))).head().getString(0)
    // min-hash property: appending can only add shingles, so the min
    // either stays or decreases; equality holds unless a new minimum appears
    assert(fp2 <= fp1)
  }

  test("identical texts collide on simhash; disjoint texts do not") {
    val df = Seq(
      (1L, "spark window merge join batch"),
      (2L, "spark window merge join batch"),
      (3L, "qq ww ee rr tt yy uu ii")).toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), Dedup.simhash(col("text")).as("sh")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(3L)) > 8)
  }

  test("sorted-intersect kernel matches array_intersect under codegen, incl. edges") {
    import spark.implicits._
    import graft.functions.SetCard
    // random sorted-distinct long arrays + edges: empty, disjoint,
    // identical, null (expression is null-safe → null out)
    val rnd = new scala.util.Random(7)
    val cases = Seq.fill(50)(
      (Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted,
        Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong).distinct.sorted)) ++
      Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq(1L, 3L), Seq(2L, 4L)),
        (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)))
    val df = cases.toDF("a", "b")
    val got = df.select(
      SetCard.sortedIntersectCard(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref")).collect()
    assert(got.forall(r => r.getInt(0) == r.getInt(1)))
    // executed through whole-stage codegen, not the interpreted path
    // (repartition forces a real exec stage — a LocalTableScan would
    // evaluate driver-side and prove nothing about doGenCode)
    val wsDf = df.repartition(2).select(SetCard.sortedIntersectCard(col("a"), col("b")).as("n"))
    val viaCodegen = wsDf.collect().map(_.getInt(0)).sum
    // AQE finalizes the plan on execution; the kernel's Project must sit
    // inside a WholeStageCodegen span — rendered as the `*(n)` prefix —
    // proving the doGenCode path ran, not interpreted eval
    assert(wsDf.queryExecution.executedPlan.toString
      .matches("(?s).*\\*\\(\\d+\\) Project \\[sorted_long_intersect_card.*"))
    assert(viaCodegen ==
      df.select(size(array_intersect(col("a"), col("b"))).as("n"))
        .collect().map(_.getInt(0)).sum)
    val withNull = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    assert(withNull.select(SetCard.sortedIntersectCard(col("a"), col("b")))
      .head().isNullAt(0))
  }

  test("distinct-cardinality rule fuses size(array_distinct) into the native codegen kernel") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Seq("a", "b", "c", "dd", "ee")
    val cases: Seq[Seq[String]] =
      Seq.fill(40)(Seq.fill(rnd.nextInt(30))(words(rnd.nextInt(words.length)))) ++
        Seq(Seq.empty[String], Seq("x", "x", "x"))
    val df = cases.toDF("a").repartition(2)
    val q = df.select(size(array_distinct(col("a"))).as("n"))
    assert(q.collect().map(_.getInt(0)).toSeq.sorted ==
      cases.map(_.distinct.length).sorted)
    // the optimizer rewrote the composable form into the kernel, inside
    // a WholeStageCodegen span (the `*(n)` prefix) — doGenCode ran.
    // Plan read AFTER collect: AQE finalizes codegen spans on execution
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("string_distinct_card") && !plan.contains("array_distinct"), plan)
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[string_distinct_card.*"), plan)
    // null ELEMENTS collapse to one distinct member, exactly like
    // array_distinct; null INPUT stays null (non-legacy size semantics)
    val withNulls = Seq(Some(Seq(Some("a"), None, Some("a"), None)),
      Option.empty[Seq[Option[String]]]).toDF("a").repartition(2)
    val got = withNulls.select(size(array_distinct(col("a"))).as("n")).collect()
    assert(got.exists(r => !r.isNullAt(0) && r.getInt(0) == 2))
    assert(got.exists(_.isNullAt(0)))
    // long arrays are NOT rewritten (kernel is string-specialized)
    val longs = Seq(Seq(1L, 1L, 2L)).toDF("a").repartition(2)
      .select(size(array_distinct(col("a"))).as("n"))
    assert(!longs.queryExecution.executedPlan.toString.contains("string_distinct_card"))
    assert(longs.collect().head.getInt(0) == 2)
  }

  test("scalar minhash signature matches a pure-Scala affine-min replay") {
    import spark.implicits._
    val df = Seq((1L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val sig = df.select(Dedup.minhashSignature(col("text")).as("mh"))
      .head().getSeq[Long](0)
    val hs = df.select(Dedup.elementHashes(
        array_distinct(Text.shingles(col("text"), 3))).as("hs"))
      .head().getSeq[Long](0)
    val want = Dedup.perms.map { case (a, b) =>
      hs.map(x => math.floorMod(a * x + b, Dedup.P)).min }
    assert(sig == want && sig.length == Dedup.NumPerms)
  }

  test("minhash pairs are exact-verified above the threshold") {
    val rows = Dedup.minhashPairs(spark, sf, threshold = 0.8).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.8 && j <= 1.0)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("minhash banding has total recall vs exact shingle-jaccard here") {
    // exact all-pairs at this sf is cheap; the banded op must find
    // every pair the exact computation finds (candidate superset)
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), array_distinct(Text.shingles(col("text"), 3)).as("s"))
    val exact = docs.as("x").join(docs.as("y"), col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        (size(array_intersect(col("x.s"), col("y.s"))).cast("double") /
          size(array_union(col("x.s"), col("y.s"))).cast("double")).as("j"))
      .filter(round(col("j"), 4) >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.minhashPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == exact)
  }

  test("exact dedup keeps exactly one row per (user, type)") {
    val out = Dedup.exactLatestEvents(spark, sf)
    val dupKeys = out.groupBy("user_id", "event_type").count().filter(col("count") > 1).count()
    assert(dupKeys == 0)
  }

  test("cosine of a unit vector with itself is 1") {
    val df = Tables(spark, sf, "embeddings").limit(5)
    val sims = df.select(round(Vectors.cosine(col("embedding"), col("embedding")), 6)).collect()
    assert(sims.forall(_.getDouble(0) == 1.0))
  }

  test("connected components: chains propagate the min label across iterations; clusters match brute-force closure") {
    import spark.implicits._
    // a 4-chain (needs multiple propagation rounds: 4's label must
    // travel 1→2→3→4), a 2-clique, and a 3-path, ids deliberately
    // NON-contiguous and unordered in the pair list
    val pairs = Seq((2L, 1L), (2L, 3L), (3L, 4L), (11L, 10L), (21L, 20L), (21L, 22L))
      .toDF("doc_a", "doc_b")
    val got = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.operators.PlanCache.release()
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    // empty pair list → empty clustering, no hang
    assert(graft.operators.Dedup.connectedComponents(
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")).count() == 0)
    graft.operators.PlanCache.release()
    // a diameter beyond the iteration cap SURFACES instead of returning
    // phantom clusters whose id is no member's doc_id
    val e = intercept[IllegalStateException](graft.operators.Dedup.connectedComponents(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("doc_a", "doc_b"), maxIters = 1))
    assert(e.getMessage.contains("did not converge"))
    graft.operators.PlanCache.release()
    // ...but a graph whose INITIAL labels are already the fixpoint
    // converges within maxIters = 1 (detection baselines on the initial
    // sum, not on two in-loop repeats)
    assert(graft.operators.Dedup.connectedComponents(
        Seq((1L, 2L)).toDF("doc_a", "doc_b"), maxIters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(1L -> 1L, 2L -> 1L))
    graft.operators.PlanCache.release()
    // end-to-end over the real pair graph: each cluster id is the
    // component minimum, every pair lands in one cluster
    val real = graft.operators.Dedup.dedupClusters(spark, sf)
    val rows = real.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    graft.operators.PlanCache.release()
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._2)
    // cluster id = min member, exactly one canonical member per cluster
    assert(byCluster.forall { case (cid, ms) => ms.map(_._1).min == cid })
    assert(byCluster.forall { case (cid, ms) =>
      ms.count(_._3) == 1 && ms.find(_._3).get._1 == cid })
  }

  test("lsh ann recall vs brute force is nontrivial") {
    val brute = Similarity.bruteForceTopK(spark, sf).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(spark, sf).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect lsh).size.toDouble / brute.size
    info(s"LSH recall vs brute force: $recall")
    assert(recall > 0.2) // 16-bit sig, 4-bit bands: approximate by design
  }

  test("bpe fertility: rollup replays applyBpe's per-word counts, occurrence-weighted") {
    import graft.operators.TextOps
    val enc = TextOps.applyBpe(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val freq = Tables(spark, sf, "documents").select("lang", "text").collect()
      .flatMap(r => r.getString(1).split(" ").map(w => (r.getString(0), w)))
      .groupBy(identity).map { case ((lang, w), os) => (lang, w, os.length.toLong) }
    val want = freq.groupBy(_._1).map { case (lang, ws) =>
      val nWords = ws.map(_._3).sum
      val nSub = ws.map(w => w._3 * enc(w._2)._2).sum
      val chars = ws.map(w => w._3 * enc(w._2)._1).sum
      lang -> (nWords, ws.size.toLong, nSub,
        nSub * 1000000L / nWords, chars * 1000000L / nSub)
    }
    val got = TextOps.bpeFertility(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == want)
    // fertility must be > 1 (merges never collapse a word to nothing)
    // and bounded by chars-per-word (a symbol is at least one char)
    got.values.foreach { case (_, _, _, fert, cps) =>
      assert(fert > 1000000L && cps >= 1000000L)
    }
  }

  test("bpe encode: segmentations reassemble their words, never grow, and the default table is the miner's") {
    val rows = graft.operators.TextOps.applyBpe(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (word, nChars, nSyms, seg) =>
      assert(seg.split(' ').mkString == word, s"'$seg' does not reassemble '$word'")
      assert(nSyms <= nChars && nSyms >= 1)
      assert(nChars == word.length.toLong)
    }
    // merges bite: the default table compresses this corpus's
    // vocabulary overall (merge ranks are frequency-dependent, so the
    // sf0.01-frozen table need not match this slice rank-for-rank —
    // but its symbols still occur)
    assert(rows.map(_._3).sum < rows.map(_._2).sum)
    // train→encode composition: the merges mined from THIS slice feed
    // the encoder directly, and every invariant holds for them too
    val mined = graft.operators.TextOps.bpeMerges(spark, sf).orderBy("iter")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val rows2 = graft.operators.TextOps.applyBpe(spark, sf, mined).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    graft.operators.PlanCache.release()
    rows2.foreach { case (word, _, _, seg) =>
      assert(seg.split(' ').mkString == word)
    }
    assert(rows2.map(_._3).sum < rows2.map(_._2).sum)
  }

  test("bpe encode property: random words × random merge tables always reassemble, never grow") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def samples[A](g: Gen[A], n: Int): Seq[A] =
      (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))
    // narrow alphabet so merges actually fire; merged symbols feed
    // later merges (multi-char lhs/rhs), like a real merges.txt
    val sym = Gen.oneOf("a", "b", "c", "ab", "bc", "ca")
    val mergeGen = Gen.zip(sym, sym)
    val wordGen = Gen.chooseNum(1, 12)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    val words = samples(wordGen, 40).distinct
    val merges = samples(mergeGen, 12).distinct.take(8)
    import spark.implicits._
    val docs = Seq((0L, words.mkString(" "))).toDF("doc_id", "text")
    // drive the production fold chain through a temp corpus dir
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_prop").toString
    docs.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.TextOps.applyBpe(spark, dir, merges).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.map(_._1).toSet == words.toSet)
    out.foreach { case (word, nChars, nSyms, seg) =>
      assert(seg.split(' ').mkString == word, s"'$seg' vs '$word' under $merges")
      assert(nSyms >= 1 && nSyms <= nChars)
    }
  }

  test("token entropy and burstiness replay their integer formulas driver-side") {
    val toks = Tables(spark, sf, "documents").select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(' ').toSeq))
    // entropy: replay micro-unit probabilities + 1e-6-grid ln exactly
    val gotE = graft.operators.TextOps.tokenEntropy(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    toks.groupBy(_._1).foreach { case (src, docs) =>
      val tf = docs.flatMap(_._2).groupBy(identity).map { case (_, o) => o.size.toLong }
      val total = tf.sum
      val s = tf.toSeq.map { n =>
        val pU = n * 1000000L / total
        if (pU > 0)
          pU * BigDecimal(math.log(pU / 1000000.0) * 1000000)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        else 0L
      }.sum
      val (nTokens, vocab, entropy) = gotE(src)
      assert(nTokens == total && vocab == tf.size.toLong)
      assert(entropy ==
        BigDecimal(-s.toDouble / 1e12).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(entropy >= 0 && entropy <= math.log(vocab.toDouble) + 1e-9)
    }
    // burstiness: exact moment replay, non-negative
    val gotF = graft.operators.TextOps.lengthBurstiness(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    toks.groupBy(_._1).foreach { case (src, docs) =>
      val xs = docs.map(_._2.size.toLong)
      val (n, sx, sxx) = (xs.size.toLong, xs.sum, xs.map(x => x * x).sum)
      val (gn, gsx, fano) = gotF(src)
      assert(gn == n && gsx == sx)
      assert(fano == (n * sxx - sx * sx) * 1000000L / ((n - 1) * sx))
      assert(fano >= 0)
    }
  }

  test("hamming ann: binary shortlist + exact rerank recall vs brute force") {
    val brute = Similarity.bruteForceTopK(spark, sf).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ham = Similarity.hammingTopK(spark, sf).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (brute intersect ham).size.toDouble / brute.size
    info(s"hamming shortlist+rerank recall vs brute force: $recall")
    // 60-bit codes, 15×4-bit bands, shortlist 100: measured 0.76 on
    // the near-orthogonal synthetic vectors (the hard regime)
    assert(recall >= 0.6)
    // a tighter shortlist can only shrink the candidate pool the
    // rerank sees — recall must not improve
    val hamTight = Similarity.hammingTopK(spark, sf, shortlist = 25)
      .select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recallTight = (brute intersect hamTight).size.toDouble / brute.size
    info(s"hamming recall at shortlist=25: $recallTight")
    assert(recallTight <= recall)
    graft.operators.PlanCache.release()
  }

  test("ann bakeoff: per-method recalls replay their own definitions") {
    val got = Similarity.annBakeoff(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet ==
      Set("lsh", "ivf", "int8", "pq", "hamming", "jl+ivf"))
    got.values.foreach { case (hits, total, micro) =>
      assert(total == 50 && hits >= 0 && hits <= total)
      assert(micro == hits * 1000000L / total)
    }
    // one method re-derived independently end-to-end
    val brute = Similarity.bruteForceTopK(spark, sf).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.lshTopK(spark, sf).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.operators.PlanCache.release()
    assert(got("lsh")._1 == (brute intersect lsh).size.toLong)
  }

  test("ivf ann probes nprobe cells and beats single-cell recall") {
    val brute = Similarity.bruteForceTopK(spark, sf).select("query_id", "cand_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(nprobe: Int): Double = {
      val ivf = Similarity.ivfTopK(spark, sf, nprobe = nprobe)
        .select("query_id", "cand_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (brute intersect ivf).size.toDouble / brute.size
    }
    val r1 = recallOf(1); val r4 = recallOf(4)
    info(s"IVF recall nprobe=1: $r1, nprobe=4: $r4")
    assert(r4 >= r1)   // more probes never hurt recall
    assert(r4 > 0.3)   // 16 cells, 4 probed: approximate by design
    // each query emits exactly k rows (cells are never empty here)
    assert(Similarity.ivfTopK(spark, sf).count() == 50)
  }

  test("filtered ann: every hit obeys the label constraint, recall holds vs filtered brute force") {
    val emb = Tables(spark, sf, "embeddings").select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Similarity.filteredIvfTopK(spark, sf)
      .select("query_id", "cand_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    got.foreach { case (q, c) => assert(emb(q) == emb(c), s"$q→$c crosses labels") }
    // filtered brute-force baseline: same-label candidates only
    val brute = {
      val e = Tables(spark, sf, "embeddings")
      val q = e.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
      import org.apache.spark.sql.functions._
      val scored = e.select(col("vec_id").as("cand_id"), col("label"),
          col("embedding").as("cv"))
        .join(broadcast(q.select(col("vec_id").as("query_id"), col("label"),
          col("embedding").as("qv"))), Seq("label"))
        .filter(col("query_id") =!= col("cand_id"))
        .select(col("query_id"), col("cand_id"),
          round(graft.functions.Vectors.dot(col("qv"), col("cv")), 6).as("sim"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("cand_id").asc)
      scored.withColumn("r", row_number().over(w)).filter(col("r") <= 5)
        .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val recall = (brute intersect got.toSet).size.toDouble / brute.size
    info(s"filtered-IVF recall vs filtered brute force: $recall")
    assert(recall > 0.5) // nprobe 6 of 16 compensates the filter's thinning
  }

  test("hard negatives: every pair crosses labels, recall holds vs the cross-label brute force") {
    val labels = Tables(spark, sf, "embeddings").select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = Similarity.hardNegatives(spark, sf)
      .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    got.foreach { case (q, c) => assert(labels(q) != labels(c), s"$q→$c shares a label") }
    val brute = {
      import org.apache.spark.sql.functions._
      val e = Tables(spark, sf, "embeddings")
      val scored = e.select(col("vec_id").as("cand_id"), col("label").as("cl"),
          col("embedding").as("cv"))
        .join(broadcast(e.filter(col("vec_id") < 10).select(col("vec_id").as("query_id"),
          col("label").as("ql"), col("embedding").as("qv"))), col("ql") =!= col("cl"))
        .select(col("query_id"), col("cand_id"),
          round(graft.functions.Vectors.dot(col("qv"), col("cv")), 6).as("sim"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(col("sim").desc, col("cand_id").asc)
      scored.withColumn("r", row_number().over(w)).filter(col("r") <= 5)
        .select("query_id", "cand_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val recall = (brute intersect got.toSet).size.toDouble / brute.size
    info(s"hard-negative recall vs cross-label brute force: $recall")
    assert(recall > 0.5)
  }

  test("rag chunks: stride/width contract — count, coverage, and tail truncation per doc") {
    val (w, s) = (graft.operators.TextOps.ChunkWidth, graft.operators.TextOps.ChunkStride)
    val got = graft.operators.TextOps.ragChunks(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (id, rs) =>
        id -> rs.map(r => r.getInt(1) -> r.getInt(2)).sortBy(_._1) }
    val nToks = Tables(spark, sf, "documents")
      .select(col("doc_id"), size(graft.functions.Text.tokens(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.keySet == nToks.keySet)
    got.foreach { case (id, chunks) =>
      val n = nToks(id)
      assert(chunks.map(_._1).toSeq == (0 until math.ceil(n.toDouble / s).toInt))
      chunks.foreach { case (idx, len) =>
        assert(len == math.min(w, n - idx * s)) // tail truncates, never pads
      }
      // overlap regime: windows wider than the stride ⇒ every token of
      // a covered prefix appears in some chunk (starts tile by s, each
      // start covers [start, start+len) with len ≥ min(w, remaining))
      assert(w > s)
    }
    assert(got.valuesIterator.exists(_.length > 1), "fixture has multi-chunk docs")
  }

  test("dup-rate report: per-source loser counts equal the cluster closure's") {
    val losers = Dedup.dedupClusters(spark, sf)
      .filter(col("doc_id") =!= col("cluster_id"))
      .collect().map(_.getLong(0)).toSet
    graft.operators.PlanCache.release()
    val sources = Tables(spark, sf, "documents").select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val got = graft.operators.TextOps.dupRateBySource(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    graft.operators.PlanCache.release()
    val expected = sources.groupBy(_._2).map { case (src, docs) =>
      val dups = docs.count(d => losers(d._1)).toLong
      src -> ((docs.length.toLong, dups,
        BigDecimal(dups.toDouble / docs.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    assert(got == expected)
    assert(got.valuesIterator.exists(_._2 > 0), "fixture has duplicated sources")
  }

  test("oov report: counts replay the top-N vocabulary boundary exactly") {
    val v = graft.operators.TextOps.OovVocab
    val got = graft.operators.TextOps.oovReport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    graft.operators.PlanCache.release()
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
    val tf = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(tf.size > v, "corpus vocabulary must exceed the configured vocab")
    val vocab = tf.toSeq.sortBy { case (t, n) => (-n, t) }.take(v).map(_._1).toSet
    val expected = docs.map { case (id, toks) =>
      val oov = toks.count(!vocab(_)).toLong
      (id, toks.length.toLong, oov,
        BigDecimal(oov.toDouble / toks.length)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSet
    assert(got.toSet == expected)
    assert(got.exists(_._3 > 0L), "OOV mass must exist below the corpus vocabulary")
    assert(got.exists(r => r._3 < r._2), "vocabulary head must cover some mass")
  }

  test("joint curation is exactly the lexical chain intersected with semantic survivors") {
    val lexical = graft.operators.TextOps.curate(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    val semDropped = Similarity.semDedup(spark, sf)
      .collect().collect { case r if !r.getBoolean(2) => r.getLong(0) }.toSet
    val got = graft.operators.TextOps.jointCurate(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2)))).toMap
    graft.operators.PlanCache.release()
    graft.operators.Dedup.releaseBandIndex()
    // a doc without a semantic verdict passes — only KNOWN dups drop
    assert(got == lexical.filter { case (id, _) => !semDropped(id) })
    // both legs bite on the fixture
    assert(got.nonEmpty && got.size < lexical.size)
  }

  test("clean split: test is the stratified sample, no train doc shares a cluster with test") {
    val split = graft.operators.TextOps.cleanSplit(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val test = graft.operators.TextOps.stratifiedSample(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val cluster = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.operators.PlanCache.release()
    graft.operators.Dedup.releaseBandIndex()
    val all = Tables(spark, sf, "documents").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(split.keySet == all)
    assert(split.collect { case (id, "test") => id }.toSet == test)
    val testClusters = test.flatMap(cluster.get)
    split.foreach {
      case (id, "train") =>
        assert(!cluster.get(id).exists(testClusters), s"train doc $id leaks a test cluster")
      case (id, "excluded") =>
        assert(!test(id) && cluster.get(id).exists(testClusters), s"$id wrongly excluded")
      case _ => ()
    }
    assert(split.valuesIterator.contains("excluded"), "exclusion zone must be non-empty")
  }

  test("cluster-size histogram conserves the clustered-doc mass, no singleton clusters") {
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val got = Dedup.clusterSizeHistogram(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.operators.PlanCache.release()
    graft.operators.Dedup.releaseBandIndex()
    val expected = clusters.groupBy(_._2).values.map(_.length.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got == expected)
    assert(got.keysIterator.min >= 2L, "a cluster needs at least one pair")
    assert(got.map { case (sz, n) => sz * n }.sum == clusters.length.toLong)
  }

  test("incremental dedup finds exactly the full pair set's batch-touching pairs") {
    // the batch-probes-index shortcut must lose nothing relative to
    // re-pairing the whole corpus: same banding, same verify, so the
    // result is the full pair list filtered to ≥1 batch member
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val full = pairs(Dedup.minhashPairs(spark, sf))
    graft.operators.PlanCache.release()
    val inc = pairs(Dedup.incrementalPairs(spark, sf))
    graft.operators.PlanCache.release()
    val expected = full.filter { case (a, b, _) => a % 10 == 0 || b % 10 == 0 }
    assert(inc == expected)
    assert(full.exists { case (a, b, _) => a % 10 != 0 && b % 10 != 0 },
      "fixture has corpus-only pairs, so the filter is actually exercised")
  }

  test("weighted mix is deterministic, rate-monotone, and drops unlisted sources") {
    import graft.operators.TextOps
    val once = TextOps.weightedSample(spark, sf).collect().map(_.getLong(0)).toSet
    val again = TextOps.weightedSample(spark, sf).collect().map(_.getLong(0)).toSet
    assert(once == again) // hash decision, not rand(): reproducible mixes
    // rate 1.0 keeps every doc of that source; rate 0 ⇒ absent
    val keepAll = TextOps.DefaultMixRates.filter(_._2 == 1.0).keySet
    val bySrc = TextOps.weightedSample(spark, sf)
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables(spark, sf, "documents")
      .groupBy("source").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    keepAll.foreach(s => assert(bySrc.get(s) == totals.get(s)))
    // raising a source's rate only ever ADDS documents (hash thresholds nest)
    val low = TextOps.weightedSample(spark, sf, Map("src0" -> 0.25))
      .collect().map(_.getLong(0)).toSet
    val high = TextOps.weightedSample(spark, sf, Map("src0" -> 0.75))
      .collect().map(_.getLong(0)).toSet
    assert(low.subsetOf(high))
    // a source missing from the mix spec contributes nothing
    assert(TextOps.weightedSample(spark, sf, Map("src1" -> 1.0))
      .filter(col("source") =!= "src1").count() == 0)
  }

  test("curation keeps exactly: quality bar + langID + near-dup survivors") {
    import graft.operators.TextOps
    val kept = TextOps.curate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toMap
    graft.operators.PlanCache.release()
    val metrics = Tables(spark, sf, "documents").select(col("doc_id"),
        Text.qualityScore(col("text")).as("q"), Text.langId(col("text")).as("g"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    val clusters = Dedup.dedupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(2))).toMap
    graft.operators.PlanCache.release()
    val expected = metrics.collect {
      case (id, (q, g)) if q >= 0.66 && g == "en" && clusters.getOrElse(id, true) => id -> q
    }
    assert(kept == expected.toMap)
    // the chain actually prunes on every leg here
    assert(metrics.exists { case (_, (q, _)) => q < 0.66 })
    assert(metrics.exists { case (_, (_, g)) => g != "en" })
    assert(clusters.exists(!_._2))
  }

  test("banded near-dups are a subset of the exact pairs with nonzero recall") {
    // q137 (linear scale path) vs q28 (exact all-pairs contract):
    // everything the banding keeps must be a true pair with the exact
    // sim, and it must keep SOMETHING at this similarity regime
    val exact = Similarity.embeddingNearDups(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val banded = Similarity.embeddingNearDupsBanded(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    graft.operators.PlanCache.release()
    assert(banded.nonEmpty && exact.nonEmpty)
    banded.foreach { case (k, sim) =>
      assert(exact.get(k).contains(sim), s"banded pair $k not in exact set") }
    val recall = banded.size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall (${banded.size}/${exact.size})")
  }

  test("embedding clusters are the components of the near-dup pair graph") {
    val pairs = Similarity.embeddingNearDups(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val got = Similarity.embeddingClusters(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    graft.operators.PlanCache.release()
    // brute-force closure on the driver (tiny pair graph)
    var label = pairs.flatMap(p => Seq(p._1, p._2)).distinct.map(n => n -> n).toMap
    var changed = true
    while (changed) {
      changed = false
      pairs.foreach { case (a, b) =>
        val m = math.min(label(a), label(b))
        if (label(a) != m || label(b) != m) {
          label += a -> m; label += b -> m; changed = true
        }
      }
    }
    assert(got.map(g => g._1 -> g._2).toMap == label)
    assert(got.forall(g => g._3 == (g._1 == g._2)))
    assert(got.nonEmpty)
  }

  test("per-source quality cap keeps the best n with deterministic ties") {
    import graft.operators.TextOps
    val n = 5
    val got = TextOps.topQualityPerSource(spark, sf, n).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getDouble(2), r.getInt(3)))
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.length <= n)
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length))
      // rank order follows (quality desc, doc_id asc)
      val byRank = rows.sortBy(_._4)
      byRank.zip(byRank.drop(1)).foreach { case (hi, lo) =>
        assert(hi._3 > lo._3 || (hi._3 == lo._3 && hi._2 < lo._2))
      }
    }
    // nothing outside the top-n: every excluded doc of a source is no
    // better than the worst kept one
    val worstKept = got.groupBy(_._1).view.mapValues(_.map(r => (r._3, r._2)).min).toMap
    Tables(spark, sf, "documents")
      .select(col("source"), col("doc_id"), Text.qualityScore(col("text")).as("q"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .filterNot(d => got.exists(g => g._2 == d._2))
      .foreach { case (src, id, q) =>
        val (wq, wid) = worstKept(src)
        assert(q < wq || (q == wq && id > wid))
      }
  }

  test("sequence packing matches a sequential per-group replay") {
    import graft.operators.TextOps
    val cap = 512
    val got = TextOps.packSequences(spark, sf, cap).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    // every document packed exactly once
    assert(got.map(_._1).distinct.length == got.length)
    assert(got.length == Tables(spark, sf, "documents").count())
    // replay each group's concat-then-chop layout sequentially in Scala
    got.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, n, chunk, spans) =>
        assert(chunk == cum / cap)
        assert(spans == (cum % cap + n > cap))
        cum += n
      }
    }
    // chunk ids are dense per group: a chunk boundary is only ever
    // crossed by adjacent documents (no empty chunks... except when one
    // doc longer than cap skips chunks — allowed by concat-chop; assert
    // monotone non-decreasing instead)
    got.groupBy(_._2).foreach { case (_, rows) =>
      val chunks = rows.sortBy(_._1).map(_._4)
      assert(chunks.zip(chunks.drop(1)).forall { case (a, b) => a <= b })
    }
  }

  test("size-ratio prefilter honors the ROUNDED verify threshold on boundary pairs") {
    // raw J = 3750/4808 = 0.779950… < 0.78, but the verify (and the
    // DuckDB oracle) filter on round(J,4) = 0.7800 >= t and KEEP the
    // pair — a prefilter on the raw threshold (0.78·4808 = 3750.24 >
    // 3750) would prune it before verification ever runs
    val tmp = java.nio.file.Files.createTempDirectory("graft-boundary").toString
    val a = (0 until 3750).map(i => s"w$i").mkString(" ")
    val b = (0 until 4808).map(i => s"w$i").mkString(" ")
    Seq((1L, "s", a), (2L, "s", b)).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Dedup.tokenJaccardPairs(spark, tmp, threshold = 0.78).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    graft.operators.PlanCache.release()
    assert(got == Seq((1L, 2L, 0.78)))
  }

  test("decontamination flags exactly the docs sharing >=2 eval shingles") {
    val flagged = Dedup.decontaminate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // replay on the driver from the raw shingle sets
    val shs = Tables(spark, sf, "documents")
      .select(col("doc_id"), array_distinct(Text.shingles(col("text"), 4)).as("shs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet)
    val evalShingles = shs.collect { case (id, s) if id % 10 == 0 => s }
      .foldLeft(Set.empty[String])(_ ++ _)
    val expected = shs.collect {
      case (id, s) if id % 10 != 0 && (s & evalShingles).size >= 2 =>
        id -> (s & evalShingles).size.toLong
    }.toMap
    assert(flagged == expected)
    assert(flagged.nonEmpty, "fixture has eval-overlapping docs")
    assert(flagged.keySet.forall(_ % 10 != 0), "eval docs never flag themselves")
  }

  test("int8-quantized ann tracks the exact baseline: high recall, small sim error") {
    val exact = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val quant = Similarity.quantizedTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val recall = quant.keySet.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.8, s"recall@5 $recall")
    // the estimate is close where both agree (int8 over unit-norm dims)
    val errs = quant.keySet.filter(exact.contains)
      .map(k => math.abs(quant(k) - exact(k)))
    assert(errs.max < 0.05, s"max |sim error| ${errs.max}")
  }

  test("pq ann: recall tracks the exact baseline, re-ranked sims are exact dots") {
    val exact = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val pq = Similarity.pqTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val recall = pq.keySet.count(exact.contains).toDouble / exact.size
    assert(recall >= 0.8, s"recall@5 $recall")
    // re-rank uses EXACT dots, so every agreeing pair matches bit-for-bit
    pq.keySet.filter(exact.contains).foreach { k =>
      assert(pq(k) == exact(k), s"pair $k re-ranked sim differs from exact")
    }
  }

  test("count-min sketch: estimate >= truth always, collisions visible, exact replay agrees") {
    val got = graft.operators.TextOps.cmsTokenFrequencies(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // ground truth + full sketch replay driver-side
    val tf = Tables(spark, sf, "documents").select(explode(Text.tokens(col("text"))).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def hash60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val depth = graft.operators.TextOps.CmsDepth
    val width = graft.operators.TextOps.CmsWidth
    val sketch = scala.collection.mutable.Map.empty[(Int, Long), Long].withDefaultValue(0L)
    tf.foreach { case (t, n) =>
      (0 until depth).foreach(d => sketch((d, hash60(s"cms$d-$t") % width)) += n) }
    val want: Seq[(String, Long, Long)] = tf.toSeq.map { case (t, n) =>
      (t, n, (0 until depth).map(d => sketch((d, hash60(s"cms$d-$t") % width))).min) }
    assert(got.toSet == want.sortBy(r => (-r._2, r._1)).take(50).toSet)
    got.foreach { case (t, n, est) => assert(est >= n, s"token $t underestimated") }
    assert(got.exists { case (_, n, est) => est > n },
      "width < vocab must produce at least one visible collision")
  }

  test("bpe merges match a sequential trainer replay; later merges compound earlier symbols") {
    val got = graft.operators.TextOps.bpeMerges(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    // sequential reference trainer over the same corpus
    val wf = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    Tables(spark, sf, "documents").select("text").collect()
      .foreach(_.getString(0).split(" ").foreach(w => wf(w) += 1))
    var vocab: Map[List[String], Long] =
      wf.groupMapReduce { case (w, _) => w.split("").filter(_.nonEmpty).toList }(_._2)(_ + _)
    val want = (1 to graft.operators.TextOps.BpeIters).map { it =>
      val pc = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => pc(p) += f) }
      val ((l, r), c) = pc.minBy { case ((a, b), n) => (-n, a, b) }
      def merge(syms: List[String]): List[String] = syms match {
        case a :: b :: rest if a == l && b == r => (l + r) :: merge(rest)
        case a :: rest => a :: merge(rest)
        case Nil => Nil
      }
      vocab = vocab.groupMapReduce { case (s, _) => merge(s) }(_._2)(_ + _)
      (it, l, r, c)
    }
    assert(got == want)
    // the learned table is genuinely hierarchical: some merge consumes
    // a symbol produced by an earlier merge
    val produced = got.map(m => m._2 + m._3).toSet
    assert(got.exists(m => produced.contains(m._2) || produced.contains(m._3)),
      "no merge builds on an earlier merge — fixture too flat for BPE")
  }

  test("corpus stats aggregate the per-doc metrics exactly") {
    import graft.operators.TextOps
    val got = TextOps.corpusStats(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    val perDoc = Tables(spark, sf, "documents").select(col("source"),
        Text.tokenCount(col("text")).as("n"), Text.qualityScore(col("text")).as("q"),
        Text.langId(col("text")).as("g"))
      .collect().map(r => (r.getString(0), r.getInt(1).toLong, r.getDouble(2), r.getString(3)))
    def r2(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    perDoc.groupBy(_._1).foreach { case (src, docs) =>
      val (n, tot, avgT, avgQ, enF) = got(src)
      assert(n == docs.length)
      assert(tot == docs.map(_._2).sum)
      assert(math.abs(avgT - r2(docs.map(_._2).sum.toDouble / docs.length, 2)) < 1e-9)
      assert(math.abs(avgQ - r2(docs.map(_._3).sum / docs.length, 4)) < 1e-9)
      assert(math.abs(enF - r2(docs.count(_._4 == "en").toDouble / docs.length, 4)) < 1e-9)
    }
    assert(got.keySet == perDoc.map(_._1).toSet)
  }

  test("vocabulary mining matches a driver-side tf/df replay") {
    import graft.operators.TextOps
    val got = TextOps.vocabulary(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // split(sep, -1): Spark's split keeps trailing empty tokens; Java's
    // default drops them — the replay must match Spark's semantics
    val docs = Tables(spark, sf, "documents").select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq)
    val tf = docs.flatMap(_._2).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val df = docs.flatMap { case (id, ts) => ts.distinct.map(_ -> id) }
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val expected = tf.toSeq.map { case (t, n) => (t, n, df(t)) }
      .sortBy { case (t, n, _) => (-n, t) }.take(100)
    assert(got.toSeq == expected)
    assert(got.nonEmpty && got.length <= 100)
  }

  test("repetition score is the duplicate-shingle fraction") {
    import graft.operators.TextOps
    val got = TextOps.repetitionScores(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    val raw = Tables(spark, sf, "documents")
      .select(col("doc_id"), Text.shingles(col("text"), 3).as("shs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    got.foreach { case (id, n, frac) =>
      val shs = raw(id)
      assert(n == shs.length)
      val expect = BigDecimal(1.0 - shs.distinct.length.toDouble / shs.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(frac - expect) < 1e-9)
      assert(frac >= 0.0 && frac < 1.0)
    }
    assert(got.exists(_._3 > 0.0), "fixture has docs with repeated shingles")
  }
  test("persisted band index: append corpus then batch; probe equals in-process incremental dedup") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft_bandindex").toString
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    // corpus first, the crawl increment second — two appends, no rebuild
    Dedup.appendToStoredIndex(docs.filter(col("doc_id") % 10 =!= 0), indexDir)
    Dedup.appendToStoredIndex(docs.filter(col("doc_id") % 10 === 0), indexDir)
    val got = Dedup.pairsAgainstStoredIndex(spark, indexDir,
        docs.filter(col("doc_id") % 10 === 0))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val want = Dedup.incrementalPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.operators.PlanCache.release()
    graft.operators.Dedup.releaseBandIndex()
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("persisted ivf: found corpus, append increment; stored probe equals in-process ivf") {
    val indexDir = java.nio.file.Files.createTempDirectory("graft_ivfindex").toString
    val emb = Tables(spark, sf, "embeddings")
    // the founding slice keeps every codebook vector (vec_id < 16);
    // the later crawl increment appends under the EXISTING codebook
    val founding = emb.filter(col("vec_id") < 16 || col("vec_id") % 7 =!= 3)
    val increment = emb.filter(col("vec_id") >= 16 && col("vec_id") % 7 === 3)
    Similarity.buildStoredIvf(founding, indexDir)
    Similarity.appendToStoredIvf(increment, indexDir)
    // every vector assigned exactly once across the two appends
    assert(spark.read.parquet(s"$indexDir/cells").count() == emb.count())
    val got = Similarity.ivfTopKAgainstStoredIndex(spark, indexDir,
        emb.filter(col("vec_id") < 10)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val want = Similarity.ivfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    graft.operators.PlanCache.release()
    assert(got == want)
    assert(want.nonEmpty)

    // --- maintenance faces on the same index ---
    // occupancy report: zero-filled over all 16 cells, mass conserved
    val stats = Similarity.ivfCellStats(spark, indexDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stats.keySet == (0L until 16L).toSet)
    assert(stats.values.sum == emb.count())
    // compaction: files collapse to one per occupied cell, probes are
    // IDENTICAL, and the probe scan partition-prunes (dynamic pruning
    // from the broadcast probe side — the whole point of the layout)
    Similarity.compactStoredIvf(spark, indexDir)
    def parquetFiles(d: java.io.File): Int =
      d.listFiles().map {
        case f if f.isDirectory => parquetFiles(f)
        case f if f.getName.endsWith(".parquet") => 1
        case _ => 0
      }.sum
    val occupied = stats.count(_._2 > 0L)
    assert(parquetFiles(new java.io.File(
      graft.operators.Atomic.resolve(spark, indexDir, "cells"))) == occupied)
    val compactProbe = Similarity.ivfTopKAgainstStoredIndex(spark, indexDir,
      emb.filter(col("vec_id") < 10))
    val plan = compactProbe.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"), s"probe scan not partition-pruned:\n$plan")
    val afterCompact = compactProbe.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    graft.operators.PlanCache.release()
    assert(afterCompact == want)
    assert(Similarity.ivfCellStats(spark, indexDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == stats)
  }

  test("codebook training: mean quantization sim never degrades and beats the stand-in") {
    val emb = Tables(spark, sf, "embeddings")
    val vecs = emb.select("embedding").collect().map(_.getSeq[Float](0).toArray)
    def meanBest(cents: Array[(Long, Array[Float])]): Double = {
      val ms = vecs.map { v =>
        cents.map { case (_, c) =>
          var s = 0.0; var i = 0
          while (i < v.length) { s += v(i).toDouble * c(i); i += 1 }
          s
        }.max
      }
      ms.sum / ms.length
    }
    val m0 = meanBest(Similarity.trainCodebook(emb, iters = 0))
    val m1 = meanBest(Similarity.trainCodebook(emb, iters = 1))
    val m3 = meanBest(Similarity.trainCodebook(emb, iters = 3))
    // lloyd monotonicity (slack: assignment argmax runs on 6-dp sims)
    assert(m1 >= m0 - 1e-5 && m3 >= m1 - 1e-5, s"$m0 -> $m1 -> $m3")
    assert(m3 > m0, "training must actually improve on the first-k stand-in")
    // a trained index founds, appends, and probes end-to-end
    val dir = java.nio.file.Files.createTempDirectory("graft_ivftrained").toString
    Similarity.buildStoredIvf(emb, dir, trainIters = 2)
    val res = Similarity.ivfTopKAgainstStoredIndex(spark, dir,
      emb.filter(col("vec_id") < 10))
    assert(res.count() > 0)
  }

  test("length histogram partitions every document into exactly one bucket") {
    val h = graft.operators.TextOps.lengthHistogram(spark, sf).collect()
    val total = h.map(_.getLong(2)).sum
    assert(total == Tables(spark, sf, "documents").count())
    // bucket floors are width-aligned and consistent with the mean
    assert(h.forall(r => r.getLong(1) % 16 == 0))
    assert(h.forall(r => {
      val b = r.getLong(1); val avg = r.getDouble(3)
      avg >= b && avg < b + 16
    }))
  }

  test("epoch mix up-samples deterministically: copy mass matches rates, copies are dense from 1") {
    val m = graft.operators.TextOps.epochMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // deterministic across runs
    val m2 = graft.operators.TextOps.epochMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(m.toSet == m2.toSet)
    // per-doc copies are 1..n with no gaps
    val byDoc = m.groupBy(_._1)
    assert(byDoc.values.forall(cs => cs.map(_._3).sorted.sameElements(1L to cs.length)))
    // a rate-2.5 source yields between 2x and 3x its docs; a rate-0.5
    // source strictly fewer than its docs; rate-1.0 exactly its docs
    val docs = Tables(spark, sf, "documents").groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val copies = m.groupBy(_._2).map { case (s, cs) => s -> cs.length.toLong }
    graft.operators.TextOps.DefaultEpochRates.foreach { case (src, rate) =>
      val n = docs(src); val c = copies.getOrElse(src, 0L)
      if (rate == 1.0) assert(c == n, s"$src identity")
      else if (rate < 1.0) assert(c < n && c > 0, s"$src downsample")
      else assert(c >= math.floor(rate).toLong * n && c <= math.ceil(rate).toLong * n,
        s"$src upsample mass")
    }
  }

  test("unigram LM: every doc scored, logp strictly negative, uniform-corpus bound holds") {
    val lm = graft.operators.TextOps.unigramLm(spark, sf).collect()
    assert(lm.length == Tables(spark, sf, "documents").count())
    // every token's corpus prob < 1 so every mean logp < 0
    assert(lm.forall(_.getDouble(2) < 0.0))
    // n_tokens matches the doc's own token count
    val counts = Tables(spark, sf, "documents")
      .select(col("doc_id"), graft.functions.Text.tokenCount(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lm.forall(r => r.getLong(1) == counts(r.getLong(0))))
    // no doc can beat the best single token's logp
    val vocabMax = math.log(
      Tables(spark, sf, "documents")
        .select(explode(split(col("text"), " ")).as("t"))
        .groupBy("t").count().agg(max("count"), sum("count"))
        .collect().map(r => r.getLong(0).toDouble / r.getLong(1)).head)
    assert(lm.forall(_.getDouble(2) <= vocabMax + 1e-6))
  }

  test("keywords: ranks dense from 1, rank-1 has the doc's max tf, df consistent with vocabulary") {
    val kw = graft.operators.TextOps.keywords(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val byDoc = kw.groupBy(_._1)
    assert(byDoc.size == Tables(spark, sf, "documents").count())
    assert(byDoc.values.forall(rs => rs.map(_._5).sorted.sameElements(1 to rs.length)))
    assert(byDoc.values.forall(rs => rs.length <= 3))
    // rank-1 tf is the max tf among the doc's extracted keywords
    assert(byDoc.values.forall(rs => rs.find(_._5 == 1).get._3 == rs.map(_._3).max))
    // df agrees with an independent count for one spot-checked token
    val (tok, df) = kw.map(r => (r._2, r._4)).head
    val want = Tables(spark, sf, "documents")
      .filter(array_contains(split(col("text"), " "), tok)).count()
    assert(df == want)
  }

  test("stratified sample: exactly min(n, source size) per source, deterministic, ranks dense") {
    val s1 = graft.operators.TextOps.stratifiedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    val s2 = graft.operators.TextOps.stratifiedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(s1.toSet == s2.toSet)
    val sizes = Tables(spark, sf, "documents").groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val bySrc = s1.groupBy(_._2)
    sizes.foreach { case (src, n) =>
      val got = bySrc.getOrElse(src, Array.empty)
      assert(got.length == math.min(12L, n), s"$src quota")
      assert(got.map(_._3).sorted.sameElements(1 to got.length), s"$src dense ranks")
    }
  }

  test("training export composes curate -> epoch mix -> pack consistently") {
    val ex = graft.operators.TextOps.trainingExport(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    graft.operators.PlanCache.release()
    graft.operators.Dedup.releaseBandIndex()
    assert(ex.nonEmpty)
    // (doc, copy) is unique
    assert(ex.map(t => (t._1, t._2)).distinct.length == ex.length)
    // exported docs = exactly the curated survivor set, minus rate-0
    // draws (a rate-0.5 source drops docs), and its copies match the
    // corpus-wide epoch mix restricted to the survivors (same salt)
    val curated = graft.operators.TextOps.curate(spark, sf).collect()
      .map(_.getLong(0)).toSet
    graft.operators.PlanCache.release()
    graft.operators.Dedup.releaseBandIndex()
    assert(ex.map(_._1).toSet.subsetOf(curated))
    val mixAll = graft.operators.TextOps.epochMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .filter(t => curated.contains(t._1)).map(t => (t._1, t._3)).toSet
    assert(ex.map(t => (t._1, t._2)).toSet == mixAll)
    // within each pack group the running sum replays chunk ids and
    // boundary flags exactly
    ex.groupBy(_._5).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(t => (t._1, t._2)).foreach { t =>
        assert(t._6 == cum / 512, s"chunk_id of ${t._1}#${t._2}")
        assert(t._7 == (cum % 512 + t._4 > 512), s"boundary of ${t._1}#${t._2}")
        cum += t._4
      }
    }
  }

  test("salted two-phase top-k equals the one-window top-k exactly") {
    val plain = graft.operators.TextOps.topQualityPerSource(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet
    val salted = graft.operators.TextOps.topQualityPerSourceSalted(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet
    assert(salted == plain && plain.nonEmpty)
    // still holds when buckets exceed source sizes (degenerate salting)
    val wide = graft.operators.TextOps.topQualityPerSourceSalted(spark, sf, buckets = 64)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getInt(3))).toSet
    assert(wide == plain)
  }

  test("quality classifier: logit replays the feature weights; keep is the sign decision") {
    val got = graft.operators.TextOps.qualityClassifier(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(got.length == Tables(spark, sf, "documents").count())
    assert(got.forall { case (_, logit, keep) => keep == (logit > 0) ||
      math.abs(logit) < 0.0001 }) // rounded logit may cross 0 only within rounding
    // both classes occur on the fixture (a one-sided classifier is untestable)
    assert(got.exists(_._3) && got.exists(!_._3))
    // spot-check one document against a hand-computed logit
    val d = Tables(spark, sf, "documents").select("doc_id", "text")
      .filter(col("doc_id") === 0).collect().head
    val toks = d.getString(1).split(" ").toSeq
    val shs = if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
              else Seq(toks.mkString(" "))
    val n = toks.length.toDouble
    val logit = -2.0 + 3.0 * (toks.distinct.length / n) +
      -1.5 * (toks.count(Set("the", "a", "and", "of")) / n) +
      0.8 * math.min(n / 100.0, 1.0) +
      -2.5 * (1.0 - shs.distinct.length.toDouble / shs.length)
    val want = BigDecimal(logit).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got.find(_._1 == 0L).get._2 - want) < 1e-9)
  }

  test("bigram LM: single-token docs score NULL, others average the corpus conditional logp") {
    val lm = graft.operators.TextOps.bigramLm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(lm.length == Tables(spark, sf, "documents").count())
    // n_bigrams = n_tokens - 1 for multi-token docs; 0 and NULL otherwise
    val counts = Tables(spark, sf, "documents")
      .select(col("doc_id"), graft.functions.Text.tokenCount(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lm.foreach { case (id, nb, score) =>
      if (counts(id) >= 2) assert(nb == counts(id) - 1 && score.isDefined, s"doc $id")
      else assert(nb == 0 && score.isEmpty, s"doc $id")
    }
    // conditional probs <= 1 so logp <= 0
    assert(lm.forall(_._3.forall(_ <= 0.0)))
  }

  test("shard manifest append: increments continue each shard's tail without rewriting old rows") {
    val dir = java.nio.file.Files.createTempDirectory("graft_shardman").toString + "/manifest"
    val docs = Tables(spark, sf, "documents").select("doc_id", "n_chars")
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 3 === 0)
    graft.operators.TextOps.appendToShardManifest(spark, dir, a)
    val afterA = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    graft.operators.TextOps.appendToShardManifest(spark, dir, b)
    val all = spark.read.parquet(dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // batch A's rows are byte-identical after the second append
    assert(afterA.toSet.subsetOf(all.toSet))
    assert(all.length == docs.count() && all.map(_._1).distinct.length == all.length)
    val bIds = b.collect().map(_.getLong(0)).toSet
    all.groupBy(_._2).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).sameElements(1L to rows.length), s"shard $shard dense")
      assert(sorted.head._4 == 0L, s"shard $shard origin")
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(y._4 == x._4 + x._5, s"shard $shard chain")
          // append order: a batch-B row never precedes a batch-A row
          assert(!(bIds(x._1) && !bIds(y._1)), s"shard $shard append order")
        case _ =>
      }
    }
  }

  test("shard manifest: positions dense, byte offsets chain exactly, all docs present once") {
    val m = graft.operators.TextOps.shardManifest(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(m.map(_._1).distinct.length == m.length)
    assert(m.length == Tables(spark, sf, "documents").count())
    m.groupBy(_._2).foreach { case (shard, rows) =>
      val sorted = rows.sortBy(_._3)
      assert(sorted.map(_._3).sameElements(1L to rows.length), s"shard $shard dense")
      // first doc starts at byte 0; each next doc starts where the
      // previous one ended
      assert(sorted.head._4 == 0L, s"shard $shard origin")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 == a._4 + a._5, s"shard $shard chain")
        case _ =>
      }
    }
  }

  /** Driver-side distinct 5-shingle sets per doc — the replay oracle for
    * the boilerplate pair of tests. */
  private def docShingleSets(): Map[Long, Set[String]] =
    Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).split(" ")
        val shs = if (toks.length >= 5) toks.sliding(5).map(_.mkString(" ")).toSet
                  else Set(toks.mkString(" "))
        r.getLong(0) -> shs
      }.toMap

  test("boilerplate shingles match a driver-side document-frequency replay") {
    val got = graft.operators.TextOps.boilerplateShingles(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val df = docShingleSets().values.toSeq.flatten.groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    assert(got == df.filter(_._2 >= 2))
    assert(got.nonEmpty, "fixture has cross-document repeated spans")
  }

  test("boilerplate coverage: every doc scored, frac consistent, replay agrees") {
    val sets = docShingleSets()
    val boiler = sets.values.toSeq.flatten.groupBy(identity)
      .filter(_._2.size >= 2).keySet
    val got = graft.operators.TextOps.boilerplateCoverage(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == sets.size, "one row per document")
    got.foreach { case (id, nSh, nB, frac) =>
      assert(nSh == sets(id).size && nB == (sets(id) & boiler).size, s"doc $id")
      assert(math.abs(frac - math.rint(nB.toDouble / nSh * 1e4) / 1e4) < 1e-9)
    }
    assert(got.exists(_._3 > 0) && got.exists(_._3 == 0),
      "fixture covers both boilerplate-hit and clean docs")
  }

  test("chunk dedup finds exactly the cross-document duplicate 32-token spans") {
    val digest = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = digest.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val chunks = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .flatMap { r =>
        val toks = r.getString(1).split(" ")
        toks.grouped(32).map(c => (r.getLong(0), md5hex(c.mkString(" "))))
      }
    val want = chunks.groupBy(_._2).collect {
      case (h, occ) if occ.map(_._1).distinct.length >= 2 =>
        h -> (occ.map(_._1).distinct.length.toLong, occ.length.toLong, occ.map(_._1).min)
    }
    val got = graft.operators.TextOps.chunkDedup(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    assert(got.nonEmpty, "fixture has duplicated spans")
  }

  test("token budget curve: monotone nonincreasing, endpoints pin to full corpus and replay") {
    import graft.operators.TextOps
    val got = TextOps.tokenBudgetCurve(spark, sf).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got.length == 5)
    // threshold 0 keeps everything
    val docs = Tables(spark, sf, "documents")
      .select(graft.functions.Text.qualityScore(col("text")).as("q"),
        graft.functions.Text.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    assert(got.head._2 == docs.length && got.head._3 == docs.map(_._2).sum)
    assert(got.head._4 == 1000000L)
    // curve is monotone nonincreasing in all three measures
    got.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 <= a._2 && b._3 <= a._3 && b._4 <= a._4)
    }
    // each point replays the conditional fold
    got.foreach { case (t, nd, nt, share) =>
      val kept = docs.filter(_._1 >= t)
      assert(nd == kept.length && nt == kept.map(_._2).sum)
      assert(share == nt * 1000000L / docs.map(_._2).sum)
    }
  }

  test("novelty: unique-shingle fractions replay the df census; novelty complements boilerplate") {
    import graft.operators.TextOps
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ")
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet else Set(t)
    }
    val dfm = docs.flatMap(d => shingles(d._2)).groupBy(identity)
      .map { case (s, o) => s -> o.length }
    val want = docs.map { case (id, t) =>
      val shs = shingles(t)
      val uniq = shs.count(dfm(_) == 1).toLong
      id -> (shs.size.toLong, uniq, uniq * 1000000L / shs.size)
    }.toMap
    val got = TextOps.noveltyScores(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    // the corpus spans the range: some docs carry unique content, none
    // is entirely unique (3-shingles over a 31-token vocab collide)
    assert(got.values.exists(_._3 > 0))
  }

  test("zipf fit: slope/intercept replay the integer least-squares, slope negative") {
    import graft.operators.TextOps
    val freqs = Tables(spark, sf, "documents").select("text").collect()
      .flatMap(_.getString(0).split(" ")).groupBy(identity)
      .map { case (t, o) => t -> o.length.toLong }
    val ranked = freqs.toSeq.sortBy { case (t, f) => (-f, t) }.zipWithIndex
      .map { case ((_, f), i) => (i + 1L, f) }
    val pts = ranked.map { case (rank, f) =>
      (math.round(math.log(rank.toDouble) * 1000.0),
        math.round(math.log(f.toDouble) * 1000.0))
    }
    val n = pts.length.toLong
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum; val sxy = pts.map(p => p._1 * p._2).sum
    val slope = (n * sxy - sx * sy) * 1000000L / (n * sxx - sx * sx)
    val intercept = ((sy - slope * sx / 1000000L) / n) * 1000L
    val r = TextOps.zipfFit(spark, sf).head()
    assert(r.getLong(0) == n && r.getLong(1) == slope && r.getLong(2) == intercept)
    assert(slope < 0, "rank-frequency slope must be negative")
  }

  test("cross-source mirrors: rollup replays q25's cross-source pairs, sides oriented by source") {
    import graft.operators.Dedup
    val src = Tables(spark, sf, "documents").select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Dedup.minhashPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val want = pairs.flatMap { case (a, b) =>
      val (sa, sb) = (src(a), src(b))
      if (sa == sb) None
      else if (sa <= sb) Some(((sa, sb), (a, b)))
      else Some(((sb, sa), (b, a)))
    }.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.length.toLong,
        xs.map(_._2._1).distinct.length.toLong, xs.map(_._2._2).distinct.length.toLong)
    }
    val got = Dedup.crossSourceMirrors(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    Dedup.releaseBandIndex()
    graft.operators.PlanCache.release()
    assert(got == want)
    assert(got.nonEmpty, "fixture has cross-source mirror pairs")
    got.keys.foreach { case (x, y) => assert(x < y) }
  }

  test("banding sweep: candidate volume tracks band count, default config consistent with q25") {
    import graft.operators.Dedup
    val got = Dedup.bandingSweep(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    graft.operators.PlanCache.release()
    assert(got.keySet == Set((8L, 4L), (16L, 2L), (32L, 1L)))
    // fewer rows per band = looser buckets = monotonically more candidates
    assert(got((8L, 4L))._1 <= got((16L, 2L))._1 &&
      got((16L, 2L))._1 <= got((32L, 1L))._1)
    // precision/recall replay their counts; recall vs the union truth
    got.foreach { case (cfg, (nc, nf, nt, p, rcl)) =>
      assert(nf <= nc && nf <= nt, s"$cfg")
      assert(p == nf * 1000000L / nc && rcl == nf * 1000000L / nt, s"$cfg")
    }
    // the default 16×2 config finds exactly minhashPairs' pair count
    val q25 = Dedup.minhashPairs(spark, sf).count()
    Dedup.releaseBandIndex()
    assert(got((16L, 2L))._2 == q25)
  }

  test("banding sweep: zero candidates / empty truth report NULL cells, not a crash") {
    import graft.operators.Dedup
    // two documents with disjoint shingle sets: no config buckets them
    // together, so every row has n_candidates = 0 and the union truth
    // set is empty — precision and recall are undefined there
    val dir = java.nio.file.Files.createTempDirectory("graft_sweep0").toString
    spark.createDataFrame(Seq(
        (1L, "alpha beta gamma delta epsilon zeta"),
        (2L, "one two three four five six")))
      .toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val rows = Dedup.bandingSweep(spark, dir).collect()
    Dedup.releaseBandIndex()
    graft.operators.PlanCache.release()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L)
      assert(r.isNullAt(5) && r.isNullAt(6))
    }
  }

  test("weighted WOR sample: exact k, keys replay A-ES, sample is the exact global top-k") {
    import graft.operators.TextOps
    val got = TextOps.weightedSampleTopK(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(3), r.getLong(4)))
    assert(got.map(_._1).sorted.toSeq == (1 to 100))
    assert(got.map(_._2).distinct.length == 100, "without replacement: distinct docs")
    // key replay: ln(u)/w from the salted md5 uniform
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    got.foreach { case (_, id, w, keyMicro) =>
      val u = (h60(s"wrs-$id") % 9007199254740992L + 1.0) / 9007199254740992.0
      val key6 = BigDecimal(math.log(u) / w)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(keyMicro == math.round(key6 * 1000000.0), s"doc $id")
    }
    // the sample IS the global top-100 by key: full driver-side
    // ranking replay over every document (weights from the engine's
    // own quality scores to avoid re-deriving the formula here)
    val allKeys = Tables(spark, sf, "documents")
      .select(col("doc_id"), graft.functions.Text.qualityScore(col("text")).as("q"))
      .collect().map { r =>
        val id = r.getLong(0)
        val w = math.max(r.getDouble(1), 0.0001)
        val u = (h60(s"wrs-$id") % 9007199254740992L + 1.0) / 9007199254740992.0
        val key6 = BigDecimal(math.log(u) / w)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (id, key6)
      }
    val wantIds = allKeys.sortBy { case (id, k2) => (-k2, id) }.take(100).map(_._1).toSeq
    assert(got.sortBy(_._1).map(_._2).toSeq == wantIds)
  }

  test("dedup savings: token mass replays the rewrite, savings bounded by [0, 1e6]") {
    import graft.operators.TextOps
    val rewrite = TextOps.chunkRewrite(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    val docs = Tables(spark, sf, "documents").select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val want = docs.groupBy(_._2).map { case (src, ds) =>
      val raw = ds.map(_._3.split(" ").length.toLong).sum
      val kept = ds.map { d =>
        val c = rewrite(d._1); if (c.isEmpty) 0L else c.split(" ").length.toLong
      }.sum
      src -> (ds.length.toLong, raw, kept, (raw - kept) * 1000000L / raw)
    }
    val got = TextOps.dedupSavingsBySource(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == want)
    got.values.foreach { case (_, raw, kept, s) =>
      assert(kept <= raw && s >= 0L && s <= 1000000L)
    }
    assert(got.values.exists(_._4 > 0), "fixture has cross-doc dup spans to save")
  }

  test("classifier lift: deciles balanced, capture ends at 1e6, rates replay the rank fold") {
    import graft.operators.TextOps
    val got = TextOps.classifierLift(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == (1L to 10L))
    val n = got.map(_._2).sum
    val p = got.map(_._3).sum
    // ntile balance and terminal capture
    assert(got.map(_._2).max - got.map(_._2).min <= 1)
    assert(got.last._6 == 1000000L)
    // rates/lift replay; capture runs the positive mass
    var cum = 0L
    got.foreach { case (_, nd, np, rate, lift, cap) =>
      cum += np
      assert(rate == np * 1000000L / nd)
      assert(lift == np * n * 1000000L / (nd * p))
      assert(cap == cum * 1000000L / p)
    }
    // the ranking works at all: decile 1 is at least as rich as decile 10
    assert(got.head._4 >= got.last._4)
  }

  test("langid eval: confusion partitions the corpus, metrics replay the counts") {
    import graft.operators.TextOps
    val r = TextOps.langIdEval(spark, sf).head()
    val (tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val total = Tables(spark, sf, "documents").count()
    assert(tp + fp + fn + tn == total)
    assert(r.getLong(4) == tp * 1000000L / (tp + fp))
    assert(r.getLong(5) == tp * 1000000L / (tp + fn))
    assert(r.getLong(6) == 2 * tp * 1000000L / (2 * tp + fp + fn))
    // replay the confusion against q22's rollup
    val roll = TextOps.langIdRollup(spark, sf).collect()
      .map(r2 => ((r2.getString(0), r2.getString(1)), r2.getLong(2))).toMap
    def cell(isEn: Boolean, predEn: Boolean) = roll.collect {
      case ((lang, guess), c)
        if (lang == "en") == isEn && (guess == "en") == predEn => c
    }.sum
    assert(tp == cell(true, true) && fp == cell(false, true) &&
      fn == cell(true, false) && tn == cell(false, false))
  }

  test("source divergence: KL replays driver-side, truncating division on both signs") {
    import graft.operators.TextOps
    val toks = Tables(spark, sf, "documents").select("source", "text").collect()
      .flatMap(r => r.getString(1).split(" ").map(t => (r.getString(0), t)))
    val corpus = toks.groupBy(_._2).map { case (t, os) => t -> os.length.toLong }
    val total = corpus.values.sum
    val want = toks.groupBy(_._1).map { case (src, os) =>
      val st = os.groupBy(_._2).map { case (t, o) => t -> o.length.toLong }
      val nS = st.values.sum
      val w = st.map { case (t, nSt) =>
        val lr = math.round(math.log(
          (nSt.toDouble * total) / (nS.toDouble * corpus(t))) * 1000000.0)
        nSt * lr
      }.sum
      src -> (nS, st.size.toLong, w / nS)
    }
    val got = TextOps.sourceTokenDivergence(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got == want)
    // KL is (numerically) non-negative-ish and nonzero somewhere: the
    // sources genuinely differ in distribution
    assert(got.values.exists(_._3 > 0))
    got.values.foreach { case (_, _, kl) => assert(kl >= -1, s"KL cannot be negative: $kl") }
  }

  test("containment catches a quote the symmetric band join misses; corpus replay agrees") {
    import graft.operators.Dedup
    // synthetic: doc 2 is a 16-token quote from the middle of doc 1 —
    // symmetric shingle-jaccard ~0.24 (far below the 0.8 near-dup bar)
    // but containment(2 in 1) = 1.0
    val big = (1 to 60).map(i => s"tok$i").mkString(" ")
    val quote = (10 to 25).map(i => s"tok$i").mkString(" ")
    val other = (100 to 140).map(i => s"zz$i").mkString(" ")
    val tmp: String = java.nio.file.Files.createTempDirectory("containment").toString
    locally { import spark.implicits._
      Seq((1L, big, "en", "s", big.length.toLong),
          (2L, quote, "en", "s", quote.length.toLong),
          (3L, other, "en", "s", other.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.parquet(s"$tmp/documents.parquet") }
    try {
      val cont = Dedup.containmentPairs(spark, tmp).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
      assert(cont.exists { case (a, b, c) => a == 1L && b == 2L && c == 1000000L },
        s"quote pair not flagged: $cont")
      assert(!cont.exists(p => p._1 == 3L || p._2 == 3L))
      val sym = Dedup.minhashPairs(spark, tmp).collect()
      assert(!sym.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
        "fixture is symmetric-visible; the containment case needs low jaccard")
    } finally Dedup.releaseBandIndex()
    // corpus run: every reported pair's containment replays exactly
    val got = Dedup.containmentPairs(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.nonEmpty)
    def shingleHashes(t: String): Set[Long] = {
      val toks = t.split(" ")
      val shs = if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet else Set(t)
      shs.map { s =>
        val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16) %
          graft.operators.Dedup.P
      }
    }
    val sets = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> shingleHashes(r.getString(1))).toMap
    got.foreach { case ((a, b), (na, nb, c)) =>
      assert(na == sets(a).size && nb == sets(b).size)
      val want = (sets(a) & sets(b)).size.toLong * 1000000L / math.min(na, nb)
      assert(c == want && c >= 900000L)
    }
  }

  test("persisted postings: two appends, both-direction probe finds the batch-touching containments") {
    import graft.operators.Dedup
    val indexDir = java.nio.file.Files.createTempDirectory("graft_postings").toString
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    Dedup.appendToStoredIndex(corpus, indexDir) // hashed (verify side)
    Dedup.appendToPostingsStore(corpus, indexDir)
    Dedup.appendToStoredIndex(batch, indexDir)
    Dedup.appendToPostingsStore(batch, indexDir)
    val got = Dedup.containmentAgainstStoredIndex(spark, indexDir, batch)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    val batchIds = batch.collect().map(_.getLong(0)).toSet
    val full = Dedup.containmentPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    val wantTouching = full.filter(p => batchIds(p._1) || batchIds(p._2))
    graft.operators.PlanCache.release()
    Dedup.releaseBandIndex()
    // exactness here: append-time ranks coincide with final ranks on
    // this fixture (rank drift would degrade recall, never precision)
    assert(got == wantTouching, s"got ${got.size} vs want ${wantTouching.size}")
    assert(wantTouching.nonEmpty)
    // no corpus↔corpus pair leaks into a batch probe
    got.foreach { case (a, b, _) => assert(batchIds(a) || batchIds(b)) }
  }

  test("cluster quality dispersion: ranges consistent with the survivor report, gap nonneg") {
    import graft.operators.Dedup
    val got = Dedup.clusterQualityDispersion(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val survivors = Dedup.qualityAwareSurvivors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    Dedup.releaseBandIndex()
    graft.operators.PlanCache.release()
    assert(got.nonEmpty)
    // same cluster membership mass; per-cluster extremes match q144's quality
    val byCluster = survivors.groupBy(_._2)
    assert(got.keySet == byCluster.keySet)
    got.foreach { case (cid, (n, q4max, q4min, spread, gap)) =>
      val ms = byCluster(cid)
      assert(n == ms.length.toLong)
      def q4(d: Double) = math.round(d * 10000)
      assert(q4max == ms.map(m => q4(m._3)).max && q4min == ms.map(m => q4(m._3)).min)
      assert(spread == (q4max - q4min) * 100 && spread >= 0)
      // the survivor's quality IS the max → gap vs canonical is ≥ 0
      assert(gap >= 0 && gap <= spread)
      val survivorQ = q4(ms.find(_._4).get._3)
      assert(survivorQ == q4max)
    }
    // the corpus motivates q144 somewhere: at least one cluster has a
    // positive canonical gap (min-id is NOT the best member)
    assert(got.values.exists(_._5 > 0), "no cluster where quality-aware choice differs")
  }

  test("quality survivors: one per cluster, max quality wins, ties fall back to min id") {
    import graft.operators.Dedup
    val rows = Dedup.qualityAwareSurvivors(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, ms) =>
      val survivors = ms.filter(_._4)
      assert(survivors.length == 1, s"cluster $cid has ${survivors.length} survivors")
      val want = ms.minBy(m => (-m._3, m._1))
      assert(survivors.head._1 == want._1,
        s"cluster $cid survivor ${survivors.head._1} != best-quality member ${want._1}")
    }
    // same membership as the canonical closure
    val canon = Dedup.dedupClusters(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(rows.map(r => r._1 -> r._2).toSet == canon)
  }

  test("chunk rewrite is idempotent: rewriting the rewritten corpus removes nothing") {
    import graft.operators.TextOps
    // write the cleaned corpus as a documents table and rewrite again
    val first = TextOps.chunkRewrite(spark, sf)
      .select(col("doc_id"), col("clean_text").as("text"))
      .filter(col("text") =!= "")
    val tmp: String = java.nio.file.Files.createTempDirectory("rewrite_fix").toString
    first.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$tmp/documents.parquet")
    val second = TextOps.chunkRewrite(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    // fixpoint: every surviving chunk was already corpus-unique or
    // canonical-owned, so the second pass keeps all of them.
    // CAVEAT this spec would catch: reassembly glues chunk boundaries
    // with single spaces, so a SHIFTED re-chunking could fabricate new
    // duplicates — it must not.
    second.foreach { case (id, (n, kept, _)) =>
      assert(kept == n, s"doc $id lost chunks on the second rewrite ($kept of $n)")
    }
    val firstTexts = first.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    second.foreach { case (id, (_, _, text)) =>
      assert(text == firstTexts(id), s"doc $id text changed on the second rewrite")
    }
  }

  test("minhash calibration replays the estimator-vs-exact report driver-side") {
    import graft.operators.Dedup
    // per-doc shingle sets and signatures, pure Scala
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def shingles(t: String): Set[String] = {
      val toks = t.split(" ")
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet else Set(t)
    }
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      val hex = d.take(8).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16) % Dedup.P
    }
    val sets = docs.map { case (id, t) => id -> shingles(t).map(h60) }.toMap
    val sigs = sets.collect { case (id, hs) if hs.nonEmpty =>
      id -> Dedup.perms.map { case (a, b) =>
        hs.map(x => java.lang.Math.floorMod(a * x + b, Dedup.P)).min }.toIndexedSeq
    }
    val ids = sigs.keys.toSeq.sorted
    val cand = for {
      i <- ids; j <- ids if i < j
      si = sigs(i); sj = sigs(j)
      if (0 until Dedup.NumBands).exists(bd =>
        (0 until Dedup.BandRows).forall(r => si(bd * 2 + r) == sj(bd * 2 + r)))
    } yield (i, j)
    val per = cand.map { case (a, b) =>
      val est = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toLong * 31250L
      val inter = (sets(a) & sets(b)).size.toLong
      val exact = inter * 1000000L / (sets(a) | sets(b)).size
      (math.min(9L, exact / 100000L), est, exact)
    }
    val want = per.groupBy(_._1).map { case (d, rows) =>
      d -> (rows.length.toLong,
        rows.map(_._2).sum / rows.length, rows.map(_._3).sum / rows.length,
        rows.map(r => math.abs(r._2 - r._3)).sum / rows.length)
    }
    val got = Dedup.minhashCalibration(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got == want)
    assert(got.nonEmpty, "fixture produces banded candidates")
    // the sketch must track truth closely where near-dups actually live
    got.get(9L).foreach { case (_, est, exact, err) =>
      assert(math.abs(est - exact) <= 50000 && err <= 100000)
    }
  }

  test("chunk rewrite: canonical docs keep full text, each dup span survives once, replay agrees") {
    val digest = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String) = digest.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val docs = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val occ = docs.toSeq.flatMap { case (id, text) =>
      text.split(" ").grouped(32).zipWithIndex.map { case (c, pos) =>
        (id, pos, md5hex(c.mkString(" ")), c.mkString(" "))
      }
    }
    val firstDoc = occ.groupBy(_._3).collect {
      case (h, os) if os.map(_._1).distinct.length >= 2 => h -> os.map(_._1).min
    }
    val want = docs.keys.map { id =>
      val mine = occ.filter(_._1 == id).sortBy(_._2)
      val kept = mine.filter(o => firstDoc.get(o._3).forall(_ == id))
      id -> (mine.length.toLong, kept.length.toLong, kept.map(_._4).mkString(" "))
    }.toMap
    val got = graft.operators.TextOps.chunkRewrite(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got == want)
    // the rewrite actually removed something, and canonical owners of
    // every dup span kept their complete text
    assert(got.exists { case (_, (n, k, _)) => k < n }, "fixture has cross-doc dup spans")
    val owners = firstDoc.values.toSet
    owners.foreach { id => assert(got(id)._3 == docs(id)) }
    // corpus-wide: every duplicated hash survives in exactly one doc
    val survivingByHash = occ.filter(o => firstDoc.contains(o._3))
      .filter(o => firstDoc(o._3) == o._1).groupBy(_._3).map(_._2.map(_._1).distinct.length)
    assert(survivingByHash.forall(_ == 1))
  }

  test("language temperature mix: minority languages keep a larger fraction, draw is deterministic") {
    val rows = graft.operators.TextOps.langTemperatureMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val langSizes = Tables(spark, sf, "documents").groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // replay the integer rate math
    val w = langSizes.view.mapValues(n => math.floor(math.sqrt(n.toDouble) * 1000).toLong).toMap
    val (nTot, wTot) = (langSizes.values.sum, w.values.sum)
    val rate = langSizes.map { case (l, n) =>
      l -> math.min(10000L, (nTot / 2) * w(l) * 10000 / (wTot * n)) }
    rows.foreach { case (_, l, bp, rBp) =>
      assert(rBp == rate(l), s"lang $l rate"); assert(bp < rBp)
    }
    // temperature flattening: smaller language => keep rate at least as large
    val bySize = langSizes.toSeq.sortBy(_._2)
    bySize.sliding(2).foreach { case Seq((l1, _), (l2, _)) =>
      assert(rate(l1) >= rate(l2), s"$l1 vs $l2")
      case _ =>
    }
    // deterministic: a second run returns the identical set
    val again = graft.operators.TextOps.langTemperatureMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSet == again.toSet && rows.nonEmpty)
  }

  test("importance score separates the target slice: high-quality docs score higher on average") {
    val scores = graft.operators.TextOps.importanceScores(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val quality = Tables(spark, sf, "documents")
      .select(col("doc_id"), Text.qualityScore(col("text")).as("q")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.length == quality.size, "every doc scored")
    val (hi, lo) = scores.partition { case (id, _, _) => quality(id) >= 0.66 }
    def mean(xs: Seq[Double]) = xs.sum / xs.size
    assert(hi.nonEmpty && lo.nonEmpty, "both slices populated")
    assert(mean(hi.map(_._3)) > mean(lo.map(_._3)),
      "target-slice docs must score higher under the target-vs-corpus LM ratio")
    // n_tokens is the doc's occurrence count (every token scored)
    val nTok = Tables(spark, sf, "documents")
      .select(col("doc_id"), size(Text.tokens(col("text"))).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    scores.foreach { case (id, n, _) => assert(n == nTok(id), s"doc $id") }
  }

  test("pii scrub redacts injected emails/ips/phones; the shipped corpus passes through") {
    val fixture = Seq(
      (1L, "contact alice.smith+spam@example.co.uk or bob@test.io thanks"),
      (2L, "server at 192.168.1.100 and 10.0.0.1 responded"),
      (3L, "call +1 415 555 0199 now"),
      (4L, "mixed: x@y.com from 8.8.8.8 phoned 555 123 4567"),
      (5L, "plain text no pii at all")).toDF("doc_id", "text")
    val got = graft.operators.TextOps.scrubPiiOf(fixture).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((2L, 0L, 0L, "contact <EMAIL> or <EMAIL> thanks")))
    assert(got(2L) == ((0L, 2L, 0L, "server at <IP> and <IP> responded")))
    assert(got(3L) == ((0L, 0L, 1L, "call <PHONE> now")))
    // sequential application: the phone pass runs on already-redacted
    // text, so the email's and IP's digits can't feed a phone match
    assert(got(4L) == ((1L, 1L, 1L, "mixed: <EMAIL> from <IP> phoned <PHONE>")))
    assert(got(5L) == ((0L, 0L, 0L, "plain text no pii at all")))
    // the synthetic corpus carries no PII: counts all zero, text intact
    val corpus = graft.operators.TextOps.scrubPii(spark, sf).collect()
    val original = Tables(spark, sf, "documents").select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(corpus.length == original.size)
    corpus.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L)
      assert(r.getString(4) == original(r.getLong(0)))
    }
  }

  test("packed chunks collapse the pack assignment: membership, mass, and order agree") {
    val assign = graft.operators.TextOps.packSequences(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val got = graft.operators.TextOps.packedChunks(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val expected = assign.groupBy(a => (a._2, a._4)).map { case (k, docs) =>
      val ordered = docs.sortBy(_._1)
      k -> ((docs.length.toLong, docs.map(_._3).sum,
        ordered.map(_._1).mkString("-")))
    }
    assert(got == expected)
    // chunks are real sequences: at least one holds multiple documents
    assert(got.valuesIterator.exists(_._1 > 1L))
    // every document appears in exactly one chunk
    assert(got.valuesIterator.map(_._1).sum == assign.length.toLong)
  }

  test("semDedup: greedy lowest-id-survives within coarse cells, replayed exactly") {
    val got = Similarity.semDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    graft.operators.PlanCache.release()
    // driver replay with the operator's exact rounding contract
    val emb = Tables(spark, sf, "embeddings").select("vec_id", "embedding")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def dot6(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val cents = emb.filter(_._1 < 16)
    val cell = emb.map { case (id, v) =>
      id -> cents.map { case (cid, cv) => (dot6(cv, v), -cid) }.max._2.unary_-
    }.toMap
    val byCell = emb.groupBy(e => cell(e._1))
    val dropped = emb.collect { case (id, v)
        if byCell(cell(id)).exists { case (o, ov) => o < id && dot6(ov, v) >= 0.35 } => id
    }.toSet
    assert(got.size == emb.length)
    assert(got.forall { case (id, (c, kept)) => c == cell(id) && kept == !dropped(id) })
    // the threshold bites on the fixture: both faces non-trivial
    assert(dropped.nonEmpty && dropped.size < emb.length)
  }

}
