package graft

import graft.operators.{Graph, TextOps}

/** Structural invariants of the round's curve readouts (their
  * cross-engine exactness is oracle-pinned by q288/q289; these pin the
  * semantics a green hash can't express by itself). */
class EvalCurvesSpec extends SparkSpec {

  test("pr curve: confusion identities hold at every threshold; the tail row is total recall") {
    val rows = TextOps.prCurve(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val pTotal = rows.head._2 + rows.head._4 // tp + fn is constant
    rows.foreach { case (_, tp, fp, fn, prec, rec, ap) =>
      assert(tp + fn == pTotal)
      assert(tp >= 0 && fp >= 0 && fn >= 0)
      assert(prec >= 0 && prec <= 1000000L)
      assert(rec >= 0 && rec <= 1000000L)
      assert(ap >= 0 && ap <= 1000000L)
    }
    // thresholds walk downward; tp and recall are non-decreasing
    assert(rows.map(_._1).toSeq == rows.map(_._1).sortBy(-_).toSeq)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    // the lowest threshold admits everything: full recall
    assert(rows.last._6 == 1000000L && rows.last._4 == 0L)
  }

  test("brier decomposition: identity holds within the floored-mean grid bias") {
    val r = TextOps.brierDecomposition(spark, sf).collect()(0)
    val (n, brier, rel, res, unc, resid) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
    assert(n > 0)
    // every term lives on the e8 probability² grid
    Seq(brier, rel, res, unc).foreach(v => assert(v >= 0 && v <= 100000000L))
    assert(resid == brier - (rel - res + unc))
    // the floored bin means bias each mean by < 1 tick; the identity's
    // residual is bounded by a few ticks of slack per term (10⁻⁴ grid →
    // cross terms ≤ ~3·10⁴ on the e8 grid, far under any real signal)
    assert(math.abs(resid) <= 100000L, s"grid residual $resid out of bound")
    // resolution can never exceed uncertainty (Murphy's inequality)
    assert(res <= unc)
  }

  test("edge embeddedness: census conserves edges and matches the truss support view") {
    val rows = Graph.edgeEmbeddedness(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // bridges flagged exactly at support 0; histogram shares sum to ~1
    rows.foreach { case (s, n, share, bridge) =>
      assert(bridge == (s == 0) && n > 0 && share >= 0)
    }
    // edge conservation: census total equals the undirected edge count
    val total = rows.map(_._2).sum
    val edges = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey")
    import org.apache.spark.sql.functions._
    val nEdges = edges.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("s"))
      .select(explode(expr(
        "flatten(transform(sort_array(s), (x, i) -> " +
          "transform(slice(sort_array(s), i + 2, size(s)), y -> struct(x, y))))"))
        .as("p"))
      .distinct().count()
    assert(total == nEdges)
  }

  test("simpson diversity: BigInt count-fold replay") {
    import org.apache.spark.sql.functions._
    val got = TextOps.simpsonDiversity(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val toks = Tables(spark, sf, "documents")
      .select(col("source"),
        explode(graft.functions.Text.tokens(col("text"))).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val want = toks.groupBy(_._1).map { case (src, ts) =>
      val counts = ts.groupBy(_._2).map(_._2.length.toLong)
      val n = BigInt(counts.sum)
      val coll = counts.map(c => BigInt(c) * (c - 1)).sum
      val sq = counts.map(c => BigInt(c) * c).sum
      (src, counts.size.toLong, n.toLong,
        (BigInt(1000000) - coll * 1000000 / (n * (n - 1)).max(1)).toLong,
        (n * n / sq.max(1)).toLong)
    }.toSet
    assert(got == want)
  }

  test("degree histogram: bucket boundaries, node conservation, ccdf anchors") {
    val rows = Graph.degreeHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (b, lo, n, ccdf) =>
      assert(lo == (1L << b.toInt))
      assert(n > 0 && ccdf >= 0 && ccdf <= 1000000L)
    }
    // the lowest bucket's CCDF covers every node (deg ≥ 1 ≥ 2^0 when
    // the min bucket is 0; in general deg ≥ its own bucket boundary)
    assert(rows.head._4 == 1000000L)
    // node conservation against a direct distinct count
    val total = Graph.degreeHistogram(spark, sf).collect().map(_.getLong(2)).sum
    val nodes = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_partkey").distinct()
    assert(total > 0 && total <= nodes.count())
  }
}
