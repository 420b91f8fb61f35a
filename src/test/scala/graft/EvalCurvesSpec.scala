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
