package graft

import graft.operators.TextOps

/** The in-engine quality-classifier training (q245) actually LEARNS:
  * the trained weights must beat q71's literal weights on held-out
  * ROC-AUC — the lifecycle claim (train in-engine, eval through the
  * q209 machinery) verified end to end, not just the arithmetic. */
class TrainedClassifierSpec extends SparkSpec {

  /** Midrank Mann–Whitney AUC over (score, label∈{0,1}) — the q209
    * formula, folded locally (held-out splits here are spec-sized). */
  private def auc(scored: Seq[(Double, Long)]): Double = {
    val byScore = scored.groupBy(_._1).toSeq.sortBy(_._1)
    var cum = 0L; var r1x2 = 0.0; var nPos = 0L; var tot = 0L
    byScore.foreach { case (_, grp) =>
      val cnt = grp.size
      val np = grp.map(_._2).sum
      r1x2 += np * (2.0 * cum + cnt + 1)
      cum += cnt; nPos += np; tot += cnt
    }
    val nNeg = tot - nPos
    assert(nPos > 0 && nNeg > 0, "held-out split lost a class")
    (r1x2 - nPos.toDouble * (nPos + 1)) / (2.0 * nPos * nNeg)
  }

  test("trained weights beat the literal classifier on held-out AUC") {
    val w = TextOps.trainQualityWeights(spark, sf)
    val held = TextOps.qualityFeatureFrame(spark, sf, heldout = true)
      .selectExpr(s"(${TextOps.microLogitExpr(w.toIndexedSeq)}) AS s",
        "CAST(f1 AS DOUBLE) AS f1", "CAST(f2 AS DOUBLE) AS f2",
        "CAST(f3 AS DOUBLE) AS f3", "CAST(f4 AS DOUBLE) AS f4", "y")
      .collect()
    val trained = held.toSeq.map(r => (r.getLong(0).toDouble, r.getLong(5)))
    // the literal q71 weights replayed over the SAME held-out docs
    val literal = held.toSeq.map { r =>
      val s = -2.0 + 3.0 * (r.getDouble(1) / 1e6) +
        -1.5 * (r.getDouble(2) / 1e6) + 0.8 * (r.getDouble(3) / 1e6) +
        -2.5 * (r.getDouble(4) / 1e6)
      (s, r.getLong(5))
    }
    val (aTrained, aLiteral) = (auc(trained), auc(literal))
    graft.operators.PlanCache.release()
    assert(aTrained > aLiteral + 0.02,
      s"training did not beat the literal weights: $aTrained vs $aLiteral")
  }

  test("the training loop is deterministic: a re-run lands on identical weights") {
    val w1 = TextOps.trainQualityWeights(spark, sf, iters = 3, lr = 16L)
    graft.operators.PlanCache.release()
    val w2 = TextOps.trainQualityWeights(spark, sf, iters = 3, lr = 16L)
    graft.operators.PlanCache.release()
    assert(w1 == w2)
  }
}
