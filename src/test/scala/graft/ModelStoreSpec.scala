package graft

import java.nio.file.Files

import graft.engine.GraftEngine
import graft.operators.{Atomic, ModelStore, TextOps}

/** The promote-if-better retrain lifecycle over the versioned model
  * registry: founding promotes, an unchanged corpus holds (hysteresis
  * — the candidate retrains to the incumbent's exact weights), a
  * beatable incumbent is replaced, and the serving face scores with
  * the LIVE version only. */
class ModelStoreSpec extends SparkSpec {

  private def retrain(storeDir: String, minGain: Long = 5000L) =
    GraftEngine.runModelRetrain(spark,
      graft.model.RetrainSpec(id = 1, sourceDir = sf, storeDir = storeDir,
        minGainMicro = minGain))

  test("founding retrain promotes; an unchanged corpus holds the incumbent") {
    val storeDir = Files.createTempDirectory("graft_model").toString
    assert(ModelStore.liveModel(spark, storeDir).isEmpty)
    intercept[IllegalStateException] {
      ModelStore.scoreWithLiveModel(spark, sf, storeDir)
    }
    val r1 = retrain(storeDir)
    graft.operators.PlanCache.release()
    assert(r1.promoted && r1.incumbentAucMicro.isEmpty)
    val Some((w1, auc1)) = ModelStore.liveModel(spark, storeDir)
    assert(auc1 == r1.candidateAucMicro)
    assert(w1 == TextOps.trainQualityWeights(spark, sf))
    graft.operators.PlanCache.release()
    val live1 = Atomic.resolve(spark, storeDir, "model")
    // same corpus → the deterministic trainer reproduces the incumbent
    // exactly; equal AUCs cannot clear the hysteresis gain
    val r2 = retrain(storeDir)
    graft.operators.PlanCache.release()
    assert(!r2.promoted)
    assert(r2.candidateAucMicro == auc1 && r2.incumbentAucMicro.contains(auc1))
    assert(Atomic.resolve(spark, storeDir, "model") == live1,
      "a held retrain must not publish a new version")
  }

  test("a beatable incumbent is replaced, atomically versioned, and served") {
    val storeDir = Files.createTempDirectory("graft_model").toString
    // an adversarial incumbent: the literal-classifier signs flipped
    ModelStore.publishModel(spark, storeDir,
      Seq(2000000L, -3000000L, 1500000L, -800000L, 2500000L), 0L)
    val v0 = Atomic.resolve(spark, storeDir, "model")
    val r = retrain(storeDir)
    graft.operators.PlanCache.release()
    assert(r.promoted, s"trained weights must beat the inverted incumbent: $r")
    assert(r.incumbentAucMicro.exists(i =>
      r.candidateAucMicro >= i + 5000L))
    val v1 = Atomic.resolve(spark, storeDir, "model")
    assert(v1 != v0, "promotion must land a NEW committed version")
    // the serving face scores the whole corpus with the live weights
    val Some((w, _)) = ModelStore.liveModel(spark, storeDir)
    val scored = ModelStore.scoreWithLiveModel(spark, sf, storeDir)
    val nDocs = Tables(spark, sf, "documents").count()
    assert(scored.count() == nDocs)
    val byLogit = scored.collect()
    assert(byLogit.forall(r => !r.isNullAt(1) && (r.getLong(1) >= 0L) == r.getBoolean(2)))
    // spot-check one doc's logit against a local replay of the grid
    val one = TextOps.qualityFeatures(spark, sf, split = None)
      .orderBy("doc_id").limit(1)
      .selectExpr("doc_id", "f1", "f2", "f3", "f4").head()
    val z = {
      val dot = BigInt(w(1)) * one.getLong(1) + BigInt(w(2)) * one.getLong(2) +
        BigInt(w(3)) * one.getLong(3) + BigInt(w(4)) * one.getLong(4)
      w(0) + ((dot + BigInt("1000000000000000000")) / 1000000 -
        BigInt("1000000000000")).toLong
    }
    graft.operators.PlanCache.release()
    val got = byLogit.find(_.getLong(0) == one.getLong(0)).get.getLong(1)
    assert(got == z, s"serving logit $got != local grid replay $z")
  }
}
