package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Sketch behavior that the oracle replay can't judge: estimation
  * error against the HLL error bound, and the Bloom filter's
  * no-false-negative guarantee. */
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
}
