package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Guards for the whole-operator top-k fusion ([[graft.plans.TopKRewrite]] /
  * [[graft.plans.TopKPerGroupExec]]): the row_number-≤-k idiom must plan the
  * bounded-heap exec (no partition-wide sort), produce results identical to
  * the window form, and leave every non-matching window shape on the stock
  * plan. */
class TopKFusionSpec extends SparkSpec {
  import spark.implicits._

  // deterministic, tie-free order (md5-derived v, id tiebreak), plus a null
  // group key and a null order value — both legal for row_number
  private def mkInput() = {
    val rows = (1 to 500).map { i =>
      val g = if (i % 97 == 0) null else s"g${i % 7}"
      val v: java.lang.Double = if (i % 53 == 0) null
        else java.lang.Double.valueOf((i * 2654435761L % 1000).toDouble)
      (g, v, i)
    }
    rows.toDF("g", "v", "id").repartition(5)
  }

  private def fused(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"v".desc_nulls_last, $"id".asc)
    df.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
  }

  /** The window form's answer computed in plain Scala (the session's own
    * window form would be fused too, so it can't serve as the oracle). */
  private def oracle(df: org.apache.spark.sql.DataFrame, k: Int): Set[(String, Option[Double], Int, Int)] =
    df.collect()
      .map(r => (Option(r.getString(0)), if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getInt(2)))
      .groupBy(_._1)
      .flatMap { case (g, rows) =>
        rows.toSeq.sortBy { case (_, v, id) => (v.isEmpty, -v.getOrElse(0.0), id) }
          .take(k).zipWithIndex
          .map { case ((_, v, id), i) => (g.orNull, v, id, i + 1) }
      }.toSet

  test("row_number ≤ k fuses: TopKPerGroup plans, Window and Sort are gone") {
    val p = fused(mkInput(), 3).queryExecution.executedPlan.toString
    assert(p.contains("TopKPerGroup"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Sort "), p)
    // still exactly the one clustering exchange the window form needs
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
  }

  test("fused results — rows AND ranks — match the window semantics exactly") {
    val df = mkInput()
    for (k <- Seq(1, 3, 1000)) { // k=1000 > every group: keep-all path
      val got = fused(df, k).collect()
        .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          r.getInt(2), r.getInt(3))).toSet
      assert(got == oracle(df, k), s"k=$k")
    }
  }

  test("rank = 1 (latest-per-key idiom) fuses and keeps one row per group") {
    val df = mkInput()
    val w = Window.partitionBy($"g").orderBy($"id".desc)
    val latest = df.withColumn("rn", row_number().over(w)).filter($"rn" === 1)
    assert(latest.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    val got = latest.select("g", "id").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSet
    val want = df.collect().map(r => (r.getString(0), r.getInt(2)))
      .groupBy(_._1).map { case (g, rs) => (g, rs.map(_._2).max) }.toSet
    assert(got == want)
  }

  test("non-matching shapes keep the stock window plan") {
    val df = mkInput()
    val w = Window.partitionBy($"g").orderBy($"v".desc)
    // rank() is not row_number: ties share ranks, a heap can't replay it
    val rk = df.withColumn("r", rank().over(w)).filter($"r" <= 3)
    assert(!rk.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    // lower bound selects the TAIL — not a top-k
    val tail = df.withColumn("rn", row_number().over(w)).filter($"rn" >= 2)
    assert(!tail.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    // unbounded rank consumption (no filter) must keep the window
    val all = df.withColumn("rn", row_number().over(w))
    assert(!all.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
  }

  test("heap-budget overflow spills to the external sorter, results unchanged") {
    // a 64-byte budget (one ~40 B row trips it at the second group) forces
    // the spill/merge path on every partition — the billion-keys-per-
    // partition shape at test scale. Same oracle as the fast path: the
    // chunked prune is lossless.
    def spillCount(p: org.apache.spark.sql.execution.SparkPlan): Long = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        spillCount(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        spillCount(s.plan)
      case t: graft.plans.TopKPerGroupExec => t.metrics("spillChunks").value
      case other => other.children.map(spillCount).sum
    }
    val df = mkInput()
    spark.conf.set("graft.topk.maxHeapBytes", "64")
    try {
      for (k <- Seq(1, 3)) {
        val q = fused(df, k)
        val got = q.collect()
          .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)),
            r.getInt(2), r.getInt(3))).toSet
        assert(got == oracle(df, k), s"k=$k (spill path)")
        assert(spillCount(q.queryExecution.executedPlan) > 0,
          s"k=$k: spill path never exercised")
      }
    } finally spark.conf.unset("graft.topk.maxHeapBytes")
  }

  test("declared per-group top-k queries plan the fused exec") {
    // q55: per-source quality top-k; q24: exact dedup's latest-per-key;
    // q123: BOTH its windows (hamming shortlist + rerank top-k) fuse
    Seq("q55_top_quality", "q24_dedup_exact", "q123_hamming_ann").foreach { name =>
      val p = SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString
      assert(p.contains("TopKPerGroup"), s"$name:\n$p")
      graft.operators.PlanCache.release()
    }
  }
}
