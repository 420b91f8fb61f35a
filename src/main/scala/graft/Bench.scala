package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // Untimed generic warmup: JIT/codegen + the parquet read, shuffle
    // exchange, broadcast join, and noop write paths, so the first timed
    // query doesn't absorb ~5 s of session warmup. Touches no benched
    // table's data beyond `region` (5 rows).
    spark.range(100000).selectExpr("sum(id * 2)").write.format("noop").mode("overwrite").save()
    spark.range(100000).selectExpr("id % 97 AS k", "id AS v").groupBy("k").sum("v")
      .write.format("noop").mode("overwrite").save()
    val warm = spark.read.parquet(s"$sfDir/region.parquet")
    warm.join(org.apache.spark.sql.functions.broadcast(warm.select("r_regionkey")),
        Seq("r_regionkey"))
      .write.format("noop").mode("overwrite").save()
    // Deterministic name order: Map iteration order reshuffles whenever
    // a query is added, which silently reassigns residual-warmup cost to
    // different queries between rounds and breaks per-query comparison.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // Three timed executions, per-query MINIMUM reported: the host
      // shows intermittent multi-second stalls that land on a random
      // query per run (same query swings 0.7 s ↔ 10 s across identical
      // runs), and a stall can span two back-to-back executions; the
      // min isolates the query's actual cost from the stall. Each
      // execution is full and independent (caches released between).
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        // noop-format write: executes the FULL plan (every projection,
        // mask, encrypt — nothing pruned the way .count() prunes), and a
        // failing query fails the bench instead of recording -1.
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        // caller-managed persistence: the bench owns the cache lifetime
        // of the dedup/ANN intermediates — released per execution so no
        // run benefits from (or pays for) a predecessor's cache
        graft.operators.PlanCache.release()
        (System.nanoTime() - t0) / 1e9
      }
      name -> secs.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
