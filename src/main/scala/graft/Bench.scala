package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // Untimed generic warmup: JIT/codegen + the parquet read and noop
    // write paths, so the first timed query doesn't absorb ~5 s of
    // session warmup. Touches no benched table's data beyond `region`
    // (5 rows).
    spark.range(100000).selectExpr("sum(id * 2)").write.format("noop").mode("overwrite").save()
    spark.read.parquet(s"$sfDir/region.parquet").write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop-format write: executes the FULL plan (every projection,
      // mask, encrypt — nothing pruned the way .count() prunes), and a
      // failing query fails the bench instead of recording -1.
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      // caller-managed persistence: the bench owns the cache lifetime of
      // the dedup/ANN intermediates — released per query so no query
      // benefits from (or pays for) a predecessor's cache
      graft.operators.PlanCache.release()
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
