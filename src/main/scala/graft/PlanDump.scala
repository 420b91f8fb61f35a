package graft

/** Builder-side plan inspection: print the physical plan of named
  * declared queries (`runMain graft.PlanDump q102_pit_join ...`) —
  * the `.explain`-and-iterate loop the scale playbook calls for,
  * without writing a throwaway main each time.
  *
  * Env knobs (all optional):
  *   SPARK_GRAFT_PLAN_DIR    write each query's plan to `<dir>/<name><suffix>.txt`
  *                           instead of stdout
  *   SPARK_GRAFT_PLAN_SUFFIX file-name suffix, e.g. `_before` / `_after`
  *   SPARK_GRAFT_PLAN_SF     data dir to plan against (default sf0.001)
  *   SPARK_GRAFT_PLAN_MODE   `formatted` (default) or `physical`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val outDir = sys.env.get("SPARK_GRAFT_PLAN_DIR")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_SF", "/root/testdata/sf0.001")
    val mode = sys.env.getOrElse("SPARK_GRAFT_PLAN_MODE", "formatted")
    outDir.foreach(d => java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
    args.foreach { name =>
      val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
      val txt =
        if (mode == "physical") qe.executedPlan.toString
        else qe.explainString(org.apache.spark.sql.execution.FormattedMode)
      outDir match {
        case Some(d) =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(d, s"$name$suffix.txt"), txt)
          println(s"[plandump] wrote $d/$name$suffix.txt")
        case None =>
          println(s"===== $name =====")
          println(txt)
      }
      graft.operators.PlanCache.release()
    }
    spark.stop()
  }
}
