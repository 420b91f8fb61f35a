package graft

/** Builder-side plan inspection: print the physical plan of named
  * declared queries (`runMain graft.PlanDump q102_pit_join ...`) —
  * the `.explain`-and-iterate loop the scale playbook calls for,
  * without writing a throwaway main each time. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    args.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString)
      graft.operators.PlanCache.release()
    }
    spark.stop()
  }
}
