package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.CorpusMonitor

/** Streaming corpus-quality monitor: running per-source stats over a
  * document ingest stream, batch-parity against `corpusStats`. */
class CorpusMonitorSpec extends SparkSpec {

  private def statRows(df: DataFrame): Map[String, (Long, Long, Double, Double, Double)] =
    df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap

  private def assertParity(got: Map[String, (Long, Long, Double, Double, Double)],
      want: Map[String, (Long, Long, Double, Double, Double)]): Unit = {
    assert(got.keySet == want.keySet)
    got.foreach { case (src, g) =>
      val w = want(src)
      assert(g._1 == w._1 && g._2 == w._2, s"$src counts")
      // double means come off different accumulation orders (streaming
      // folds per trigger); rounded values agree to the last ulp
      assert(math.abs(g._3 - w._3) < 1e-9 && math.abs(g._4 - w._4) < 1e-9 &&
        math.abs(g._5 - w._5) < 1e-9, s"$src means: $g vs $w")
    }
  }

  test("running stats fold each ingest batch into the batch-parity report; alerts read the live face") {
    val root = Files.createTempDirectory("graft_corpusmon").toString
    val docs = Tables(spark, sf, "documents")
    val half1 = docs.filter(col("doc_id") % 2 === 0)
    val half2 = docs.filter(col("doc_id") % 2 =!= 0)
    half1.coalesce(1).write.mode("append").json(s"$root/in")
    // continuous trigger: AvailableNow would finalize after the first
    // ingest batch and never see the second append
    val q = CorpusMonitor.start(spark, s"$root/in", "corpusmon_test",
      availableNow = false)
    try {
      q.processAllAvailable()
      assertParity(statRows(CorpusMonitor.currentStats(spark, "corpusmon_test")),
        statRows(graft.operators.TextOps.corpusStatsOf(half1)))
      // second ingest batch folds in; the face now equals the full corpus
      half2.coalesce(1).write.mode("append").json(s"$root/in")
      q.processAllAvailable()
      assertParity(statRows(CorpusMonitor.currentStats(spark, "corpusmon_test")),
        statRows(graft.operators.TextOps.corpusStats(spark, sf)))
      // alert face: floor above every mean flags all sources; floor 0 none
      val all = CorpusMonitor.currentStats(spark, "corpusmon_test").count()
      assert(CorpusMonitor.lowQualitySources(spark, "corpusmon_test", 1.0).count() == all)
      assert(CorpusMonitor.lowQualitySources(spark, "corpusmon_test", 0.0).count() == 0)
    } finally q.stop()
  }
}
