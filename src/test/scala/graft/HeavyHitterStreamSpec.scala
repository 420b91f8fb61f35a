package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.HeavyHitterStream

/** The Misra–Gries guarantees — which hold under ANY row order, so
  * they are what survives a checkpointed restart (exact counter values
  * are order-dependent by construction and deliberately NOT pinned). */
class HeavyHitterStreamSpec extends SparkSpec {

  private def truthFor(docs: org.apache.spark.sql.DataFrame) =
    HeavyHitterStream.tokenRows(docs)
      .groupBy("source", "token").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap

  test("k < vocab: error band and heavy-hitter presence hold through a checkpointed restart") {
    val dir = Files.createTempDirectory("mg-src").toString
    val out = Files.createTempDirectory("mg-out").toString
    val ckpt = Files.createTempDirectory("mg-ckpt").toString
    val k = 8
    val docs = Tables(spark, sf, "documents").select("doc_id", "text", "source")
    docs.filter(col("doc_id") % 2 === 0).write.json(s"$dir/batch1")
    HeavyHitterStream.start(spark, s"$dir/*", out, ckpt, k).awaitTermination()
    docs.filter(col("doc_id") % 2 === 1).write.json(s"$dir/batch2")
    HeavyHitterStream.start(spark, s"$dir/*", out, ckpt, k).awaitTermination()

    val truth = truthFor(docs)
    val nPerSource = truth.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val rows = HeavyHitterStream.currentSummary(spark, out).collect()
      .map(r => (r.getString(0), r.getString(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val bySource = rows.groupBy(_._1)
    // every source stays FRESH even when its summary decayed to empty
    // (the sentinel row), so each source's latest snapshot covers the
    // whole corpus
    assert(bySource.keySet == nPerSource.keySet)
    bySource.foreach { case (src, allRows) =>
      val n = nPerSource(src)
      assert(allRows.forall(_._4 == n), s"$src: n_processed != true token count")
      val srcRows = allRows.filter(_._2.nonEmpty) // drop the sentinel
      assert(srcRows.length <= k)
      val bound = n / (k + 1)
      srcRows.foreach { case (_, tok, est, _) =>
        val tru = truth((src, tok))
        assert(est <= tru, s"$src/$tok overestimates: $est > $tru")
        assert(est >= tru - bound, s"$src/$tok under error band: $est < $tru - $bound")
      }
      // every true heavy hitter (count > n/(k+1)) MUST be present — an
      // empty summary therefore certifies there are none
      val present = srcRows.map(_._2).toSet
      truth.collect { case ((s, t), c) if s == src && c > bound => t }
        .foreach(t => assert(present(t), s"$src: heavy hitter $t missing"))
    }
  }

  test("k >= vocabulary: no decrement ever fires and the summary is the exact count table") {
    val docs = Tables(spark, sf, "documents").select("doc_id", "text", "source")
    val got = HeavyHitterStream
      .summaryStream(HeavyHitterStream.tokenRows(docs), k = 64).collect()
      .map(s => (s.source, s.token) -> s.est_count).toMap
    assert(got == truthFor(docs))
  }
}
