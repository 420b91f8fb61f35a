package graft

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

import graft.operators.Dedup

/** Skew robustness of the LSH band probe — the known failure mode of
  * MinHash dedup on real crawls: one boilerplate family (a cookie
  * banner, a license header) dominates the corpus, and its (band,
  * bucket) keys concentrate the candidate join's work.
  *
  * Two defenses, both METRIC-asserted here on the real
  * [[Dedup.incrementalPairs]] plan over a deliberately skewed fixture
  * (90% of docs are one near-identical boilerplate family):
  *
  *  1. **Intrinsic banding spread** — a dominant family hashes to 16
  *     DISTINCT (band, bucket) keys (one per band), so even with no
  *     runtime help the join's work fans across band keys: the spec
  *     asserts no single task of the candidate-join stage emits more
  *     than a bounded fraction of the stage's output.
  *  2. **AQE runtime skew split** (enabled in [[GraftSession]]) — the
  *     planner re-splits oversized join partitions after seeing map
  *     output sizes. Asserted as a PAIRED-RUN comparison (split off vs
  *     on, thresholds dropped to fixture scale): with the split on,
  *     the stage runs strictly more tasks and its max per-task shuffle
  *     read drops — measured, not assumed; a vacuous assertion would
  *     pass both runs identically.
  */
class DedupSkewSpec extends SparkSpec {

  /** Per-(stage, task) shuffle read/write record counts. */
  private final class Probe extends SparkListener {
    val rows: mutable.Buffer[(Int, Long, Long)] = mutable.Buffer.empty
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
      val m = t.taskMetrics
      if (m != null && (m.shuffleReadMetrics.recordsRead > 0 ||
          m.shuffleWriteMetrics.recordsWritten > 0))
        rows += ((t.stageId, m.shuffleReadMetrics.recordsRead,
          m.shuffleWriteMetrics.recordsWritten))
    }
  }

  /** (tasks, maxRead, maxWrite, totalWrite) of the candidate-join
    * stage: the stage that both reads shuffled band rows and writes
    * the (by far) largest record volume — the probe's hot stage. */
  private def joinStage(p: Probe): (Int, Long, Long, Long) = {
    val byStage = p.synchronized(p.rows.toVector).groupBy(_._1)
      .filter { case (_, rs) => rs.exists(_._2 > 0) && rs.map(_._3).sum > 0 }
    val (_, rs) = byStage.maxBy { case (_, rs) => rs.map(_._3).sum }
    (rs.length, rs.map(_._2).max, rs.map(_._3).max, rs.map(_._3).sum)
  }

  test("a dominant boilerplate family cannot produce a straggler task in the band probe") {
    val dir = Files.createTempDirectory("graft_skew").toString
    // 720 of 800 docs are one boilerplate family (3 near-identical
    // variants → the family shares its 16 band keys); 80 organic.
    // Batch = doc_id % 10 == 0, so the probe's hot side is real.
    val boiler = "all rights reserved this page uses cookies accept to " +
      "continue browsing here and more legal text follows"
    val rows = (0L until 800L).map { id =>
      val text = if (id % 10 < 9) s"$boiler tail ${id % 3}"
      else s"organic document $id with words ${id % 7} ${id % 11} ${id % 13} tail"
      (id, s"s${id % 4}", "en", text)
    }
    spark.createDataFrame(rows).toDF("doc_id", "source", "lang", "text")
      .repartition(8).write.parquet(s"$dir/documents.parquet")

    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions",
      "spark.sql.adaptive.skewJoin.enabled")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap

    def run(skewSplit: Boolean): (Long, (Int, Long, Long, Long)) = {
      // fixture-scale thresholds: broadcast off so the probe is the
      // shuffled join it is at corpus scale; split arms at KBs; no
      // coalescing so organic partitions stay distinct; 32 shuffle
      // partitions ≫ the 16 hot keys, as a real cluster has
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4k")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.shuffle.partitions", "32")
      conf.set("spark.sql.adaptive.skewJoin.enabled", skewSplit.toString)
      val p = new Probe
      spark.sparkContext.addSparkListener(p)
      try {
        val n = Dedup.incrementalPairs(spark, dir)
          .filter(org.apache.spark.sql.functions.col("jaccard") >= 0.8).count()
        // listener events drain asynchronously; settle before reading
        var waited = 0
        while (waited < 5000 && p.synchronized(p.rows.isEmpty)) {
          Thread.sleep(100); waited += 100
        }
        Thread.sleep(500)
        (n, joinStage(p))
      } finally spark.sparkContext.removeSparkListener(p)
    }

    try {
      val (nOff, (tasksOff, maxReadOff, maxWriteOff, totalOff)) = run(skewSplit = false)
      val (nOn, (tasksOn, maxReadOn, _, _)) = run(skewSplit = true)

      // correctness under skew, independent of the split
      assert(nOff == nOn && nOff > 25000, s"pairs off=$nOff on=$nOn")

      // intrinsic spread: even UNSPLIT, the dominant family's work
      // fans across its 16 band keys — no task emitted more than 20%
      // of the candidate volume (a single-key collapse would be ~100%)
      assert(maxWriteOff <= totalOff / 5,
        s"unsplit straggler: max task wrote $maxWriteOff of $totalOff")

      // the runtime split engaged and subdivided the hot partitions:
      // strictly more tasks, max per-task read down by ≥ 30%
      assert(tasksOn > tasksOff, s"split never engaged: $tasksOn <= $tasksOff tasks")
      assert(maxReadOn * 10 <= maxReadOff * 7,
        s"split did not reduce the hot read: on=$maxReadOn off=$maxReadOff")
    } finally {
      saved.foreach { case (k, v) =>
        v match { case Some(x) => conf.set(k, x); case None => conf.unset(k) } }
      Dedup.releaseBandIndex()
    }
  }
}
