package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

import graft.functions.Security
import graft.model.FieldSecurity
import graft.operators.Upsert

/** The CDC pipeline (SURVEY §3.1): a file-based change-event stream →
  * optional PII transforms → checkpointed foreachBatch keyed upsert.
  *
  * Reference stages it replaces (mongodb.go:527-815): the hand-rolled
  * channel buffering, disk spill files, smart batch packing, and ≤8
  * parse workers are Spark's micro-batch engine + `maxFilesPerTrigger`
  * + task parallelism; the resume-token file written only after a
  * durable flush (mongodb.go:773-776) is exactly Structured Streaming's
  * two-phase offset/commit log. A failed batch is routed to a DLQ
  * parquet table and the batch is COMMITTED — preserving the
  * reference's contract that DLQ'd batches count as processed
  * (mongodb.go:1302-1307); the DLQ retry job re-applies them (ST10).
  */
object CdcPipeline {

  final case class Config(
      sourceDir: String,
      targetDir: String,
      checkpointDir: String,
      dlqDir: String,
      keyCol: String = "key",
      ignoreDeleteOps: Boolean = false,      // mongodb.go:1168-1177
      fieldSecurity: Seq[FieldSecurity] = Nil,
      maxFilesPerTrigger: Int = 1000,        // apply-batch cap, mongodb.go:258
      maxDlqAttempts: Int = 3,               // mongodb.go:261 maxRetryAttempts
      nsFilter: Option[(String, String)] = None, // P2: (db, table) $match, mongodb.go:550-556
      includeTableRegex: Seq[String] = Nil,  // P3: binlog include regexes, mysql.go:52-58
      maxBytesPerTrigger: Option[Long] = None) // ST3: byte-based batch cap, mongodb.go:256

  /** Start the stream. With `availableNow=true` it drains all pending
    * input then stops (test/batch-catchup mode); otherwise it runs on a
    * 2 s cadence like the reference's flush timer (mongodb.go:698-699). */
  def start(spark: SparkSession, cfg: Config, availableNow: Boolean = true): StreamingQuery = {
    // ST3: the reference's smart batch controller caps a batch by bytes
    // (256 MB default) or by count; Spark's file source exposes the
    // same two knobs but only one may be active — the byte cap wins
    // when configured (it is the one that tracks memory, not file
    // count, which is what the controller is actually protecting).
    val reader = spark.readStream.schema(ChangeEvents.schema)
    cfg.maxBytesPerTrigger match {
      case Some(b) => reader.option("maxBytesPerTrigger", b)
      case None    => reader.option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
    }
    val raw = reader.json(cfg.sourceDir)
    val matched = cfg.nsFilter.map { case (db, t) =>
      ChangeEvents.matchStage(raw, db, t) }.getOrElse(raw)
    val included = ChangeEvents.includeTables(matched, cfg.includeTableRegex)
    val secured = Security.applyFieldSecurity(included, cfg.fieldSecurity)

    val q = secured.writeStream
      .queryName(s"cdc->${cfg.targetDir}")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("2 seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        try Upsert.mergeIntoParquet(batch.sparkSession, cfg.targetDir, batch, cfg.keyCol, cfg.ignoreDeleteOps)
        catch {
          case e: Exception => // DLQ'd batch counts as processed (ST10)
            // One directory per failed batch (mongodb.go parks one file
            // per batch) so a successful retry can delete it atomically;
            // overwrite keeps a re-delivered batchId idempotent.
            batch.withColumn("dlq_batch_id", lit(batchId))
              .withColumn("dlq_error", lit(e.getMessage))
              .withColumn("dlq_retry_count", lit(0))
              .write.mode(SaveMode.Overwrite).json(batchDir(cfg, batchId))
        }
      }
      .start()
    q
  }

  private def batchDir(cfg: Config, batchId: Long): String =
    s"${cfg.dlqDir}/batch_$batchId"

  private def dlqSchema = ChangeEvents.schema
    .add("dlq_batch_id", LongType).add("dlq_error", StringType)
    .add("dlq_retry_count", IntegerType)

  /** True when the DLQ holds batches a [[retryDlq]] pass would touch
    * (pending `batch_N` dirs or recoverable `.tmp` orphans; permanently
    * `parked_*` batches don't count). Lives here, next to the layout it
    * describes, so callers never hardcode the naming. */
  def hasPendingBatches(spark: SparkSession, cfg: Config): Boolean = {
    val p = new Path(cfg.dlqDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isDirectory && s.getPath.getName.matches("""batch_\d+(\.tmp)?"""))
  }

  /** Outcome of one DLQ pass: batches re-applied successfully (and
    * deleted), batches that failed again (retry count bumped), and
    * batches parked for good (attempts exhausted). */
  final case class DlqStats(succeeded: Long = 0, failed: Long = 0, parked: Long = 0)

  /** DLQ retry (reference processDeadLetterBatch, mongodb.go:1876-1969):
    * one pass over the parked batches in batch-id (offset) order.
    * Per batch: skip when `dlq_retry_count` has reached
    * `cfg.maxDlqAttempts` (parked for good — the reference never
    * retries ops past maxRetryAttempts); otherwise re-apply via the
    * idempotent merge, DELETE the batch dir on success
    * (mongodb.go:1938-1950), or rewrite it with the retry count
    * incremented on failure (mongodb.go:1952-1966). A batch that has
    * exhausted its attempts is renamed `parked_N` — retained for manual
    * replay, invisible to later passes — and the pass fires ONE alert
    * (the reference notifies Slack when dead-letter ops exhaust
    * retries, mongodb.go:1311-1408).
    *
    * Concurrency contract: run only when the pipeline's own stream is
    * NOT applying batches (drained, stopped, or before start) — the
    * retry merge and the live foreachBatch merge on the same buckets
    * would race. [[graft.engine.GraftEngine]]'s sweep stops the
    * pipeline first and lets the reconcile restart it. */
  def retryDlq(spark: SparkSession, cfg: Config,
      alerts: Alerts.Sink = Alerts.Log): DlqStats = {
    val dlqPath = new Path(cfg.dlqDir)
    val fs = dlqPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dlqPath)) return DlqStats()
    // Recover from a crash inside the tmp-swap window below: a
    // `batch_N.tmp` whose `batch_N` is gone holds the only copy of the
    // parked events (the crash hit between delete and rename) — rename
    // it back; one whose `batch_N` survived is a stale duplicate — drop
    // it. Without this sweep a single orphan would also poison the
    // numeric sort on every later pass.
    val entries = fs.listStatus(dlqPath).toSeq.filter(_.isDirectory)
    entries.filter(_.getPath.getName.matches("""batch_\d+\.tmp""")).foreach { st =>
      val original = new Path(dlqPath, st.getPath.getName.stripSuffix(".tmp"))
      if (fs.exists(original)) fs.delete(st.getPath, true)
      else fs.rename(st.getPath, original)
    }
    val batchDirs = fs.listStatus(dlqPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("""batch_\d+"""))
      .sortBy(_.getPath.getName.stripPrefix("batch_").toLong)
    var stats = DlqStats()
    batchDirs.foreach { st =>
      val dir = st.getPath
      val parked = spark.read.schema(dlqSchema).json(dir.toString)
      val attempts = parked.agg(max(col("dlq_retry_count"))).head() match {
        case r if r.isNullAt(0) => 0
        case r => r.getInt(0)
      }
      if (attempts >= cfg.maxDlqAttempts) {
        // park for good under a name later passes IGNORE: the batch's
        // data is retained for manual replay, but it no longer costs a
        // Spark read per pass and the park alert fires exactly once
        // (a pager sink must not receive the same park every 10 s).
        // The destination must not pre-exist (batch ids restart after a
        // checkpoint reset; rename INTO an existing dir would nest) —
        // probe for a free name, and on a failed rename leave the batch
        // in place (degraded re-alerts, never corruption).
        val idx = dir.getName.stripPrefix("batch_")
        var dest = new Path(dlqPath, s"parked_$idx")
        var j = 1
        while (fs.exists(dest)) { dest = new Path(dlqPath, s"parked_${idx}_$j"); j += 1 }
        if (fs.rename(dir, dest)) stats = stats.copy(parked = stats.parked + 1)
        else {
          // persistent rename failure (permissions?): the operator must
          // still be paged about the dead batch, every pass, until fixed
          alerts.send(Alerts.Alert("dlq_park_failed", dir.toString,
            s"exhausted batch could not be renamed to $dest"))
          stats = stats.copy(failed = stats.failed + 1)
        }
      } else {
        val events = parked.drop("dlq_batch_id", "dlq_error", "dlq_retry_count")
        try {
          Upsert.mergeIntoParquet(spark, cfg.targetDir, events, cfg.keyCol, cfg.ignoreDeleteOps)
          fs.delete(dir, true) // consumed — the DLQ must not re-apply it
          stats = stats.copy(succeeded = stats.succeeded + 1)
        } catch {
          case e: Exception =>
            // failed again: bump the count via tmp-dir + atomic swap so a
            // crash mid-rewrite never loses the parked events
            val tmp = new Path(dir.getParent, dir.getName + ".tmp")
            parked.withColumn("dlq_retry_count", lit(attempts + 1))
              .withColumn("dlq_error", lit(e.getMessage))
              .write.mode(SaveMode.Overwrite).json(tmp.toString)
            fs.delete(dir, true)
            fs.rename(tmp, dir)
            stats = stats.copy(failed = stats.failed + 1)
        }
      }
    }
    if (stats.parked > 0)
      alerts.send(Alerts.Alert("dlq_parked", cfg.dlqDir,
        s"${stats.parked} batch(es) parked after ${cfg.maxDlqAttempts} attempts"))
    stats
  }
}
