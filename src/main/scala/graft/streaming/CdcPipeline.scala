package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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
      maxBytesPerTrigger: Option[Long] = None, // ST3: byte-based batch cap, mongodb.go:256
      // "json" = the generic file stream; "changelog" = the engine's
      // own DSv2 MicroBatchStream (graft.sources.ChangeLogSource):
      // resume-token offsets, per-file partitions, gated token commit,
      // maxFilesPerTrigger honored via admission control (the byte cap
      // is a file-source knob and does not apply).
      sourceFormat: String = "json")

  /** Start the stream. With `availableNow=true` it drains all pending
    * input then stops (test/batch-catchup mode); otherwise it runs on a
    * 2 s cadence like the reference's flush timer (mongodb.go:698-699). */
  def start(spark: SparkSession, cfg: Config, availableNow: Boolean = true): StreamingQuery = {
    // ST3: the reference's smart batch controller caps a batch by bytes
    // (256 MB default) or by count; Spark's file source exposes the
    // same two knobs but only one may be active — the byte cap wins
    // when configured (it is the one that tracks memory, not file
    // count, which is what the controller is actually protecting).
    val raw = if (cfg.sourceFormat == "changelog")
      spark.readStream.format("changelog")
        .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
        .load(cfg.sourceDir)
    else {
      val reader = spark.readStream.schema(ChangeEvents.schema)
      cfg.maxBytesPerTrigger match {
        case Some(b) => reader.option("maxBytesPerTrigger", b)
        case None    => reader.option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      }
      reader.json(cfg.sourceDir)
    }
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
            Dlq.park(batch, batchId, e, cfg.dlqDir)
        }
      }
      .start()
    q
  }

  /** True when the DLQ holds batches a [[retryDlq]] pass would touch. */
  def hasPendingBatches(spark: SparkSession, cfg: Config): Boolean =
    Dlq.hasPendingBatches(spark, cfg.dlqDir)

  /** Outcome of one DLQ pass — see [[Dlq.Stats]]. */
  type DlqStats = Dlq.Stats
  val DlqStats = Dlq.Stats

  /** DLQ retry (reference processDeadLetterBatch, mongodb.go:1876-1969):
    * the generic [[Dlq.retry]] pass with this pipeline's event schema
    * and idempotent merge as the apply function. Run only while the
    * pipeline's own stream is not applying batches (see Dlq.retry's
    * concurrency contract). */
  def retryDlq(spark: SparkSession, cfg: Config,
      alerts: Alerts.Sink = Alerts.Log): DlqStats =
    Dlq.retry(spark, cfg.dlqDir, ChangeEvents.schema, cfg.maxDlqAttempts,
      events => Upsert.mergeIntoParquet(spark, cfg.targetDir, events,
        cfg.keyCol, cfg.ignoreDeleteOps),
      alerts)
}
