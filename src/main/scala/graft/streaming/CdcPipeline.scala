package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
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
      maxFilesPerTrigger: Int = 1000)        // apply-batch cap, mongodb.go:258

  /** Start the stream. With `availableNow=true` it drains all pending
    * input then stops (test/batch-catchup mode); otherwise it runs on a
    * 2 s cadence like the reference's flush timer (mongodb.go:698-699). */
  def start(spark: SparkSession, cfg: Config, availableNow: Boolean = true): StreamingQuery = {
    val raw = spark.readStream
      .schema(ChangeEvents.schema)
      .option("maxFilesPerTrigger", cfg.maxFilesPerTrigger)
      .json(cfg.sourceDir)
    val secured = Security.applyFieldSecurity(raw, cfg.fieldSecurity)

    val q = secured.writeStream
      .queryName(s"cdc->${cfg.targetDir}")
      .option("checkpointLocation", cfg.checkpointDir)
      .trigger(if (availableNow) Trigger.AvailableNow() else Trigger.ProcessingTime("2 seconds"))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        try Upsert.mergeIntoParquet(batch.sparkSession, cfg.targetDir, batch, cfg.keyCol, cfg.ignoreDeleteOps)
        catch {
          case e: Exception => // DLQ'd batch counts as processed (ST10)
            batch.withColumn("dlq_batch_id", lit(batchId))
              .withColumn("dlq_error", lit(e.getMessage))
              .write.mode(SaveMode.Append).json(cfg.dlqDir)
        }
      }
      .start()
    q
  }

  /** DLQ retry (reference processDeadLetterQueue, mongodb.go:1836-1969):
    * re-apply parked batches in offset order; idempotent merge makes
    * retries safe. Returns the number of retried events. */
  def retryDlq(spark: SparkSession, cfg: Config): Long = {
    val dlq = try spark.read.schema(
      ChangeEvents.schema.add("dlq_batch_id", "long").add("dlq_error", "string"))
      .json(cfg.dlqDir)
    catch { case _: Exception => return 0L }
    val events = dlq.drop("dlq_batch_id", "dlq_error")
    val n = events.count()
    if (n > 0)
      Upsert.mergeIntoParquet(spark, cfg.targetDir, events, cfg.keyCol, cfg.ignoreDeleteOps)
    n
  }
}
