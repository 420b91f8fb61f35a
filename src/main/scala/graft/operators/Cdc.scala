package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.ChangeEvents

/** Batch-declarative CDC final-state semantics: what the streaming
  * upsert pipeline must converge to. Used both as an oracle-checked
  * query and as the differential spec for the streaming path
  * (SURVEY §5: round-trip CDC consistency).
  */
object Cdc {

  /** Final replicated state after applying the events-derived change
    * log in (ts, offset) order: last change per key, dropped if it is
    * a delete. */
  def finalState(spark: SparkSession, dir: String): DataFrame = {
    val changes = ChangeEvents.fromEvents(spark, dir)
    val w = Window.partitionBy(col("key")).orderBy(col("ts").desc, col("offset").desc)
    changes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "delete")
      .select(col("key").as("user_id"), col("after.value").as("value"),
        col("after.k").as("k"), col("ts").as("updated_at"))
  }

  /** q48 — tombstone semantics of the MERGE itself: replay the whole
    * change log through [[graft.operators.Upsert.applyBatch]] from an
    * empty target and KEEP the tombstone rows. A key whose last change
    * is a delete surfaces as `(key, null payload, delete's ts,
    * deleted=true)` — the resurrect-guard row a stale DLQ retry loses
    * against. Oracle-checked so the tombstone contract is pinned
    * cross-engine, not just by unit tests. */
  def finalStateWithTombstones(spark: SparkSession, dir: String): DataFrame = {
    val changes = ChangeEvents.fromEvents(spark, dir)
    val empty = changes.select(
      col("key"), col("after.value").as("value"), col("after.k").as("k"),
      col("ts").as("updated_at"), col("offset").as("updated_off"),
      lit(false).as("deleted")).limit(0)
    Upsert.applyBatch(empty, changes, "key")
      .select(col("key").as("user_id"), col("value"), col("k"),
        col("updated_at"), col("deleted"))
  }

  /** Same, with ignoreDeleteOps=true (mongodb.go:1168-1177): deletes are
    * dropped from the log BEFORE the last-writer-wins fold, so a key
    * whose last op was delete keeps its last non-delete payload. */
  def finalStateIgnoreDeletes(spark: SparkSession, dir: String): DataFrame = {
    val changes = ChangeEvents.fromEvents(spark, dir).filter(col("op") =!= "delete")
    val w = Window.partitionBy(col("key")).orderBy(col("ts").desc, col("offset").desc)
    changes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("key").as("user_id"), col("after.value").as("value"),
        col("after.k").as("k"), col("ts").as("updated_at"))
  }
}
