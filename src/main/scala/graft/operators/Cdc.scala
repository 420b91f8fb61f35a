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

  /** INCREMENTAL VIEW MAINTENANCE with retractions — the missing piece
    * between the CDC state fold (q31: the TABLE stays fresh) and the
    * monitoring rollups (q13: recomputed from scratch): keep an
    * AGGREGATE view (per-bucket row count + cents sum over the live
    * state) fresh by applying only the DELTA. The log splits at the
    * midpoint offset into "yesterday's materialized view" and "today's
    * delta batch"; the delta is applied as retraction algebra — for
    * each TOUCHED key, −1/−cents of its old state row, +1/+cents of
    * its new winner — and merged into the base view with one
    * delta-sized aggregate. The result must equal (and the oracle IS)
    * the naive full recompute over the whole log, which makes the
    * oracle row a genuine IVM-correctness proof, not an echo.
    *
    * The touched key's new winner folds its BASE STATE ROW (carrying
    * the base winner's ts/offset) together with its delta events —
    * last-writer-wins is associative over that pair, so a key whose
    * base row still out-timestamps every delta event keeps it, without
    * the maintenance path ever re-reading untouched base rows.
    *
    * Scale: this is THE pattern that makes a 100 TB view affordable —
    * per batch, work is bounded by the delta: one LWW window over the
    * delta, one semi-join of the (key-partitioned, in production
    * persisted) base state against the touched keys, and a
    * buckets-sized merge. Nothing rescans the base table. Here the
    * base state derives in-plan from the read-only testdata (the
    * quantizedTopK caveat); production persists it, which is exactly
    * the [[graft.operators.Upsert]] target table.
    *
    * Null discipline: a null payload value contributes 0 cents (both
    * engines coalesce before summing); a null bucket key lands in
    * bucket −1. A bucket whose membership empties nets to zero rows
    * and is dropped, matching the recompute's absent group. */
  def incrementalView(spark: SparkSession, dir: String,
      buckets: Int = 8): DataFrame =
    incrementalViewOf(ChangeEvents.fromEvents(spark, dir), buckets)

  /** [[incrementalView]] over any change log with
    * (op, key, after(value, k), ts, offset) — the fixture-parametric
    * core the differential spec replays hostile logs through. */
  def incrementalViewOf(log: DataFrame, buckets: Int = 8): DataFrame =
    incrementalViewOf(log, graft.model.IvmView(buckets = buckets))

  /** [[incrementalViewOf]] for a CONFIGURED view — the batch twin of
    * the `ivmTasks` stream face, sharing its
    * [[graft.model.IvmView]] bucket/value/aggregate contract so a
    * parity check between the two is meaningful on any view spec. The
    * log's key column is `view.keyField`; bucket/value fields are
    * looked up inside the `after` payload struct. */
  def incrementalViewOf(log: DataFrame,
      view: graft.model.IvmView): DataFrame = {
    val buckets = view.buckets
    val logCols: Seq[org.apache.spark.sql.Column] = Seq(
      col("op"), col(view.keyField).as("key"), col("after"), col("ts"),
      col("offset"))
    val changes0 = PlanCache.tracked(log.select(logCols: _*))
    // deterministic "snapshot vs delta" boundary, derived IN-PLAN via
    // Scalars.attach so building the DataFrame stays lazy (no scan at
    // construction time); an empty log folds to cut 0 and an empty view
    val cutFrame = changes0.agg(
      (coalesce(max(col("offset")), lit(0L)) / lit(2L)).cast("long")
        .as("__cut"))
    val changes = Scalars.attach(changes0, cutFrame,
      col("offset"), col("__cut"))
    val cut = col("__cut")
    def lww(log: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("key"))
        .orderBy(col("ts").desc, col("offset").desc)
      log.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("op"), col("key"), col("after"), col("ts"),
          col("offset"))
    }
    def contrib(state: DataFrame, sign: Int) = state.select(
      coalesce(pmod(col(s"after.${view.bucketField}"), lit(buckets.toLong)),
        lit(-1L)).as("bucket"),
      lit(sign.toLong).as("dn"),
      (lit(sign.toLong) *
        coalesce(floor(col(s"after.${view.valueField}") * 100)
          .cast("long"), lit(0L))).as("dcents"))
    // ---- yesterday: the materialized view (persisted in production)
    val base = PlanCache.tracked(lww(changes.filter(col("offset") <= cut)))
    val baseState = base.filter(col("op") =!= "delete")
    val baseView = contrib(baseState, 1).groupBy(col("bucket"))
      .agg(sum(col("dn")).as("dn"), sum(col("dcents")).as("dcents"))
    // ---- today: delta-bounded maintenance
    val delta = changes.filter(col("offset") > cut).drop("__cut")
    val touched = delta.select(col("key")).distinct()
    val oldRows = baseState.join(touched, Seq("key"), "left_semi")
    val newState = lww(base.join(touched, Seq("key"), "left_semi")
        .unionByName(delta))
      .filter(col("op") =!= "delete")
    baseView
      .unionByName(contrib(oldRows, -1))
      .unionByName(contrib(newState, 1))
      .groupBy(col("bucket"))
      .agg(sum(col("dn")).as("n_rows"), sum(col("dcents")).as("cents"))
      .filter(col("n_rows") > 0)
      .select((col("bucket") +: view.aggs.distinct.map(col)): _*)
      .orderBy(col("bucket").asc)
  }
}
