package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** J2/W5/W3 — replication without a primary key.
  *
  * Two reference behaviors:
  *  - PostgreSQL with REPLICA IDENTITY FULL deletes by matching the old
  *    tuple on ALL columns, null-safe (`col IS NULL` for null fields)
  *    — reference postgresql.go:934-965 `handleDeleteWithAllColumns`.
  *    `DELETE … WHERE every-column-matches` removes EVERY matching
  *    duplicate, so the target is a multiset whose per-value count
  *    drops to zero at each delete.
  *  - MySQL tables with no PK cannot address rows at all: update and
  *    delete ops are SKIPPED with a warning metric and only inserts
  *    apply — reference mysql.go:608-611.
  *
  * Spark shape: replaying a keyless log row-by-row would be a driver
  * loop; instead the multiset semantics fold into one aggregate —
  * for each distinct row value, the rows that survive a batch are
  *   target_count(value)  if the batch never deletes the value, else 0,
  *   + inserts of the value AFTER its last delete (by log position).
  * One groupBy + one join on a struct key (struct equality treats null
  * fields as equal, giving the reference's IS-NULL matching), then the
  * surviving multiplicity is re-exploded. No window over the target,
  * no per-event iteration — the plan scales with distinct values, and
  * the shuffle key is the full row struct.
  */
object Keyless {

  private val RowKey = "_row"

  /** Apply a keyless change batch (op ∈ insert|delete, payload columns
    * `cols`, `position` = the engine's LSN/offset) to a keyless target.
    * An update under REPLICA IDENTITY FULL arrives decomposed as
    * delete(old) + insert(new) at consecutive positions, like pgoutput
    * delivers it. */
  def applyKeylessBatch(target: DataFrame, batch: DataFrame, cols: Seq[String],
      positionCol: String = "offset"): DataFrame = {
    val key = struct(cols.map(col): _*)
    val lastDel = batch.filter(col("op") === "delete")
      .groupBy(key.as(RowKey)).agg(max(col(positionCol)).as("_last_del"))
    val inserts = batch.filter(col("op") === "insert")
      .withColumn(RowKey, key)
      .join(lastDel, Seq(RowKey), "left")
      .filter(col("_last_del").isNull || col(positionCol) > col("_last_del"))
      .groupBy(RowKey).agg(count(lit(1)).as("_n_ins"))
    val kept = target
      .groupBy(key.as(RowKey)).agg(count(lit(1)).as("_n_tgt"))
      .join(lastDel, Seq(RowKey), "left")
      .filter(col("_last_del").isNull) // a delete removes every duplicate
      .drop("_last_del")
    val counts = kept.join(inserts, Seq(RowKey), "full")
      .select(col(RowKey),
        (coalesce(col("_n_tgt"), lit(0L)) + coalesce(col("_n_ins"), lit(0L))).as("_n"))
      .filter(col("_n") > 0)
    counts
      .select(col(RowKey), explode(sequence(lit(1L), col("_n"))).as("_i"))
      .select(cols.map(c => col(s"$RowKey.$c").as(c)): _*)
  }

  /** W3 — the MySQL no-PK path: inserts append, update/delete ops are
    * dropped and counted (mysql.go:608-611 logs `no PK => skip`).
    * Returns the new state and the number of skipped ops. */
  def applyNoPkBatch(target: DataFrame, batch: DataFrame, cols: Seq[String]): (DataFrame, Long) = {
    val skipped = batch.filter(col("op").isin("update", "delete")).count()
    val appended = batch.filter(col("op") === "insert").select(cols.map(col): _*)
    (target.unionByName(appended), skipped)
  }

  // --- q40: oracle-checked keyless replay over the events table -------
  // Deterministic keyless log: error → delete, everything else →
  // insert; the row payload (row_a, row_b) is deliberately
  // low-cardinality so duplicates and delete-all-copies semantics are
  // exercised. Replay position is the event_id (the LSN analogue).

  def keylessLog(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    Tables(spark, dir, "events").select(
      when(col("event_type") === "error", "delete").otherwise("insert").as("op"),
      (col("user_id") % 20).as("row_a"),
      // k%7==3 → NULL: keyless rows carry null columns in practice, and
      // REPLICA IDENTITY FULL matches them IS-NULL-safely — the null path
      // must be exercised by the oracle-checked replay, not just specs
      when(k % 7 === 3, lit(null).cast(LongType)).otherwise(k % 10).as("row_b"),
      col("event_id").as("offset"))
  }

  /** q40 — final multiset after replaying the keyless log into an empty
    * target, reported as per-value counts (values with count 0 drop
    * out, like rows deleted from the table). */
  def finalStateCounts(spark: SparkSession, dir: String): DataFrame = {
    val log = keylessLog(spark, dir)
    val empty = log.select("row_a", "row_b").limit(0)
    applyKeylessBatch(empty, log, Seq("row_a", "row_b"))
      .groupBy("row_a", "row_b").agg(count(lit(1)).as("cnt"))
  }
}
