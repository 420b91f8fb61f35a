package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Cdc

/** Differential spec for incremental view maintenance: the
  * delta-bounded retraction path must equal the naive full recompute
  * on logs built to break it — a base winner that out-timestamps its
  * delta events, a key deleted by the delta (emptying its bucket), a
  * key born in the delta, null bucket keys and null payloads. */
class IvmSpec extends SparkSpec {
  import spark.implicits._

  // (op, key, value, k, tsSec, offset); max offset 10 → cut 5:
  // offsets 1-5 are "yesterday's view", 6-10 the delta batch
  private val rows: Seq[(String, Long, java.lang.Double, java.lang.Long, Long, Long)] = Seq(
    // plain base→delta update: delta wins on ts
    ("insert", 1L, 10.0, 0L, 100L, 1L),
    ("update", 1L, 20.0, 0L, 200L, 6L),
    // base winner OUT-TIMESTAMPS the delta event: base row must win
    // even though the key is touched (the associativity trap)
    ("insert", 2L, 30.0, 1L, 300L, 2L),
    ("update", 2L, 40.0, 1L, 250L, 7L),
    // deleted by the delta; sole member of bucket 2 → bucket vanishes
    ("insert", 3L, 50.0, 2L, 100L, 3L),
    ("delete", 3L, null, 2L, 400L, 8L),
    // born in the delta
    ("insert", 4L, 60.0, 3L, 100L, 9L),
    // untouched base survivor
    ("insert", 5L, 70.0, 4L, 100L, 4L),
    // null bucket key → bucket −1; null payload in the delta → 0 cents
    ("insert", 6L, 80.0, null, 100L, 5L),
    ("update", 6L, null, null, 200L, 10L))

  private def log(rs: Seq[(String, Long, java.lang.Double, java.lang.Long, Long, Long)]): DataFrame =
    rs.toDF("op", "key", "value", "k", "tssec", "offset")
      .select(col("op"), col("key"),
        struct(col("value"), col("k")).as("after"),
        col("tssec").cast("timestamp").as("ts"), col("offset"))

  private def recompute(changes: DataFrame): Set[(Long, Long, Long)] = {
    val w = Window.partitionBy(col("key"))
      .orderBy(col("ts").desc, col("offset").desc)
    changes.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "delete")
      .select(coalesce(pmod(col("after.k"), lit(8L)), lit(-1L)).as("bucket"),
        coalesce(floor(col("after.value") * 100).cast("long"), lit(0L))
          .as("cents"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("retraction algebra equals the naive recompute on a hostile log") {
    val changes = log(rows)
    val got = Cdc.incrementalViewOf(changes).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == recompute(changes))
    // the emptied bucket is genuinely gone, not a zero row
    assert(!got.exists(_._1 == 2L))
    // the out-of-order base winner held: key 2's bucket carries 30.0
    assert(got.contains((1L, 1L, 3000L)))
    // null payload contributes 0 cents to bucket −1
    assert(got.contains((-1L, 1L, 0L)))
  }

  test("delta-only and base-only degenerate splits still converge") {
    // every offset ≤ cut (no delta): offsets all equal → cut = max/2
    // puts everything in the delta instead; both paths must agree
    val baseOnly = log(rows.map { case (op, k, v, kk, ts, off) =>
      (op, k, v, kk, ts, off + 100L) })
    val got = Cdc.incrementalViewOf(baseOnly).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == recompute(baseOnly))
  }

  test("empty log yields an empty view, not a crash") {
    val empty = log(rows).limit(0)
    assert(Cdc.incrementalViewOf(empty).collect().isEmpty)
  }
}
