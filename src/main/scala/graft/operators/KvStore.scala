package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

import graft.Tables

/** Redis-style KV pillar — the fourth engine of the reference
  * (reference pkg/syncer/redis/redis.go), re-expressed as a keyed
  * DataFrame state machine.
  *
  * Canonical KV record (SURVEY §1.1 #4): one row per live key —
  * `(key: String, kind: "string"|"hash", value: String,
  *   f_k/f_uid: hash fields, ttlMs: Long)`. TTL encoding follows the
  * reference probe (redis.go:125-133): `-1` = persistent, `-2` =
  * expired/non-existent, `>= 0` = concrete expiry in milliseconds.
  *
  * Operation semantics (redis.go:166-232 `handleKeyspaceChange` +
  * redis.go:125-164 `copyFullKey`):
  *  - `del`  → key removed from the target.
  *  - `set`  → typed upsert: string keys via SET (value), hash keys via
  *             HSET (fields); written with no expiry (`Set(ctx,key,val,0)`),
  *             so ttlMs becomes -1.
  *  - `copy` → DUMP+RESTORE REPLACE preserving the source TTL; if the
  *             source key is expired (`ttl < 0 && ttl != -1`) the copy is
  *             **skipped, not deleted** — a no-op that leaves the target's
  *             previous state intact (redis.go:130-133).
  *
  * Scale design: state lives in a parquet table hash-bucketed on `key`
  * (same partition-scoped MERGE shape as [[Upsert]]); a change batch is
  * reduced map-side to one effective op per key (window over the batch,
  * not the table) and only the touched buckets are rewritten. No
  * driver-side iteration: the reference's per-key SCAN/RESTORE loop
  * becomes one distributed anti-join + union per micro-batch.
  */
object KvStore {

  /** P9 — the reference's expiry skip rule `ttl < 0 && ttl != -1`
    * (redis.go:130-133): keep persistent (-1) and concrete (>=0) TTLs. */
  def ttlAlive(ttlMs: Column): Column = ttlMs === -1L || ttlMs >= 0L

  /** copyFullKey's RESTORE expiry argument: persistent maps to 0
    * ("no expiry"), concrete TTLs pass through (redis.go:142-150). */
  def restoreExpireMs(ttlMs: Column): Column =
    when(ttlMs === -1L, 0L).otherwise(greatest(ttlMs, lit(0L)))

  // --- deterministic KV view of the `events` table -------------------
  // Same derivation trick as ChangeEvents.fromEvents: the synthetic
  // events table plays the role of the source Redis instance so the
  // final KV state is SQL-expressible for the DuckDB oracle.
  //  key   = 'user:' || user_id
  //  kind  = user_id % 3 == 0 ? 'hash' : 'string'   (TYPE probe result)
  //  op    = error → del, signup|purchase → set, view|click → copy
  //  ttl   = copy ops carry a source TTL derived from props.k:
  //          k%5==0 → -2 (expired), k%5==1 → (k+1)*1000, else -1

  /** S9-shaped keyspace-notification log: one `(op, key, …)` record per
    * event, ordered by (ts, offset) like the pubsub channel delivers. */
  def keyspaceOps(spark: SparkSession, dir: String): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast(LongType)
    Tables(spark, dir, "events").select(
      when(col("event_type") === "error", "del")
        .when(col("event_type").isin("signup", "purchase"), "set")
        .otherwise("copy").as("op"),
      concat(lit("user:"), col("user_id")).as("key"),
      when(col("user_id") % 3 === 0, "hash").otherwise("string").as("kind"),
      when(col("user_id") % 3 === 0, lit(null).cast(StringType))
        .otherwise(k.cast(StringType)).as("value"),
      when(col("user_id") % 3 === 0, k.cast(StringType)).as("f_k"),
      when(col("user_id") % 3 === 0, col("user_id").cast(StringType)).as("f_uid"),
      when(col("event_type").isin("view", "click"),
        when(k % 5 === 0, -2L).when(k % 5 === 1, (k + 1) * 1000L).otherwise(-1L))
        .otherwise(lit(-1L)).as("ttlMs"),
      col("ts"),
      col("event_id").as("offset"))
  }

  /** Reduce an op log/batch to one *effective* op per key: expired-copy
    * no-ops are dropped first (they change nothing, redis.go:130-133),
    * then the latest surviving op wins. Window is over the batch, which
    * is micro-batch-sized — never over the accumulated state. */
  def effectiveOps(ops: DataFrame): DataFrame = {
    val alive = ops.filter(!(col("op") === "copy" && !ttlAlive(col("ttlMs"))))
    val w = Window.partitionBy(col("key")).orderBy(col("ts").desc, col("offset").desc)
    alive.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** W6: apply a keyspace-op batch to a KV state. `set` rewrites the
    * TTL to persistent (reference Set/HSet pass expiry 0); `copy`
    * preserves the source TTL through RESTORE.
    *
    * Known simplification vs the reference: an HSet (redis.go:216-222)
    * merges fields into the target hash and leaves the key's existing
    * TTL untouched, whereas this model replaces the whole row and
    * resets the TTL to persistent. The synthetic op log always carries
    * the full field set and its hash ops never mix with TTL-carrying
    * copies on the same key, so both semantics agree here; a production
    * hash-merge would map-side combine fields per key before the merge. */
  def applyKvBatch(state: DataFrame, batch: DataFrame): DataFrame = {
    val eff = effectiveOps(batch)
    val upserts = eff.filter(col("op") =!= "del").select(
      col("key"), col("kind"), col("value"), col("f_k"), col("f_uid"),
      when(col("op") === "set", -1L).otherwise(col("ttlMs")).as("ttlMs"),
      col("ts").as("updated_at"))
    state.join(eff.select("key"), Seq("key"), "left_anti").unionByName(upserts)
  }

  // --- bucketed parquet state (the "target Redis") --------------------

  val NumBuckets = 64 // local-test sizing; 4096 at production scale

  private def bucketOf(c: Column) = pmod(hash(c), lit(NumBuckets))

  /** Partition-scoped KV MERGE — the streaming sink's per-batch apply.
    * Identical shape to [[Upsert.mergeIntoParquet]]: the only collect is
    * the touched-bucket list, bounded by [[NumBuckets]]. */
  def mergeKvIntoParquet(spark: SparkSession, targetDir: String, batch: DataFrame): Unit = {
    val batched = batch.withColumn("bucket", bucketOf(col("key"))).persist()
    try {
      val touched = batched.select("bucket").distinct().collect().map(_.getInt(0))
      if (touched.isEmpty) return
      val empty = batched.select(
        col("key"), col("kind"), col("value"), col("f_k"), col("f_uid"),
        col("ttlMs"), col("ts").as("updated_at")).limit(0)
      // Hadoop FS existence probe (not java.io.File) so the merge works
      // on distributed storage (HDFS/S3) exactly as on local disk.
      val path = new org.apache.hadoop.fs.Path(targetDir)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val target =
        if (!fs.exists(path)) empty
        else spark.read.parquet(targetDir)
          .filter(col("bucket").isin(touched.toSeq: _*)).drop("bucket")
      val merged = applyKvBatch(target, batched.drop("bucket"))
        .withColumn("bucket", bucketOf(col("key")))
      merged.write
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket").mode(SaveMode.Overwrite).parquet(targetDir)
    } finally batched.unpersist()
  }

  // --- q37/q38/q39: oracle-checked KV queries -------------------------

  /** q37 — S8 initial full sync + P9 TTL skip: SCAN sees the source's
    * *current* keys — the last raw op per key, no no-op filtering (a key
    * whose latest state is expired is skipped by the TTL probe, even
    * though the notification replay in [[finalState]] would have kept
    * its older value) — then emits the DUMP/RESTORE view with the
    * reference's expireMs mapping (redis.go:89-164). */
  def snapshot(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("key")).orderBy(col("ts").desc, col("offset").desc)
    val cur = keyspaceOps(spark, dir)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .filter(col("op") =!= "del")
    cur.filter(ttlAlive(col("ttlMs")))
      .select(col("key"), col("kind"), col("value"), col("f_k"), col("f_uid"),
        restoreExpireMs(col("ttlMs")).as("expire_ms"))
  }

  /** q38 — S9/W6 final KV state after replaying the whole keyspace-
    * notification log in (ts, offset) order. */
  def finalState(spark: SparkSession, dir: String): DataFrame = {
    val empty = keyspaceOps(spark, dir).select(
      col("key"), col("kind"), col("value"), col("f_k"), col("f_uid"),
      col("ttlMs"), col("ts").as("updated_at")).limit(0)
    applyKvBatch(empty, keyspaceOps(spark, dir))
      .select("key", "kind", "value", "f_k", "f_uid", "ttlMs", "updated_at")
      .withColumnRenamed("ttlMs", "ttl_ms")
  }

  /** q39 — S10 stream-consumer materialization: every stream message
    * becomes hash key `msg:{id}` with the message fields HSET into it
    * (redis.go:281-317 processStreamMessage). Purchases play the part
    * of XMessages; ids are unique so state = all messages. */
  def streamMessages(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events").filter(col("event_type") === "purchase")
      .select(
        concat(lit("msg:"), col("event_id")).as("hash_key"),
        col("user_id").cast(StringType).as("f_user"),
        get_json_object(col("props"), "$.k").as("f_amount"))
}
