package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Data-layout optimization: Z-order (Morton) clustering, the
  * write-time lever for multi-dimensional file pruning. A table
  * range-partitioned and sorted by ONE column prunes scans filtered
  * on that column only; interleaving the bits of two dimensions into
  * one sort key gives every output file a bounded extent in BOTH —
  * a point or range predicate on either dimension then skips most
  * files on parquet min/max stats alone. This is how lakehouse
  * tables (Delta OPTIMIZE ZORDER BY, Iceberg sort orders) make
  * "filter by user AND day" cheap at 100 TB without a second copy.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of `a` (even positions)
    * and `b` (odd positions) — an unrolled sum of shift/mask terms,
    * fully inside whole-stage codegen, replayed term-for-term by the
    * DuckDB oracle. 16+16 bits → a 32-bit key in an int64. */
  def zInterleave(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** The events table's Z-key: (user_id low bits) × (epoch day). Day
    * indexes (~20k for current dates) and hashed-down user ids both
    * fit 16 bits; the bucket (top 8 bits of the 32-bit key) is the
    * unit a writer would range-partition on. */
  def zOrderEvents(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "events")
      .select(col("event_id"),
        col("user_id").bitwiseAND(lit(0xFFFFL)).as("z_user"),
        expr("unix_micros(ts) div 86400000000").as("z_day"))
      .withColumn("zval", zInterleave(col("z_user"), col("z_day")))
      .withColumn("zbucket", shiftright(col("zval"), 24))

  /** Write `df` Z-clustered on (`a`, `b`): range-partition by the
    * Morton key (contiguous key ranges per file — `numFiles` stays a
    * WRITER choice, data size / target file size in production), sort
    * within partitions, drop the key. Every emitted file then has a
    * bounded min/max extent in both dimensions, which is the whole
    * point: scans filtered on either column skip files on footer
    * stats. The shuffle is the one range-exchange any clustered write
    * pays; nothing here is driver-side. */
  def writeZOrdered(df: DataFrame, a: String, b: String, outDir: String,
      numFiles: Int = 8): Unit =
    df.withColumn("_z", zInterleave(col(a), col(b)))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(outDir)

  /** Write `df` as a BUCKETED table: hash-partitioned into `buckets`
    * files by `key` and sorted within each — the layout that makes a
    * fact⋈fact join on that key run with ZERO exchanges (and, with
    * the sort, zero sorts): Spark's bucketing-aware scan reports the
    * hash distribution to the planner, so two tables bucketed the
    * same way merge-join file-to-file. At 100 TB this is THE lever
    * for repeated big joins — the shuffle is paid once at write, not
    * per query (cf. [[graft.operators.Upsert]], whose MERGE buckets
    * its target for the same reason). Registered via `saveAsTable`
    * (bucket metadata lives in the catalog) with an explicit external
    * `path`. */
  def writeBucketed(df: DataFrame, table: String, key: String, path: String,
      buckets: Int = 8): Unit =
    // repartition on the key FIRST, with the bucket count: Spark's
    // repartition hash is the bucketing hash, so every task holds
    // exactly one bucket's rows and writes ONE file per bucket —
    // without this, every input task emits a file into every bucket
    // (tasks × buckets small files) AND the scan-side sort elision is
    // forfeited (it requires one file per bucket to trust sortBy)
    df.repartition(buckets, col(key))
      .write.bucketBy(buckets, key).sortBy(key)
      .option("path", path).format("parquet").mode("overwrite")
      .saveAsTable(table)
}
