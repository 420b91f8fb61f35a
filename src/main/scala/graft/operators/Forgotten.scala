package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Right-to-be-forgotten bookkeeping for the persisted indexes (the
  * MinHash band index and the IVF embedding index). A deletion request
  * must propagate into every DERIVED artifact, not just the source
  * table — at 100 TB rewriting a multi-terabyte index per request is
  * not an option, so the contract is the lakehouse one:
  *
  *  1. [[append]] records the ids in a tombstone table — O(request),
  *     immediate;
  *  2. every probe [[exclude]]s tombstoned rows — correctness is
  *     instant, the data is merely unreachable;
  *  3. the next index COMPACTION physically drops the rows and
  *     [[clear]]s the tombstones — the durable erasure, amortized
  *     into maintenance the index was paying anyway.
  */
private[graft] object Forgotten {

  private def path(indexDir: String) = s"$indexDir/forgotten"

  def append(spark: SparkSession, indexDir: String, ids: Seq[Long]): Unit = {
    require(ids.nonEmpty, "empty forget request")
    spark.createDataFrame(
        java.util.Arrays.asList(ids.map(org.apache.spark.sql.Row(_)): _*),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("forgotten_id",
            org.apache.spark.sql.types.LongType))))
      .coalesce(1).write.mode("append").parquet(path(indexDir))
  }

  /** The tombstoned ids, or None when no forget was ever requested. */
  def read(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path(indexDir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) Some(spark.read.parquet(path(indexDir))) else None
  }

  /** `df` minus tombstoned rows — a broadcast anti-join (a forget set
    * is request-sized, never corpus-sized); identity when no
    * tombstones exist, so the no-forget fast path costs nothing. */
  def exclude(df: DataFrame, idCol: String, spark: SparkSession,
      indexDir: String): DataFrame =
    read(spark, indexDir) match {
      case Some(f) =>
        df.join(broadcast(f), df(idCol) === f("forgotten_id"), "left_anti")
      case None => df
    }

  /** Drop the tombstone table — called by compaction AFTER the rows
    * are physically gone. */
  def clear(spark: SparkSession, indexDir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path(indexDir))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
  }
}
