package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Ops report over the persisted index family (MinHash band index,
  * IVF embedding index, binary-code index, HLL sketch store): one row
  * per stored artifact table with its row count, file count, and the
  * index's pending tombstones — the dashboard a maintenance scheduler
  * reads to decide when to compact (file count creeping up from
  * appends), when an erasure pass is owed (tombstones > 0), and how
  * the index is growing. The per-cell/occupancy view stays with
  * [[Similarity.ivfCellStats]]; this is the cross-index rollup.
  *
  * Cost, stated plainly: file listing and tombstone counts are
  * driver-side metadata; row counts execute one `count()` per
  * artifact, which parquet answers from footer row-group counts —
  * no data column is ever read. Output is artifacts × indexes rows. */
object IndexOps {

  /** `indexDirs` maps a label ("band", "ivf", "codes", "sketch", …) to
    * that index's root directory. Every parquet table directly under a
    * root is reported; a root's `forgotten` table is folded into its
    * siblings' `tombstones` column instead of listed as an artifact. */
  def report(spark: SparkSession, indexDirs: Map[String, String]): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val rows = indexDirs.toSeq.sortBy(_._1).flatMap { case (kind, dir) =>
      val root = new org.apache.hadoop.fs.Path(dir)
      val fs = root.getFileSystem(conf)
      if (!fs.exists(root)) Nil
      else {
        val children = fs.listStatus(root).filter(_.isDirectory).map(_.getPath)
          .filterNot(_.getName.startsWith("_"))
          .filterNot(_.getName.contains("_compacting"))
        val tombstones = children.find(_.getName == "forgotten") match {
          case Some(f) => spark.read.parquet(f.toString).count()
          case None => 0L
        }
        // versioned artifacts (marker-committed compaction) report under
        // their BASE name, resolving to the committed version; an
        // unmarked stray from a crashed publish is not an artifact
        val versioned = "(.+)_v(\\d+)".r
        children.filterNot(_.getName == "forgotten")
          .map(_.getName match {
            case versioned(base, _) => base
            case n => n
          })
          .distinct.toSeq.sorted
          .flatMap { base =>
            val t = new org.apache.hadoop.fs.Path(
              Atomic.resolve(spark, dir, base))
            if (!fs.exists(t)) Nil
            else {
              // recursive: partitioned artifacts (compacted IVF cells)
              // keep their files under partition subdirectories
              val it = fs.listFiles(t, true)
              var files = 0L
              while (it.hasNext)
                if (it.next().getPath.getName.endsWith(".parquet")) files += 1
              Seq((kind, base, spark.read.parquet(t.toString).count(),
                files, tombstones))
            }
          }
      }
    }
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1))
      .toDF("kind", "table", "n_rows", "n_files", "tombstones")
  }
}
