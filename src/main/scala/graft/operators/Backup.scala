package graft.operators

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Backup/export path (SURVEY §3.2): regex table discovery → prefix
  * grouping → date-suffix pruning → filtered+projected union export
  * (reference pkg/backup/executor.go:345-418, external_simple.go:252-388).
  *
  * The reference's date-suffixed physical tables (`orders_202401`,
  * `orders_2024`…) are the poor man's partitioning; we model a logical
  * table as (name, slices) where each slice carries its parsed date
  * range, so pruning is a driver-side metadata operation — exactly what
  * Catalyst's partition pruning does once these land as real partitions.
  * The row-level time predicate is still applied after pruning (pruning
  * is a performance step, never a correctness step).
  */
object Backup {

  /** A physical slice of a logical table, e.g. `orders_202401`. */
  final case class TableSlice(name: String, df: () => DataFrame,
      range: Option[(LocalDate, LocalDate)])

  /** PR2/F13: strip a date/number suffix to find the logical prefix —
    * the reference's 6 regexes (executor.go:474-501) collapse into one. */
  private val suffixRe = "_(\\d{4}|\\d{6}|\\d{8})$".r

  def extractPrefix(table: String): String =
    suffixRe.replaceAllIn(table, "")

  /** F13: parse `_YYYY` / `_YYYYMM` / `_YYYYMMDD` suffix into the
    * slice's [start, end) date range (executor.go:662-747). */
  def parseSuffixRange(table: String): Option[(LocalDate, LocalDate)] =
    suffixRe.findFirstMatchIn(table).map(_.group(1)).flatMap { d =>
      try d.length match {
        case 4 =>
          val s = LocalDate.of(d.toInt, 1, 1); Some((s, s.plusYears(1)))
        case 6 =>
          val s = LocalDate.of(d.take(4).toInt, d.drop(4).toInt, 1); Some((s, s.plusMonths(1)))
        case 8 =>
          val s = LocalDate.parse(d, java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
          Some((s, s.plusDays(1)))
        case _ => None
      } catch { case _: Exception => None }
    }

  /** PR1: keep slices overlapping [start, end); a slice with no parsed
    * range is kept (the reference falls back to including the table,
    * executor.go:563-599). */
  def pruneSlices(slices: Seq[TableSlice], start: LocalDate, end: LocalDate): Seq[TableSlice] =
    slices.filter(_.range.forall { case (s, e) => s.isBefore(end) && e.isAfter(start) })

  /** S11: regex table discovery over a table-name list
    * (executor.go:421-458). */
  def discover(tables: Seq[String], pattern: String): Seq[String] =
    tables.filter(_.matches(pattern))

  /** PR2: group discovered tables by logical prefix
    * (executor.go:461-471). */
  def groupByPrefix(tables: Seq[String]): Map[String, Seq[String]] =
    tables.groupBy(extractPrefix)

  /** SET1/P1/P4: merged export of a slice group — prune by window,
    * apply the row predicate and projection ("all" = full projection,
    * external_simple.go:420-425), union all surviving slices. */
  def mergedExport(slices: Seq[TableSlice], start: LocalDate, end: LocalDate,
      rowPredicate: Column, fields: Seq[String]): DataFrame = {
    val kept = pruneSlices(slices, start, end)
    require(kept.nonEmpty, "no slice overlaps the export window")
    val dfs = kept.map { s =>
      val base = s.df().filter(rowPredicate)
      if (fields == Seq("all")) base else base.select(fields.map(col): _*)
    }
    dfs.reduce(_ unionByName _)
  }

  /** W7/W8: export artifacts — JSONL (the reference's merged-file
    * format, executor.go:514-531) or fully-quoted CSV
    * (pkg/backup/mysql.go:196-222), optionally gzipped (≙ zip+GCS). */
  def writeJsonl(df: DataFrame, path: String, compress: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }

  def writeCsv(df: DataFrame, path: String, compress: Boolean = true): Unit = {
    val w = df.write.mode("overwrite")
      .option("header", "true").option("quoteAll", "true") // QUOTE_ALL, mysql.go:196-222
      .option("nullValue", "\\N")                          // \N sentinel, mysql.go:199
    (if (compress) w.option("compression", "gzip") else w).csv(path)
  }

  /** F9 read side — load a [[writeCsv]] artifact back with the same
    * conventions (header, \N nulls, quotes); pass the original schema
    * to round-trip types exactly (CSV carries no type info). */
  def readCsv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read
      .option("header", "true").option("nullValue", "\\N")
      .schema(schema).csv(path)

  /** Year-sliced view of a TESTDATA table, standing in for the
    * reference's date-suffixed physical tables. */
  def yearSlices(spark: SparkSession, dir: String, table: String, tsCol: String,
      years: Seq[Int]): Seq[TableSlice] =
    years.map { y =>
      TableSlice(s"${table}_$y",
        () => graft.Tables(spark, dir, table).filter(year(col(tsCol)) === y),
        parseSuffixRange(s"${table}_$y"))
    }

  /** The oracle-checked export query: orders slices 1995-2001, window
    * [1997-06-01, 1999-01-01), status filter, 3-column projection. The
    * pruning step must leave exactly the 1997/1998 slices; the row
    * predicate then bounds the result. */
  def prunedMergedExport(spark: SparkSession, dir: String): DataFrame = {
    val slices = yearSlices(spark, dir, "orders", "o_orderdate", 1995 to 2001)
    val start = LocalDate.parse("1997-06-01"); val end = LocalDate.parse("1999-01-01")
    mergedExport(slices, start, end,
      col("o_orderstatus") === "F" &&
        col("o_orderdate") >= lit("1997-06-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"),
      Seq("o_orderkey", "o_orderdate", "o_totalprice"))
  }
}
