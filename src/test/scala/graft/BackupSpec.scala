package graft

import java.nio.file.Files
import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.operators.Backup

class BackupSpec extends SparkSpec {

  test("suffix parsing: year, month, day, none") {
    assert(Backup.parseSuffixRange("orders_2024") ==
      Some((LocalDate.parse("2024-01-01"), LocalDate.parse("2025-01-01"))))
    assert(Backup.parseSuffixRange("orders_202403") ==
      Some((LocalDate.parse("2024-03-01"), LocalDate.parse("2024-04-01"))))
    assert(Backup.parseSuffixRange("orders_20240315") ==
      Some((LocalDate.parse("2024-03-15"), LocalDate.parse("2024-03-16"))))
    assert(Backup.parseSuffixRange("orders") == None)
    assert(Backup.extractPrefix("orders_202403") == "orders")
    assert(Backup.extractPrefix("lineitem") == "lineitem")
  }

  test("regex discovery and prefix grouping") {
    val tables = Seq("orders_2023", "orders_2024", "lineitem_2024", "users")
    assert(Backup.discover(tables, "orders_\\d{4}") == Seq("orders_2023", "orders_2024"))
    val groups = Backup.groupByPrefix(tables)
    assert(groups("orders") == Seq("orders_2023", "orders_2024"))
    assert(groups("users") == Seq("users"))
  }

  test("pruning keeps overlapping slices and unparseable ones") {
    val slices = (1995 to 2001).map(y =>
      Backup.TableSlice(s"t_$y", () => null, Backup.parseSuffixRange(s"t_$y"))) :+
      Backup.TableSlice("t_misc", () => null, None)
    val kept = Backup.pruneSlices(slices, LocalDate.parse("1997-06-01"), LocalDate.parse("1999-01-01"))
    assert(kept.map(_.name) == Seq("t_1997", "t_1998", "t_misc"))
  }

  test("merged export equals a direct filtered scan (pruning is invisible)") {
    val viaExport = operators.Backup.prunedMergedExport(spark, sf)
    val direct = Tables(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F" &&
        col("o_orderdate") >= lit("1997-06-01").cast("timestamp") &&
        col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_orderdate", "o_totalprice")
    assert(viaExport.count() == direct.count())
    assert(viaExport.exceptAll(direct).count() == 0)
  }

  test("jsonl and quoted-csv writers round-trip") {
    import spark.implicits._
    val df = Seq((1L, "a,b", null.asInstanceOf[String]), (2L, "c\"d", "x"))
      .toDF("id", "s", "maybe")
    val jdir = Files.createTempDirectory("graft_jsonl").toString + "/out"
    Backup.writeJsonl(df, jdir)
    assert(spark.read.json(jdir).count() == 2)
    val cdir = Files.createTempDirectory("graft_csv").toString + "/out"
    Backup.writeCsv(df, cdir)
    val back = spark.read.option("header", "true").option("nullValue", "\\N").csv(cdir)
    assert(back.count() == 2)
    assert(back.filter(col("maybe").isNull).count() == 1)
    // gzip artifacts actually produced (the zip/GCS analog)
    val files = new java.io.File(cdir).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".csv.gz")))
    // F9 read side: schema-true round trip through the library reader
    val typed = Backup.readCsv(spark, cdir, df.schema)
    // CSV reads are nullable-by-construction; types/names must match
    assert(typed.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(typed.exceptAll(df).count() == 0 && df.exceptAll(typed).count() == 0)
  }

  test("sql dump round-trips hostile literals through write -> parse -> same rows") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType),
      StructField("v", DoubleType), StructField("ok", BooleanType),
      StructField("ts", TimestampType)))
    val data = Seq(
      Row(1L, "it's a 'quote'", 1.5, true, java.sql.Timestamp.valueOf("1996-01-02 03:04:05")),
      Row(2L, "back\\slash and line\nbreak", -0.25, false, null),
      Row(3L, null, null, null, java.sql.Timestamp.valueOf("2024-12-31 23:59:59")),
      Row(4L, "comma, (paren) \"double\"", 1.0e-7, true, null),
      Row(5L, "NULL", 0.0, false, null)) // the STRING 'NULL' must survive as a string
    val df = spark.createDataFrame(java.util.Arrays.asList(data: _*), schema)
    val dir = Files.createTempDirectory("graft_sql").toString + "/out"
    Backup.writeSql(df, "events_dump", dir, compress = false, rowsPerInsert = 2)

    // artifact shape: mysqldump-style multi-row INSERTs
    val lines = spark.read.textFile(dir).collect()
    assert(lines.nonEmpty)
    assert(lines.forall(l =>
      l.startsWith("INSERT INTO `events_dump` (`id`, `s`, `v`, `ok`, `ts`) VALUES ")
        && l.endsWith(";")))

    val restored = Backup.readSql(spark, dir, schema)
    def norm(d: org.apache.spark.sql.DataFrame) = d.collect().map(_.toSeq).toSet
    assert(norm(restored) == norm(df))
    // gzip variant also readable (the reference zips every artifact)
    val gzDir = Files.createTempDirectory("graft_sqlgz").toString + "/out"
    Backup.writeSql(df, "events_dump", gzDir, compress = true)
    assert(new java.io.File(gzDir).listFiles().map(_.getName).exists(_.endsWith(".txt.gz")))
    assert(norm(Backup.readSql(spark, gzDir, schema)) == norm(df))
  }

  test("sql dump round-trips binary columns (0x-hex and empty)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("payload", BinaryType)))
    val data = Seq(
      Row(1L, Array[Byte](0, 1, 127, -128, -1, 0x5a)),
      Row(2L, Array.empty[Byte]), // renders as ''
      Row(3L, null))              // renders as NULL
    val df = spark.createDataFrame(java.util.Arrays.asList(data: _*), schema)
    val dir = Files.createTempDirectory("graft_sqlbin").toString + "/out"
    Backup.writeSql(df, "blobs", dir, compress = false)
    val restored = Backup.readSql(spark, dir, schema)
    def norm(d: org.apache.spark.sql.DataFrame): Set[(Long, Option[Seq[Byte]])] =
      d.collect().map(r => (r.getLong(0),
        Option(r.get(1)).map(_.asInstanceOf[Array[Byte]].toSeq))).toSet
    assert(norm(restored) == norm(df))
  }

  test("zip artifact packages part files and the store puts it (W8)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_zip").toString
    val df = (1 to 300).map(i => (i.toLong, s"row$i")).toDF("id", "s").repartition(3)
    Backup.writeCsv(df, s"$root/export", compress = false)
    val zip = Backup.zipArtifact(spark, s"$root/export", s"$root/export.zip")

    // one entry per data part file, checksummed content intact
    val zin = new java.util.zip.ZipInputStream(new java.io.FileInputStream(zip))
    var entries = Vector.empty[String]
    var lines = 0
    try {
      var e = zin.getNextEntry
      while (e != null) {
        entries :+= e.getName
        lines += scala.io.Source.fromInputStream(zin).getLines().size
        e = zin.getNextEntry
      }
    } finally zin.close()
    assert(entries.size == 3 && entries.forall(_.endsWith(".csv")))
    assert(lines == 300 + 3) // 300 rows + one header per part

    // the upload seam: put copies the zip under the store root
    val stored = new Backup.LocalArtifactStore(s"$root/uploads")
      .put(spark, zip, "export_2024-01-01.zip")
    assert(Files.exists(java.nio.file.Paths.get(s"$root/uploads/export_2024-01-01.zip")))
    assert(Files.size(java.nio.file.Paths.get(new java.net.URI(stored).getPath)) ==
      Files.size(java.nio.file.Paths.get(zip)))
  }

  test("A8: exported file record count matches the source count") {
    import spark.implicits._
    val df = (1 to 257).map(i => (i.toLong, s"row$i")).toDF("id", "s")
    val dir = Files.createTempDirectory("graft_cnt").toString + "/out"
    Backup.writeJsonl(df, dir, compress = false)
    // the reference counts lines in the merged artifact
    // (executor.go:514-531); JSONL = one record per line
    val lines = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".json"))
      .map(f => java.nio.file.Files.readAllLines(f.toPath).size()).sum
    assert(lines == 257)
    assert(spark.read.json(dir).count() == 257)
  }
}
