package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Backup

/** The SQL-dump DataSource V2: typed round trip through
  * `spark.read.format("sqldump")`, header schema inference, and the
  * scan-level work — column pruning, filter pushdown, per-file
  * parallelism — that the v1 `Backup.readSql` path cannot do. */
class SqlDumpSourceSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType),
    StructField("v", DoubleType), StructField("ok", BooleanType),
    StructField("ts", TimestampType), StructField("d", DateType),
    StructField("amt", DecimalType(10, 2)), StructField("bin", BinaryType)))

  private def fixture(): org.apache.spark.sql.DataFrame = {
    val rows = Seq(
      Row(1L, "plain", 1.5, true, java.sql.Timestamp.valueOf("2024-03-15 10:30:00.123456"),
        java.sql.Date.valueOf("2024-03-15"), new java.math.BigDecimal("12.34"),
        Array[Byte](1, 2, -3)),
      Row(2L, "it's, (tricky)\nline", 2.5, false,
        java.sql.Timestamp.valueOf("2024-03-16 00:00:00"),
        java.sql.Date.valueOf("2024-03-16"), new java.math.BigDecimal("0.01"),
        Array.empty[Byte]),
      Row(3L, null, null, null, null, null, null, null),
      Row(44L, "x\\y", 40.25, true, java.sql.Timestamp.valueOf("2024-03-17 23:59:59"),
        java.sql.Date.valueOf("2024-03-17"), new java.math.BigDecimal("99.99"),
        Array[Byte](0)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }

  private def asComparable(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().toSet[Row].map(_.toSeq.map {
      case b: Array[Byte] => b.toSeq
      case other => other
    })

  test("typed round trip through format(sqldump), plain and gzip") {
    val df = fixture()
    for (compress <- Seq(false, true)) {
      val dir = Files.createTempDirectory("sqldump_v2").toString
      Backup.writeSql(df, "t", dir, compress = compress)
      val back = spark.read.format("sqldump").schema(schema).load(dir)
      assert(asComparable(back) == asComparable(df))
    }
  }

  test("schema inference: header column names, all STRING") {
    val dir = Files.createTempDirectory("sqldump_infer").toString
    Backup.writeSql(fixture(), "t", dir, compress = false)
    val back = spark.read.format("sqldump").load(dir)
    assert(back.schema.fields.map(_.name).toSeq == schema.fields.map(_.name).toSeq)
    assert(back.schema.fields.forall(_.dataType == StringType))
    // untyped values are the dump texts (NULL → null)
    val byId = back.collect().map(r => r.getString(0) -> r).toMap
    assert(byId("1").getString(2) == "1.5")
    assert(byId("3").isNullAt(1))
  }

  test("column pruning reaches the scan: only projected columns in ReadSchema") {
    val dir = Files.createTempDirectory("sqldump_prune").toString
    Backup.writeSql(fixture(), "t", dir, compress = false)
    val proj = spark.read.format("sqldump").schema(schema).load(dir).select("s", "id")
    val plan = proj.queryExecution.executedPlan.toString
    assert(plan.contains("GraftSqlDump"))
    val read = plan.substring(plan.indexOf("ReadSchema: "))
    assert(read.contains("s:string") && read.contains("id:bigint"))
    assert(!read.contains("amt") && !read.contains("ts"))
    assert(proj.collect().length == 4)
  }

  test("comparison filters push into the scan; unsupported ones stay residual") {
    val dir = Files.createTempDirectory("sqldump_filter").toString
    Backup.writeSql(fixture(), "t", dir, compress = false)
    val base = spark.read.format("sqldump").schema(schema).load(dir)

    val pushedQ = base.filter(col("v") > 2.0).select("id")
    val plan = pushedQ.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThan(v,2.0)"), plan)
    assert(pushedQ.collect().map(_.getLong(0)).toSet == Set(2L, 44L))

    // string EndsWith is not in the pushable set: declined → Spark
    // re-applies it above the scan, result stays correct
    val residualQ = base.filter(col("s").endsWith("y")).select("id")
    val rplan = residualQ.queryExecution.executedPlan.toString
    assert(!rplan.contains("PushedFilters: [StringEndsWith"), rplan)
    assert(residualQ.collect().map(_.getLong(0)).toSet == Set(44L))

    // null-semantics: pushed comparison never matches a NULL row (id=3)
    assert(base.filter(col("v") <= 1000.0).count() == 3)
  }

  test("one input partition per part file") {
    val dir = Files.createTempDirectory("sqldump_parallel").toString
    Backup.writeSql(fixture().repartition(3), "t", dir, compress = false)
    val back = spark.read.format("sqldump").schema(schema).load(dir)
    assert(back.rdd.getNumPartitions == 3)
    assert(back.count() == 4)
  }

  test("v2 write: typed round trip, one part file per partition, no temp residue") {
    val df = fixture()
    for (compress <- Seq(false, true)) {
      val dir = Files.createTempDirectory("sqldump_w").toString
      df.repartition(2).write.format("sqldump")
        .option("table", "t").option("compress", compress.toString)
        .mode("overwrite").save(dir)
      // visible files only: the local FS adds hidden .crc siblings,
      // which every reader path already skips
      val names = new java.io.File(dir).listFiles().map(_.getName)
        .filterNot(_.startsWith("."))
      assert(names.count(_.startsWith("part-")) == 2, names.toSeq)
      assert(!names.exists(_.startsWith("_")), s"temp residue: ${names.toSeq}")
      assert(names.forall(_.endsWith(if (compress) ".sql.gz" else ".sql")))
      val back = spark.read.format("sqldump").schema(schema).load(dir)
      assert(asComparable(back) == asComparable(df))
      // writeSql's reader accepts the v2 artifact too (shared renderer)
      assert(asComparable(Backup.readSql(spark, dir, schema)) == asComparable(df))
    }
  }

  test("v2 write: overwrite truncates, append accumulates") {
    val dir = Files.createTempDirectory("sqldump_modes").toString
    val df = fixture()
    df.write.format("sqldump").option("table", "t").mode("overwrite").save(dir)
    df.write.format("sqldump").option("table", "t").mode("overwrite").save(dir)
    val once = spark.read.format("sqldump").schema(schema).load(dir)
    assert(once.count() == 4, "overwrite must replace, not accumulate")
    df.write.format("sqldump").option("table", "t").mode("append").save(dir)
    val twice = spark.read.format("sqldump").schema(schema).load(dir)
    assert(twice.count() == 8, "append must accumulate")
    assert(asComparable(once) == asComparable(df))
  }

  test("v2 streaming write: epochs accumulate exactly once across restarts; replayed commit is a no-op") {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = Files.createTempDirectory("sqldump_ssrc").toString
    val outDir = Files.createTempDirectory("sqldump_sout").toString
    val ckpt = Files.createTempDirectory("sqldump_sckpt").toString
    val streamSchema = StructType(Seq(
      StructField("id", LongType), StructField("s", StringType)))
    def drop(name: String, rows: Seq[(Long, String)]): Unit = {
      val json = rows.map { case (i, s) => s"""{"id":$i,"s":"$s"}""" }.mkString("\n")
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(srcDir, name), json)
    }
    def runOnce(): Unit = {
      val q = spark.readStream.schema(streamSchema).json(srcDir)
        .writeStream.format("sqldump")
        .option("table", "t").option("compress", "false")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start(outDir)
      q.awaitTermination()
    }
    drop("a.json", Seq(1L -> "one", 2L -> "two"))
    runOnce()
    drop("b.json", Seq(3L -> "three"))
    runOnce()
    runOnce() // no new data: no new epoch output
    val back = spark.read.format("sqldump").schema(streamSchema).load(outDir)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set(1L -> "one", 2L -> "two", 3L -> "three"))
    // replayed epoch commit publishes nothing twice: re-commit epoch 0
    // with a fresh temp file, marker already present
    val sw = new graft.sources.SqlDumpStreamingWrite(
      streamSchema, outDir, "t", false, 500, "replayq")
    val fac = sw.createStreamingWriterFactory(null)
    val w = fac.createWriter(0, 99L, 0L)
    w.write(org.apache.spark.sql.catalyst.InternalRow(
      7L, org.apache.spark.unsafe.types.UTF8String.fromString("seven")))
    val msg = w.commit()
    val before = new java.io.File(outDir).listFiles()
      .map(_.getName).filter(_.startsWith("part-")).toSet
    sw.commit(0L, Array(msg)) // epoch 0 already committed by the query
    val after = new java.io.File(outDir).listFiles()
      .map(_.getName).filter(_.startsWith("part-")).toSet
    assert(after == before, "replayed commit must publish nothing")
    assert(spark.read.format("sqldump").schema(streamSchema).load(outDir).count() == 3)
  }

  test("v2 write: statement batching honors rowsPerInsert") {
    val dir = Files.createTempDirectory("sqldump_batch").toString
    fixture().coalesce(1).write.format("sqldump")
      .option("table", "t").option("compress", "false").option("rowsPerInsert", "2")
      .mode("overwrite").save(dir)
    val lines = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".sql"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
      .filter(_.nonEmpty)
    assert(lines.length == 2, s"4 rows / rowsPerInsert=2 = 2 statements, got ${lines.length}")
    assert(lines.forall(_.startsWith("INSERT INTO `t` (")))
  }
}
