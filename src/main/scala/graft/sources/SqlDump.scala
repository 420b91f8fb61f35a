package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.compress.CompressionCodecFactory
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, IsNotNull, IsNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.Backup

/** DataSource V2 batch reader for the engine's SQL-dump export format
  * ([[graft.operators.Backup.writeSql]] — the re-expression of the
  * reference's mysqldump-shaped backup artifacts,
  * pkg/backup/mysql.go:105-164,380-516). `Backup.readSql` restores a
  * dump through `textFile → flatMap`; this connector makes the same
  * artifacts first-class Spark tables:
  *
  * {{{
  * spark.read.format("sqldump").schema(schema).load("/backups/orders")
  * }}}
  *
  * with the scan work a v1 restore cannot do:
  *
  *  - **Column pruning during parse** — only the projected (or
  *    filter-referenced) positions of each VALUES tuple are decoded to
  *    typed values; the rest stay untouched text. On a wide dump a
  *    2-column projection skips most of the per-row conversion cost.
  *  - **Filter pushdown** — comparison/null predicates are evaluated on
  *    the parsed JVM values before any InternalRow is built, so
  *    filtered-out rows never materialize. Residual (unsupported)
  *    filters are declined and re-applied by Spark above the scan.
  *  - **File-granular parallelism** — one input partition per part
  *    file, so a dump written by N tasks reads back with N-way
  *    parallelism, gzip part files included (codec via the standard
  *    Hadoop factory).
  *
  * Schema: pass the table's original schema for a typed round trip
  * (dumps carry no type info — same contract as `readSql`). Without
  * one, the schema is inferred from the first INSERT header: column
  * names exact, every column `STRING`.
  */
final class SqlDumpSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sqldump"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SqlDump.inferSchema(SqlDump.pathOf(options.asScala.toMap))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new SqlDumpTable(schema, SqlDump.pathOf(properties.asScala.toMap))
}

final class SqlDumpTable(schema: StructType, path: String)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"sqldump($path)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.STREAMING_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SqlDumpScanBuilder(schema, path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new SqlDumpWriteBuilder(info, path)
}

final class SqlDumpScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition(SqlDump.evaluable(fullSchema, _))
    pushed = accepted
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new SqlDumpScan(fullSchema, required, pushed, path)
}

final class SqlDumpScan(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], path: String) extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSqlDump $path, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] =
    SqlDump.listPartFiles(path).map(f => SqlDumpPartition(f): InputPartition)

  override def createReaderFactory(): PartitionReaderFactory =
    new SqlDumpReaderFactory(fullSchema, required, pushed)
}

final case class SqlDumpPartition(file: String) extends InputPartition

final class SqlDumpReaderFactory(fullSchema: StructType, required: StructType,
    pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new SqlDumpPartitionReader(fullSchema, required, pushed,
      p.asInstanceOf[SqlDumpPartition].file)
}

/** Streams one part file: line → INSERT tuples → (filter on parsed
  * externals) → InternalRow of the pruned columns. Only positions that
  * the projection or a pushed filter touches are ever decoded. */
final class SqlDumpPartitionReader(fullSchema: StructType, required: StructType,
    pushed: Array[Filter], file: String) extends PartitionReader[InternalRow] {

  private val reqIdx = required.fields.map(f => fullSchema.fieldIndex(f.name))
  private val filterEvals = pushed.map(SqlDump.compile(fullSchema, _))
  private val neededIdx =
    (reqIdx ++ pushed.flatMap(_.references.map(fullSchema.fieldIndex))).distinct.sorted

  private val reader = SqlDump.openLines(file)
  private var lineTuples: Iterator[Seq[(String, Boolean)]] = Iterator.empty
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (true) {
      if (lineTuples.hasNext) {
        val tuple = lineTuples.next()
        require(tuple.length == fullSchema.length,
          s"tuple arity ${tuple.length} != schema arity ${fullSchema.length} in $file")
        // decode only the touched positions to external JVM values
        val ext = new Array[Any](fullSchema.length)
        var i = 0
        while (i < neededIdx.length) {
          val c = neededIdx(i)
          val (text, quoted) = tuple(c)
          ext(c) = Backup.parseSqlValue(text, quoted, fullSchema(c).dataType)
          i += 1
        }
        if (filterEvals.forall(_(ext))) {
          current = new GenericInternalRow(reqIdx.map(c =>
            SqlDump.toCatalyst(ext(c), fullSchema(c).dataType)))
          return true
        }
      } else {
        val line = reader.readLine()
        if (line == null) return false
        if (line.nonEmpty) lineTuples = Backup.parseInsertTuples(line).iterator
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}

// ---- DataSource V2 write path ---------------------------------------

/** Batch write for the dump format — the sink half of the connector:
  *
  * {{{
  * df.write.format("sqldump").option("table", "orders")
  *   .mode("overwrite").save("/backups/orders")
  * }}}
  *
  * Spark's V2 commit protocol, done properly for a cluster:
  *
  *  - Each task renders its partition to
  *    `_temporary/<queryId>/part-<partition>-<task>.sql[.gz]` — the
  *    task attempt id in the name makes speculative/retried attempts
  *    collision-free; only the attempt whose [[SqlDumpTaskWriter.commit]]
  *    message reaches the driver gets published.
  *  - Job [[SqlDumpBatchWrite.commit]] (driver, exactly once) clears
  *    the old part files iff the builder saw `truncate()` (= mode
  *    "overwrite"), renames exactly the COMMITTED temp files into
  *    place, and drops the temp dir. `abort` drops the temp dir and
  *    publishes nothing — readers never observe a half-written dump.
  *
  * Options: `table` (INSERT target name; default = last path segment),
  * `compress` (gzip part files; default true), `rowsPerInsert`
  * (default 500 — [[graft.operators.Backup.writeSql]]'s statement
  * batching). Rendering is byte-identical to `writeSql` (shared
  * literal renderer), so either writer's artifacts restore through
  * either reader. */
final class SqlDumpWriteBuilder(
    info: org.apache.spark.sql.connector.write.LogicalWriteInfo, path: String)
    extends org.apache.spark.sql.connector.write.WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsTruncate {
  private var doTruncate = false
  override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
    doTruncate = true; this
  }
  override def build(): org.apache.spark.sql.connector.write.Write =
    new org.apache.spark.sql.connector.write.Write {
      private def table = Option(info.options.get("table"))
        .getOrElse(new Path(path).getName)
      private def compress = Option(info.options.get("compress")).forall(_.toBoolean)
      private def rpi =
        Option(info.options.get("rowsPerInsert")).map(_.toInt).getOrElse(500)
      override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
        new SqlDumpBatchWrite(info.schema(), path, table, compress, rpi,
          info.queryId(), doTruncate)
      override def toStreaming
          : org.apache.spark.sql.connector.write.streaming.StreamingWrite =
        new SqlDumpStreamingWrite(info.schema(), path, table, compress, rpi,
          info.queryId())
    }
}

/** Streaming face of the dump sink — `writeStream.format("sqldump")`,
  * append mode. Exactly-once across micro-batch REPLAYS: Spark may
  * re-run an epoch whose sink commit completed but whose checkpoint
  * offset write did not; `commit(epochId, …)` is IDEMPOTENT — a
  * `_committed_<epoch>` marker records completion, and a replayed
  * commit sees the marker, discards its temp files, and publishes
  * nothing twice (the file-sink-log idea, one marker per epoch).
  * Part names carry the epoch (`part-e<epoch>-<partition>.sql`), so
  * epochs never collide and the batch reader reads the accumulated
  * dump as one table. */
final class SqlDumpStreamingWrite(schema: StructType, path: String, table: String,
    compress: Boolean, rowsPerInsert: Int, queryId: String)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {

  override def createStreamingWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new SqlDumpStreamingWriterFactory(schema,
      new Path(path, s"_temporary/$queryId").toString, table, compress, rowsPerInsert)

  override def commit(epochId: Long,
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    fs.mkdirs(dir)
    val marker = new Path(dir, s"_committed_$epochId")
    if (fs.exists(marker)) {
      // replayed epoch: already published — drop the re-run's temps
      messages.foreach { case SqlDumpCommit(temp, _) =>
        fs.delete(new Path(temp), false)
      }
    } else {
      val suffix = if (compress) ".sql.gz" else ".sql"
      messages.foreach { case SqlDumpCommit(temp, pid) =>
        fs.rename(new Path(temp), new Path(dir, f"part-e$epochId%05d-$pid%05d$suffix"))
      }
      fs.create(marker, true).close()
    }
  }

  override def abort(epochId: Long,
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val fs = new Path(path).getFileSystem(new Configuration())
    messages.foreach { case SqlDumpCommit(temp, _) =>
      fs.delete(new Path(temp), false)
    }
  }
}

final class SqlDumpStreamingWriterFactory(schema: StructType, tempDir: String,
    table: String, compress: Boolean, rowsPerInsert: Int)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new SqlDumpTaskWriter(schema, s"$tempDir-e$epochId", table, compress,
      rowsPerInsert, partitionId, taskId)
}

final case class SqlDumpCommit(tempFile: String, partitionId: Int)
    extends org.apache.spark.sql.connector.write.WriterCommitMessage

final class SqlDumpBatchWrite(schema: StructType, path: String, table: String,
    compress: Boolean, rowsPerInsert: Int, queryId: String, truncate: Boolean)
    extends org.apache.spark.sql.connector.write.BatchWrite {

  private def tempDir = new Path(path, s"_temporary/$queryId")

  override def createBatchWriterFactory(
      info: org.apache.spark.sql.connector.write.PhysicalWriteInfo)
      : org.apache.spark.sql.connector.write.DataWriterFactory =
    new SqlDumpWriterFactory(schema, tempDir.toString, table, compress, rowsPerInsert)

  override def commit(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val dir = new Path(path)
    val fs = dir.getFileSystem(new Configuration())
    if (truncate && fs.exists(dir))
      fs.listStatus(dir).filter(_.isFile).map(_.getPath)
        .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
        .foreach(fs.delete(_, false))
    fs.mkdirs(dir)
    // the queryId fragment keeps APPENDED part files from colliding
    // with a prior write's same-partition names (rename onto an
    // existing path is not a replace on every Hadoop FS)
    val tag = queryId.replaceAll("[^0-9a-zA-Z]", "").take(8)
    messages.foreach { case SqlDumpCommit(temp, pid) =>
      val suffix = if (compress) ".sql.gz" else ".sql"
      fs.rename(new Path(temp), new Path(dir, f"part-$pid%05d-$tag$suffix"))
    }
    fs.delete(tempDir, true)
    // drop _temporary entirely when no other query is mid-write
    val tparent = tempDir.getParent
    if (fs.exists(tparent) && fs.listStatus(tparent).isEmpty) fs.delete(tparent, true)
  }

  override def abort(
      messages: Array[org.apache.spark.sql.connector.write.WriterCommitMessage]): Unit = {
    val fs = tempDir.getFileSystem(new Configuration())
    fs.delete(tempDir, true)
  }
}

final class SqlDumpWriterFactory(schema: StructType, tempDir: String,
    table: String, compress: Boolean, rowsPerInsert: Int)
    extends org.apache.spark.sql.connector.write.DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[InternalRow] =
    new SqlDumpTaskWriter(schema, tempDir, table, compress, rowsPerInsert,
      partitionId, taskId)
}

/** Renders one partition; buffers at most `rowsPerInsert` tuple strings
  * before flushing a statement line (bounded memory at any row count). */
final class SqlDumpTaskWriter(schema: StructType, tempDir: String, table: String,
    compress: Boolean, rowsPerInsert: Int, partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DataWriter[InternalRow] {

  private val header = schema.fieldNames.map(n => s"`$n`")
    .mkString(s"INSERT INTO `$table` (", ", ", ") VALUES ")
  private val tempFile =
    new Path(tempDir, s"part-$partitionId-$taskId.sql" + (if (compress) ".gz" else ""))
  private val out: java.io.Writer = {
    val fs = tempFile.getFileSystem(new Configuration())
    val raw: java.io.OutputStream = fs.create(tempFile, true)
    val s = if (compress) new java.util.zip.GZIPOutputStream(raw) else raw
    new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(s, java.nio.charset.StandardCharsets.UTF_8))
  }
  private val buf = new scala.collection.mutable.ArrayBuffer[String](rowsPerInsert)

  private def flush(): Unit = if (buf.nonEmpty) {
    out.write(header + buf.mkString(",") + ";\n")
    buf.clear()
  }

  override def write(row: InternalRow): Unit = {
    val tuple = schema.fields.indices.map { i =>
      val dt = schema.fields(i).dataType
      val ext: Any =
        if (row.isNullAt(i)) null
        else dt match {
          case StringType => row.getUTF8String(i).toString
          case TimestampType => DateTimeUtils.toJavaTimestamp(row.getLong(i))
          case TimestampNTZType => DateTimeUtils.microsToLocalDateTime(row.getLong(i))
          case DateType => DateTimeUtils.toJavaDate(row.getInt(i))
          case d: DecimalType => row.getDecimal(i, d.precision, d.scale).toJavaBigDecimal
          case _ => row.get(i, dt)
        }
      Backup.sqlLiteral(ext)
    }.mkString("(", ",", ")")
    buf += tuple
    if (buf.length >= rowsPerInsert) flush()
  }

  override def commit(): org.apache.spark.sql.connector.write.WriterCommitMessage = {
    flush(); out.close()
    SqlDumpCommit(tempFile.toString, partitionId)
  }

  override def abort(): Unit = {
    out.close()
    tempFile.getFileSystem(new Configuration()).delete(tempFile, false)
  }

  override def close(): Unit = ()
}

private[sources] object SqlDump {

  def pathOf(opts: Map[String, String]): String =
    opts.getOrElse("path", throw new IllegalArgumentException(
      "sqldump: a single load(path) is required"))

  /** Non-hidden part files under `path` (a file or a flat export dir). */
  def listPartFiles(path: String): Array[String] = {
    val p = new Path(path)
    val fs = p.getFileSystem(new Configuration())
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory)
        fs.listStatus(p).filter(_.isFile).map(_.getPath)
          .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
      else Array(p)
    files.map(_.toString).sorted
  }

  /** Buffered line reader with transparent Hadoop codec (.gz) decode. */
  def openLines(file: String): java.io.BufferedReader = {
    val conf = new Configuration()
    val p = new Path(file)
    val raw: java.io.InputStream = p.getFileSystem(conf).open(p)
    val codec = new CompressionCodecFactory(conf).getCodec(p)
    val in = if (codec == null) raw else codec.createInputStream(raw)
    new java.io.BufferedReader(
      new java.io.InputStreamReader(in, java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Column names from the first INSERT header; all STRING (dumps are
    * untyped text — same contract as [[Backup.readSql]]'s schema arg). */
  def inferSchema(path: String): StructType = {
    val files = listPartFiles(path)
    require(files.nonEmpty, s"sqldump: no part files under $path")
    val r = openLines(files.head)
    try {
      val line = r.readLine()
      require(line != null, s"sqldump: ${files.head} is empty")
      val open = line.indexOf('(')
      val close = line.indexOf(')', open + 1)
      require(open >= 0 && close > open && line.contains(" VALUES "),
        s"sqldump: not an INSERT header: ${line.take(80)}")
      StructType(line.substring(open + 1, close).split(',')
        .map(c => StructField(c.trim.stripPrefix("`").stripSuffix("`"), StringType)))
    } finally r.close()
  }

  /** Orderable column: the comparison filters compile for these. */
  private def orderable(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType | ShortType | ByteType |
         DoubleType | FloatType | TimestampType | DateType | _: DecimalType => true
    case _ => false
  }

  def evaluable(schema: StructType, f: Filter): Boolean = f match {
    case IsNull(a) => schema.fieldNames.contains(a)
    case IsNotNull(a) => schema.fieldNames.contains(a)
    case EqualTo(a, _) => schema.fieldNames.contains(a) &&
      (orderable(schema(a).dataType) || schema(a).dataType == BooleanType)
    case GreaterThan(a, _) => schema.fieldNames.contains(a) && orderable(schema(a).dataType)
    case GreaterThanOrEqual(a, _) => schema.fieldNames.contains(a) && orderable(schema(a).dataType)
    case LessThan(a, _) => schema.fieldNames.contains(a) && orderable(schema(a).dataType)
    case LessThanOrEqual(a, _) => schema.fieldNames.contains(a) && orderable(schema(a).dataType)
    case _ => false
  }

  /** Compile an accepted filter to a predicate over the external-value
    * array (null semantics: comparisons with null are false). */
  def compile(schema: StructType, f: Filter): Array[Any] => Boolean = {
    def idx(a: String) = schema.fieldIndex(a)
    def cmpAt(a: String, v: Any, keep: Int => Boolean): Array[Any] => Boolean = {
      val i = idx(a)
      ext => ext(i) != null && keep(cmp(ext(i), v))
    }
    f match {
      case IsNull(a) => val i = idx(a); ext => ext(i) == null
      case IsNotNull(a) => val i = idx(a); ext => ext(i) != null
      case EqualTo(a, v) => val i = idx(a); ext => ext(i) != null && ext(i) == v
      case GreaterThan(a, v) => cmpAt(a, v, _ > 0)
      case GreaterThanOrEqual(a, v) => cmpAt(a, v, _ >= 0)
      case LessThan(a, v) => cmpAt(a, v, _ < 0)
      case LessThanOrEqual(a, v) => cmpAt(a, v, _ <= 0)
      case other => throw new IllegalStateException(s"unpushable filter $other")
    }
  }

  /** Both sides come from the same column's external type (the filter
    * literal is Catalyst-external for that type), so raw Comparable is
    * sound; LocalDate/Instant literals (java8 datetime API) are bridged
    * to the parser's java.sql externals first. */
  private def cmp(a: Any, b: Any): Int = {
    val bb = b match {
      case d: java.time.LocalDate => java.sql.Date.valueOf(d)
      case t: java.time.Instant   => java.sql.Timestamp.from(t)
      case other                  => other
    }
    a.asInstanceOf[Comparable[Any]].compareTo(bb)
  }

  /** External JVM value → Catalyst internal value. */
  def toCatalyst(v: Any, dt: DataType): Any = v match {
    case null => null
    case s: String => UTF8String.fromString(s)
    case t: java.sql.Timestamp => DateTimeUtils.fromJavaTimestamp(t)
    case l: java.time.LocalDateTime => DateTimeUtils.localDateTimeToMicros(l)
    case d: java.sql.Date => DateTimeUtils.fromJavaDate(d)
    case b: java.math.BigDecimal =>
      val d = dt.asInstanceOf[DecimalType]
      Decimal(b.setScale(d.scale), d.precision, d.scale)
    case other => other // primitives, Array[Byte]
  }
}
