package graft.sources

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.ChangeEvents

/** DataSource V2 STREAMING source for the change-event log — the
  * engine's own `MicroBatchStream` over a change-event drop directory,
  * replacing the generic file stream + JSON reader for the CDC pillar
  * with a source that speaks the reference's resume-token protocol
  * first-class (retail-ai-inc/sync pkg/syncer/mongodb/mongodb.go:1561-1638:
  * the watcher resumes from a persisted token and re-persists it only
  * after a durable flush).
  *
  * {{{
  * spark.readStream.format("changelog").load("/cdc/events")
  * }}}
  *
  * Contract with Structured Streaming's two-phase log:
  *
  *  - **Offsets** ([[ChangeLogOffset]]) are positions in the
  *    append-only file log, ordered by (modificationTime, name) —
  *    arrival order, immune to the lexicographic shuffling of UUID
  *    part names. `latestOffset` is a pure LIST of the directory
  *    (metadata-sized); no data is read at planning time.
  *  - **planInputPartitions(start, end)** is exactly the files that
  *    arrived in `(start, end]` — one partition per file, so a batch
  *    dropped as N part files parses with N-way task parallelism (the
  *    reference's ≤8 parse workers, as cluster tasks).
  *  - **commit(end)** re-persists the RESUME TOKEN — a tiny JSON file
  *    under the stream's checkpoint dir — only after the micro-batch
  *    is durably complete, mirroring the gated token write. Restart
  *    replays from Spark's own offset log (deserializeOffset); the
  *    token is the cross-system surface an operator (or the
  *    reference's resume path) reads, and the spec asserts it never
  *    runs ahead of commits.
  *
  * The schema is the canonical [[ChangeEvents.schema]] — this source
  * IS that contract; ts parses from the engine's wire format
  * ([[graft.streaming.SessionStream.TsFormat]]) or plain
  * `yyyy-MM-dd HH:mm:ss`. Append-only directory assumption: files are
  * never rewritten once dropped (the CDC drop convention the file
  * stream already relied on).
  */
final class ChangeLogSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "changelog"
  override def supportsExternalMetadata(): Boolean = true
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChangeEvents.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    require(schema == ChangeEvents.schema,
      "changelog: the schema is the canonical ChangeEvents contract")
    new ChangeLogTable(SqlDump.pathOf(properties.asScala.toMap))
  }
}

final class ChangeLogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"changelog($path)"
  override def schema(): StructType = ChangeEvents.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ, TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new ChangeLogScan(path,
        Option(options.get("maxfilespertrigger")).map(_.toInt))
    }
}

final class ChangeLogScan(path: String, maxFilesPerTrigger: Option[Int])
    extends Scan with org.apache.spark.sql.connector.read.Batch {
  override def readSchema(): StructType = ChangeEvents.schema
  override def description(): String = s"GraftChangeLog $path"
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChangeLogMicroBatchStream(path, checkpointLocation, maxFilesPerTrigger)

  // batch face (`spark.read.format("changelog")`): the bootstrap /
  // backfill read over the whole log — same per-file partitions and
  // reader as the stream, no checkpoint involved
  override def toBatch: org.apache.spark.sql.connector.read.Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    new ChangeLogMicroBatchStream(path, "unused-batch", None).allFiles()
      .map(f => ChangeLogPartition(f): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeLogReaderFactory
}

/** Position in the append-only change log: `n` files consumed, the
  * last being `last` ("modTime/name", a drift guard). */
final case class ChangeLogOffset(n: Int, last: String) extends Offset {
  override def json(): String = {
    val m = new ObjectMapper()
    val node = m.createObjectNode()
    node.put("n", n); node.put("last", last)
    m.writeValueAsString(node)
  }
}

final class ChangeLogMicroBatchStream(path: String, checkpointLocation: String,
    maxFilesPerTrigger: Option[Int] = None)
    extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  private def fs = new Path(path).getFileSystem(new Configuration())

  // Trigger.AvailableNow contract: pin the drain target ONCE at query
  // start; the engine then loops capped micro-batches until the log's
  // pinned prefix is consumed (without this interface Spark falls
  // back to a single uncapped batch and admission control is moot)
  private var availableNowEnd: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowEnd = Some(listLog().length)

  /** ST1–ST3 parity for the custom source: the reference's apply-batch
    * cap (mongodb.go:258) as Spark admission control — a trigger
    * admits at most `maxFilesPerTrigger` new files; AvailableNow keeps
    * triggering until the log drains. */
  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    maxFilesPerTrigger
      .map(org.apache.spark.sql.connector.read.streaming.ReadLimit.maxFiles)
      .getOrElse(
        org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable())

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit): Offset = {
    val log = listLog()
    val avail = availableNowEnd.fold(log.length)(math.min(_, log.length))
    if (avail == 0) return ChangeLogOffset(0, "")
    val s = start.asInstanceOf[ChangeLogOffset].n
    val e = limit match {
      case m: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        math.min(avail, s + m.maxFiles())
      case _ => avail
    }
    if (e == 0) ChangeLogOffset(0, "")
    else ChangeLogOffset(e, s"${log(e - 1)._1}/${log(e - 1)._2}")
  }

  override def reportLatestOffset(): Offset = latestOffset()

  /** All current log files, in arrival order (the batch face's plan). */
  private[sources] def allFiles(): Array[String] = listLog().map(_._2)

  /** The log, in arrival order — metadata listing only. */
  private def listLog(): Array[(Long, String)] = {
    val p = new Path(path)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).filter(_.isFile)
      .filterNot(f => f.getPath.getName.startsWith("_") ||
        f.getPath.getName.startsWith("."))
      .map(f => (f.getModificationTime, f.getPath.toString))
      .sortBy { case (t, n) => (t, n) }
  }

  override def initialOffset(): Offset = ChangeLogOffset(0, "")

  override def latestOffset(): Offset = {
    val log = listLog()
    if (log.isEmpty) ChangeLogOffset(0, "")
    else ChangeLogOffset(log.length, s"${log.last._1}/${log.last._2}")
  }

  override def deserializeOffset(json: String): Offset = {
    val node: JsonNode = new ObjectMapper().readTree(json)
    ChangeLogOffset(node.get("n").asInt(), node.get("last").asText())
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[ChangeLogOffset].n,
      end.asInstanceOf[ChangeLogOffset].n)
    val log = listLog()
    require(log.length >= e,
      s"changelog: $path shrank below a planned offset ($e > ${log.length}) — " +
        "the log directory must be append-only")
    log.slice(s, e).map { case (_, f) => ChangeLogPartition(f): InputPartition }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangeLogReaderFactory

  /** The gated resume-token write: only after Spark marks the batch
    * durably complete does the token advance — an external consumer
    * (or a cold operator inspection) never sees a token ahead of the
    * committed state, the reference's flush-then-persist order. */
  override def commit(end: Offset): Unit = {
    val dir = new Path(checkpointLocation)
    val cfs = dir.getFileSystem(new Configuration())
    cfs.mkdirs(dir)
    val tmp = new Path(dir, "_resume_token.tmp")
    val out = cfs.create(tmp, true)
    try out.write(end.json().getBytes("UTF-8")) finally out.close()
    val token = new Path(dir, "resume_token")
    cfs.delete(token, false)
    require(cfs.rename(tmp, token), s"changelog: token swap failed under $dir")
  }

  override def stop(): Unit = ()
}

object ChangeLogMicroBatchStream {
  /** Read face of the persisted resume token (None before first
    * commit). Accepts either the stream's checkpoint ROOT (Spark
    * hands each source `<root>/sources/<i>` — probed here) or the
    * per-source directory itself. */
  def resumeToken(spark: org.apache.spark.sql.SparkSession,
      checkpointLocation: String): Option[ChangeLogOffset] = {
    val root = new Path(checkpointLocation)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val direct = new Path(root, "resume_token")
    val candidates: Seq[Path] =
      if (fs.exists(direct)) Seq(direct)
      else {
        val srcs = new Path(root, "sources")
        if (!fs.exists(srcs)) Nil
        else fs.listStatus(srcs).filter(_.isDirectory)
          .map(s => new Path(s.getPath, "resume_token")).filter(fs.exists).toSeq
      }
    candidates.headOption.map { p =>
      val in = fs.open(p)
      try {
        val node = new ObjectMapper().readTree(in)
        ChangeLogOffset(node.get("n").asInt(), node.get("last").asText())
      } finally in.close()
    }
  }
}

final case class ChangeLogPartition(file: String) extends InputPartition

final class ChangeLogReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new ChangeLogPartitionReader(p.asInstanceOf[ChangeLogPartition].file)
}

/** One JSONL change-event file → typed InternalRows of the canonical
  * schema. Blank lines skip; a malformed line fails the task loudly
  * (a corrupt change log must never silently drop operations —
  * at-least-once demands the error surface, and the DLQ path above
  * this source owns retry). */
final class ChangeLogPartitionReader(file: String)
    extends PartitionReader[InternalRow] {

  private val mapper = new ObjectMapper()
  private val reader = SqlDump.openLines(file)
  private var current: InternalRow = _

  private val plainTs = java.time.format.DateTimeFormatter.ofPattern(
    "yyyy-MM-dd HH:mm:ss[.SSS]")

  /** ISO offset (the wire format / Spark's JSON default, any fraction
    * width), ISO local, or the plain `yyyy-MM-dd HH:mm:ss` face —
    * offset-less values read as UTC (the session convention). */
  private def tsMicros(s: String): Long = {
    import java.time.format.{DateTimeFormatter, DateTimeParseException}
    val inst =
      try java.time.OffsetDateTime.parse(s, DateTimeFormatter.ISO_OFFSET_DATE_TIME).toInstant
      catch { case _: DateTimeParseException =>
        val ldt =
          try java.time.LocalDateTime.parse(s, DateTimeFormatter.ISO_LOCAL_DATE_TIME)
          catch { case _: DateTimeParseException =>
            java.time.LocalDateTime.parse(s, plainTs) }
        ldt.toInstant(java.time.ZoneOffset.UTC)
      }
    inst.getEpochSecond * 1000000L + inst.getNano / 1000L
  }

  override def next(): Boolean = {
    var line = reader.readLine()
    while (line != null && line.trim.isEmpty) line = reader.readLine()
    if (line == null) return false
    val n = mapper.readTree(line)
    def strOrNull(name: String): UTF8String =
      if (n.hasNonNull(name)) UTF8String.fromString(n.get(name).asText()) else null
    val after: InternalRow =
      if (n.hasNonNull("after")) {
        val a = n.get("after")
        new GenericInternalRow(Array[Any](
          if (a.hasNonNull("value")) a.get("value").asDouble() else null,
          if (a.hasNonNull("k")) a.get("k").asLong() else null))
      } else null
    require(n.hasNonNull("op") && n.hasNonNull("key") &&
      n.hasNonNull("ts") && n.hasNonNull("offset"),
      s"changelog: malformed change event in $file: ${line.take(120)}")
    current = new GenericInternalRow(Array[Any](
      UTF8String.fromString(n.get("op").asText()),
      n.get("key").asLong(),
      after,
      strOrNull("sourceDb"),
      strOrNull("sourceTable"),
      tsMicros(n.get("ts").asText()),
      n.get("offset").asLong()))
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
