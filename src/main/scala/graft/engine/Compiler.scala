package graft.engine

import graft.model.{CountCondition, SyncTaskSpec, TableMapping}
import graft.streaming.{CdcPipeline, KvPipeline}

/** Spec→pipeline compiler: turns one [[SyncTaskSpec]] into the per-table
  * pipeline configs the streaming layer runs — the typed analogue of the
  * reference's `startSyncTasks` dispatch (reference cmd/sync/main.go:148-188),
  * where each enabled task fans out one syncer per mapped table.
  *
  * Layout conventions (the engine's DSN): a task's `sourceDir` /
  * `targetDir` / `checkpointDir` / `dlqDir` are roots holding one
  * subdirectory per table, so pipelines never share a checkpoint or DLQ.
  */
object Compiler {

  sealed trait PipelineDef { def name: String }

  /** The syncIndexes compilation: replay these index specs (diffed
    * against the target's existing names, then CREATE INDEX) on the
    * JDBC connection at pipeline start — copyIndexes,
    * reference mongodb.go:313-321. The key-column index is the one
    * structural spec the engine knows for its file-based sources. */
  final case class IndexSync(jdbcUrl: String, table: String,
      indexes: Seq[graft.operators.MetaOps.IndexSpec])

  /** mongodb|mysql|mariadb|postgresql → CDC pipeline (+ optional initial
    * snapshot, applied once via skip-if-nonempty before the stream).
    * `counts` carries the mapping's countQuery conditions for the
    * engine's monitoring report (query_counter.go:59-280). */
  final case class CdcDef(name: String, cfg: CdcPipeline.Config,
      snapshotDir: Option[String], sourceTable: String = "",
      counts: Seq[CountCondition] = Nil,
      indexSync: Option[IndexSync] = None) extends PipelineDef

  /** redis → KV pipeline. */
  final case class KvDef(name: String, cfg: KvPipeline.Config) extends PipelineDef

  /** A6 composed: the task-level `dailyRollup` opt-in runs a
    * [[graft.streaming.DailyRollup]] stream per table beside its CDC
    * pipeline — the reference's per-table daily counters
    * (monitor.go daily reset) as a supervised windowed aggregation.
    * Reads the SAME change-event source as the sibling CDC pipeline
    * (read-only: no storage roots of its own); `queryName` is the
    * in-memory sink's SQL-safe table name. */
  final case class RollupDef(name: String, sourceDir: String,
      queryName: String) extends PipelineDef

  /** ST14/ST15 composed: the task-level `sessionize` opt-in runs a
    * [[graft.streaming.SessionStream]] per table beside its CDC
    * pipeline — gap sessions of per-KEY activity over the same
    * change-event source, finalized by watermark and landed in a
    * durable parquet log (`outDir`) with its own checkpoint. */
  final case class SessionizeDef(name: String, sourceDir: String,
      outDir: String, checkpointDir: String) extends PipelineDef

  /** The task-level `rateMonitor` opt-in runs a
    * [[graft.streaming.RateStream]] per table beside its CDC pipeline —
    * sliding-window per-op rates over the same change-event source,
    * finalized by watermark into a durable parquet log (`outDir`)
    * with its own checkpoint. */
  final case class RateMonitorDef(name: String, sourceDir: String,
      outDir: String, checkpointDir: String) extends PipelineDef

  /** A `decontamTasks` entry: resident
    * [[graft.streaming.DecontamStream]] pipeline — crawl documents
    * scored at ingest against the corpus's eval shingle set, quarantine
    * log + checkpoint owned by this pipeline. */
  final case class DecontamDef(name: String, spec: graft.model.DecontamSpec)
      extends PipelineDef

  /** A resident incremental-view-maintenance pipeline
    * ([[graft.streaming.IvmStream]]): the change log at
    * `spec.sourceDir` keeps the configured aggregate view fresh with
    * delta work only, under the supervisor like any sync pipeline. */
  final case class IvmDef(name: String, spec: graft.model.IvmTaskSpec)
      extends PipelineDef

  /** The task-level `anomalyMonitor` opt-in runs an
    * [[graft.streaming.AnomalyStream]] per table beside its CDC
    * pipeline — daily op-count z-score alerts off the same
    * change-event source, durable history + checkpoint owned here. */
  final case class AnomalyDef(name: String, sourceDir: String,
      historyDir: String, checkpointDir: String) extends PipelineDef

  /** Seasonal forecast-residual alarm rider
    * ([[graft.streaming.ForecastAnomalyStream]]): daily op counts
    * scored against their one-step Holt-Winters forecast, so a
    * weekly-cycle volume peak does not page while a genuine break
    * does. */
  final case class ForecastAnomalyDef(name: String, sourceDir: String,
      historyDir: String, checkpointDir: String,
      // false: daily op COUNTS; true: the after-image's daily CENT
      // MASS (`value_forecast_anomaly` — the q90/q155 revenue series)
      watchValues: Boolean = false) extends PipelineDef

  /** Namespace + storage-path derivation. A table whose mapping-level
    * sourceDb DIFFERS from the task default gets db-prefixed paths and
    * a db-qualified pipeline name, so a multi-database task's tables
    * never collide on name, checkpoint, target, or DLQ — and its ns
    * filter matches ITS database, not the first mapping's. Tables of
    * the default database keep the flat layout. */
  private def sourceNs(spec: SyncTaskSpec, m: TableMapping): String =
    m.sourceDb.getOrElse(spec.sourceDb)

  private def srcSub(spec: SyncTaskSpec, m: TableMapping): String =
    if (m.sourceDb.exists(_ != spec.sourceDb)) s"${m.sourceDb.get}/${m.sourceTable}"
    else m.sourceTable

  private def tgtSub(spec: SyncTaskSpec, m: TableMapping): String =
    // an EXPLICIT targetDatabase always namespaces the target (the
    // reference maps source db → target db, config.go:36-41); without
    // one, a non-default source db namespaces it, default stays flat.
    // Layout note: adding/removing targetDatabase on a RUNNING config
    // relocates the target root while the checkpoint (source-keyed)
    // resumes committed offsets against the new, empty location — move
    // or re-snapshot the old target when changing this field.
    m.targetDb.orElse(m.sourceDb.filter(_ != spec.sourceDb)) match {
      case Some(db) => s"$db/${m.targetTable}"
      case None     => m.targetTable
    }

  def pipelineName(spec: SyncTaskSpec, m: TableMapping): String =
    s"task${spec.id}/${srcSub(spec, m)}"

  /** Compile one task; a disabled task compiles to nothing, which makes
    * disable-in-config == stop-at-reconcile (main.go:149-151). */
  def compile(spec: SyncTaskSpec): Seq[PipelineDef] =
    if (!spec.enabled) Nil
    else spec.tables.flatMap { m =>
      val name = pipelineName(spec, m)
      val src = srcSub(spec, m); val tgt = tgtSub(spec, m)
      // the rollup consumes change events, so it rides CDC tasks only
      // (the KV op log has a different schema)
      val rollup =
        if (spec.dailyRollup && spec.taskType != "redis")
          Seq(RollupDef(s"$name#rollup", s"${spec.sourceDir}/$src",
            s"rollup_task${spec.id}_$src".replaceAll("[^A-Za-z0-9_]", "_")))
        else Nil
      // '#' keeps the session roots SIBLINGS of the table roots (never
      // nested inside them), so the compileAll nesting check holds
      val sessions =
        if (spec.sessionize && spec.taskType != "redis")
          Seq(SessionizeDef(s"$name#sessions", s"${spec.sourceDir}/$src",
            s"${spec.targetDir}/$tgt#sessions", s"${spec.checkpointDir}/$src#sessions"))
        else Nil
      val rateMonitors =
        if (spec.rateMonitor && spec.taskType != "redis")
          Seq(RateMonitorDef(s"$name#rates", s"${spec.sourceDir}/$src",
            s"${spec.targetDir}/$tgt#rates", s"${spec.checkpointDir}/$src#rates"))
        else Nil
      val anomalyMonitors =
        if (spec.anomalyMonitor && spec.taskType != "redis")
          Seq(AnomalyDef(s"$name#anomalies", s"${spec.sourceDir}/$src",
            s"${spec.targetDir}/$tgt#anomalies", s"${spec.checkpointDir}/$src#anomalies"))
        else Nil
      val forecastMonitors =
        if (spec.forecastMonitor && spec.taskType != "redis")
          Seq(ForecastAnomalyDef(s"$name#forecast", s"${spec.sourceDir}/$src",
            s"${spec.targetDir}/$tgt#forecast", s"${spec.checkpointDir}/$src#forecast"))
        else Nil
      val valueForecastMonitors =
        if (spec.valueForecastMonitor && spec.taskType != "redis")
          Seq(ForecastAnomalyDef(s"$name#vforecast", s"${spec.sourceDir}/$src",
            s"${spec.targetDir}/$tgt#vforecast",
            s"${spec.checkpointDir}/$src#vforecast", watchValues = true))
        else Nil
      rollup ++ sessions ++ rateMonitors ++ anomalyMonitors ++
        forecastMonitors ++ valueForecastMonitors :+ (spec.taskType match {
        case "redis" =>
          KvDef(name, KvPipeline.Config(
            sourceDir = s"${spec.sourceDir}/$src",
            targetDir = s"${spec.targetDir}/$tgt",
            checkpointDir = s"${spec.checkpointDir}/$src",
            dlqDir = s"${spec.dlqDir}/$src"))
        case t =>
          CdcDef(name, CdcPipeline.Config(
            sourceDir = s"${spec.sourceDir}/$src",
            targetDir = s"${spec.targetDir}/$tgt",
            checkpointDir = s"${spec.checkpointDir}/$src",
            dlqDir = s"${spec.dlqDir}/$src",
            keyCol = m.keyColumns.headOption.getOrElse("key"),
            ignoreDeleteOps = m.advanced.ignoreDeleteOps,
            // task-level securityEnabled gates the per-field rules,
            // reference config.go:268-276
            fieldSecurity = if (m.securityEnabled) m.fieldSecurity else Nil,
            // mongodb/postgresql watch one namespace (the $match stage /
            // publication); mysql binlog filters by include-table regex
            nsFilter =
              if (t == "mongodb" || t == "postgresql") Some((sourceNs(spec, m), m.sourceTable))
              else None,
            includeTableRegex =
              // both parts quoted: sourceTable is a LITERAL name in this
              // compiler (it is also the source/checkpoint directory), so
              // a dot or paren in the name must not act as regex syntax
              if (t == "mysql" || t == "mariadb")
                Seq("^" + java.util.regex.Pattern.quote(sourceNs(spec, m)) + "\\." +
                  java.util.regex.Pattern.quote(m.sourceTable) + "$")
              else Nil),
            snapshotDir = spec.snapshotDir.map(s => s"$s/$src"),
            sourceTable = m.sourceTable,
            counts = m.countConditions,
            indexSync = (spec.targetJdbcUrl, m.advanced.syncIndexes) match {
              case (Some(url), true) if m.keyColumns.nonEmpty =>
                Some(IndexSync(url, m.targetTable, Seq(graft.operators.MetaOps.IndexSpec(
                  s"idx_${m.targetTable}_${m.keyColumns.mkString("_")}",
                  m.keyColumns.map((_, 1)), unique = false))))
              case _ => None
            })
      })
    }

  /** The supervisor's desired state: every enabled task's pipelines,
    * keyed by [[pipelineName]]. Rejects silent-loss configurations:
    * duplicate pipeline names (the Map would drop one) and storage
    * roots that nest inside each other (a flat table named like
    * another mapping's database would put one table's files INSIDE
    * another's parquet/checkpoint root). A rejected config keeps the
    * previous running set (the engine treats this like a config load
    * failure). */
  def compileAll(specs: Seq[SyncTaskSpec],
      decontam: Seq[graft.model.DecontamSpec] = Nil,
      ivm: Seq[graft.model.IvmTaskSpec] = Nil): Map[String, PipelineDef] = {
    val defs = specs.flatMap(compile) ++
      decontam.filter(_.enabled).map(d => DecontamDef(s"decontam${d.id}", d)) ++
      ivm.filter(_.enabled).map(s => IvmDef(s"ivm${s.id}", s))
    val dupNames = defs.groupBy(_.name).collect { case (n, ds) if ds.size > 1 => n }
    require(dupNames.isEmpty, s"pipeline name collision: ${dupNames.mkString(", ")}")
    // rollup queryNames are sanitized ([^A-Za-z0-9_] → _), which can
    // collide names that differ only in separators (db2/orders vs
    // db2_orders) — the second memory-sink stream would then fail to
    // start on EVERY reconcile; reject the config instead
    val dupQueryNames = defs.collect { case r: RollupDef => r }
      .groupBy(_.queryName).collect { case (q, rs) if rs.size > 1 =>
        s"$q (${rs.map(_.name).mkString(" vs ")})" }
    require(dupQueryNames.isEmpty,
      s"rollup query-name collision after sanitization: ${dupQueryNames.mkString(", ")}")
    // slash-appended before sorting: strings sharing prefix "a/" form a
    // contiguous sorted range, so the adjacent-pair check is sound — a
    // bare sort is not (a sibling like "a-old" sorts BETWEEN "a" and
    // "a/x" because '-' < '/')
    val roots = defs.flatMap {
      case CdcDef(n, c, _, _, _, _) => Seq(c.sourceDir, c.targetDir, c.checkpointDir, c.dlqDir).map((n, _))
      case KvDef(n, c)           => Seq(c.sourceDir, c.targetDir, c.checkpointDir, c.dlqDir).map((n, _))
      case _: RollupDef          => Nil // read-only rider: owns no storage roots
      // reads the shared change stream; owns only its log + checkpoint
      case SessionizeDef(n, _, out, ckpt) => Seq(out, ckpt).map((n, _))
      case RateMonitorDef(n, _, out, ckpt) => Seq(out, ckpt).map((n, _))
      // corpus + crawl source are read-only; it owns its log + checkpoint
      case DecontamDef(n, s) => Seq(s.outDir, s.checkpointDir).map((n, _))
      case AnomalyDef(n, _, hist, ckpt) => Seq(hist, ckpt).map((n, _))
      case ForecastAnomalyDef(n, _, hist, ckpt, _) => Seq(hist, ckpt).map((n, _))
      // change log is read-only; it owns its view store + checkpoint
      case IvmDef(n, s) => Seq(s.storeDir, s.checkpointDir).map((n, _))
    }.map { case (n, r) => (n, r + "/") }.sortBy(_._2)
    roots.sliding(2).foreach {
      case Seq((na, a), (nb, b)) =>
        require(b != a && !b.startsWith(a),
          s"storage roots nest: '$a' ($na) contains '$b' ($nb)")
      case _ => ()
    }
    defs.map(d => d.name -> d).toMap
  }
}
