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

  /** mongodb|mysql|mariadb|postgresql → CDC pipeline (+ optional initial
    * snapshot, applied once via skip-if-nonempty before the stream).
    * `counts` carries the mapping's countQuery conditions for the
    * engine's monitoring report (query_counter.go:59-280). */
  final case class CdcDef(name: String, cfg: CdcPipeline.Config,
      snapshotDir: Option[String], sourceTable: String = "",
      counts: Seq[CountCondition] = Nil) extends PipelineDef

  /** redis → KV pipeline. */
  final case class KvDef(name: String, cfg: KvPipeline.Config) extends PipelineDef

  def pipelineName(spec: SyncTaskSpec, m: TableMapping): String =
    s"task${spec.id}/${m.sourceTable}"

  /** Compile one task; a disabled task compiles to nothing, which makes
    * disable-in-config == stop-at-reconcile (main.go:149-151). */
  def compile(spec: SyncTaskSpec): Seq[PipelineDef] =
    if (!spec.enabled) Nil
    else spec.tables.map { m =>
      val name = pipelineName(spec, m)
      spec.taskType match {
        case "redis" =>
          KvDef(name, KvPipeline.Config(
            sourceDir = s"${spec.sourceDir}/${m.sourceTable}",
            targetDir = s"${spec.targetDir}/${m.targetTable}",
            checkpointDir = s"${spec.checkpointDir}/${m.sourceTable}"))
        case t =>
          CdcDef(name, CdcPipeline.Config(
            sourceDir = s"${spec.sourceDir}/${m.sourceTable}",
            targetDir = s"${spec.targetDir}/${m.targetTable}",
            checkpointDir = s"${spec.checkpointDir}/${m.sourceTable}",
            dlqDir = s"${spec.dlqDir}/${m.sourceTable}",
            keyCol = m.keyColumns.headOption.getOrElse("key"),
            ignoreDeleteOps = m.advanced.ignoreDeleteOps,
            // task-level securityEnabled gates the per-field rules,
            // reference config.go:268-276
            fieldSecurity = if (m.securityEnabled) m.fieldSecurity else Nil,
            // mongodb/postgresql watch one namespace (the $match stage /
            // publication); mysql binlog filters by include-table regex
            nsFilter =
              if (t == "mongodb" || t == "postgresql") Some((spec.sourceDb, m.sourceTable))
              else None,
            includeTableRegex =
              // both parts quoted: sourceTable is a LITERAL name in this
              // compiler (it is also the source/checkpoint directory), so
              // a dot or paren in the name must not act as regex syntax
              if (t == "mysql" || t == "mariadb")
                Seq("^" + java.util.regex.Pattern.quote(spec.sourceDb) + "\\." +
                  java.util.regex.Pattern.quote(m.sourceTable) + "$")
              else Nil),
            snapshotDir = spec.snapshotDir.map(s => s"$s/${m.sourceTable}"),
            sourceTable = m.sourceTable,
            counts = m.countConditions)
      }
    }

  /** The supervisor's desired state: every enabled task's pipelines,
    * keyed by [[pipelineName]]. */
  def compileAll(specs: Seq[SyncTaskSpec]): Map[String, PipelineDef] =
    specs.flatMap(compile).map(d => d.name -> d).toMap
}
