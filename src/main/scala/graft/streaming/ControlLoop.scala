package graft.streaming

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.streaming.StreamingQuery

/** ST11 — config hot-reload: the control loop that turns the query
  * library into an engine (reference cmd/sync/main.go:91-145).
  *
  * The reference polls its config store every 10 s and, on any change,
  * cancels every sync task and restarts the lot from the new config;
  * checkpoints make the restart lossless. This supervisor keeps the
  * poll-diff-restart contract but reconciles PER PIPELINE: only specs
  * that were added, removed, or changed have their StreamingQuery
  * stopped/started — unchanged pipelines keep running untouched (at
  * 100s of tables, restarting the world on a one-table edit would be
  * an availability hole). Structured Streaming's checkpoint makes a
  * swap lossless: the restarted query resumes after the last committed
  * micro-batch.
  */
object ControlLoop {

  /** `failed` carries specs whose `start` threw this round: the
    * supervisor does NOT hold them as running, so the next reconcile
    * retries them — one poisoned spec must never take healthy
    * pipelines down with it (the reference restarts each syncer
    * independently, cmd/sync/main.go:148-188). */
  final case class Reconcile(started: Set[String], stopped: Set[String],
      kept: Set[String], failed: Map[String, Throwable] = Map.empty)

  /** Supervises a set of named pipelines. `start` compiles a spec into
    * a running StreamingQuery (typically CdcPipeline/KvPipeline.start
    * with a stable checkpoint dir per name). Spec equality (case-class
    * `==`, like the reference's configsEqual) decides restarts. */
  final class Supervisor[S](start: S => StreamingQuery) {

    private var running = Map.empty[String, (S, StreamingQuery)]

    def activeQueries: Map[String, StreamingQuery] =
      running.view.mapValues(_._2).toMap

    /** Bring the running set in line with `specs`: stop removed/changed
      * pipelines (graceful — offsets already committed stay committed),
      * start added/changed ones, leave identical ones alone. Each start
      * is isolated in `Try`: a throwing spec is reported in
      * [[Reconcile.failed]] and the remaining starts still happen. */
    def reconcile(specs: Map[String, S]): Reconcile = synchronized {
      // A pipeline whose query is no longer active (crashed, or drained
      // under AvailableNow) is treated like a changed spec: removed here
      // and restarted below from its checkpoint — the poll-loop face of
      // the guardian's restart envelope (mongodb.go:613-691).
      val stopped = running.collect {
        case (name, (spec, q)) if !specs.get(name).contains(spec) || !q.isActive =>
          q.stop(); name // stop() on a terminated query is a no-op
      }.toSet
      running --= stopped
      val attempts = specs.collect {
        case (name, spec) if !running.contains(name) => name -> Try(start(spec))
      }
      attempts.foreach {
        case (name, Success(q)) => running += name -> (specs(name), q)
        case _ => ()
      }
      val started = attempts.collect { case (n, Success(_)) => n }.toSet
      val failed = attempts.collect { case (n, Failure(e)) => n -> e }.toMap
      Reconcile(started, stopped,
        specs.keySet -- started -- stopped -- failed.keySet, failed)
    }

    def stopAll(): Unit = synchronized {
      running.values.foreach(_._2.stop())
      running = Map.empty
    }
  }

  /** The 10 s poll loop (main.go:92): reload specs, reconcile, sleep —
    * for `rounds` iterations (tests pass a small count and a no-op
    * sleeper; a deployment loops effectively forever). */
  def poll[S](supervisor: Supervisor[S], load: () => Map[String, S],
      intervalMs: Long = 10000L, rounds: Int = Int.MaxValue,
      sleep: Long => Unit = Thread.sleep): Unit = {
    var i = 0
    while (i < rounds) {
      supervisor.reconcile(load())
      i += 1
      if (i < rounds) sleep(intervalMs)
    }
  }
}
