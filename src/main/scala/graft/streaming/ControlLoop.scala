package graft.streaming

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

  final case class Reconcile(started: Set[String], stopped: Set[String], kept: Set[String])

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
      * start added/changed ones, leave identical ones alone. */
    def reconcile(specs: Map[String, S]): Reconcile = synchronized {
      val stopped = running.collect {
        case (name, (spec, q)) if !specs.get(name).contains(spec) =>
          q.stop(); name
      }.toSet
      running --= stopped
      val started = specs.collect {
        case (name, spec) if !running.contains(name) =>
          running += name -> (spec, start(spec)); name
      }.toSet
      Reconcile(started, stopped, specs.keySet -- started -- stopped)
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
