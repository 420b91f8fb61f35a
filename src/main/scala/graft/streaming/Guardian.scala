package graft.streaming

import scala.annotation.tailrec

import org.apache.spark.sql.streaming.StreamingQuery

/** S3 — the retry guardian: a driver-side restart envelope around a
  * streaming pipeline, re-expressing the reference's
  * `watchChangesWithRetry` loop (reference mongodb.go:613-691) and its
  * recoverable-error classifier (mongodb.go:1794-1833).
  *
  * Spark mapping: the reference wraps a change-stream goroutine and
  * restarts it from the persisted resume token; here each attempt
  * (re)starts a checkpointed StreamingQuery, and Structured Streaming's
  * offset/commit log plays the resume-token role — a restarted attempt
  * resumes exactly after the last committed micro-batch, so the
  * envelope adds availability without touching delivery semantics
  * (at-least-once + idempotent merge, ST9).
  *
  * Backoff envelope (defaults per mongodb.go:616-629): up to
  * `maxRetries` restarts after the initial attempt, starting at
  * `baseDelayMs` and growing ×`factor` up to `maxDelayMs`.
  */
object Guardian {

  final case class Backoff(
      maxRetries: Int = 10,          // mongodb.go:618
      baseDelayMs: Long = 5000L,     // mongodb.go:623
      factor: Double = 1.5,          // mongodb.go:680
      maxDelayMs: Long = 300000L)    // mongodb.go:628 (5 min cap)

  /** Substring patterns marking an error transient/retryable — the
    * classifier contract of mongodb.go:1794-1833, generalized from
    * Mongo driver strings to the failures a Spark pipeline sees
    * (executor loss, storage hiccups, network). */
  private val recoverablePatterns: Seq[String] = Seq(
    "timeout", "timed out",
    "connection refused", "connection reset", "connection pool",
    "broken pipe", "host unreachable", "no reachable servers",
    "cursor not found", "interrupted at shutdown",
    "temporarily unavailable", "service unavailable",
    "too many requests", "slow down",
    "executorlostfailure", "fetchfailed", "shuffle")

  /** True when the failure (or any of its causes) matches a
    * recoverable pattern. Unknown errors are FATAL — the reference
    * only retries whitelisted failures, anything else surfaces. */
  @tailrec
  def isRecoverable(e: Throwable): Boolean =
    if (e == null) false
    else {
      val msg = Option(e.getMessage).getOrElse("").toLowerCase
      if (recoverablePatterns.exists(msg.contains)) true
      else isRecoverable(e.getCause)
    }

  /** Outcome of a supervised run: how many attempts were made and the
    * backoff delays actually taken (for observability/tests). */
  final case class Supervision(attempts: Int, delaysMs: Seq[Long])

  /** Run `attempt` under the restart envelope. Retries only
    * recoverable failures, at most `b.maxRetries` times, sleeping the
    * capped-exponential delay between attempts. Throws the final error
    * when fatal or when retries are exhausted (the reference gives up
    * and stops the guardian loop, mongodb.go:664-668).
    *
    * `sleep` is injectable so specs can assert the delay schedule
    * without waiting wall-clock minutes. */
  def run(b: Backoff = Backoff(), sleep: Long => Unit = Thread.sleep)
      (attempt: () => Unit): Supervision = {
    var delay = b.baseDelayMs
    var delays = Vector.empty[Long]
    var attempts = 0
    while (true) {
      attempts += 1
      try { attempt(); return Supervision(attempts, delays) }
      catch {
        case e: Throwable =>
          val failures = attempts
          if (!isRecoverable(e) || failures > b.maxRetries) throw e
          sleep(delay)
          delays :+= delay
          delay = math.min((delay * b.factor).toLong, b.maxDelayMs)
      }
    }
    sys.error("unreachable")
  }

  /** Supervise a restartable streaming pipeline: each attempt starts a
    * fresh query against the SAME checkpoint and awaits termination, so
    * a restart resumes from the last committed offset. */
  def superviseStream(b: Backoff = Backoff(), sleep: Long => Unit = Thread.sleep)
      (start: () => StreamingQuery): Supervision =
    run(b, sleep) { () => start().awaitTermination() }
}
