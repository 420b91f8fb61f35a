package graft.streaming

import java.util.concurrent.ConcurrentLinkedQueue

/** Alerting hooks — the engine-side re-expression of the reference's
  * Slack notifier (reference pkg/utils/slack.go, wired from the DLQ
  * park path mongodb.go:1311-1408 and the row-count mismatch monitor
  * monitor.go:1158-1203).
  *
  * The reference posts to a webhook; an egress-free engine exposes the
  * same contract as a pluggable [[Alerts.Sink]]: production wires a
  * webhook/pager implementation, tests wire [[Alerts.Buffer]], and the
  * default is the driver log. Alert volume is always metadata-sized
  * (one per parked batch pass / per mismatching day), never per-row.
  */
object Alerts {

  /** kind ∈ dlq_parked | count_mismatch | … ; source names the pipeline
    * or comparison that fired. */
  final case class Alert(kind: String, source: String, message: String)

  trait Sink { def send(a: Alert): Unit }

  /** Default: surface on the driver log (the reference also logs every
    * alert it posts, slack.go). */
  object Log extends Sink {
    private val logger = org.slf4j.LoggerFactory.getLogger("graft.alerts")
    def send(a: Alert): Unit = logger.warn(s"[${a.kind}] ${a.source}: ${a.message}")
  }

  object Noop extends Sink { def send(a: Alert): Unit = () }

  /** Test/inspection sink: buffers alerts for assertion. */
  final class Buffer extends Sink {
    private val q = new ConcurrentLinkedQueue[Alert]()
    def send(a: Alert): Unit = q.add(a)
    def drain(): Seq[Alert] = Iterator.continually(q.poll()).takeWhile(_ != null).toSeq
  }
}
