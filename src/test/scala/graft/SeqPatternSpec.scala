package graft

import org.apache.spark.sql.functions._

import graft.operators.EventFlow

/** Brute-force recount of gapped-pattern support: per user a direct
  * scan of the time-sorted event list (first-a, first-b-after,
  * any-c-after) instead of the operator's join-shaped aggregates. */
class SeqPatternSpec extends SparkSpec {

  test("sequential patterns: per-user scan recount matches the join plan") {
    val got = EventFlow.sequentialPatterns(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = ev.groupBy(_._1).map { case (u, es) =>
      u -> es.map(e => (e._2, e._3)).sortBy(_._1)
    }
    val support = scala.collection.mutable.Map.empty[(String, String, String), Long]
    byUser.values.foreach { seq =>
      val types = seq.map(_._2).distinct
      for (a <- types; b <- types; c <- types) {
        val ta = seq.collectFirst { case (t, ty) if ty == a => t }
        val tb = ta.flatMap(x =>
          seq.collectFirst { case (t, ty) if ty == b && t > x => t })
        val ok = tb.exists(x => seq.exists(e => e._2 == c && e._1 > x))
        if (ok) support((a, b, c)) = support.getOrElse((a, b, c), 0L) + 1L
      }
    }
    val want = support.toSeq
      .map { case ((a, b, c), n) => (a, b, c, n) }
      .sortBy { case (a, b, c, n) => (-n, a, b, c) }
      .take(20)
    assert(got.toSeq == want, "support recount diverged")
    assert(got.nonEmpty && got.head._4 >= got.last._4,
      "top-k must be support-descending")
  }
}
