package graft

import org.apache.spark.sql.functions._

import graft.operators.EventFlow

class EventFlowSpec extends SparkSpec {

  private lazy val events: Array[(Long, Long, java.sql.Timestamp, String)] =
    Tables(spark, sf, "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3)))

  private def key(ts: java.sql.Timestamp, id: Long) = (ts.getTime * 1000 + ts.getNanos / 1000 % 1000, id)

  test("as-of join matches a per-user sequential replay") {
    val got = EventFlow.asofViewBeforePurchase(spark, sf).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    val byUser = events.filter(e => e._4 == "purchase" || e._4 == "view").groupBy(_._1)
    val expected = byUser.values.flatMap { evs =>
      val ordered = evs.sortBy(e => key(e._3, e._2))
      var lastView: Option[Long] = None
      ordered.flatMap { e =>
        if (e._4 == "view") { lastView = Some(e._2); None }
        else Some(e._2 -> lastView)
      }
    }.toMap
    assert(got == expected)
    assert(got.valuesIterator.exists(_.isEmpty), "fixture has view-less purchases")
    assert(got.valuesIterator.exists(_.nonEmpty))
  }

  test("sessionization matches a per-user gap replay") {
    val gapUs = EventFlow.DefaultGapUs
    val got = EventFlow.sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getTimestamp(3), r.getTimestamp(4)))).toMap
    val expected = events.groupBy(_._1).flatMap { case (uid, evs) =>
      val ordered = evs.sortBy(e => key(e._3, e._2))
      var seq = 0L
      var prevUs = Long.MinValue
      val bySession = ordered.map { e =>
        val us = key(e._3, e._2)._1
        if (prevUs == Long.MinValue || us - prevUs > gapUs) seq += 1
        prevUs = us
        (seq, e._3)
      }.groupBy(_._1)
      bySession.map { case (s, rows) =>
        val ts = rows.map(_._2)
        (uid, s) -> ((rows.length.toLong,
          ts.minBy(t => (t.getTime, t.getNanos)), ts.maxBy(t => (t.getTime, t.getNanos))))
      }
    }
    assert(got == expected)
    assert(got.valuesIterator.exists(_._1 > 1), "fixture has multi-event sessions")
  }
}
