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

  test("sequence rules: confidence/lift recount from per-user scans") {
    val got = EventFlow.sequenceRules(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val ev = Tables(spark, sf, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("t"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byUser = ev.groupBy(_._1).map { case (u, es) =>
      u -> es.map(e => (e._2, e._3)).sortBy(_._1)
    }
    val nUsers = byUser.size.toLong
    val supAB = scala.collection.mutable.Map.empty[(String, String), Long]
    val supC = scala.collection.mutable.Map.empty[String, Long]
    val supABC =
      scala.collection.mutable.Map.empty[(String, String, String), Long]
    byUser.values.foreach { seq =>
      val types = seq.map(_._2).distinct
      types.foreach(c => supC(c) = supC.getOrElse(c, 0L) + 1L)
      for (a <- types; b <- types) {
        val ta = seq.collectFirst { case (t, ty) if ty == a => t }
        val tb = ta.flatMap(x =>
          seq.collectFirst { case (t, ty) if ty == b && t > x => t })
        if (tb.isDefined) {
          supAB((a, b)) = supAB.getOrElse((a, b), 0L) + 1L
          for (c <- types)
            if (seq.exists(e => e._2 == c && e._1 > tb.get))
              supABC((a, b, c)) = supABC.getOrElse((a, b, c), 0L) + 1L
        }
      }
    }
    val want = supABC.toSeq.map { case ((a, b, c), abc) =>
      val ab = supAB((a, b))
      val conf = (BigInt(abc) * 1000000 / ab).toLong
      val lift = (BigInt(abc) * nUsers * 1000000 / (BigInt(ab) * supC(c)))
        .toLong
      (a, b, c, abc, ab, conf, lift)
    }.sortBy { case (a, b, c, _, _, conf, _) => (-conf, a, b, c) }.take(20)
    assert(got.toSeq == want, "rule recount diverged")
    got.foreach { case (_, _, _, abc, ab, conf, _) =>
      assert(abc <= ab, "a rule can't fire more often than its antecedent")
      assert(conf <= 1000000L)
    }
  }
}
