package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.EventFlow
import graft.streaming.FunnelStream

/** Streaming funnel: the finalize fold must replay the batch funnel
  * user-for-user, and the stream must finalize journeys at idle,
  * absorb out-of-order arrivals inside the watermark, and survive a
  * restart without loss or duplication. */
class FunnelStreamSpec extends SparkSpec {

  test("finalize fold equals the batch funnel for every testdata user") {
    val want = EventFlow.conversionFunnel(spark, sf).collect()
      .map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)),
        Option(r.getTimestamp(2)), Option(r.getTimestamp(3)), r.getInt(4)))).toMap
    val byUser = Tables(spark, sf, "events")
      .select("user_id", "event_type", "ts").collect()
      .map(r => FunnelStream.Ev(r.getLong(0), r.getString(1), r.getTimestamp(2)))
      .groupBy(_.userId)
    assert(byUser.nonEmpty && byUser.keySet == want.keySet)
    byUser.foreach { case (uid, evs) =>
      val got = FunnelStream.finalizeJourney(uid, evs.toSeq)
      assert((got.signup_ts, got.view_ts, got.purchase_ts, got.stage) == want(uid),
        s"user $uid")
    }
  }

  test("journeys finalize at idle, absorb out-of-order arrivals, survive restart") {
    val src = Files.createTempDirectory("graft_funnel_src").toString
    val out = Files.createTempDirectory("graft_funnel_out").toString
    val ckpt = Files.createTempDirectory("graft_funnel_ckpt").toString
    def writeEvents(rows: (Long, String, String)*): Unit = {
      import org.apache.spark.sql.{Row, SaveMode}
      spark.createDataFrame(
        java.util.Arrays.asList(rows.map { case (u, et, t) =>
          Row(u, et, java.sql.Timestamp.valueOf(t)) }: _*),
        FunnelStream.schema)
        .coalesce(1).write.mode(SaveMode.Append)
        .option("timestampFormat", graft.streaming.SessionStream.TsFormat).json(src)
    }
    // user 1 converts (view arrives LATER, out of order); user 2's
    // purchase precedes the view, so it must not count as converted;
    // user 3 never signs up
    writeEvents(
      (1L, "signup", "2024-03-01 10:00:00"),
      (1L, "purchase", "2024-03-01 10:10:00"),
      (2L, "purchase", "2024-03-01 10:00:00"),
      (2L, "signup", "2024-03-01 10:02:00"),
      (2L, "view", "2024-03-01 10:04:00"),
      (3L, "view", "2024-03-01 10:00:00"))
    val q1 = FunnelStream.start(spark, src, out, ckpt)
    try q1.awaitTermination() finally q1.stop()
    // nothing idle past the horizon yet: no journey finalized
    assert(FunnelStream.currentJourneys(spark, out).count() == 0)

    // the straggler view + a pusher that idles everyone out; restart
    // from the same checkpoint
    writeEvents(
      (1L, "view", "2024-03-01 10:05:00"),
      (999L, "view", "2030-01-01 00:00:00"))
    val q2 = FunnelStream.start(spark, src, out, ckpt)
    try q2.awaitTermination() finally q2.stop()
    val got = FunnelStream.currentJourneys(spark, out).collect()
      .map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)).map(_.toString),
        Option(r.getTimestamp(3)).map(_.toString), r.getInt(4)))).toMap
    assert(got.keySet == Set(1L, 2L, 3L)) // the pusher's journey stays open
    assert(got(1L) == ((Some("2024-03-01 10:00:00.0"),
      Some("2024-03-01 10:10:00.0"), 3)), got(1L).toString)
    assert(got(2L)._3 == 2) // purchase-before-view is not a conversion
    assert(got(3L)._3 == 0)

    // replay: re-running with nothing new emits nothing twice
    val q3 = FunnelStream.start(spark, src, out, ckpt)
    try q3.awaitTermination() finally q3.stop()
    assert(FunnelStream.currentJourneys(spark, out).count() == 3)

    // re-activation AFTER finalize+eviction starts a fresh journey:
    // user 1 converts again years later, a pusher idles it out — the
    // append log now holds TWO rows for user 1 (by design), and
    // latestJourneys keeps exactly the newer one per user
    writeEvents(
      (1L, "signup", "2031-06-01 09:00:00"),
      (1L, "view", "2031-06-01 09:01:00"),
      (998L, "view", "2040-01-01 00:00:00"))
    val q4 = FunnelStream.start(spark, src, out, ckpt)
    try q4.awaitTermination() finally q4.stop()
    val log = FunnelStream.currentJourneys(spark, out)
    assert(log.filter(col("user_id") === 1L).count() == 2)
    val latest = FunnelStream.latestJourneys(spark, out).collect()
      .map(r => r.getLong(0) -> ((Option(r.getTimestamp(1)).map(_.toString), r.getInt(4))))
      .toMap
    assert(latest.values.toSeq.size == latest.size) // one row per user
    assert(latest(1L) == ((Some("2031-06-01 09:00:00.0"), 2)), latest(1L).toString)
  }
}
