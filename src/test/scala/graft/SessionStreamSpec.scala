package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.EventFlow
import graft.streaming.SessionStream

/** Streaming gap sessionization — parity with the batch op and
  * watermark finalization semantics. Append mode emits a session only
  * once the watermark passes its window end, so each test flushes the
  * tail with far-future sentinel events (two writes: the first
  * advances the watermark, the second triggers the batch that emits
  * under it). */
class SessionStreamSpec extends SparkSpec {

  private val SentinelUser = 999999L

  private def writeEvents(src: String)(rows: (Long, Long, String)*): Unit = {
    import org.apache.spark.sql.{Row, SaveMode}
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (u, e, t) =>
        Row(u, e, java.sql.Timestamp.valueOf(t)) }: _*),
      SessionStream.schema)
      .coalesce(1).write.mode(SaveMode.Append)
      .option("timestampFormat", SessionStream.TsFormat).json(src)
  }

  private def flush(src: String, q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    writeEvents(src)((SentinelUser, -1L, "2030-01-01 00:00:00"))
    q.processAllAvailable()
    writeEvents(src)((SentinelUser, -2L, "2030-01-02 00:00:00"))
    q.processAllAvailable()
  }

  test("streaming sessions equal the batch gap sessionization") {
    val src = Files.createTempDirectory("graft_sess").toString
    Tables(spark, sf, "events").select("user_id", "event_id", "ts")
      .coalesce(1).write.mode("append")
      .option("timestampFormat", SessionStream.TsFormat).json(src)

    val q = SessionStream.start(spark, src, "sess_stream_test", availableNow = false)
    try { q.processAllAvailable(); flush(src, q) } finally q.stop()
    val streamed = spark.sql(
        "SELECT user_id, n_events, session_start, session_end FROM sess_stream_test")
      .filter(col("user_id") =!= SentinelUser)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3))).toSet

    val batch = EventFlow.sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getTimestamp(3), r.getTimestamp(4))).toSet

    assert(streamed.nonEmpty && streamed == batch)
    assert(streamed.exists(_._2 > 1), "fixture has multi-event sessions")
  }

  test("watermark finalizes quiet sessions: a late straggler is dropped, never re-counted") {
    val src = Files.createTempDirectory("graft_sess_late").toString
    // one session for user 1, then an event 3 days later: the watermark
    // (max ts − 1 h) passes the session's end + gap → finalized
    writeEvents(src)((1L, 1L, "2024-03-01 10:00:00"), (1L, 2L, "2024-03-01 11:00:00"),
      (9L, 3L, "2024-03-04 10:00:00"))
    val q = SessionStream.start(spark, src, "sess_late", availableNow = false)
    try {
      q.processAllAvailable()
      // a straggler INSIDE the finalized session's span: its event time
      // is below the watermark, so it is dropped — the session must NOT
      // re-emit grown to 3 and no new 1-event session may appear
      writeEvents(src)((1L, 4L, "2024-03-01 10:30:00"))
      q.processAllAvailable()
      flush(src, q)
    } finally q.stop()
    val u1 = spark.sql(
        "SELECT n_events, session_start FROM sess_late WHERE user_id = 1")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toInstant.toString)).toSet
    assert(u1 == Set((2L, "2024-03-01T10:00:00Z")))
  }
  test("durable sink: restart mid-stream loses no finalized session and never duplicates one") {
    val src = Files.createTempDirectory("graft_sess_dur_src").toString
    val out = Files.createTempDirectory("graft_sess_dur_out").toString
    val ckpt = Files.createTempDirectory("graft_sess_dur_ckpt").toString
    // run 1: a two-event session for user 1, then a far-later event that
    // pushes the watermark past its end + gap → the session finalizes
    // and lands in the parquet log
    writeEvents(src)((1L, 1L, "2024-03-01 10:00:00"), (1L, 2L, "2024-03-01 11:00:00"),
      (9L, 3L, "2024-03-04 10:00:00"))
    val q1 = SessionStream.startDurable(spark, src, out, ckpt)
    q1.awaitTermination()
    def sessions(): Set[(Long, Long, String)] =
      SessionStream.currentSessions(spark, out).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2).toInstant.toString)).toSet
    assert(sessions() == Set((1L, 2L, "2024-03-01T10:00:00Z")))
    // run 2 (RESTART from the checkpoint): a session for user 2 plus a
    // further watermark push. The restarted query finalizes user 2's
    // session AND user 9's first session; user 1's session — finalized
    // before the restart — survives exactly once (no loss, no re-emit)
    writeEvents(src)((2L, 4L, "2024-03-05 10:00:00"), (9L, 5L, "2024-03-08 10:00:00"))
    val q2 = SessionStream.startDurable(spark, src, out, ckpt)
    q2.awaitTermination()
    assert(sessions() == Set(
      (1L, 2L, "2024-03-01T10:00:00Z"),
      (9L, 1L, "2024-03-04T10:00:00Z"),
      (2L, 1L, "2024-03-05T10:00:00Z")))
  }

}
