package graft

import java.nio.file.Files

import graft.streaming.DormancyStream

/** Dormancy stream: the timeout IS the output — a user idle past the
  * horizon emits `dormant` stamped last_seen + horizon, their return
  * emits `reactivated`, continuous activity emits nothing, and a
  * restart neither drops nor duplicates transitions. */
class DormancyStreamSpec extends SparkSpec {

  private def writeEvents(src: String, rows: (Long, String)*): Unit = {
    import org.apache.spark.sql.{Row, SaveMode}
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (u, t) =>
        Row(u, java.sql.Timestamp.valueOf(t)) }: _*),
      DormancyStream.schema)
      .coalesce(1).write.mode(SaveMode.Append)
      .option("timestampFormat", graft.streaming.SessionStream.TsFormat).json(src)
  }

  test("dormancy fires at the horizon, reactivation on return, restart-safe") {
    val src = Files.createTempDirectory("graft_dorm_src").toString
    val out = Files.createTempDirectory("graft_dorm_out").toString
    val ckpt = Files.createTempDirectory("graft_dorm_ckpt").toString
    val horizonMs = 3600000L // 1 h
    // user 1: events at 10:00 and 10:30, then silence
    // user 2: steadily active through the window — never dormant
    writeEvents(src,
      (1L, "2024-03-01 10:00:00"), (1L, "2024-03-01 10:30:00"),
      (2L, "2024-03-01 10:00:00"), (2L, "2024-03-01 11:00:00"),
      (2L, "2024-03-01 12:00:00"))
    val q1 = DormancyStream.start(spark, src, out, ckpt, horizonMs)
    try q1.awaitTermination() finally q1.stop()
    // watermark = 12:00 − 30 min = 11:30 ≤ 10:30 + 1 h: nothing fires yet
    assert(DormancyStream.transitionLog(spark, out).count() == 0)

    // push the watermark past user 1's deadline (12:30 − 30 min = 12:00)
    // with more user-2 activity; RESTART from the checkpoint
    writeEvents(src, (2L, "2024-03-01 12:30:00"))
    val q2 = DormancyStream.start(spark, src, out, ckpt, horizonMs)
    try q2.awaitTermination() finally q2.stop()
    val afterIdle = DormancyStream.transitionLog(spark, out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).toString,
        r.getTimestamp(3).toString))
    assert(afterIdle.toSeq == Seq(
      (1L, "dormant", "2024-03-01 11:30:00.0", "2024-03-01 10:30:00.0")))
    val dormantNow = DormancyStream.currentlyDormant(spark, out).collect()
    assert(dormantNow.map(_.getLong(0)).toSeq == Seq(1L))

    // user 1 returns: a reactivation stamped at the return moment,
    // with last_seen pointing at the pre-dormancy activity
    writeEvents(src, (1L, "2024-03-01 14:00:00"), (2L, "2024-03-01 14:00:00"))
    val q3 = DormancyStream.start(spark, src, out, ckpt, horizonMs)
    try q3.awaitTermination() finally q3.stop()
    val afterReturn = DormancyStream.transitionLog(spark, out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).toString))
      .sortBy(t => (t._1, t._3))
    assert(afterReturn.toSeq == Seq(
      (1L, "dormant", "2024-03-01 11:30:00.0"),
      (1L, "reactivated", "2024-03-01 14:00:00.0")))
    // the campaign face drops the reactivated user
    assert(DormancyStream.currentlyDormant(spark, out).count() == 0)

    // a watermark pusher (new user 3) idles BOTH existing users out:
    // fresh dormancies at 14:00 + 1 h for each — user 1's SECOND
    // dormancy proves the marker→active→marker cycle re-arms
    writeEvents(src, (3L, "2024-03-01 18:00:00"))
    val q4 = DormancyStream.start(spark, src, out, ckpt, horizonMs)
    try q4.awaitTermination() finally q4.stop()
    val finalLog = DormancyStream.transitionLog(spark, out).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).toString))
    assert(finalLog.count(t =>
      t._2 == "dormant" && t._3 == "2024-03-01 15:00:00.0") == 2)
    // 2 rows from earlier phases + the two fresh dormancies; user 3's
    // own deadline (19:00) is still ahead of the watermark
    assert(finalLog.length == 4, s"got ${finalLog.toSeq.sortBy(t => (t._1, t._3))}")
    assert(DormancyStream.currentlyDormant(spark, out).collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }
}
