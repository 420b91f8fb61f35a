package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.IntervalJoinStream

/** Stream-stream interval join — batch parity and watermark-bounded
  * state. Sentinel flushes push both watermarks past every fixture
  * event so all on-time pairs emit before assertions. */
class IntervalJoinStreamSpec extends SparkSpec {

  private val SentinelUser = 999999L

  private def writeEvents(src: String)(rows: (Long, Long, String, String)*): Unit = {
    import org.apache.spark.sql.{Row, SaveMode}
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (u, e, t, k) =>
        Row(u, e, java.sql.Timestamp.valueOf(t), k) }: _*),
      IntervalJoinStream.schema)
      .coalesce(1).write.mode(SaveMode.Append)
      .option("timestampFormat", IntervalJoinStream.TsFormat).json(src)
  }

  private def flush(src: String, q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    writeEvents(src)((SentinelUser, -1L, "2030-01-01 00:00:00", "view"),
      (SentinelUser, -2L, "2030-01-01 00:00:00", "purchase"))
    q.processAllAvailable()
    writeEvents(src)((SentinelUser, -3L, "2030-01-02 00:00:00", "view"),
      (SentinelUser, -4L, "2030-01-02 00:00:00", "purchase"))
    q.processAllAvailable()
  }

  private def rowSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.filter(col("user_id") =!= SentinelUser).select("purchase_id", "user_id", "view_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("streamed attribution equals the batch interval join on the events fixture") {
    val src = Files.createTempDirectory("graft_ivj").toString
    Tables(spark, sf, "events").select("user_id", "event_id", "ts", "event_type")
      .filter(col("event_type").isin("view", "purchase"))
      .coalesce(1).write.mode("append")
      .option("timestampFormat", IntervalJoinStream.TsFormat).json(src)
    val q = IntervalJoinStream.start(spark, src, "ivj_parity")
    try { q.processAllAvailable(); flush(src, q) } finally q.stop()
    val streamed = rowSet(spark.sql("SELECT * FROM ivj_parity"))
    val batch = rowSet(IntervalJoinStream.attributed(
      Tables(spark, sf, "events").select("user_id", "event_id", "ts", "event_type")))
    assert(streamed.nonEmpty && streamed == batch)
    // the horizon bites: some purchase has no view inside 1h
    val purchases = Tables(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(streamed.map(_._1).size < purchases)
  }

  test("a view below the watermark is dropped, never matched retroactively") {
    val src = Files.createTempDirectory("graft_ivj_late").toString
    // view + matching purchase 30 min apart, then a far-future event
    // pair pushes both watermarks ahead
    writeEvents(src)((1L, 1L, "2024-03-01 10:00:00", "view"),
      (1L, 2L, "2024-03-01 10:30:00", "purchase"),
      (9L, 3L, "2024-03-05 00:00:00", "view"),
      (9L, 4L, "2024-03-05 00:00:00", "purchase"))
    val q = IntervalJoinStream.start(spark, src, "ivj_late")
    try {
      q.processAllAvailable()
      // a second purchase for user 1 inside the original hour, arriving
      // AFTER the watermark passed it: dropped — it must not join the
      // (still-remembered or not) view
      writeEvents(src)((1L, 5L, "2024-03-01 10:45:00", "purchase"))
      q.processAllAvailable()
      flush(src, q)
    } finally q.stop()
    val got = rowSet(spark.sql("SELECT * FROM ivj_late"))
    assert(got == Set((2L, 1L, 1L), (4L, 9L, 3L)))
  }

  test("outer attribution: an unattributed purchase emits with null view once the watermark proves it") {
    val src = Files.createTempDirectory("graft_ivj_outer").toString
    val q = IntervalJoinStream.start(spark, src, "ivj_outer", joinType = "rightOuter")
    try {
      // user 1: attributed purchase; user 2: purchase with NO view in
      // its trailing hour (the nearest view is 2h earlier)
      writeEvents(src)((1L, 1L, "2024-03-01 10:00:00", "view"),
        (1L, 2L, "2024-03-01 10:30:00", "purchase"),
        (2L, 3L, "2024-03-01 08:00:00", "view"),
        (2L, 4L, "2024-03-01 10:30:00", "purchase"))
      q.processAllAvailable()
      flush(src, q)
      val rows = spark.sql(
          "SELECT purchase_id, user_id, view_id FROM ivj_outer WHERE user_id < 999999")
        .collect().map(r => (r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
      assert(rows == Set((2L, 1L, Some(1L)), (4L, 2L, None)))
    } finally q.stop()
  }
}
