package graft

import java.nio.file.Files

import graft.streaming.{EventDedupStream, IntervalJoinStream}

/** Bounded-state streaming dedup — both faces of the horizon contract. */
class EventDedupStreamSpec extends SparkSpec {

  private def writeEvents(src: String)(rows: (Long, Long, String, String)*): Unit = {
    import org.apache.spark.sql.{Row, SaveMode}
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (u, e, t, k) =>
        Row(u, e, java.sql.Timestamp.valueOf(t), k) }: _*),
      IntervalJoinStream.schema)
      .coalesce(1).write.mode(SaveMode.Append)
      .option("timestampFormat", IntervalJoinStream.TsFormat).json(src)
  }

  test("duplicates within the horizon collapse; beyond it state evicts and the key re-emits") {
    val src = Files.createTempDirectory("graft_evdedup").toString
    val q = EventDedupStream.start(spark, src, "evdedup")
    try {
      // event 1 plus an in-batch duplicate, then a cross-batch retry
      // still inside the hour horizon: one row total
      writeEvents(src)((1L, 1L, "2024-03-01 10:00:00", "view"),
        (1L, 1L, "2024-03-01 10:00:00", "view"))
      q.processAllAvailable()
      writeEvents(src)((1L, 1L, "2024-03-01 10:20:00", "view"))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM evdedup WHERE event_id = 1")
        .head().getLong(0) == 1L)
      // advance the watermark far past event 1's horizon, then replay
      // it: the state is gone, the duplicate re-emits — at-least-once
      // beyond the horizon is the contract, not a bug (bounded state
      // is the point; the idempotent MERGE downstream absorbs this)
      writeEvents(src)((9L, 2L, "2024-03-01 15:00:00", "view"))
      q.processAllAvailable()
      writeEvents(src)((1L, 1L, "2024-03-01 14:30:00", "view"))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM evdedup WHERE event_id = 1")
        .head().getLong(0) == 2L)
      assert(spark.sql("SELECT count(*) FROM evdedup").head().getLong(0) == 3L)
    } finally q.stop()
  }
}
