package graft.functions

import java.time.{LocalDate, LocalDateTime, ZoneId, ZoneOffset}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** JST calendar-window math (reference pkg/utils/time_utils.go:100-184,
  * pkg/utils/query_counter.go:96-181).
  *
  * The reference computes every monitoring/backup window in JST
  * (UTC+9) and converts to UTC bounds before querying. We fold the
  * same arithmetic at plan time so the bounds reach the scan as
  * literals — Catalyst then prunes partitions/row groups with them.
  *
  * Two deliberately different end-bound semantics, preserved from the
  * reference (SURVEY §7.5 #3):
  *  - counts use an inclusive end  (`$lte`, query_counter.go:108-111)
  *  - exports use an exclusive end (`$lt`, external_simple.go:573-580)
  */
object TimeWindows {
  val JST: ZoneId = ZoneId.of("Asia/Tokyo")

  /** [startUtc, endUtc] for a JST day-offset window relative to an
    * anchor instant: startOffset/endOffset in days, bounds at JST
    * midnight (time_utils.go:100-156). */
  def jstDayWindow(anchorUtc: LocalDateTime, startOffsetDays: Int, endOffsetDays: Int)
      : (LocalDateTime, LocalDateTime) = {
    val jstDate = anchorUtc.atZone(ZoneOffset.UTC).withZoneSameInstant(JST).toLocalDate
    val s = jstDate.plusDays(startOffsetDays.toLong).atStartOfDay(JST)
    val e = jstDate.plusDays(endOffsetDays.toLong + 1L).atStartOfDay(JST)
    (s.withZoneSameInstant(ZoneOffset.UTC).toLocalDateTime,
      e.withZoneSameInstant(ZoneOffset.UTC).toLocalDateTime)
  }

  /** dateRange keyword → JST window (query_counter.go:96-181):
    * daily/today = anchor's JST day; yesterday; weekly = since Sunday;
    * monthly = since the 1st. */
  def dateRangeWindow(range: String, anchorUtc: LocalDateTime): (LocalDateTime, LocalDateTime) = {
    val jstDate = anchorUtc.atZone(ZoneOffset.UTC).withZoneSameInstant(JST).toLocalDate
    def span(start: LocalDate, endExclusive: LocalDate) = {
      val s = start.atStartOfDay(JST)
      val e = endExclusive.atStartOfDay(JST)
      (s.withZoneSameInstant(ZoneOffset.UTC).toLocalDateTime,
        e.withZoneSameInstant(ZoneOffset.UTC).toLocalDateTime)
    }
    range match {
      case "daily" | "today" => span(jstDate, jstDate.plusDays(1))
      case "yesterday"       => span(jstDate.minusDays(1), jstDate)
      case "weekly" => // since most recent Sunday (query_counter.go:128-143)
        val dow = jstDate.getDayOfWeek.getValue % 7 // Sunday -> 0
        span(jstDate.minusDays(dow.toLong), jstDate.plusDays(1))
      case "monthly" => span(jstDate.withDayOfMonth(1), jstDate.plusDays(1))
      case other => throw new IllegalArgumentException(s"unknown dateRange: $other")
    }
  }

  /** Count-semantics predicate: start <= ts <= end (inclusive end). */
  def countPredicate(ts: Column, w: (LocalDateTime, LocalDateTime)): Column =
    ts >= lit(java.sql.Timestamp.valueOf(w._1)) && ts <= lit(java.sql.Timestamp.valueOf(w._2))

  /** Export-semantics predicate: start <= ts < end (exclusive end). */
  def exportPredicate(ts: Column, w: (LocalDateTime, LocalDateTime)): Column =
    ts >= lit(java.sql.Timestamp.valueOf(w._1)) && ts < lit(java.sql.Timestamp.valueOf(w._2))
}
