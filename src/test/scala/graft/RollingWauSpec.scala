package graft

import graft.operators.Sketches

/** The sliding register merge: a 1-day window must degrade to the
  * daily report bit-for-bit (same salt, same registers, same
  * estimator), and the 7-day window's exact leg must match a direct
  * per-window distinct count. */
class RollingWauSpec extends SparkSpec {

  test("a 1-day rolling window degrades to the daily report") {
    val daily = Sketches.dailyActiveUsers(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    val rolling = Sketches.rollingActiveUsers(spark, sf, windowDays = 1)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getDouble(2),
        r.getLong(3))).toSet
    assert(rolling == daily)
  }

  test("the 7-day exact leg matches a direct windowed distinct; the sketch tracks it") {
    val rows = Sketches.rollingActiveUsers(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getDouble(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    val presence = Tables(spark, sf, "events")
      .selectExpr("CAST(ts AS DATE) AS day", "user_id").distinct()
      .collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    rows.foreach { case (d, mHit, est, trueWau) =>
      val want = presence.filter { case (day, _) =>
        !day.isAfter(d) && !day.isBefore(d.minusDays(6))
      }.map(_._2).distinct.length.toLong
      assert(trueWau == want, s"$d: $trueWau != $want")
      assert(mHit > 0 && est > 0.0)
      // 256 registers ⇒ ~6.5% standard error; 40% is a generous
      // non-flaky envelope that still catches a broken merge
      assert(math.abs(est - trueWau) <= math.max(0.4 * trueWau, 8.0),
        s"$d: est $est vs $trueWau")
    }
  }
}
