package graft

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{Conditions, TimeWindows}
import graft.model.CountCondition

class ConditionsSpec extends SparkSpec {
  import spark.implicits._

  private val anchor = LocalDateTime.parse("2024-01-15T00:00:00")

  /** Deterministic sampler over a ScalaCheck Gen (no scalatestplus
    * bridge in the offline cache). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("coercion: long, then double, then string (query_counter.go:185-244)") {
    assert(Conditions.coerce("42") == 42L)
    assert(Conditions.coerce("4.5") == 4.5)
    assert(Conditions.coerce("abc") == "abc")
    assert(Conditions.coerce("1e3") == 1000.0)
  }

  test("every operator's compiled predicate matches scala semantics") {
    val data = (-50 to 50).map(_.toDouble)
    val df = data.toDF("value").cache()
    val cases: Seq[(String, Double => Boolean)] = Seq(
      ("=", _ == 7.0), (">", _ > 7.0), (">=", _ >= 7.0),
      ("<", _ < 7.0), ("<=", _ <= 7.0), ("!=", _ != 7.0), ("<>", _ != 7.0))
    cases.foreach { case (op, pred) =>
      val c = Conditions.compile(Seq(CountCondition("t", "value", op, "7")), "t", anchor)
      assert(df.filter(c).count() == data.count(pred), s"op=$op")
    }
  }

  test("property: random thresholds agree with scala filter") {
    val data = Seq.tabulate(200)(i => (i % 37) * 1.5 - 20)
    val df = data.toDF("value").cache()
    val gen = for {
      t <- Gen.chooseNum(-25.0, 40.0)
      op <- Gen.oneOf(">", ">=", "<", "<=")
    } yield (t, op)
    samples(gen, 40).foreach { case (t, op) =>
      val cond = CountCondition("t", "value", op, t.toString)
      val got = df.filter(Conditions.compile(Seq(cond), "t", anchor)).count()
      val want = op match {
        case ">"  => data.count(_ > t)
        case ">=" => data.count(_ >= t)
        case "<"  => data.count(_ < t)
        case "<=" => data.count(_ <= t)
      }
      assert(got == want, s"op=$op t=$t")
    }
  }

  test("condition routing skips other tables") {
    val df = Seq(1, 2, 3).toDF("value")
    val conds = Seq(CountCondition("other", "value", ">", "100"))
    assert(df.filter(Conditions.compile(conds, "mine", anchor)).count() == 3)
  }

  test("JST windows: daily/yesterday/weekly/monthly bounds") {
    // anchor 2024-01-15T00:00Z = 2024-01-15T09:00 JST (Monday)
    val daily = TimeWindows.dateRangeWindow("daily", anchor)
    assert(daily._1 == LocalDateTime.parse("2024-01-14T15:00:00"))
    assert(daily._2 == LocalDateTime.parse("2024-01-15T15:00:00"))
    val yday = TimeWindows.dateRangeWindow("yesterday", anchor)
    assert(yday._1 == LocalDateTime.parse("2024-01-13T15:00:00"))
    assert(yday._2 == LocalDateTime.parse("2024-01-14T15:00:00"))
    val weekly = TimeWindows.dateRangeWindow("weekly", anchor)
    assert(weekly._1 == LocalDateTime.parse("2024-01-13T15:00:00")) // Sunday JST
    val monthly = TimeWindows.dateRangeWindow("monthly", anchor)
    assert(monthly._1 == LocalDateTime.parse("2023-12-31T15:00:00"))
  }

  test("count windows are end-inclusive; export windows end-exclusive") {
    val w = TimeWindows.jstDayWindow(anchor, 0, 0)
    val boundary = java.sql.Timestamp.valueOf(w._2)
    val df = Seq(boundary).toDF("ts")
    assert(df.filter(TimeWindows.countPredicate(col("ts"), w)).count() == 1)
    assert(df.filter(TimeWindows.exportPredicate(col("ts"), w)).count() == 0)
  }
}
