package graft

import org.apache.spark.sql.functions._

import graft.operators.DataQuality
import graft.operators.DataQuality._

class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, Some("a"), 5.0, "O"),
    (2L, None: Option[String], -1.0, "O"),
    (2L, Some("b"), 150.0, "X"),
    (3L, Some("c"), 50.0, "F"))
    .toDF("id", "tag", "amount", "status")

  test("each rule kind counts exactly its violations in one pass") {
    val got = DataQuality.check(df, Seq(
      NotNull("tag_present", "tag"),
      Unique("id_unique", "id"),
      MinValue("amount_min", "amount", 0.0),
      MaxValue("amount_max", "amount", 100.0),
      InSet("status_domain", "status", Seq("O", "F")))).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))).toMap
    assert(got == Map(
      "tag_present" -> (("tag", 4L, 1L, false)),
      "id_unique" -> (("id", 4L, 1L, false)),
      "amount_min" -> (("amount", 4L, 1L, false)),
      "amount_max" -> (("amount", 4L, 1L, false)),
      "status_domain" -> (("status", 4L, 1L, false))))
    // the same rules on a conforming frame all pass
    val clean = DataQuality.check(
      Seq((1L, "a", 5.0, "O"), (2L, "b", 50.0, "F")).toDF("id", "tag", "amount", "status"),
      Seq(NotNull("t", "tag"), Unique("u", "id"), MinValue("mn", "amount", 0.0),
        MaxValue("mx", "amount", 100.0), InSet("d", "status", Seq("O", "F")))).collect()
    assert(clean.forall(_.getBoolean(4)))
  }

  test("rule-list hygiene: empty lists and duplicate names are rejected") {
    intercept[IllegalArgumentException](DataQuality.check(df, Nil))
    intercept[IllegalArgumentException](DataQuality.check(df,
      Seq(NotNull("x", "tag"), Unique("x", "id"))))
  }

  test("the whole rule list compiles to a single aggregate over one scan") {
    val plan = DataQuality.check(df, Seq(
      NotNull("a", "tag"), MinValue("b", "amount", 0.0),
      InSet("c", "status", Seq("O")))).queryExecution.executedPlan.toString
    // one distinct-free aggregate pair (partial+final), no join, no extra scan
    assert(!plan.contains("Join"), plan)
    assert("LocalTableScan|Scan ExistingRDD".r.findAllIn(plan).length <= 2, plan)
  }

  test("t-closeness: hand-computed ordinal EMD, the balanced group reads 0") {
    // groups X(8:2), Y(2:8), Z(5:5) over bands {0,1}; global = 15:15,
    // so cum_q = [500000, 1000000] and the one-step EMDs are
    // |cum_p(0) − 500000| (the band-1 step is always 0): X = Y =
    // 300000 (at risk at t = 0.2), Z = 0
    val rows =
      (Seq.fill(8)(("X", 0L)) ++ Seq.fill(2)(("X", 1L)) ++
        Seq.fill(2)(("Y", 0L)) ++ Seq.fill(8)(("Y", 1L)) ++
        Seq.fill(5)(("Z", 0L)) ++ Seq.fill(5)(("Z", 1L)))
        .toDF("grp", "band")
    val got = DataQuality.tClosenessProfile(rows, Seq("grp"), "band")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got == Map(
      "X" -> ((10L, 300000L, true)),
      "Y" -> ((10L, 300000L, true)),
      "Z" -> ((10L, 0L, false))))
  }

  test("t-closeness: a group mirroring the global distribution is never at risk, single-band degenerates to 0") {
    val mono = Seq(("A", 3L), ("A", 3L), ("B", 3L)).toDF("grp", "band")
    val got = DataQuality.tClosenessProfile(mono, Seq("grp"), "band").collect()
    assert(got.forall(r => r.getLong(2) == 0L && !r.getBoolean(3)))
  }
}
