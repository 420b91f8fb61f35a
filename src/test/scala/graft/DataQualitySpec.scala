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
}
