package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Keyless

/** J2/W5 full-row-match delete + W3 no-PK skip. */
class KeylessSpec extends SparkSpec {

  private val rowSchema = StructType(Seq(
    StructField("a", LongType), StructField("b", StringType)))
  private val batchSchema = StructType(
    StructField("op", StringType, nullable = false) +:
      rowSchema.fields.toSeq :+ StructField("offset", LongType, nullable = false))

  private def rows(data: (java.lang.Long, String)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(data.map { case (a, b) => Row(a, b) }: _*), rowSchema)

  private def batch(data: (String, java.lang.Long, String, Long)*) =
    spark.createDataFrame(
      java.util.Arrays.asList(data.map { case (op, a, b, off) => Row(op, a, b, off) }: _*),
      batchSchema)

  private def multiset(df: org.apache.spark.sql.DataFrame): Map[(Option[Long], Option[String]), Long] =
    df.collect().groupBy(r => (
      if (r.isNullAt(0)) None else Some(r.getLong(0)),
      Option(r.getString(1)))).view.mapValues(_.length.toLong).toMap

  test("full-row delete removes every duplicate; later inserts survive") {
    val target = rows((1L, "x"), (1L, "x"), (2L, "y"))
    val b = batch(
      ("insert", 1L, "x", 10L),  // pre-delete insert: wiped with the dups
      ("delete", 1L, "x", 20L),
      ("insert", 1L, "x", 30L),  // post-delete: survives
      ("insert", 3L, "z", 40L))
    val out = Keyless.applyKeylessBatch(target, b, Seq("a", "b"))
    assert(multiset(out) == Map(
      (Some(1L), Some("x")) -> 1L,
      (Some(2L), Some("y")) -> 1L,
      (Some(3L), Some("z")) -> 1L))
  }

  test("null columns match null-safely like the reference's IS NULL clauses") {
    val target = rows((1L, null), (null, "y"), (null, null))
    val b = batch(
      ("delete", 1L, null, 1L),
      ("delete", null, "y", 2L),
      ("insert", null, null, 3L)) // duplicates the all-null row
    val out = Keyless.applyKeylessBatch(target, b, Seq("a", "b"))
    assert(multiset(out) == Map((None, None) -> 2L))
  }

  test("delete of a non-existent row is a no-op; update = delete+insert") {
    val target = rows((5L, "v1"))
    val b = batch(
      ("delete", 9L, "ghost", 1L),
      // REPLICA IDENTITY FULL update decomposed as delete(old)+insert(new)
      ("delete", 5L, "v1", 2L),
      ("insert", 5L, "v2", 3L))
    val out = Keyless.applyKeylessBatch(target, b, Seq("a", "b"))
    assert(multiset(out) == Map((Some(5L), Some("v2")) -> 1L))
  }

  test("no-PK tables apply inserts only and count skipped ops") {
    val target = rows((1L, "x"))
    val b = batch(
      ("insert", 2L, "y", 1L),
      ("update", 1L, "x", 2L),
      ("delete", 1L, "x", 3L))
    val (out, skipped) = Keyless.applyNoPkBatch(target, b, Seq("a", "b"))
    assert(skipped == 2L)
    assert(multiset(out) == Map((Some(1L), Some("x")) -> 1L, (Some(2L), Some("y")) -> 1L))
  }

  test("property: random keyless logs match a row-by-row multiset replay") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val opGen = for {
      op <- Gen.frequency(3 -> Gen.const("insert"), 1 -> Gen.const("delete"))
      a <- Gen.oneOf[java.lang.Long](Seq[java.lang.Long](0L, 1L, 2L, null))
      b <- Gen.oneOf("x", "y", null)
    } yield (op, a, b)
    val logGen = Gen.listOfN(40, opGen)
    (0 until 8).foreach { seed =>
      val ops = logGen(Gen.Parameters.default, Seed(seed.toLong)).get
        .zipWithIndex.map { case ((op, a, b), i) => (op, a, b, i.toLong) }
      // reference replay: multiset keyed on (a, b); delete wipes the key
      var state = Map.empty[(Option[Long], Option[String]), Long]
      ops.foreach { case (op, a, b, _) =>
        val key = (Option(a).map(_.longValue), Option(b))
        if (op == "delete") state -= key
        else state = state.updated(key, state.getOrElse(key, 0L) + 1L)
      }
      val target = rows() // empty
      val out = Keyless.applyKeylessBatch(target, batch(ops: _*), Seq("a", "b"))
      assert(multiset(out) == state.filter(_._2 > 0), s"seed=$seed")
    }
  }

  test("q40 derivation matches a row-by-row replay at sf0.001, nulls included") {
    def rowB(r: Row, i: Int): Option[Long] = if (r.isNullAt(i)) None else Some(r.getLong(i))
    val log = Keyless.keylessLog(spark, sf).orderBy("offset").collect()
    // the derived log must actually exercise the null-column path
    assert(log.exists(_.isNullAt(2)))
    var state = Map.empty[(Long, Option[Long]), Long]
    log.foreach { r =>
      val key = (r.getLong(1), rowB(r, 2))
      if (r.getString(0) == "delete") state -= key
      else state = state.updated(key, state.getOrElse(key, 0L) + 1L)
    }
    val got = Keyless.finalStateCounts(spark, sf).collect()
      .map(r => (r.getLong(0), rowB(r, 1)) -> r.getLong(2)).toMap
    assert(got == state)
  }
}
