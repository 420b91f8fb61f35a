package graft

import org.apache.spark.sql.functions._

/** The packed-register merge aggregate: element-wise byte max,
  * idempotent under replay, loud on width mismatch. */
class RegsMaxSpec extends SparkSpec {

  test("regs_max folds element-wise byte max, ignores nulls, is idempotent under replay") {
    import spark.implicits._
    val rows = Seq(
      ("a", Array[Byte](1, 5, 0, 7)),
      ("a", Array[Byte](3, 2, 0, 7)),
      ("a", null.asInstanceOf[Array[Byte]]),
      ("b", Array[Byte](0, 0, 9, 1))).toDF("k", "regs")
    def fold(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(col("k"))
        .agg(graft.functions.RegsMax.regsMax(col("regs")).as("m"))
        .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("m").toSeq)
        .toMap
    val once = fold(rows)
    assert(once("a") == Seq[Byte](3, 5, 0, 7))
    assert(once("b") == Seq[Byte](0, 0, 9, 1))
    // max-merge is idempotent: replayed rows cannot move a register
    assert(fold(rows.union(rows)) == once)
    // bytes compare UNSIGNED: 0x80 (-128 signed) must beat 0x01
    val hi = Seq(("h", Array[Byte](0x80.toByte)), ("h", Array[Byte](1)))
      .toDF("k", "regs")
    assert(fold(hi)("h") == Seq(0x80.toByte))
  }

  test("regs_max fails loudly on mixed register widths") {
    import spark.implicits._
    val bad = Seq(
      ("a", Array[Byte](1, 2)),
      ("a", Array[Byte](1, 2, 3))).toDF("k", "regs")
    val e = intercept[Exception] {
      bad.groupBy(col("k"))
        .agg(graft.functions.RegsMax.regsMax(col("regs"))).collect()
    }
    assert(e.getMessage != null)
  }
}
