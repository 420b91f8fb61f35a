package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** |a ∩ b| for two SORTED, DISTINCT `array<bigint>` columns — the
  * allocation-free verify kernel behind the dedup pipelines.
  *
  * The composable form `size(array_intersect(a, b))` builds a hash set
  * AND an output array per row pair only to take its length; at
  * hundreds of thousands of candidate pairs × ~100-element hash arrays
  * that allocation is the dominant verify cost (q25/q27). This native
  * expression is a single merge-walk over the two sorted arrays —
  * O(|a|+|b|), zero allocation — with whole-stage codegen via
  * `doGenCode` (a UDF would break the codegen span AND pay
  * serialization; the custom-Expression route is the sanctioned
  * escalation, SURVEY §7.4).
  *
  * Contract: both inputs sorted ascending with distinct elements
  * (`array_sort ∘ array_distinct`); union cardinality is then
  * `|a| + |b| − |a ∩ b|`, so one kernel serves Jaccard. */
final case class SortedLongIntersectCard(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_long_intersect_card"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xn = x.numElements(); val yn = y.numElements()
    var i = 0; var j = 0; var n = 0
    while (i < xn && j < yn) {
      val xi = x.getLong(i); val yj = y.getLong(j)
      if (xi == yj) { n += 1; i += 1; j += 1 }
      else if (xi < yj) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j"); val n = ctx.freshName("n")
      val xn = ctx.freshName("xn"); val yn = ctx.freshName("yn")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $n = 0;
         |final int $xn = $a.numElements();
         |final int $yn = $b.numElements();
         |while ($i < $xn && $j < $yn) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $n++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongIntersectCard =
    copy(left = newLeft, right = newRight)
}

object SetCard {
  val FnName = "sorted_long_intersect_card"

  /** Registration tuple for `SparkSessionExtensions.injectFunction` —
    * the sanctioned way to surface a custom Expression (wired in
    * [[graft.GraftSession]]'s builder, so every engine session has it). */
  val injection: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(FnName),
      new ExpressionInfo(classOf[SortedLongIntersectCard].getName, FnName),
      (exprs: Seq[Expression]) => SortedLongIntersectCard(exprs(0), exprs(1)))

  /** Column face of [[SortedLongIntersectCard]]. */
  def sortedIntersectCard(a: Column, b: Column): Column = call_function(FnName, a, b)
}
