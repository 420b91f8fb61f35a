package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Product-quantization kernels for the PQ-ANN path (q80): nearest-
  * centroid code assignment and the batched ADC (asymmetric distance
  * computation) scan.
  *
  * Why native expressions (the SURVEY §7.4 escalation, like
  * [[SetCard]]/[[DistinctCard]]): the composable encode —
  * `slice ∘ zip_with ∘ aggregate` per (subspace, centroid) — is 1024
  * INTERPRETED higher-order folds per row (~9 s of the q80 bench at
  * sf0.1); unrolling the codebook into literal arithmetic instead
  * builds a ~4096-node tree that janino compiles for ~27 s before a
  * row moves. Each kernel here is a tight loop over a flat primitive
  * array riding along as ONE literal/reference — compact bytecode,
  * zero per-row allocation beyond the output.
  *
  * Why a batched ADC scan instead of an ADC join: joining candidates
  * against a broadcast of per-query 1024-double tables re-materializes
  * the 8 KB table into every joined row — at sf0.1 that row-copy alone
  * was ~6.5 s, 40× the arithmetic it feeds. [[PqAdcScore]] keeps ALL
  * query tables in one reference array and emits the per-query score
  * vector per candidate row: the scan never shuffles or copies a
  * table, output width is one double per query. (FAISS's shape: ADC
  * tables are query-time metadata computed once, shipped to workers.)
  *
  * Determinism contract (bit-identical to the composable form and the
  * DuckDB oracle): subspace dots accumulate `(double)e[i]*(double)c[i]`
  * LEFT-ASSOCIATIVELY from 0.0 (exactly `aggregate(zip_with(...), 0.0,
  * _+_)`); rounding is HALF_UP at 6 dp the way Spark's `round` does it
  * ([[PqCodec.round6]]); code assignment tie-breaks to the SMALLEST
  * centroid id (strict `>` on an ascending scan); the ADC sum starts
  * at the FIRST term like `reduce(_ + _)`. PqCodecSpec pins
  * kernel-vs-composable bit-equality.
  *
  * Shapes: codebook flattens j-major (`idx = j·dims + s·sub + i`);
  * each ADC table is s-major (`tbl[s·nCb + j]`); the table batch is
  * table-major (`tbls[t·nSub·nCb + s·nCb + j]`).
  */
abstract class PqKernel extends TernaryExpression {
  /** Second/third children must be literals (codebook / shape). */
  override def checkInputDataTypes(): TypeCheckResult =
    if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(s"$prettyName: codebook and shape must be literals")
    else if (!inputOk)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: unexpected input types (${first.dataType.simpleString}, ${second.dataType.simpleString})")
    else TypeCheckResult.TypeCheckSuccess
  protected def inputOk: Boolean

  /** Row kernel, called from both eval and generated code. */
  def apply(e: ArrayData): ArrayData

  override def nullSafeEval(e: Any, c: Any, n: Any): Any =
    apply(e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj(prettyName, this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (e, _, _) => s"${ev.value} = $self.apply($e);")
  }
}

/** Per-subspace nearest-centroid codes for an embedding:
  * `pq_encode(emb, cbFlat, nSub)` → `array<int>` of length nSub. */
final case class PqEncode(first: Expression, second: Expression, third: Expression)
    extends PqKernel {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"
  protected def inputOk: Boolean =
    (first.dataType, second.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => true
      case _ => false
    }

  @transient private lazy val cbFlat: Array[Float] =
    second.eval().asInstanceOf[ArrayData].toFloatArray()
  @transient private lazy val nSub: Int = third.eval().asInstanceOf[Int]

  override def apply(e: ArrayData): ArrayData = {
    val dims = e.numElements()
    val sub = dims / nSub
    val nCb = cbFlat.length / dims
    val codes = new Array[Int](nSub)
    var s = 0
    while (s < nSub) {
      var bestJ = 0
      var bestSim = Double.NegativeInfinity
      var j = 0
      while (j < nCb) {
        var acc = 0.0
        var i = 0
        while (i < sub) {
          acc += e.getFloat(s * sub + i).toDouble * cbFlat(j * dims + s * sub + i).toDouble
          i += 1
        }
        val sim = PqCodec.round6(acc)
        if (sim > bestSim) { bestSim = sim; bestJ = j }
        j += 1
      }
      codes(s) = bestJ
      s += 1
    }
    new GenericArrayData(codes)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqEncode = copy(f, s, t)
}

/** Batched ADC scores for a candidate's code vector against EVERY
  * query table: `pq_adc_score(codes, tblsFlat, nCb)` → `array<double>`
  * with one rounded similarity per table, in table order. */
final case class PqAdcScore(first: Expression, second: Expression, third: Expression)
    extends PqKernel {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_adc_score"
  protected def inputOk: Boolean =
    (first.dataType, second.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) => true
      case _ => false
    }

  @transient private lazy val tbls: Array[Double] =
    second.eval().asInstanceOf[ArrayData].toDoubleArray()
  @transient private lazy val nCb: Int = third.eval().asInstanceOf[Int]

  override def apply(codes: ArrayData): ArrayData = {
    val nSub = codes.numElements()
    val perTable = nSub * nCb
    val nTables = tbls.length / perTable
    val out = new Array[Double](nTables)
    var t = 0
    while (t < nTables) {
      val base = t * perTable
      // reduce(_ + _) order: start at the first term, not 0.0
      var acc = tbls(base + codes.getInt(0))
      var s = 1
      while (s < nSub) {
        acc += tbls(base + s * nCb + codes.getInt(s))
        s += 1
      }
      out(t) = PqCodec.round6(acc)
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqAdcScore = copy(f, s, t)
}

object PqCodec {
  val EncodeFn = "pq_encode"
  val AdcScoreFn = "pq_adc_score"

  /** Spark `round(x, 6)` semantics for doubles — HALF_UP on the
    * shortest decimal representation. */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** One query's s-major ADC table (`tbl[s·nCb + j]`) — the
    * driver-side twin of [[PqEncode]]'s inner dot: same fold order,
    * same rounding, so literal tables match what an executor-side
    * kernel would compute. */
  def adcTableFlat(emb: Array[Float], cbFlat: Array[Float], nSub: Int): Array[Double] = {
    val dims = emb.length
    val sub = dims / nSub
    val nCb = cbFlat.length / dims
    val tbl = new Array[Double](nSub * nCb)
    var s = 0
    while (s < nSub) {
      var j = 0
      while (j < nCb) {
        var acc = 0.0
        var i = 0
        while (i < sub) {
          acc += emb(s * sub + i).toDouble * cbFlat(j * dims + s * sub + i).toDouble
          i += 1
        }
        tbl(s * nCb + j) = round6(acc)
        j += 1
      }
      s += 1
    }
    tbl
  }

  val injections: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier(EncodeFn),
      new ExpressionInfo(classOf[PqEncode].getName, EncodeFn),
      (e: Seq[Expression]) => PqEncode(e(0), e(1), e(2))),
    (FunctionIdentifier(AdcScoreFn),
      new ExpressionInfo(classOf[PqAdcScore].getName, AdcScoreFn),
      (e: Seq[Expression]) => PqAdcScore(e(0), e(1), e(2))))

  /** Column faces. */
  def encode(emb: Column, cbFlat: Column, nSub: Int): Column =
    call_function(EncodeFn, emb, cbFlat, lit(nSub))
  def adcScore(codes: Column, tblsFlat: Column, nCb: Int): Column =
    call_function(AdcScoreFn, codes, tblsFlat, lit(nCb))
}
