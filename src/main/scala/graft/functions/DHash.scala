package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `dhash60(payload)` — a difference-hash (dHash) perceptual signature
  * over an opaque frame payload, as a codegen'd Catalyst expression.
  *
  * The image-dHash recipe (resize to a (G+1)×G grayscale grid, emit one
  * bit per adjacent-cell brightness gradient) transplanted to a 1-D
  * byte stream: the payload is divided into 61 equal-measure cells
  * (cell of byte p = p·61 div L — the exact-integer partition both
  * engines can replay), each cell reduces to its unsigned byte sum
  * (the "brightness"), and bit c (0 ≤ c < 60) is set iff
  * cell(c+1) > cell(c). 60 bits so the signature rides a non-negative
  * BIGINT on both engines (the [[Text.md5Hash60]] convention).
  *
  * Why a GRADIENT signature and not a digest: md5 flips ~half its bits
  * on a one-byte edit, so "almost the same frame" is invisible to it.
  * dHash bits move only where an edit crosses a cell-sum comparison —
  * near-identical payloads land within a few bits of Hamming distance
  * while unrelated payloads sit near the random-hash expectation of
  * ~30/60 differing bits, which is what makes cross-media NEAR-dup
  * frame detection (q118) and scene segmentation (q271) perceptual
  * instead of exact. (Reference treats media as opaque bytes end to
  * end — internal/rest/handlers.go sync payloads — so this whole
  * family is beyond-reference surface.)
  *
  * Scale: one tight primitive loop per row (no allocation beyond the
  * 61-long cell array), inlined into whole-stage codegen via a static
  * kernel call — the PqCodec escalation pattern for per-row kernels
  * that would otherwise be deep interpreted higher-order folds.
  */
final case class DHash60(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = DHash.FnName

  override def nullSafeEval(input: Any): Any =
    DHash.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DHash.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): DHash60 =
    copy(child = newChild)
}

object DHash {
  val FnName = "dhash60"

  /** 61 cells → 60 gradient bits. */
  val Cells = 61

  /** Row kernel, called from both eval and generated code. Empty
    * payload → 0 (no cells, no gradients). Corpus payloads are ASCII
    * (byte == char), so the DuckDB replay over `ord(substr(...))`
    * folds the identical cell sums. */
  def hash(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    val cells = new Array[Long](Cells)
    var p = 0
    while (p < n) {
      cells(p * Cells / n) += (bytes(p) & 0xff).toLong
      p += 1
    }
    var h = 0L
    var c = 0
    while (c < Cells - 1) {
      if (cells(c + 1) > cells(c)) h |= 1L << c
      c += 1
    }
    h
  }

  val injection: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(FnName),
      new ExpressionInfo(classOf[DHash60].getName, FnName),
      (exprs: Seq[Expression]) => DHash60(exprs.head))

  def dhash60(s: Column): Column = call_function(FnName, s)
}
