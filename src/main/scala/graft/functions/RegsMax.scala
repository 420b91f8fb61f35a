package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** `regs_max(bin)` — element-wise byte MAX over equal-length binary
  * values: the register-merge aggregate sketch iterations are made
  * of. [[HllCardAgg]] fuses hashing and merging for one in-scan
  * sketch; this is the complementary half for ITERATED sketches
  * (HyperBall), where the registers are carried between rounds as a
  * packed blob column: a graph round ships ONE m-byte row per edge
  * instead of m (node, reg, rho) rows — the q252 neighborhood sketch
  * measured 3× faster wall-clock when its per-register grain
  * collapsed into this aggregate.
  *
  * Merge is element-wise max: associative, commutative, idempotent —
  * shuffle-order-independent and replay-safe, the same contract the
  * register stores pin. The buffer adopts the first input's length;
  * mixed lengths fail loudly (a sketch mixing register widths is a
  * caller bug, not data). */
final case class RegsMaxAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "regs_max"

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  private def maxInto(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (b.isEmpty) a
    else if (a.isEmpty) b.clone()
    else {
      require(a.length == b.length,
        s"regs_max: register width mismatch (${a.length} vs ${b.length})")
      var i = 0
      // UNSIGNED compare: a register is a 0–255 cell, and JVM bytes
      // are signed — a signed max would rank 0x80 below 0x01 (q252's
      // rho ≤ 56 never trips it, but the function is registered
      // session-wide as a general byte max)
      while (i < a.length) {
        if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
        i += 1
      }
      a
    }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf else maxInto(buf, v.asInstanceOf[Array[Byte]])
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    maxInto(a, b)

  override def eval(buf: Array[Byte]): Any = buf

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): RegsMaxAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): RegsMaxAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): RegsMaxAgg =
    copy(child = newChildren.head)
}

object RegsMax {
  val FnName = "regs_max"

  val injection: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(FnName),
      new ExpressionInfo(classOf[RegsMaxAgg].getName, FnName),
      (exprs: Seq[Expression]) => RegsMaxAgg(exprs.head))

  def regsMax(b: Column): Column = call_function(FnName, b)
}
