package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** `hll_card(s)` — HyperLogLog distinct-cardinality AGGREGATE over a
  * string column, with the engine's md5-deterministic register scheme
  * (reference dedup/monitoring reports, retail-ai-inc/sync
  * pkg/syncer/monitor.go row-count school — here as a sketch).
  *
  * Why not `approx_count_distinct`: Spark's HLL++ hashes with
  * xxHash64, which no other engine replays — its estimates can never
  * be oracle-checked. This aggregate uses the same md5 register/rho
  * split as [[graft.operators.Sketches]] (q83/q117/q124), so a DuckDB
  * replay produces the IDENTICAL registers and the identical estimate:
  * an approximate result with an exact differential test.
  *
  * Why not `count_distinct`: N distinct aggregates in one `agg` plan
  * an Expand (one input-row copy per aggregate — the q99 profiler's
  * 10× row inflation). This is a plain aggregate with a fixed
  * 256-byte buffer: any number of them share one pass, no Expand, and
  * partial aggregation merges register-wise — the shuffle carries one
  * 256-byte row per group per column at ANY corpus size.
  *
  * The buffer is the register array itself (max rho per register,
  * rho ≤ 53 fits a byte); merge is element-wise max — associative,
  * commutative, shuffle-order-independent. The returned
  * `(m_hit, sumpow)` pair feeds [[graft.operators.Sketches]]'s shared
  * estimator Column: integer register sum `Σ 2^(53−rho)` exactly as
  * q83's, so the ln/division double math stays bit-identical across
  * engines and consumers.
  */
final case class HllCardAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with ImplicitCastInputTypes {

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("m_hit", IntegerType, nullable = false),
    StructField("sumpow", LongType, nullable = false)))
  override def prettyName: String = "hll_card"

  private val m = graft.operators.Sketches.HllRegisters // 256
  private val regBits = graft.operators.Sketches.HllRegisterBits // 8
  private val maxRho = graft.operators.Sketches.HllRestBits + 1 // 53

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  // per-task-instance digest (update runs serially within a task;
  // each task deserializes its own expression copy) — getInstance
  // per row was the measured hot spot of the whole profile pass
  @transient private lazy val md = MessageDigest.getInstance("MD5")
  private val prefix = "hllc-".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // identical value to Text.md5Hash60's convention: the first 15
      // hex chars of the md5 = the top 60 bits of the first 8 digest
      // bytes (big-endian >>> 4) — computed bytewise, no hex strings.
      // The 'hllc-' salt keeps these registers independent of the
      // token sketches'.
      md.reset()
      md.update(prefix)
      md.update(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
      val d = md.digest()
      val h = (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
        ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
        ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
      val reg = (h % m).toInt
      val rest = h >>> regBits
      val rho =
        if (rest == 0L) maxRho
        else maxRho - (64 - java.lang.Long.numberOfLeadingZeros(rest))
      if (rho > buf(reg)) buf(reg) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var hit = 0
    var sumpow = 0L
    var i = 0
    while (i < m) {
      if (buf(i) > 0) { hit += 1; sumpow += 1L << (maxRho - buf(i)) }
      i += 1
    }
    InternalRow(hit, sumpow)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllCardAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllCardAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllCardAgg =
    copy(child = newChildren.head)
}

object HllCard {
  val FnName = "hll_card"

  /** Registration tuple for `SparkSessionExtensions.injectFunction`
    * (wired in [[graft.GraftSession]]) — the analyzer wraps the bare
    * AggregateFunction in an AggregateExpression at resolution, the
    * same path built-in aggregates take. */
  val injection: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(FnName),
      new ExpressionInfo(classOf[HllCardAgg].getName, FnName),
      (exprs: Seq[Expression]) => HllCardAgg(exprs.head))

  /** Column face: `hllCard(s)` → struct(m_hit, sumpow). */
  def hllCard(s: Column): Column = call_function(FnName, s)
}
