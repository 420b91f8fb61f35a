package graft.plans

import scala.collection.mutable

import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, AttributeReference, AttributeSet, BaseOrdering, CurrentRow, EqualTo, Expression, GenericInternalRow, IsNotNull, JoinedRow, LessThan, LessThanOrEqual, Literal, PredicateHelper, RowFrame, RowNumber, RowOrdering, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, UnsafeProjection, UnsafeRow, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.types.{DoubleType, FloatType, IntegerType}
import org.apache.spark.util.collection.unsafe.sort.PrefixComparators

/** Whole-operator fusion for the per-group top-k idiom — the SURVEY
  * §7.4 rung (c) escalation: a custom `LogicalPlan` + optimizer
  * `Rule` + `SparkStrategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions` (see [[graft.GraftSession]]).
  *
  * The declarative form every operator writes —
  * `row_number().over(partitionBy(g).orderBy(o)) <= k` then filter —
  * plans as Exchange → SORT → Window → Filter: the sort orders ENTIRE
  * partitions only for the filter to keep k rows per group. Spark's
  * own `WindowGroupLimit` optimization bounds what reaches the sort
  * but still sorts. [[TopKPerGroupExec]] replaces sort+window+filter
  * with one pass of bounded per-group HEAPS: O(n log k) comparisons,
  * no partition-wide sort buffer, same single hash exchange (the
  * required clustered distribution). At 100 TB the difference is a
  * full sort spill per partition vs k rows of state per group.
  *
  * Results are IDENTICAL to the window form, including ranks, when
  * the order is total (our operators tie-break explicitly); with ties
  * the heap picks the same arbitrary winners row_number would — both
  * are implementation-ordered under a non-total order.
  *
  * [[TopKRewrite]] fires only on the exact safe shape: a Filter
  * directly over a single-expression `row_number` Window whose frame
  * is the rank frame, whose predicate is a conjunction of upper
  * bounds on the rank column (≤ k, < k, = 1) plus at most its
  * IsNotNull, and whose partition/order expressions are
  * deterministic. Everything else keeps the stock plan. */
final case class TopKPerGroupPlan(partition: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: Attribute, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupPlan =
    copy(child = newChild)
}

object TopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Heap state is k rows per group; beyond this a sort is the right
    * plan anyway. */
  val MaxK = 100000

  private def hasFloat(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case FloatType | DoubleType => true
    case s: org.apache.spark.sql.types.StructType => s.fields.exists(f => hasFloat(f.dataType))
    case a: org.apache.spark.sql.types.ArrayType => hasFloat(a.elementType)
    case m: org.apache.spark.sql.types.MapType => hasFloat(m.keyType) || hasFloat(m.valueType)
    case _ => false
  }

  private def rankBound(conjuncts: Seq[Expression], rn: Attribute): Option[Int] = {
    val bounds = conjuncts.flatMap {
      case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.semanticEquals(rn) => Some(v)
      case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.semanticEquals(rn) => Some(v - 1)
      case EqualTo(a: AttributeReference, Literal(1, IntegerType))
        if a.semanticEquals(rn) => Some(1)
      case _ => None
    }
    val recognized = conjuncts.forall {
      case LessThanOrEqual(a: AttributeReference, Literal(_: Int, IntegerType)) => a.semanticEquals(rn)
      case LessThan(a: AttributeReference, Literal(_: Int, IntegerType)) => a.semanticEquals(rn)
      case EqualTo(a: AttributeReference, Literal(1, IntegerType)) => a.semanticEquals(rn)
      case IsNotNull(a: AttributeReference) => a.semanticEquals(rn) // rn is never null
      case _ => false
    }
    if (recognized && bounds.nonEmpty) Some(bounds.min) else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      w.windowExpressions match {
        case Seq(alias @ Alias(WindowExpression(_: RowNumber,
            WindowSpecDefinition(_, _, SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
          if w.orderSpec.nonEmpty &&
            w.partitionSpec.forall(_.deterministic) &&
            w.orderSpec.forall(_.child.deterministic) &&
            // Window partition keys get NormalizeFloatingNumbers (-0.0/NaN
            // canonicalization) late in optimization; our node replaces the
            // Window before that rule sees it, and the heap groups by raw
            // key bytes — float-keyed windows stay on the stock plan
            w.partitionSpec.forall(e => !hasFloat(e.dataType)) =>
          rankBound(splitConjunctivePredicates(cond), alias.toAttribute) match {
            case Some(k) if k >= 1 && k <= MaxK =>
              TopKPerGroupPlan(w.partitionSpec, w.orderSpec, k, alias.toAttribute, w.child)
            case _ => f
          }
        case _ => f
      }
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(p, o, k, rank, child) =>
      TopKPerGroupExec(p, o, k, rank, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** One pass of bounded per-group heaps over the clustered child.
  * The heap is a max-heap under the sort order, so its head is the
  * WORST retained row — a new row either loses to it (drop) or evicts
  * it. Emission sorts each k-heap (k log k) and appends the 1-based
  * rank, preserving the window form's output schema.
  *
  * SPILL SAFETY (the 100 TB case the heap alone cannot hold): retained
  * state is groups-per-partition × k rows — tiny for top-k-per-source,
  * but the rank=1 latest-per-key idiom makes every key a group, and a
  * billion-key partition must not pin a billion rows on-heap where the
  * stock sort-based window would spill. The exec tracks retained BYTES
  * against `graft.topk.maxHeapBytes` (default 64 MiB); on overflow the
  * retained rows drain into an [[UnsafeExternalRowSorter]] (task-memory
  * managed, disk-spilling) and the heap map resets. The prune stays
  * LOSSLESS across chunks: an evicted row lost to k better rows of its
  * own group, so it can never be in the group's top k. A final sorted
  * merge pass — (partition keys, order) sort over only the surviving
  * chunk rows — emits the first k per group. Fast path (no overflow)
  * never sorts; worst case degrades to exactly the stock plan's
  * external sort over PRE-PRUNED input. */
final case class TopKPerGroupExec(partition: Seq[Expression], order: Seq[SortOrder],
    k: Int, rankAttr: Attribute, child: SparkPlan) extends UnaryExecNode {

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "spillChunks" -> SQLMetrics.createMetric(sparkContext, "heap-budget spill chunks"))

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def requiredChildDistribution: Seq[Distribution] =
    if (partition.isEmpty) AllTuples :: Nil else ClusteredDistribution(partition) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val kV = k
    val childOut = child.output
    val partExprs = partition
    val orderSpec = order
    val outAttrs = output
    val budgetBytes = conf.getConfString("graft.topk.maxHeapBytes",
      String.valueOf(64L << 20)).toLong
    val numOutputRows = longMetric("numOutputRows")
    val spillChunks = longMetric("spillChunks")
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(partExprs, childOut)
      val ordering: BaseOrdering = RowOrdering.create(orderSpec, childOut)
      implicit val heapOrd: Ordering[UnsafeRow] = new Ordering[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ordering.compare(a, b)
      }
      var heaps = new java.util.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]()
      var retainedBytes = 0L
      var sorter: UnsafeExternalRowSorter = null

      def drainHeapsToSorter(): Unit = {
        if (sorter == null) {
          // group-then-rank total order; constant prefix (comparator sees
          // ties) defers every comparison to the full record ordering
          val fullOrder = partExprs.map(e => SortOrder(e, Ascending)) ++ orderSpec
          val recordOrdering = RowOrdering.create(fullOrder, childOut)
          val prefixComputer = new UnsafeExternalRowSorter.PrefixComputer {
            private val zero = new UnsafeExternalRowSorter.PrefixComputer.Prefix
            override def computePrefix(row: InternalRow): UnsafeExternalRowSorter.PrefixComputer.Prefix = zero
          }
          sorter = UnsafeExternalRowSorter.create(
            DataTypeUtils.fromAttributes(childOut), recordOrdering,
            PrefixComparators.LONG, prefixComputer,
            SparkEnv.get.memoryManager.pageSizeBytes, false)
        }
        val it = heaps.values().iterator()
        while (it.hasNext) it.next().foreach(sorter.insertRow)
        heaps = new java.util.LinkedHashMap[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]()
        retainedBytes = 0L
      }

      while (iter.hasNext) {
        val row = iter.next().asInstanceOf[UnsafeRow]
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = mutable.PriorityQueue.empty[UnsafeRow]
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kV) {
          heap += row.copy()
          retainedBytes += row.getSizeInBytes
        } else if (ordering.compare(row, heap.head) < 0) {
          retainedBytes -= heap.dequeue().getSizeInBytes
          heap += row.copy()
          retainedBytes += row.getSizeInBytes
        }
        if (retainedBytes > budgetBytes) {
          drainHeapsToSorter()
          spillChunks += 1
        }
      }

      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      if (sorter == null) {
        import scala.jdk.CollectionConverters._
        heaps.values().iterator().asScala.flatMap { heap =>
          // dequeueAll drains worst-first; reverse = rank order
          val ranked: Seq[UnsafeRow] = heap.dequeueAll.reverse
          ranked.iterator.zipWithIndex.map { case (r, i) =>
            numOutputRows += 1
            rankRow.update(0, i + 1)
            outProj(joined(r, rankRow))
          }
        }
      } else {
        drainHeapsToSorter()
        heaps = null
        val sorted = sorter.sort()
        new Iterator[InternalRow] {
          private var curKey: UnsafeRow = null
          private var emitted = 0
          private var staged: InternalRow = null // one outstanding sorter row
          private def stage(): Unit = {
            while (staged == null && sorted.hasNext) {
              val row = sorted.next()
              val key = keyProj(row)
              if (curKey == null || key != curKey) {
                curKey = key.copy()
                emitted = 0
              }
              if (emitted < kV) staged = row
            }
          }
          override def hasNext: Boolean = { stage(); staged != null }
          override def next(): InternalRow = {
            stage()
            val row = staged
            staged = null
            emitted += 1
            numOutputRows += 1
            rankRow.update(0, emitted)
            outProj(joined(row, rankRow))
          }
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
