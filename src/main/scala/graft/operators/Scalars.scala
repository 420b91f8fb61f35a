package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Attach a 1-row totals/stats frame to every row of `df` as a
  * broadcast HASH join — the scale-safe middle path between
  * `crossJoin(broadcast(_))` (plans BroadcastNestedLoopJoin, which the
  * plan suite bans globally) and an empty-partition window (moves the
  * WHOLE frame through one task). A literal join key gets
  * constant-folded away and the join degrades back to a nested loop,
  * so the key is derived from a caller-named NON-NULL column on each
  * side: `pmod(anchor, 1)` is identically 0 at runtime but opaque to
  * ConstantFolding. Every probe hits the single build row; the join
  * stays a BroadcastHashJoin and the stream side keeps its
  * partitioning. */
object Scalars {
  def attach(df: DataFrame, one: DataFrame,
      dfAnchor: Column, oneAnchor: Column): DataFrame = {
    val k = "__scalar_k"
    def key(anchor: Column): Column =
      coalesce(pmod(anchor, lit(1)).cast("int"), lit(0))
    df.withColumn(k, key(dfAnchor))
      .join(broadcast(one.withColumn(k, key(oneAnchor))), Seq(k))
      .drop(k)
  }
}
