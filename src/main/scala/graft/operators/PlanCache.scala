package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.DataFrame

/** Caller-managed persistence for operators whose returned plan reads a
  * cached intermediate more than once (LSH banding + verify both scan
  * the hashed documents; the signature feeds both sides of a self-join).
  *
  * Previous shape: persist → build → `.localCheckpoint()` → unpersist in
  * `finally`. localCheckpoint materializes EAGERLY into unreplicated
  * executor-local blocks: on a real cluster, losing one executor after
  * the checkpoint fails every downstream action instead of recomputing
  * from lineage — a scale liability — and the eager materialization runs
  * even if the caller never executes the plan.
  *
  * Now the intermediate stays a plain `persist()` (lineage intact,
  * evictable, recomputable) registered here, and the returned plan is
  * lazy and checkpoint-free. Lifetime belongs to the CALLER: loop-style
  * jobs call [[release]] between iterations; one-shot drivers may leave
  * eviction to the LRU block manager, which can always drop these blocks
  * safely precisely because lineage survives.
  */
object PlanCache {
  private val live = new ConcurrentLinkedQueue[DataFrame]

  /** Persist `df` and track it for a later [[release]]. */
  def tracked(df: DataFrame): DataFrame = { val c = df.persist(); live.add(c); c }

  /** Unpersist every tracked intermediate. */
  def release(): Unit =
    Iterator.continually(live.poll()).takeWhile(_ != null).foreach(_.unpersist())
}
