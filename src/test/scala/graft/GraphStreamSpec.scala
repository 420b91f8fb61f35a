package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Graph
import graft.streaming.GraphStream

/** The streamed graph store equals the one-shot build, and a restart
  * resumes without double-counting edge deltas. */
class GraphStreamSpec extends SparkSpec {

  test("two checkpointed deliveries of whole baskets reproduce the full-corpus edges") {
    val src = Files.createTempDirectory("graph-src").toString
    val store = Files.createTempDirectory("graph-store").toString
    val ckpt = Files.createTempDirectory("graph-ckpt").toString
    val li = Tables(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    // whole-order files: the basket-atomicity contract
    li.filter(col("l_orderkey") % 2 === 0).write.json(s"$src/batch1")
    GraphStream.start(spark, s"$src/*", store, ckpt).awaitTermination()
    li.filter(col("l_orderkey") % 2 === 1).write.json(s"$src/batch2")
    GraphStream.start(spark, s"$src/*", store, ckpt).awaitTermination()

    val streamed = Graph.storedEdges(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = Graph.coPurchaseEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed == full)
    // a THIRD run over the same files must be a no-op (checkpointed
    // offsets) — deltas cannot double-count
    GraphStream.start(spark, s"$src/*", store, ckpt).awaitTermination()
    val again = Graph.storedEdges(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again == full)
    // the stored pagerank read face works over the streamed layout
    assert(Graph.pageRankFromStore(spark, store).count() == 25)
    graft.operators.PlanCache.release()
  }

  test("a batch delivered AFTER a compaction lands in the live versioned dir, not the dead legacy path") {
    val src = Files.createTempDirectory("graph-src2").toString
    val store = Files.createTempDirectory("graph-store2").toString
    val ckpt = Files.createTempDirectory("graph-ckpt2").toString
    val li = Tables(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    li.filter(col("l_orderkey") % 2 === 0).write.json(s"$src/batch1")
    GraphStream.start(spark, s"$src/*", store, ckpt).awaitTermination()
    // compaction cuts the store over to edges_v0; the legacy `edges`
    // dir is now dead and the NEXT publish deletes it — a stream that
    // kept writing there would lose every post-compaction batch
    // silently (checkpoint-committed, round-10 advice high)
    Graph.compactGraphStore(spark, store)
    li.filter(col("l_orderkey") % 2 === 1).write.json(s"$src/batch2")
    GraphStream.start(spark, s"$src/*", store, ckpt).awaitTermination()
    val full = Graph.coPurchaseEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def stored() = Graph.storedEdges(spark, store).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(stored() == full, "post-compaction stream deltas were lost")
    // a second compaction (which cleans superseded dirs) keeps them
    Graph.compactGraphStore(spark, store)
    assert(stored() == full)
    // and the streamed baskets are in the ledger: reconcile is a no-op
    assert(Graph.reconcileGraphStore(spark, sf, store) == 0L)
    graft.operators.PlanCache.release()
  }
}
