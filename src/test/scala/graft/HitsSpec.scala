package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Exact in-memory replay of the HITS iterations — the invariant the
  * oracle replay shares but a reader can't eyeball: both walk the same
  * integer pico grid, so the spec recomputes it a third way (BigInt
  * folds over the collected edge list) and demands bit equality. */
class HitsSpec extends SparkSpec {

  test("hits: BigInt replay matches, sides normalized, ranks dense") {
    val got = Graph.hits(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    graft.operators.PlanCache.release()

    val edges = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables(spark, sf, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_partkey")),
        Seq("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_partkey")).agg(count(lit(1)).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val scale = BigInt(Graph.PrScale)
    var auth: Map[Long, BigInt] =
      edges.map(_._2).distinct.map(_ -> scale).toMap
    var hub: Map[Long, BigInt] = Map.empty
    for (_ <- 1 to 3) {
      val hraw = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => BigInt(e._3) * auth(e._2)).sum
      }
      val htot = hraw.values.sum
      hub = hraw.map { case (c, v) => c -> v * scale / htot }
      val araw = edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => BigInt(e._3) * hub(e._1)).sum
      }
      val atot = araw.values.sum
      auth = araw.map { case (p, v) => p -> v * scale / atot }
    }
    def topk(m: Map[Long, BigInt], side: String) =
      m.toSeq.sortBy { case (k, v) => (-v, k) }.take(25).zipWithIndex
        .map { case ((k, v), i) => (side, i + 1L, k, v.toLong) }
    val want = topk(auth, "auth") ++ topk(hub, "hub")
    assert(got.toSeq == want, "HITS top-k replay diverged")
    // each side's FULL mass stays within the truncation envelope
    assert(hub.values.sum <= scale && auth.values.sum <= scale)
    assert(auth.values.sum >= scale * 99 / 100,
      "authority mass leaked more than 1%")
  }
}
