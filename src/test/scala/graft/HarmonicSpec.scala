package graft

import java.security.MessageDigest

import graft.operators.Graph

/** Driver-side BFS replay of the sampled harmonic centrality: the
  * same md5 source sample, a plain BigInt/Map BFS to the hop horizon,
  * and the 10⁶ div hops fold must reproduce the engine's top-k rows
  * exactly — including the rank column's tie-break. */
class HarmonicSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("sampled harmonic: driver BFS replay matches rank-for-rank") {
    val got = Graph.sampledHarmonic(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    val und = Graph.coPurchaseEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = (und.map(e => e._1 -> e._2) ++ und.map(e => e._2 -> e._1))
      .groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    val samples = adj.keys.toSeq
      .sortBy(s => md5hex(s"anf-$s")).take(8)
    val dist = samples.flatMap { s =>
      var reached = Map(s -> 0)
      var frontier = Set(s)
      for (h <- 1 to 3) {
        val next = frontier.flatMap(adj(_)).diff(reached.keySet)
        reached ++= next.map(_ -> h)
        frontier = next
      }
      reached.collect { case (n, h) if h > 0 => (n, h) }
    }
    val want = dist.groupBy(_._1).toSeq
      .map { case (n, hs) =>
        (n, hs.size.toLong, hs.map(p => 1000000L / p._2).sum)
      }
      .sortBy { case (n, _, h) => (-h, n) }
      .take(25).zipWithIndex
      .map { case ((n, ns, h), i) => (i + 1, n, ns, h) }
    assert(got.toSeq == want)
  }
}
