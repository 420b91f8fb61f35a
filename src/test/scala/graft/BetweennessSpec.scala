package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Pure-Scala Brandes replay of q270 on a hand-built bridge graph
  * (where betweenness has an obvious right answer), plus invariants
  * on the real corpus graph. */
class BetweennessSpec extends SparkSpec {

  private def h(s: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  test("betweenness: BigInt Brandes replay on a hand-built bridge graph") {
    import spark.implicits._
    // two cliques joined ONLY through node 15 — the broker
    val baskets: Seq[(Long, Seq[Long])] = Seq(
      1L -> Seq(10L, 11L, 12L), 2L -> Seq(10L, 11L, 13L),
      3L -> Seq(12L, 13L), 4L -> Seq(13L, 15L),
      5L -> Seq(15L, 20L),
      6L -> Seq(20L, 21L, 22L), 7L -> Seq(20L, 21L, 23L),
      8L -> Seq(22L, 23L))
    val dir = java.nio.file.Files.createTempDirectory("graft_btw").toString
    baskets.flatMap { case (b, items) => items.map(i => (b, i)) }
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")

    // undirected adjacency
    val und = scala.collection.mutable.Set.empty[(Long, Long)]
    baskets.foreach { case (_, items) =>
      val s = items.distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.length)
        und += ((s(i), s(j)))
    }
    val adj = und.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val nodes = adj.keys.toSeq
    val samples = nodes.sortBy(n => h(s"btw-$n")).take(8)
    val maxHops = 3

    val delta = scala.collection.mutable.Map.empty[Long, BigInt]
    val levelCount = scala.collection.mutable.Map.empty[Long, Long]
    samples.foreach { s0 =>
      // forward BFS with path counts
      var levels = Vector(Map(s0 -> BigInt(1)))
      var reached = Set(s0)
      for (_ <- 1 to maxHops) {
        val sig = scala.collection.mutable.Map.empty[Long, BigInt]
        levels.last.foreach { case (u, su) =>
          adj(u).foreach { v =>
            if (!reached(v)) sig(v) = sig.getOrElse(v, BigInt(0)) + su
          }
        }
        reached ++= sig.keySet
        levels :+= sig.toMap
      }
      // backward accumulation in integer micro
      var below: Map[Long, (BigInt, BigInt)] =
        levels(maxHops).map { case (n, s) => n -> (s, BigInt(0)) }
      for (hh <- (maxHops - 1) to 1 by -1) {
        val cur = levels(hh).map { case (v, sv) =>
          val dep = adj(v).toSeq.flatMap(w => below.get(w).map {
            case (sw, dw) => sv * (1000000 + dw) / sw
          }).sum
          v -> (sv, dep)
        }
        cur.foreach { case (v, (_, d)) =>
          delta(v) = delta.getOrElse(v, BigInt(0)) + d
          levelCount(v) = levelCount.getOrElse(v, 0L) + 1L
        }
        below = cur
      }
    }
    val want = delta.toSeq.filter(_._2 > 0)
      .map { case (n, d) => (n, d.toLong, levelCount(n)) }
      .sortBy { case (n, d, _) => (-d, n) }.take(25)

    val got = Graph.sampledBetweenness(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    graft.operators.PlanCache.release()
    assert(got.toSeq == want, s"got ${got.toSeq}, want $want")
    // the bridge must dominate: every 10s↔20s shortest path crosses 15
    assert(got.head._1 == 15L, "the broker node must rank first")
  }

  test("betweenness: invariants on the real corpus graph") {
    val got = Graph.sampledBetweenness(spark, sf).collect()
    graft.operators.PlanCache.release()
    assert(got.nonEmpty)
    val bcs = got.map(_.getLong(1))
    assert(bcs.forall(_ > 0L))
    assert(bcs.zip(bcs.tail).forall { case (a, b) => a >= b },
      "rows ordered by betweenness")
  }
}
