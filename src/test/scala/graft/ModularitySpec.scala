package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Independent recount of q267 on a hand-built basket set: the LPA
  * rounds AND the modularity fold both re-derived in pure Scala with
  * BigInt rationals — validating the label walk and the quality
  * arithmetic in one sweep, plus structural invariants on real data. */
class ModularitySpec extends SparkSpec {

  test("modularity: brute-force LPA + BigInt fold on a hand-built graph") {
    import spark.implicits._
    // two dense families bridged by one shared item
    val baskets: Seq[(Long, Seq[Long])] = Seq(
      1L -> Seq(10L, 11L, 12L), 2L -> Seq(10L, 11L, 13L),
      3L -> Seq(11L, 12L, 13L), 4L -> Seq(10L, 12L, 13L),
      5L -> Seq(13L, 20L),
      6L -> Seq(20L, 21L, 22L), 7L -> Seq(20L, 21L, 23L),
      8L -> Seq(21L, 22L, 23L), 9L -> Seq(20L, 22L, 23L))
    val dir = java.nio.file.Files.createTempDirectory("graft_mod").toString
    baskets.flatMap { case (b, items) => items.map(i => (b, i)) }
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")

    // undirected pair weights
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.foreach { case (_, items) =>
      val s = items.distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.length)
        w((s(i), s(j))) = w.getOrElse((s(i), s(j)), 0L) + 1L
    }
    val sym = w.toSeq.flatMap { case ((a, b), ww) =>
      Seq((a, b, ww), (b, a, ww)) }
    // 4 synchronous LPA rounds, argmax (votes desc, lbl asc)
    var lbl = sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 0 until 4) {
      lbl = sym.groupBy(_._2).map { case (node, in) =>
        val votes = in.groupBy(e => lbl(e._1))
          .map { case (l, es) => l -> es.map(_._3).sum }
        node -> votes.toSeq.sortBy { case (l, v) => (-v, l) }.head._1
      }
    }
    val m2 = BigInt(sym.map(_._3).sum)
    val wdeg = sym.groupBy(_._1).map { case (n, es) => n -> es.map(_._3).sum }
    val want = lbl.groupBy(_._2).map { case (c, members) =>
      val nodes = members.keySet
      val inW = BigInt(sym.filter(e =>
        lbl(e._1) == c && lbl(e._2) == c).map(_._3).sum)
      val totW = BigInt(nodes.toSeq.map(wdeg).sum)
      val contrib = (inW * m2 - totW * totW) * 1000000 / (m2 * m2)
      (c, nodes.size.toLong, inW.toLong, totW.toLong, contrib.toLong)
    }.toSeq.sortBy { case (c, n, _, _, _) => (-n, c) }

    val got = Graph.communityModularity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    graft.operators.PlanCache.release()
    assert(got.toSeq == want, s"got ${got.toSeq}, want $want")
    // a 2-family graph with one bridge must beat chance decisively
    assert(want.map(_._5).sum > 300000L, "Q must be clearly positive here")
  }

  test("quotient graph: brute-force mixing matrix on the hand-built graph") {
    import spark.implicits._
    val baskets: Seq[(Long, Seq[Long])] = Seq(
      1L -> Seq(10L, 11L, 12L), 2L -> Seq(10L, 11L, 13L),
      3L -> Seq(11L, 12L, 13L), 4L -> Seq(10L, 12L, 13L),
      5L -> Seq(13L, 20L),
      6L -> Seq(20L, 21L, 22L), 7L -> Seq(20L, 21L, 23L),
      8L -> Seq(21L, 22L, 23L), 9L -> Seq(20L, 22L, 23L))
    val dir = java.nio.file.Files.createTempDirectory("graft_qt").toString
    baskets.flatMap { case (b, items) => items.map(i => (b, i)) }
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.foreach { case (_, items) =>
      val s = items.distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.length)
        w((s(i), s(j))) = w.getOrElse((s(i), s(j)), 0L) + 1L
    }
    val sym = w.toSeq.flatMap { case ((a, b), ww) =>
      Seq((a, b, ww), (b, a, ww)) }
    var lbl = sym.map(_._1).distinct.map(n => n -> n).toMap
    for (_ <- 0 until 4) {
      lbl = sym.groupBy(_._2).map { case (node, in) =>
        val votes = in.groupBy(e => lbl(e._1))
          .map { case (l, es) => l -> es.map(_._3).sum }
        node -> votes.toSeq.sortBy { case (l, v) => (-v, l) }.head._1
      }
    }
    val cells = w.toSeq.map { case ((a, b), ww) =>
      val (ca, cb) = (lbl(a) min lbl(b), lbl(a) max lbl(b))
      ((ca, cb), ww)
    }.groupBy(_._1).map { case (p, es) =>
      p -> (es.size.toLong, es.map(_._2).sum)
    }
    val wTot = BigInt(cells.values.map(_._2).sum)
    val want = cells.toSeq.map { case ((ca, cb), (n, ws)) =>
      (ca, cb, n, ws, (BigInt(ws) * 1000000 / wTot).toLong)
    }.sortBy { case (ca, cb, _, ws, _) => (-ws, ca, cb) }.take(25)
    val got = Graph.communityQuotient(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    graft.operators.PlanCache.release()
    assert(got.toSeq == want, s"got ${got.toSeq}, want $want")
    // the hand-built graph has two families and one bridge cell
    assert(want.count { case (a, b, _, _, _) => a != b } >= 1,
      "an off-diagonal (bridge) cell must exist")
  }

  test("truss peel: brute-force shrinkage curve; the bridge edge peels") {
    import spark.implicits._
    val baskets: Seq[(Long, Seq[Long])] = Seq(
      1L -> Seq(10L, 11L, 12L), 2L -> Seq(10L, 11L, 13L),
      3L -> Seq(11L, 12L, 13L), 4L -> Seq(10L, 12L, 13L),
      5L -> Seq(13L, 20L),
      6L -> Seq(20L, 21L, 22L), 7L -> Seq(20L, 21L, 23L),
      8L -> Seq(21L, 22L, 23L), 9L -> Seq(20L, 22L, 23L))
    val dir = java.nio.file.Files.createTempDirectory("graft_truss").toString
    baskets.flatMap { case (b, items) => items.map(i => (b, i)) }
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    var es = scala.collection.mutable.Set.empty[(Long, Long)]
    baskets.foreach { case (_, items) =>
      val s = items.distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.length)
        es += ((s(i), s(j)))
    }
    val k = 4
    val want = (0 to 2).map { r =>
      if (r > 0) {
        val adj = es.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
          .groupBy(_._1).map { case (n, xs) => n -> xs.map(_._2).toSet }
        es = es.filter { case (a, b) =>
          (adj(a) & adj(b)).size >= k - 2 }
      }
      val nodes = es.toSeq.flatMap(e => Seq(e._1, e._2)).distinct
      (r.toLong, es.size.toLong, nodes.size.toLong)
    }
    val got = Graph.trussPeel(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    graft.operators.PlanCache.release()
    assert(got.toSeq == want, s"got ${got.toSeq}, want $want")
    // the bridge tie (13, 20) sits in no triangle: round 1 must peel it
    assert(want(1)._2 == want(0)._2 - 1, "exactly the bridge edge peels")
  }

  test("modularity: invariants on the real corpus graph") {
    val got = Graph.communityModularity(spark, sf).collect()
    graft.operators.PlanCache.release()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3),
        "intra weight can't exceed the community's degree mass")
      assert(r.getLong(4) <= 1000000L && r.getLong(4) >= -1000000L)
    }
    val sizes = got.map(_.getLong(1))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b },
      "rows ordered by community size")
  }
}
