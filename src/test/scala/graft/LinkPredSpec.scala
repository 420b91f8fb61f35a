package graft

import org.apache.spark.sql.functions._

import graft.operators.{DataQuality, Graph}

/** Semantics the q261/q262 oracle replays can't independently see:
  * a pure-Scala brute-force recount of the link-prediction eval on a
  * hand-built basket set, and an exact in-memory replay of the
  * randomized-response mechanism over the real customer table. */
class LinkPredSpec extends SparkSpec {

  /** The engine's md5 grid (functions.Text.md5Hash60) in pure Scala. */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("link prediction: brute-force replay on a hand-built basket set") {
    import spark.implicits._
    val baskets: Seq[(Long, Seq[Long])] = Seq(
      1L -> Seq(10L, 20L, 30L), 2L -> Seq(20L, 30L, 40L),
      3L -> Seq(10L, 40L, 50L), 4L -> Seq(30L, 50L, 60L),
      5L -> Seq(10L, 20L, 60L), 6L -> Seq(40L, 60L, 70L),
      7L -> Seq(20L, 50L, 70L), 8L -> Seq(10L, 30L, 70L),
      9L -> Seq(40L, 50L, 80L), 10L -> Seq(60L, 70L, 80L))
    val dir = java.nio.file.Files.createTempDirectory("graft_lp").toString
    baskets.flatMap { case (b, items) => items.map(i => (b, i)) }
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")

    // brute force: undirected pairs with basket counts
    val w = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.foreach { case (_, items) =>
      val s = items.distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.length)
        w((s(i), s(j))) = w.getOrElse((s(i), s(j)), 0L) + 1L
    }
    val train = w.filter { case ((a, b), _) => h60(s"linkpred-$a-$b") % 10 < 8 }
    val test = w.keys.filter { case (a, b) => h60(s"linkpred-$a-$b") % 10 >= 8 }
      .toSeq
    assert(test.nonEmpty, "the hand-built set must hash some edges to test")
    val sym = train.toSeq.flatMap { case ((a, b), ww) =>
      Seq((a, b, ww), (b, a, ww))
    }
    val deg = sym.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    // .toSeq BEFORE flatMap: flatMapping a Map with a tuple-valued fn
    // rebuilds a Map and silently collapses to one edge per src
    val capped = sym.groupBy(_._1).toSeq.flatMap { case (src, es) =>
      es.sortBy(e => (-e._3, e._2)).take(Graph.LinkPredCap).map(e => (src, e._2))
    }
    val adj = capped.groupBy(_._1).map { case (n, es) => n -> es.map(_._2) }
    val trainSet = sym.map(e => (e._1, e._2)).toSet
    // 2-hop candidates through each midpoint z, RA on the integer grid
    val scores = scala.collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    capped.foreach { case (a, z) =>
      adj.getOrElse(z, Seq.empty).foreach { b =>
        if (a != b) {
          val (cn, ra) = scores.getOrElse((a, b), (0L, 0L))
          scores((a, b)) = (cn + 1L, ra + 1000000L / deg(z))
        }
      }
    }
    val ranked = scores.toSeq
      .filterNot { case (p, _) => trainSet(p) }
      .groupBy(_._1._1)
      .flatMap { case (a, cands) =>
        cands.sortBy { case ((_, b), (cn, ra)) => (-ra, -cn, b) }
          .take(10).zipWithIndex
          .map { case (((_, b), _), i) => (a, b) -> (i + 1L) }
      }
    val cases = test.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val exp = Seq(1, 5, 10).map { k =>
      val hits = cases.count(p => ranked.get(p).exists(_ <= k))
      k.toLong -> (k.toLong, cases.size.toLong, hits.toLong,
        BigInt(hits) * 1000000 / cases.size)
    }.toMap

    val got = Graph.linkPredictionEval(spark, dir).collect()
    graft.operators.PlanCache.release()
    assert(got.length == 3)
    got.foreach { r =>
      val e = exp(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) ==
        (e._2, e._3, e._4.toLong),
        s"k=${r.getLong(0)}: got ${r.mkString(",")}, want $e")
    }
  }

  test("randomized response: mass conserved and the mechanism replays exactly") {
    val got = DataQuality.randomizedResponse(spark, sf).collect()
    val cust = Tables(spark, sf, "customer")
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = cust.length.toLong
    // the noisy histogram is a PERMUTATION of the mass, never a leak
    assert(got.map(_.getLong(1)).sum == n, "true counts cover every customer")
    assert(got.map(_.getLong(2)).sum == n, "noisy counts cover every customer")
    // exact mechanism replay: same md5 draws, same j >= own -> j+1 skip
    val noisy = cust.map { case (ck, nat) =>
      if (h60(s"rr-$ck") % 1000000L < 750000L) nat
      else {
        val j = h60(s"rr2-$ck") % 24L
        if (j >= nat) j + 1 else j
      }
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    got.foreach { r =>
      assert(r.getLong(2) == noisy.getOrElse(r.getLong(0), 0L),
        s"noisy count mismatch at nation ${r.getLong(0)}")
      // closed-form debias on the integer grid, clamped at zero
      val est = (BigInt(96) * r.getLong(2) - n).max(BigInt(0)) / 71
      assert(r.getLong(3) == est.toLong)
      assert(r.getLong(4) == math.abs(est.toLong - r.getLong(1)))
    }
  }
}
