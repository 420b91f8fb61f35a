package graft

import graft.operators.Graph

/** Driver-side ladder replay of the rich-club coefficient: collect
  * the co-purchase edges, recompute degrees, club sizes, club edges,
  * and φ with BigInt math at every power-of-two threshold. */
class RichClubSpec extends SparkSpec {

  test("rich-club ladder replays threshold-for-threshold") {
    val got = Graph.richClub(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    val und = Graph.coPurchaseEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (und.map(_._1) ++ und.map(_._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.length.toLong }
    val want = Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L, 128L, 256L).flatMap { t =>
      val club = deg.filter(_._2 > t).keySet
      if (club.isEmpty) None
      else {
        val n = club.size.toLong
        val e = und.count(p => club(p._1) && club(p._2)).toLong
        val phi = if (n >= 2)
          Some((BigInt(2) * e * 1000000 / (n * (n - 1))).toLong)
        else None
        Some((t, n, e, phi))
      }
    }
    assert(got.toSeq == want)
  }
}
