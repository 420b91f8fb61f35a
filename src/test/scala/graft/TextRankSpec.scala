package graft

import org.apache.spark.sql.functions._

import graft.operators.{Graph, TextOps}

/** TextRank's two contracts, pinned separately: the co-occurrence
  * edge extraction (adjacency AFTER stopword/short-token removal, in
  * canonical pair order) and the string-keyed power iteration — a
  * BigInt hand fold replays the integer pico grid bit-for-bit, the
  * same discipline HoltSpec applies to the smoother. */
class TextRankSpec extends SparkSpec {
  import spark.implicits._

  test("cooccurrence edges: filtered adjacency, canonical order, counts") {
    val docs = Seq(
      // survivors: quick fox jumps lazy dog — 'the'/'of' drop out and
      // jumps/lazy become adjacent across the removed stopword
      "the quick fox jumps of the lazy dog",
      "fox jumps quick",
      // self-pair (fox fox) and 1-char token drop out
      "fox fox x").toDF("text")
    val got = TextOps.cooccurrenceEdges(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      ("fox", "quick", 1L), ("fox", "jumps", 2L), ("jumps", "lazy", 1L),
      ("dog", "lazy", 1L), ("jumps", "quick", 1L)))
  }

  test("string-keyed pagerank: BigInt hand fold replays the pico grid") {
    val edges = Seq(("a", "b", 2L), ("b", "c", 1L), ("a", "c", 1L))
      .toDF("pa", "pb", "w")
    val got = Graph.pageRankOnEdges(edges, iters = 3, k = 10).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))

    // hand replay with the exact integer algebra
    val sym = Seq(("a", "b", 2L), ("b", "c", 1L), ("a", "c", 1L))
      .flatMap { case (x, y, w) => Seq((x, y, w), (y, x, w)) }
    val outw = sym.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val scale = BigInt("1000000000000")
    val base = scale / 3
    val teleport = BigInt(15) * base / 100
    var rank: Map[String, BigInt] = Seq("a", "b", "c").map(_ -> base).toMap
    for (_ <- 0 until 3) {
      val inflow = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (s, _, w) => rank(s) * w / outw(s) }.sum
      }
      rank = inflow.map { case (v, in) => v -> (teleport + BigInt(85) * in / 100) }
    }
    val want = rank.toSeq
      .sortBy { case (v, r) => (-r, v) }
      .zipWithIndex
      .map { case ((v, r), i) => (i + 1, v, r.toLong) }
    assert(got.toSeq == want)
  }
}
