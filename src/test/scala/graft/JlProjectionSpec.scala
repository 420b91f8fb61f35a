package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.Similarity

/** Driver-side replay of the JL pipeline from the tick grid up:
  * signs, projections, both rankings, and the agreement flags are
  * recomputed with plain Long/BigInt math and must match the engine
  * bit-for-bit. (The tick quantization itself is oracle-pinned by
  * q282; here it is read back from the engine so the spec pins
  * everything downstream of it.) */
class JlProjectionSpec extends SparkSpec {

  test("projection, both rankings, and agreement flags replay exactly") {
    val got = Similarity.jlProjectionTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))

    val ticks = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    val signs = Array.tabulate(16, 64)((j, d) =>
      Vectors.hyperplaneSign(j, d).toLong)
    val proj: Map[Long, Array[Long]] = ticks.map { case (id, mi) =>
      id -> Array.tabulate(16)(j =>
        (0 until 64).map(d => mi(d) * signs(j)(d)).sum)
    }
    val queryIds = ticks.keys.filter(_ < 10).toSeq.sorted
    val want = queryIds.flatMap { q =>
      val cands = ticks.keys.filter(_ != q).toSeq
      def top5(score: Long => Long): Seq[Long] =
        cands.sortBy(c => (-score(c), c)).take(5)
      val exactTop = top5(c =>
        (0 until 64).map(d => ticks(c)(d) * ticks(q)(d)).sum).toSet
      def projScore(c: Long): Long =
        (0 until 16).map(j => proj(c)(j) * proj(q)(j)).sum
      top5(projScore).zipWithIndex.map { case (c, i) =>
        (q, i + 1, c, projScore(c), exactTop.contains(c))
      }
    }
    assert(got.toSeq == want)
  }
}
