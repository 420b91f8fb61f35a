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

  test("jl+ivf composition: structure holds and recall vs exact clears the floor") {
    val got = Similarity.jlIvfTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // structure: 10 queries × 5 ranked rows, ranks dense 1..5
    assert(got.map(_._1).distinct.length == 10)
    assert(got.length == 50)
    assert(got.groupBy(_._1).values.forall(_.map(_._4).sorted.toSeq == (1 to 5)))
    // recall floor vs the EXACT tick-dot top-5 (the same baseline the
    // q282 readout ranks against): measured 29/50 at this fixture with
    // the defaults — the floor at 25/50 catches a broken composition
    // (random cells ≈ 1/100) without pinning the measured value
    val ticks = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray)
      .toMap
    val exactTop = ticks.keys.filter(_ < 10).map { q =>
      q -> ticks.keys.filter(_ != q).toSeq
        .sortBy(c => (-(0 until 64).map(d => ticks(c)(d) * ticks(q)(d)).sum, c))
        .take(5).toSet
    }.toMap
    val hits = got.count { case (q, c, _, _) => exactTop(q).contains(c) }
    assert(hits * 2 >= got.length, s"recall ${hits}/${got.length} below the 0.5 floor")
    // the exact rerank really is exact: each returned sim_ticks equals
    // the driver-side tick dot
    got.foreach { case (q, c, s, _) =>
      val want = (0 until 64).map(d => ticks(c)(d) * ticks(q)(d)).sum
      assert(s == want, s"sim_ticks mismatch for ($q,$c)")
    }
  }
}
