package graft

import java.nio.file.Files

import graft.operators.Graph

/** Persisted epoch-gauge store contract: the store-backed series
  * equals the full q298 recompute, maintenance appends ONLY missing
  * closed epochs (zero on an unchanged axis), the open epoch is never
  * persisted, and a crash-torn append self-heals on the next run —
  * the GraphStoreSpec discipline on the evolution pillar. */
class EpochGaugeSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
      if (r.isNullAt(7)) None else Some(r.getLong(7)))).toSeq

  test("store-backed series equals the full recompute; appends are incremental") {
    val storeDir = Files.createTempDirectory("graft_epoch_gauges").toString
    val want = rows(Graph.communityEvolutionSeries(spark, sf, epochs = 4))
    graft.operators.PlanCache.release()
    assert(want.size == 4)
    // founding maintenance persists the 3 closed epochs
    assert(Graph.appendEpochGauges(spark, sf, storeDir, epochs = 4) == 3L)
    val gauges = spark.read
      .parquet(graft.operators.Atomic.resolve(spark, storeDir, "gauges"))
    assert(gauges.count() == 3, "only CLOSED epochs are persisted")
    assert(!gauges.select("epoch").collect().map(_.getLong(0)).contains(3L),
      "the open epoch must never be persisted")
    // steady state: an unchanged axis appends nothing
    assert(Graph.appendEpochGauges(spark, sf, storeDir, epochs = 4) == 0L)
    // the read face: closed epochs off disk + one live open-epoch LPA
    val got = rows(Graph.evolutionSeriesFromStore(spark, sf, storeDir))
    graft.operators.PlanCache.release()
    assert(got == want, "store-backed series must equal the full q298 run")
  }

  test("a crash-torn append self-heals: missing closed epochs recompute on read AND on the next append") {
    val storeDir = Files.createTempDirectory("graft_epoch_crash").toString
    val want = rows(Graph.communityEvolutionSeries(spark, sf, epochs = 4))
    graft.operators.PlanCache.release()
    Graph.appendEpochGauges(spark, sf, storeDir, epochs = 4)
    // simulate a crash that lost epoch 1's gauge row: rewrite the
    // gauges table without it
    val gp = graft.operators.Atomic.resolve(spark, storeDir, "gauges")
    val kept = spark.read.parquet(gp)
      .filter(org.apache.spark.sql.functions.col("epoch") =!= 1L)
      .collect()
    val schema = spark.read.parquet(gp).schema
    spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          java.util.Arrays.asList(kept: _*)), schema)
      .coalesce(1).write.mode("overwrite").parquet(gp)
    // the read face fills the hole live, result unchanged
    val got = rows(Graph.evolutionSeriesFromStore(spark, sf, storeDir))
    graft.operators.PlanCache.release()
    assert(got == want)
    // the next maintenance run re-persists exactly the hole
    assert(Graph.appendEpochGauges(spark, sf, storeDir, epochs = 4) == 1L)
    assert(spark.read.parquet(gp).count() == 3)
  }

  test("engine graphHealthTasks with a storeDir read the store and still bound drift") {
    val storeDir = Files.createTempDirectory("graft_epoch_engine").toString
    val spec = graft.model.GraphHealthSpec(id = 9, sourceDir = sf,
      maxDriftMicro = 0L, storeDir = storeDir)
    // maxDriftMicro 0 pages on EVERY modularity drop — the fixture
    // has at least one epoch-over-epoch decline at every SF, and the
    // store-backed path must report the same epochs the full path does
    val storeBacked = graft.engine.GraftEngine.runGraphEvolution(spark, spec)
    val full = graft.engine.GraftEngine.runGraphEvolution(spark,
      spec.copy(storeDir = ""))
    assert(storeBacked == full)
    assert(spark.read
      .parquet(graft.operators.Atomic.resolve(spark, storeDir, "gauges"))
      .count() == 3, "the engine audit founded the store as a side effect")
  }
}
