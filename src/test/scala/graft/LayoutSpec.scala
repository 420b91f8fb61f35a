package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {

  test("Morton key: driver replay of the bit interleave") {
    val got = Layout.zOrderEvents(spark, sf).limit(200).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (u, d, z) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val expected = (0 until 16).map { i =>
        (((u >> i) & 1L) << (2 * i)) | (((d >> i) & 1L) << (2 * i + 1))
      }.sum
      assert(z == expected && r.getLong(4) == (z >> 24))
    }
  }

  test("z-ordered files bound both dimensions: point probes touch fewer files than a one-column layout") {
    val ev = graft.Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id").bitwiseAND(lit(0xFFFFL)).as("u"),
        expr("unix_micros(ts) div 86400000000").as("d"))
    val zdir = Files.createTempDirectory("graft_zorder").toString
    val tdir = Files.createTempDirectory("graft_bytime").toString
    val udir = Files.createTempDirectory("graft_byuser").toString
    Layout.writeZOrdered(ev, "u", "d", zdir)
    // the two single-column layouts a table must normally choose
    // between: time-clustered (event_id ≈ ingest order) and
    // user-clustered — each perfect on its own dimension, useless on
    // the other; z-order must beat each on the dimension it neglects
    ev.repartitionByRange(8, col("event_id")).sortWithinPartitions(col("event_id"))
      .write.mode("overwrite").parquet(tdir)
    ev.repartitionByRange(8, col("u")).sortWithinPartitions(col("u"))
      .write.mode("overwrite").parquet(udir)
    def extents(dir: String): Array[(Long, Long, Long, Long)] =
      new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min("u"), max("u"), min("d"), max("d")).head()
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    val (ze, te, ue) = (extents(zdir), extents(tdir), extents(udir))
    assert(ze.length > 1 && te.length > 1 && ue.length > 1)
    // a predicate on EITHER single dimension: count files whose
    // footer min/max cannot rule the probe value out
    val probes = ev.limit(64).collect().map(r => (r.getLong(1), r.getLong(2)))
    def touched(ext: Array[(Long, Long, Long, Long)]): (Long, Long) = (
      probes.map(p => ext.count { case (lu, hu, _, _) => lu <= p._1 && p._1 <= hu }.toLong).sum,
      probes.map(p => ext.count { case (_, _, ld, hd) => ld <= p._2 && p._2 <= hd }.toLong).sum)
    val (zu, zd) = touched(ze)
    val (tu, _) = touched(te)
    val (_, ud) = touched(ue)
    assert(zu < tu, s"user-dim pruning: z-order touched $zu vs time-layout $tu")
    assert(zd < ud, s"day-dim pruning: z-order touched $zd vs user-layout $ud")
  }

  test("co-bucketed tables join with zero exchanges and zero sorts") {
    val ev = graft.Tables(spark, sf, "events")
    val facts = ev.select(col("user_id"), col("event_id"), col("value"))
    val dims = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    try {
      Layout.writeBucketed(facts, "graft_bkt_facts", "user_id",
        Files.createTempDirectory("graft_bkt_f").toString)
      Layout.writeBucketed(dims, "graft_bkt_dims", "user_id",
        Files.createTempDirectory("graft_bkt_d").toString)
      // force the merge path: a broadcast would hide the bucket win
      // (the hint must ride a join INPUT, not the joined frame)
      def joined() = spark.table("graft_bkt_facts").hint("merge")
        .join(spark.table("graft_bkt_dims").hint("merge"), Seq("user_id"))
      val plan = joined().queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucket join shuffled:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // the sortBy half: since 3.0 Spark ignores bucket sort metadata
      // at planning unless told to pay the planning-time file listing
      // (one file per bucket required — writeBucketed guarantees it)
      val key = "spark.sql.legacy.bucketedTableScan.outputOrdering"
      spark.conf.set(key, "true")
      try {
        val sorted = joined().queryExecution.executedPlan.toString
        assert(!sorted.contains("Exchange") && !sorted.contains("+- Sort "),
          s"sorted bucket join re-sorted:\n$sorted")
      } finally spark.conf.set(key, "false")
      // and the answer is the answer
      assert(joined().count() == facts.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_dims")
    }
  }
}
