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
}
