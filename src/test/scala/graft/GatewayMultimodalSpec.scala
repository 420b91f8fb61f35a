package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, SchemaInfer, SqlGateway}
import graft.streaming.{CdcPipeline, ChangeEvents, Metrics}

class GatewayMultimodalSpec extends SparkSpec {

  test("sql gateway executes reads and rejects writes by plan type") {
    SqlGateway.registerTables(spark, sf)
    assert(SqlGateway.execute(spark, "SELECT count(*) AS n FROM region").head().getLong(0) == 5L)
    // keyword-in-a-literal is read-only (the reference's keyword sniffing
    // would have misrouted this, auth_handler.go:1310-1316)
    assert(SqlGateway.execute(spark, "SELECT 'insert into x' AS s FROM region LIMIT 1").count() == 1)
    intercept[SqlGateway.WriteRejectedException] {
      SqlGateway.execute(spark, "INSERT INTO region VALUES (99, 'X')")
    }
    intercept[SqlGateway.WriteRejectedException] {
      SqlGateway.execute(spark, "DROP TABLE region")
    }
  }

  test("multimodal features match the payload bytes") {
    val row = Multimodal.mediaMeta(spark, sf).filter(col("media_id") === 0).head()
    val text = Tables(spark, sf, "documents").filter(col("doc_id") === 0)
      .select("text").head().getString(0)
    assert(row.getAs[Long]("n_bytes") == text.getBytes("UTF-8").length.toLong)
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(row.getAs[String]("checksum") == md5)
    assert(row.getAs[Int]("n_frames") == (text.getBytes("UTF-8").length + 255) / 256)
  }

  test("frame sampling yields zero frames for an empty payload") {
    import spark.implicits._
    val media = Seq((1L, "a" * 600), (2L, ""), (3L, "xyz")).toDF("media_id", "text")
    val frames = Multimodal.sampleFramesOf(media, frameSize = 256, stride = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 600 chars → frames 0,1,2 → stride keeps 0; "" → NONE (the nf=0
    // guard: unguarded, sequence(0, -1) emits a spurious [0,-1] frame);
    // "xyz" → frame 0
    assert(frames == Set((1L, 0L), (3L, 0L)))
  }

  test("schema inference flattens nested dot paths with reference type names") {
    val got = SchemaInfer.inferEventDoc(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(
      ("key", "int"), ("after", "object"), ("after.value", "float"),
      ("after.props", "object"), ("after.props.k", "int")))
  }

  test("metrics listener records progress; rollup aggregates it") {
    val metricsDir = Files.createTempDirectory("graft_metrics").toString + "/m"
    val rec = new Metrics.Recorder(spark, metricsDir)
    spark.streams.addListener(rec)
    try {
      val base = Files.createTempDirectory("graft_cdcm").toString
      val cfg = CdcPipeline.Config(
        sourceDir = base + "/src", targetDir = base + "/target",
        checkpointDir = base + "/ckpt", dlqDir = base + "/dlq")
      ChangeEvents.fromEvents(spark, sf).coalesce(1).write.mode("append").json(cfg.sourceDir)
      CdcPipeline.start(spark, cfg).awaitTermination()
      // listener events are async; wait for delivery
      spark.streams.awaitAnyTermination(1)
      Thread.sleep(2000)
      assert(rec.flush() > 0)
      val rollup = Metrics.streamStatsRollup(spark, metricsDir).collect()
      assert(rollup.nonEmpty)
      assert(rollup.map(_.getAs[Long]("rows_received")).sum > 0)
    } finally spark.streams.removeListener(rec)
  }

  test("frame dedup flags exactly the frame hashes shared across media") {
    val frames = graft.operators.Multimodal.sampleFrames(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val got = graft.operators.Multimodal.frameDedup(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val expected = frames.groupBy(_._2).collect {
      case (h, occ) if occ.map(_._1).distinct.length >= 2 =>
        h -> ((occ.map(_._1).distinct.length.toLong, occ.length.toLong, occ.map(_._1).min))
    }.toMap
    assert(got == expected)
    assert(got.nonEmpty, "fixture has shared frames")
  }

  test("scene segmentation: run-length recount over a hand-built payload") {
    import spark.implicits._
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    def md5hex(s: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    // frameSize 4 over short synthetic payloads: repeated blocks form
    // scenes, block changes form cuts — plus a sub-frame-size payload
    val media = Seq(
      (1L, "aaaaaaaabbbbaaaa"), // frames aaaa,aaaa,bbbb,aaaa
      (2L, "cccc"), // one frame: no pairs, NULL density
      (3L, "ddddddddddddeeee")) // dddd×3, eeee
      .toDF("media_id", "text")
    val got = graft.operators.Multimodal
      .sceneChangesOf(media, frameSize = 4, stride = 1, buckets = 8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val want = Seq((1L, "aaaaaaaabbbbaaaa"), (2L, "cccc"),
      (3L, "ddddddddddddeeee")).map { case (id, text) =>
      val bkts = text.grouped(4).toSeq
        .map(f => h60(md5hex(f)) % 8)
      // sliding(2) on a 1-frame list yields one size-1 window
      val cuts = 1 + bkts.sliding(2).count(p => p.size == 2 && p(0) != p(1))
      val runs = bkts.foldLeft(List.empty[(Long, Int)]) {
        case (acc, b) if acc.nonEmpty && acc.head._1 == b =>
          (b, acc.head._2 + 1) :: acc.tail
        case (acc, b) => (b, 1) :: acc
      }
      (id, bkts.length.toLong, cuts.toLong, runs.map(_._2).max.toLong,
        if (bkts.length > 1)
          Some((cuts - 1L) * 1000000L / (bkts.length - 1L))
        else None)
    }
    assert(got.toSeq == want, s"got ${got.toSeq}, want $want")
    // the repeated-block payloads must segment into > 1 scene each
    assert(got(0)._3 >= 2 && got(2)._3 >= 2)
  }
}
