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

  private def dh(s: String): Long =
    graft.functions.DHash.hash(s.getBytes("UTF-8"))
  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // Textured 64-char blocks for the perceptual fixtures: a gradient
  // signature over a CONSTANT payload is all-zeros (dHash's flat-image
  // property), so fixtures must carry byte-level texture.
  private val blockA: String =
    (0 until 64).map(i => ('a' + (i * 7) % 26).toChar).mkString
  private val blockB: String = blockA.reverse
  // one-char retouch of A: +1 on a byte whose cell-sum comparisons
  // have slack, so the gradient signature moves by at most a few bits
  private val blockA2: String =
    blockA.updated(10, (blockA(10) + 1).toChar)

  test("dhash60: near-identical payloads land close, distinct ones far") {
    // kernel sanity against a by-hand fold
    val bytes = blockA.getBytes("UTF-8")
    val cells = new Array[Long](61)
    bytes.zipWithIndex.foreach { case (b, p) => cells(p * 61 / 64) += b & 0xff }
    val wantBits = (0 until 60).filter(c => cells(c + 1) > cells(c))
      .map(1L << _).sum
    assert(dh(blockA) == wantBits)
    // perceptual contract: a one-char retouch moves ≤ a few gradient
    // bits; unrelated texture sits near the ~30-bit random distance
    assert(ham(dh(blockA), dh(blockA2)) <= 4)
    assert(ham(dh(blockA), dh(blockB)) > 16)
    // the codegen'd expression computes the same kernel
    import spark.implicits._
    val got = Seq(blockA, blockA2, blockB).toDF("s")
      .select(graft.functions.DHash.dhash60(col("s"))).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(dh(blockA), dh(blockA2), dh(blockB)))
  }

  test("frame dedup groups near-identical frames by perceptual signature") {
    // corpus-level recount: expected groups recomputed locally from the
    // raw text via the kernel
    val docs = Tables(spark, sf, "documents").select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val frames = docs.flatMap { case (id, text) =>
      text.grouped(256).zipWithIndex.collect {
        case (f, i) if i % 4 == 0 => (id, dh(f))
      }
    }
    val expected = frames.groupBy(_._2).collect {
      case (h, occ) if occ.map(_._1).distinct.length >= 2 =>
        h -> ((occ.map(_._1).distinct.length.toLong, occ.length.toLong,
          occ.map(_._1).min))
    }.toMap
    val got = graft.operators.Multimodal.frameDedup(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected)
    assert(got.nonEmpty, "fixture has shared frames")
    // and the perceptual upgrade does what md5 can't: a retouched frame
    // in a second medium still groups with the original
    import spark.implicits._
    val media = Seq((1L, blockA), (2L, blockA2), (3L, blockB))
      .toDF("media_id", "text")
    val near = graft.operators.Multimodal
      .frameSignaturesOf(media, frameSize = 64, stride = 1)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    if (dh(blockA) == dh(blockA2)) // the usual case: edit inside slack
      assert(near.find(_._1 == 1L).map(_._2) == near.find(_._1 == 2L).map(_._2))
    assert(near.find(_._1 == 1L).map(_._2) != near.find(_._1 == 3L).map(_._2))
  }

  test("scene segmentation: Hamming-threshold cuts over a hand-built payload") {
    import spark.implicits._
    // frames of 64 chars: [A, A', B, B] — the retouch is in-scene
    // motion (≤ 4 bits), the texture change is a cut (> 16 bits)
    val media = Seq(
      (1L, blockA + blockA2 + blockB + blockB),
      (2L, blockA), // one frame: no pairs, NULL density
      (3L, blockB + blockB + blockA2))
      .toDF("media_id", "text")
    val got = graft.operators.Multimodal
      .sceneChangesOf(media, frameSize = 64, stride = 1, tauBits = 16)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val want = Seq(
      (1L, Seq(blockA, blockA2, blockB, blockB)),
      (2L, Seq(blockA)),
      (3L, Seq(blockB, blockB, blockA2))).map { case (id, fs) =>
      val hs = fs.map(dh)
      val cuts = 1 + hs.sliding(2).count(p =>
        p.size == 2 && ham(p(0), p(1)) > 16)
      // run lengths via the same cut positions
      val runLens = hs.indices.foldLeft(List.empty[Int]) {
        case (acc, 0) => 1 :: acc
        case (acc, i) if ham(hs(i - 1), hs(i)) > 16 => 1 :: acc
        case (h :: t, _) => (h + 1) :: t
        case (acc, _) => acc
      }
      (id, hs.length.toLong, cuts.toLong, runLens.max.toLong,
        if (hs.length > 1) Some((cuts - 1L) * 1000000L / (hs.length - 1L))
        else None)
    }
    assert(got.toSeq == want, s"got ${got.toSeq}, want $want")
    // near-identical frames stay in ONE scene, distinct ones split
    assert(want.head._3 == 2L && got(0)._3 == 2L)
    assert(got(2)._3 == 2L)
  }
}
