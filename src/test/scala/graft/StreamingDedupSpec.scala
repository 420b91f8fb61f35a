package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.StreamingDedup

class StreamingDedupSpec extends SparkSpec {

  test("merge-walk twin matches the expression kernel semantics") {
    assert(StreamingDedup.intersectCard(Seq(1L, 3L, 5L), Seq(3L, 4L, 5L)) == 2)
    assert(StreamingDedup.intersectCard(Seq.empty, Seq(1L)) == 0)
    assert(StreamingDedup.intersectCard(Seq(1L, 2L), Seq(1L, 2L)) == 2)
    assert(StreamingDedup.jaccard(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)) == 0.5)
  }

  test("batch-mode state path reproduces the batch dedup pair set exactly") {
    // same banding expressions + same verify semantics ⇒ running the
    // stateful path over the corpus as ONE batch must equal minhashPairs
    val viaState = StreamingDedup.pairStream(
        StreamingDedup.bandedDocs(Tables(spark, sf, "documents").select("doc_id", "text")),
        threshold = 0.8)
      .dropDuplicates("doc_a", "doc_b")
      .collect().map(p => (p.doc_a, p.doc_b, p.jaccard)).toSet
    val viaBatch = graft.operators.Dedup.minhashPairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    graft.operators.PlanCache.release()
    assert(viaState == viaBatch)
    assert(viaBatch.nonEmpty)
  }

  test("online dedup is incremental across restarts: new docs pair against checkpointed state") {
    val dir = Files.createTempDirectory("sdedup-src").toString
    val out = Files.createTempDirectory("sdedup-out").toString
    val ckpt = Files.createTempDirectory("sdedup-ckpt").toString
    def doc(id: Long, text: String) = s"""{"doc_id":$id,"text":"$text"}"""
    val a = (1 to 30).map(i => s"w$i").mkString(" ") // 30 tokens
    val b = (1 to 30).map(i => s"x$i").mkString(" ") // disjoint from a
    // batch 1: 1≈2 (identical), 3 unrelated
    Files.write(Paths.get(dir, "b1.json"),
      Seq(doc(1, a), doc(2, a), doc(3, b)).mkString("\n").getBytes)
    val q1 = StreamingDedup.start(spark, dir, out, ckpt)
    q1.awaitTermination()
    val first = StreamingDedup.currentPairs(spark, out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first == Set((1L, 2L)))
    // batch 2: 4 duplicates 3, 5 duplicates 1/2. The restarted query
    // recovers bucket state from the checkpoint, so cross pairs against
    // batch-1 docs emit WITHOUT reprocessing b1.json, and (1,2) is not
    // re-paired (it appears once in the log, from run 1).
    Files.write(Paths.get(dir, "b2.json"),
      Seq(doc(4, b), doc(5, a)).mkString("\n").getBytes)
    val q2 = StreamingDedup.start(spark, dir, out, ckpt)
    q2.awaitTermination()
    val second = StreamingDedup.currentPairs(spark, out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(second == Set((1L, 2L), (3L, 4L), (1L, 5L), (2L, 5L)))
    // exact duplicates verify at jaccard 1.0
    assert(StreamingDedup.currentPairs(spark, out)
      .filter(col("jaccard") =!= 1.0).count() == 0)
  }
  test("horizon mode: idle buckets evict, cross-horizon docs do not pair, in-horizon pairs unaffected") {
    val dir = Files.createTempDirectory("sdedup-ttl-src").toString
    val out = Files.createTempDirectory("sdedup-ttl-out").toString
    val ckpt = Files.createTempDirectory("sdedup-ttl-ckpt").toString
    def doc(id: Long, text: String, ts: String) =
      s"""{"doc_id":$id,"text":"$text","ts":"$ts"}"""
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    val b = (1 to 30).map(i => s"x$i").mkString(" ")
    val horizon = Some(10L * 60 * 1000) // 10 minutes
    def run(file: String, lines: Seq[String]): Unit = {
      Files.write(Paths.get(dir, file), lines.mkString("\n").getBytes)
      StreamingDedup.start(spark, dir, out, ckpt, horizonMs = horizon).awaitTermination()
    }
    def pairs(): Set[(Long, Long)] = StreamingDedup.currentPairs(spark, out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // two near-dups 5 minutes apart: inside the horizon, they pair
    run("b1.json", Seq(doc(1, a, "2026-01-01 10:00:00"), doc(2, a, "2026-01-01 10:05:00")))
    assert(pairs() == Set((1L, 2L)))
    // an unrelated doc two hours later pushes the watermark past the
    // (1,2) bucket's horizon — no new pairs
    run("b2.json", Seq(doc(9, b, "2026-01-01 12:00:00")))
    assert(pairs() == Set((1L, 2L)))
    // a duplicate of doc 1 arrives past the horizon: the aged bucket
    // was evicted/pruned, so NO pair forms against docs 1 or 2
    run("b3.json", Seq(doc(3, a, "2026-01-01 12:00:01")))
    assert(pairs() == Set((1L, 2L)))
    // but a duplicate of the recent doc 9, within the horizon, pairs —
    // eviction did not damage live state
    run("b4.json", Seq(doc(4, b, "2026-01-01 12:00:30")))
    assert(pairs() == Set((1L, 2L), (4L, 9L)))
  }

}
