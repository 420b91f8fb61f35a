package graft

import org.scalatest.funsuite.AnyFunSuite

/** The self-adjudicating bench board's reference parse and suspect rule —
  * pinned after round 13 shipped them half dead: the no-space regex
  * rejected every row of the pretty-printed BENCH_REFERENCE.json, so the
  * reference map loaded EMPTY and the >3x-reference suspect flag plus the
  * escape-hatch retry never fired (the r13 driver board carried a 13.97x
  * row unflagged). These tests parse the committed artifact itself. */
class BenchBoardSpec extends AnyFunSuite {

  private def committed: String = {
    val p = java.nio.file.Paths.get("BENCH_REFERENCE.json")
    assert(java.nio.file.Files.exists(p), "committed BENCH_REFERENCE.json must exist")
    java.nio.file.Files.readString(p)
  }

  test("the committed pretty-printed reference board parses to >=300 rows") {
    val ref = Bench.parseReference(committed)
    assert(ref.size >= 300, s"parsed only ${ref.size} reference rows")
    // spot-check one known row round-trips as a number
    assert(ref.contains("q1_pricing_summary"))
    assert(ref("q1_pricing_summary") > 0.0)
  }

  test("parse is bounded to the queries object — scalar fields are not rows") {
    val ref = Bench.parseReference(committed)
    assert(!ref.contains("value"))
    assert(!ref.contains("cpus"))
  }

  test("parse tolerates both compact and pretty-printed forms") {
    val compact = """{"queries":{"q1":0.5,"q2":1.25}}"""
    val pretty = "{\n \"queries\": {\n  \"q1\": 0.5,\n  \"q2\": 1.25\n }\n}"
    assert(Bench.parseReference(compact) === Map("q1" -> 0.5, "q2" -> 1.25))
    assert(Bench.parseReference(pretty) === Map("q1" -> 0.5, "q2" -> 1.25))
    assert(Bench.parseReference("{}") === Map.empty)
  }

  test("a synthetic >3x-reference row is flagged suspect on a quiet host") {
    val ref = Map("q_slow" -> 1.0, "q_fine" -> 1.0)
    assert(Bench.isSuspect("q_slow", 3.5, load = 1.0, ref))
    assert(!Bench.isSuspect("q_fine", 2.9, load = 1.0, ref))
    // a query with no reference row is judged by load alone
    assert(!Bench.isSuspect("q_new", 100.0, load = 1.0, ref))
    assert(Bench.isSuspect("q_new", 0.1, load = Bench.SuspectLoad + 1, ref))
  }

  test("the load bar scales with the run's own Spark thread count") {
    // the r14 driver failure mode: a healthy local[32] run drives the
    // 1-minute load toward 32 and the FIXED bar of 8 branded 117/315
    // rows suspect — a run's own threads are expected load
    assert(Bench.suspectLoad(4) === 8.0)   // quiet-host floor holds
    assert(Bench.suspectLoad(8) === 12.0)
    assert(Bench.suspectLoad(32) === 48.0)
    val ref = Map.empty[String, Double]
    assert(!Bench.isSuspect("q", 1.0, load = 30.0, ref, Bench.suspectLoad(32)))
    assert(Bench.isSuspect("q", 1.0, load = 50.0, ref, Bench.suspectLoad(32)))
  }

  test("the real r13 failure mode: 13.97x the committed q189 row is suspect") {
    val ref = Bench.parseReference(committed)
    val q189 = ref.getOrElse("q189_monthly_checksums", fail("q189 row missing"))
    assert(Bench.isSuspect("q189_monthly_checksums", q189 * 13.97, load = 1.0, ref))
  }

  test("the reference applies only at its own scale factor") {
    assert(Bench.parseReferenceSf(committed).contains("/root/testdata/sf0.1"))
    assert(Bench.referenceFor(committed, "/root/testdata/sf0.1").size >= 300)
    // an sf1 linearity sweep must NOT be judged against sf0.1 rows —
    // 10x data legitimately exceeds the 3x suspect bar on most queries
    assert(Bench.referenceFor(committed, "/tmp/sf1").isEmpty)
  }
}
