package graft

import java.nio.file.Files

import graft.operators.Atomic

/** The marker-committed version protocol behind index compaction:
  * readers never resolve an uncommitted write, a crash mid-publish is
  * invisible, and each publish supersedes and cleans its
  * predecessor. */
class AtomicSpec extends SparkSpec {
  import spark.implicits._

  private def writeRows(path: String, vs: Seq[Long]): Unit =
    vs.toDF("v").write.mode("overwrite").parquet(path)

  private def readRows(path: String): Set[Long] =
    spark.read.parquet(path).collect().map(_.getLong(0)).toSet

  test("resolve falls back to the legacy unversioned dir; an unmarked version dir is invisible") {
    val base = Files.createTempDirectory("atomic").toString
    writeRows(s"$base/cells", Seq(1L, 2L))
    assert(Atomic.resolve(spark, base, "cells") == s"$base/cells")
    // a crashed publish: data dir present, no commit marker
    writeRows(s"$base/cells_v0", Seq(99L))
    assert(Atomic.resolve(spark, base, "cells") == s"$base/cells")
    assert(readRows(Atomic.resolve(spark, base, "cells")) == Set(1L, 2L))
  }

  test("publish flips the resolved version atomically; grace retention keeps one predecessor") {
    val base = Files.createTempDirectory("atomic").toString
    writeRows(s"$base/cells", Seq(1L, 2L))
    writeRows(s"$base/cells_v0", Seq(99L)) // stray from a crashed publish
    Atomic.publish(spark, base, "cells")(p => writeRows(p, Seq(3L, 4L)))
    val live = Atomic.resolve(spark, base, "cells")
    assert(live == s"$base/cells_v0" || live.startsWith(s"$base/cells_v"))
    assert(readRows(live) == Set(3L, 4L))
    // grace retention: the legacy dir (the superseded generation)
    // survives THIS publish — a reader that resolved it pre-cutover
    // finishes its scan — and is cleaned by the next one
    assert(new java.io.File(s"$base/cells").exists())
    assert(readRows(s"$base/cells") == Set(1L, 2L))
    // a second publish supersedes the first, retains it, cleans legacy
    Atomic.publish(spark, base, "cells")(p => writeRows(p, Seq(5L)))
    val live2 = Atomic.resolve(spark, base, "cells")
    assert(live2 != live && readRows(live2) == Set(5L))
    assert(!new java.io.File(s"$base/cells").exists())
    assert(new java.io.File(live).exists() && readRows(live) == Set(3L, 4L))
    // a third publish finally drops the first version
    Atomic.publish(spark, base, "cells")(p => writeRows(p, Seq(6L)))
    assert(readRows(Atomic.resolve(spark, base, "cells")) == Set(6L))
    assert(!new java.io.File(live).exists())
    assert(new java.io.File(live2).exists())
  }

  test("a concurrent append aborts the publish and loses nothing") {
    val base = Files.createTempDirectory("atomic").toString
    Atomic.publish(spark, base, "cells")(p => writeRows(p, Seq(1L, 2L)))
    val live = Atomic.resolve(spark, base, "cells")
    // the compactor reads the live version while an appender lands a
    // batch into the same resolved path (the mode("append") contract)
    val ex = intercept[java.util.ConcurrentModificationException] {
      Atomic.publish(spark, base, "cells") { p =>
        writeRows(p, Seq(1L, 2L)) // staged rewrite from the snapshot
        Seq(3L).toDF("v").write.mode("append").parquet(live) // the race
      }
    }
    assert(ex.getMessage.contains("concurrent append"))
    // old version still live, appended rows included; no staged stray
    assert(Atomic.resolve(spark, base, "cells") == live)
    assert(readRows(live) == Set(1L, 2L, 3L))
    assert(!new java.io.File(s"$base/cells_v1").exists())
    // the retry (no appender this time) succeeds and sees the append
    Atomic.publish(spark, base, "cells") { p =>
      spark.read.parquet(live).write.mode("overwrite").parquet(p)
    }
    assert(readRows(Atomic.resolve(spark, base, "cells")) == Set(1L, 2L, 3L))
  }
}
