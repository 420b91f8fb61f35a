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

  test("publish flips the resolved version atomically and cleans predecessors and strays") {
    val base = Files.createTempDirectory("atomic").toString
    writeRows(s"$base/cells", Seq(1L, 2L))
    writeRows(s"$base/cells_v0", Seq(99L)) // stray from a crashed publish
    Atomic.publish(spark, base, "cells")(p => writeRows(p, Seq(3L, 4L)))
    val live = Atomic.resolve(spark, base, "cells")
    assert(live == s"$base/cells_v0" || live.startsWith(s"$base/cells_v"))
    assert(readRows(live) == Set(3L, 4L))
    // legacy dir and the unmarked stray are gone
    assert(!new java.io.File(s"$base/cells").exists())
    // a second publish supersedes the first and removes it
    Atomic.publish(spark, base, "cells")(p => writeRows(p, Seq(5L)))
    val live2 = Atomic.resolve(spark, base, "cells")
    assert(live2 != live && readRows(live2) == Set(5L))
    assert(!new java.io.File(live).exists())
  }
}
