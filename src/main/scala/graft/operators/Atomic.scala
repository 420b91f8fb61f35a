package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Marker-committed directory versions — atomic snapshot cutover for
  * the persisted index stores' compaction, the file-log idea Delta's
  * transaction log and Spark's own file-sink `_spark_metadata` are
  * built on, reduced to the one operation compaction needs: REPLACE a
  * directory's contents so that every concurrent reader sees either
  * the old version or the new one, never an empty or half-written
  * directory, and a crash at ANY step leaves a readable store.
  *
  * The in-place swap it replaces (write staged → delete live → rename
  * staged) has two failure faces at 100 TB: a reader that lists the
  * live path between the delete and the rename plans against an empty
  * relation, and a process death there loses the live pointer until an
  * operator hand-recovers the staged dir. With versions the publish
  * order is (1) write `<child>_v<N+1>` fully, (2) atomically CREATE
  * the empty marker `_commit_<child>_v<N+1>` (file create is the one
  * atomic primitive every Hadoop filesystem guarantees), (3)
  * best-effort clean older versions. Readers resolve max committed N;
  * an unmarked version dir is invisible garbage by construction.
  *
  * A store founded before versioning (the bare `<child>` dir) resolves
  * as version −1, so existing indexes read unchanged and their first
  * compaction migrates them forward. */
object Atomic {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def marker(child: String, v: Long): String = s"_commit_${child}_v$v"

  private def committedVersions(spark: SparkSession, base: String,
      child: String): Seq[Long] = {
    val f = fs(spark, base)
    val p = new Path(base)
    if (!f.exists(p)) Nil
    else f.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith(s"_commit_${child}_v"))
      .flatMap(_.stripPrefix(s"_commit_${child}_v").toLongOption)
  }

  /** The current committed data path for `base/child` — the highest
    * marker-committed version, or the legacy unversioned dir. */
  def resolve(spark: SparkSession, base: String, child: String): String =
    committedVersions(spark, base, child) match {
      case Nil => s"$base/$child"
      case vs  => s"$base/${child}_v${vs.max}"
    }

  /** Publish a replacement version of `base/child`: `write` fills the
    * next version dir, the marker commit makes it live, and versions
    * OLDER than the one being superseded (plus unmarked strays) are
    * cleaned best-effort. Readers resolving concurrently see the
    * previous version until the marker lands.
    *
    * Two concurrency guarantees beyond the marker protocol:
    *
    *  - '''Append detection.''' A concurrent `mode("append")` writer
    *    targets the path `resolve` returned BEFORE this publish; its
    *    rows would land in the retiring version and silently vanish at
    *    cleanup. `publish` snapshots the live dir's file listing before
    *    `write` and re-lists after: any change aborts the publish
    *    (staged dir deleted, [[java.util.ConcurrentModificationException]]
    *    thrown) with the OLD version — appended rows included — still
    *    live. The compactor retries; the appender never loses data.
    *    The residual window (an append landing between the re-list and
    *    the marker create) is not destructive either, because of:
    *  - '''Grace retention.''' The immediately-superseded version (or
    *    the legacy unversioned dir on the founding publish) survives
    *    this publish and is cleaned on the NEXT one, so a reader that
    *    resolved it pre-cutover finishes its scan on intact files —
    *    the cutover is atomic for new resolutions and in-flight plans
    *    get a full publish cycle to drain.
    *
    * Single-compactor contract: concurrent `publish` calls on the same
    * child race the marker create (the loser fails the `require`);
    * schedule compaction from one maintenance job per store. */
  def publish(spark: SparkSession, base: String, child: String)(
      write: String => Unit): Unit = {
    val f = fs(spark, base)
    val prior = committedVersions(spark, base, child)
    val next = if (prior.isEmpty) 0L else prior.max + 1L
    // a crashed publish may have left an unmarked stray at this slot
    f.delete(new Path(s"$base/${child}_v$next"), true)
    val livePath = new Path(resolve(spark, base, child))
    def liveFiles(): Set[String] =
      if (!f.exists(livePath)) Set.empty
      else f.listStatus(livePath).toSeq.map(_.getPath.getName).toSet
    val before = liveFiles()
    write(s"$base/${child}_v$next")
    if (liveFiles() != before) {
      f.delete(new Path(s"$base/${child}_v$next"), true)
      throw new java.util.ConcurrentModificationException(
        s"$base/$child changed during publish (concurrent append?) — " +
          "aborted with the prior version still live; retry the compaction")
    }
    require(f.createNewFile(new Path(base, marker(child, next))),
      s"commit marker collision for $base/$child v$next")
    // clean: committed versions older than the one just superseded
    // (grace retention keeps prior.max until the NEXT publish), the
    // legacy dir once a committed version supersedes it, and unmarked
    // strays from crashed publishes
    val retain = prior.maxOption
    prior.filter(v => !retain.contains(v)).foreach { v =>
      f.delete(new Path(base, marker(child, v)), false)
      f.delete(new Path(s"$base/${child}_v$v"), true)
    }
    if (prior.nonEmpty) f.delete(new Path(s"$base/$child"), true)
    f.listStatus(new Path(base)).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith(s"${child}_v") && n != s"${child}_v$next" &&
        n.stripPrefix(s"${child}_v").toLongOption
          .exists(v => !f.exists(new Path(base, marker(child, v)))))
      .foreach(n => f.delete(new Path(base, n), true))
  }

  /** Delete every superseded artifact of `base/child` — committed
    * versions below the live one, their markers, and the legacy dir.
    * The grace retention [[publish]] leaves behind serves mid-scan
    * readers, but after a right-to-be-forgotten compaction it would
    * keep physically-erased rows readable on disk — and the erasure
    * contract is the stronger one, so erasure compactions purge as
    * soon as their publish lands. A reader mid-scan on the condemned
    * version fails loudly and retries against the live one; silently
    * serving forgotten bytes would not even be visible. */
  def purge(spark: SparkSession, base: String, child: String): Unit = {
    val f = fs(spark, base)
    committedVersions(spark, base, child) match {
      case Nil => ()
      case vs =>
        val live = vs.max
        vs.filter(_ != live).foreach { v =>
          f.delete(new Path(base, marker(child, v)), false)
          f.delete(new Path(s"$base/${child}_v$v"), true)
        }
        f.delete(new Path(s"$base/$child"), true)
    }
  }
}
