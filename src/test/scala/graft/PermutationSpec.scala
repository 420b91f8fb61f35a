package graft

import java.security.MessageDigest

import graft.operators.EventFlow

/** Driver-side replay of the permutation test: the same md5
  * assignments, floored micro rates, and add-one p-value recomputed
  * with plain Long math over the collected per-user conversions. */
class PermutationSpec extends SparkSpec {

  private def md5arm(salt: String, id: Long): Boolean = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"$salt$id".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16) % 2 == 0
  }

  test("observed diff, tail count, and p replay exactly") {
    val got = EventFlow.permutationTest(spark, sf).collect()(0)
    val users = Tables(spark, sf, "events")
      .groupBy(org.apache.spark.sql.functions.col("user_id"))
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.when(
          org.apache.spark.sql.functions.col("event_type") === "purchase", 1L)
          .otherwise(0L)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def diff(arm: Long => Boolean): Long = {
      val (a, b) = users.partition(u => arm(u._1))
      val ra = a.map(_._2).sum * 1000000L / math.max(a.length, 1)
      val rb = b.map(_._2).sum * 1000000L / math.max(b.length, 1)
      math.abs(ra - rb)
    }
    val obs = diff(id => md5arm("ab-", id))
    val tail = (1 to 200).count(b => diff(id => md5arm(s"perm-$b-", id)) >= obs)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) ==
      (users.length.toLong, 200L, obs, tail.toLong,
        (1L + tail) * 1000000L / 201L))
  }
}
