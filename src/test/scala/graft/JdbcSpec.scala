package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** S4/S6/W4 against a real JDBC engine (embedded Derby — in the Spark
  * distribution for the Hive metastore, repurposed here as the test
  * database). */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private def cfg(table: String) = Jdbc.JdbcConfig(url, table)

  override def beforeAll(): Unit = {
    super.beforeAll()
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE users (id BIGINT NOT NULL, name VARCHAR(64), score DOUBLE)")
      val ins = conn.prepareStatement("INSERT INTO users VALUES (?, ?, ?)")
      (1 to 100).foreach { i =>
        ins.setLong(1, i.toLong); ins.setString(2, s"user_$i"); ins.setDouble(3, i * 1.5)
        ins.addBatch()
      }
      ins.executeBatch()
      st.executeUpdate("CREATE TABLE empty_t (id BIGINT)")
    } finally conn.close()
  }

  test("snapshot reads the full table through a single cursor") {
    val df = Jdbc.snapshot(spark, cfg("users"))
    assert(df.count() == 100)
    assert(df.rdd.getNumPartitions == 1) // no partition column: one cursor
    val r = df.filter(col("ID") === 42).head()
    assert(r.getAs[String]("NAME") == "user_42" && r.getAs[Double]("SCORE") == 63.0)
  }

  test("partitioned snapshot probes bounds and splits into range cursors") {
    assert(Jdbc.bounds(spark, cfg("users"), "id").contains((1L, 100L)))
    val df = Jdbc.snapshot(spark, cfg("users").copy(partitionColumn = Some("id"), numPartitions = 4))
    assert(df.rdd.getNumPartitions == 4)
    // range partitions cover every row exactly once
    assert(df.count() == 100)
    assert(df.agg(sum("ID")).head().getLong(0) == 5050L)
  }

  test("filters and projections push into the remote query") {
    val df = Jdbc.snapshot(spark, cfg("users"))
      .filter(col("ID") > 90).select("ID", "NAME")
    assert(df.count() == 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ID"))
  }

  test("empty table yields no bounds and an empty single-cursor read") {
    assert(Jdbc.bounds(spark, cfg("empty_t"), "id").isEmpty)
    val df = Jdbc.snapshot(spark, cfg("empty_t").copy(partitionColumn = Some("id")))
    assert(df.count() == 0)
  }

  test("guardian self-heals a transiently failing JDBC read (ST12)") {
    var attempts = 0
    val sup = graft.streaming.Guardian.run(
      graft.streaming.Guardian.Backoff(baseDelayMs = 1), _ => ()) { () =>
      attempts += 1
      if (attempts == 1) throw new RuntimeException("connection reset by peer")
      assert(Jdbc.snapshot(spark, cfg("users")).count() == 100)
    }
    assert(sup.attempts == 2) // reconnect-and-retry, not fail-fast
  }

  test("batched append round-trips through the JDBC sink") {
    import spark.implicits._
    val conn = DriverManager.getConnection(url)
    try conn.createStatement()
      .executeUpdate("CREATE TABLE sink_t (k BIGINT, v VARCHAR(32))")
    finally conn.close()
    val df = (1 to 50).map(i => (i.toLong, s"v$i")).toDF("k", "v")
    Jdbc.writeAppend(df, cfg("sink_t"))
    val back = Jdbc.snapshot(spark, cfg("sink_t"))
    assert(back.count() == 50)
    assert(back.agg(sum("K")).head().getLong(0) == 1275L)
  }
}
