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

  test("DDL replay: index diff renders CREATE INDEX and applies on a real database") {
    import graft.operators.MetaOps
    val conn = DriverManager.getConnection(url)
    try {
      def targetNames: Set[String] = {
        val rs = conn.getMetaData.getIndexInfo(null, null, "USERS", false, false)
        val b = Set.newBuilder[String]
        while (rs.next()) Option(rs.getString("INDEX_NAME")).foreach(b += _)
        b.result()
      }
      val source = Seq(
        MetaOps.IndexSpec("_id_", Seq(("ID", 1))), // implicit index: never syncs
        MetaOps.IndexSpec("IDX_NAME", Seq(("NAME", 1))),
        MetaOps.IndexSpec("IDX_SCORE_DESC", Seq(("SCORE", -1))))
      val (toCreate, skipped0) = MetaOps.indexDiff(source, targetNames)
      assert(toCreate.map(_.name) == Seq("IDX_NAME", "IDX_SCORE_DESC") && skipped0 == 0)
      val ddl = MetaOps.createIndexDdl("USERS", toCreate)
      assert(ddl == Seq(
        """CREATE INDEX "IDX_NAME" ON "USERS" ("NAME" ASC)""",
        """CREATE INDEX "IDX_SCORE_DESC" ON "USERS" ("SCORE" DESC)"""))
      val st = conn.createStatement()
      ddl.foreach(st.executeUpdate)
      assert(Set("IDX_NAME", "IDX_SCORE_DESC").subsetOf(targetNames))
      // re-diff against the applied target: idempotent, all skipped
      val (again, skipped) = MetaOps.indexDiff(source, targetNames)
      assert(again.isEmpty && skipped == 2)
    } finally conn.close()
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
