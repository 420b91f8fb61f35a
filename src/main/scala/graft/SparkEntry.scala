package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is an operator from SURVEY.md §2 (or a
  * training-data-pipeline extension), and every SQL-expressible one has
  * a DuckDB oracle in [[oracleSql]] with matching column names.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.sourceTargetDiff(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (Relational.pricingSummary _),
    "q2_revenue_by_nation" -> (Relational.revenueByNation _),
    "q3_top_orders" -> (Relational.topOrders _),
    "q4_trend_daily" -> (Relational.trendDaily _),
    "q5_source_target_diff" -> (Relational.sourceTargetDiff _),
    "q7_anti_join" -> (Relational.partsNotShipped1996 _),
    "q8_distinct_users" -> (Relational.distinctUsers _),
    "q9_recent_errors" -> (Relational.recentErrors _),
    "q10_union_merged" -> (Relational.mergedYearExport _),
    "q12_json_extract" -> (Relational.jsonKBuckets _),
    "q13_daily_sync_stats" -> (Relational.dailySyncStats _),
    "q11_masked_projection" -> (Pii.maskedProjection _),
    "q14_encrypt_roundtrip" -> (Pii.encryptRoundtrip _),
    "q17_nested_mask" -> (Pii.nestedMask _),
    "q15_conditional_count" -> (Windows.conditionalCount _),
    "q16_export_window" -> (Windows.exportWindowSlice _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q2_revenue_by_nation" ->
      """SELECT n_name,
        |  round(sum(o_totalprice), 2) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC
        |LIMIT 100""".stripMargin,
    "q4_trend_daily" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type,
        |    count(*) AS n, round(sum(value), 2) AS sum_value
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT day, event_type, n, sum_value,
        |  n - lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS delta
        |FROM daily""".stripMargin,
    "q5_source_target_diff" ->
      """WITH src AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS src_count
        |  FROM events GROUP BY 1
        |), tgt AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS tgt_count
        |  FROM events WHERE event_type <> 'error' GROUP BY 1
        |)
        |SELECT coalesce(src.day, tgt.day) AS day,
        |  coalesce(src_count, 0) AS src_count,
        |  coalesce(tgt_count, 0) AS tgt_count,
        |  coalesce(src_count, 0) - coalesce(tgt_count, 0) AS diff
        |FROM src FULL OUTER JOIN tgt ON src.day = tgt.day""".stripMargin,
    "q7_anti_join" ->
      """SELECT p_partkey, p_name, p_brand
        |FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND year(l_shipdate) = 1996)""".stripMargin,
    "q8_distinct_users" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_users,
        |  count(*) AS n_events
        |FROM events GROUP BY event_type""".stripMargin,
    "q9_recent_errors" ->
      """SELECT event_id, ts, user_id, value
        |FROM events WHERE event_type = 'error'
        |ORDER BY ts DESC, event_id DESC
        |LIMIT 500""".stripMargin,
    "q10_union_merged" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_quantity > 25.0 AND year(l_shipdate) = 1996
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
        |FROM lineitem
        |WHERE l_quantity > 25.0 AND year(l_shipdate) = 1997""".stripMargin,
    "q12_json_extract" ->
      """SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS BIGINT) / 10) AS BIGINT) AS k_bucket,
        |  count(*) AS n
        |FROM events GROUP BY 1""".stripMargin,
    "q13_daily_sync_stats" ->
      """SELECT o_orderstatus,
        |  round(max(o_totalprice) - min(o_totalprice), 2) AS spread,
        |  round(max(o_totalprice), 2) AS max_price,
        |  max(o_orderdate) AS last_at,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "q11_masked_projection" ->
      """SELECT c_custkey,
        |  repeat('*', length(c_name)) AS name_masked,
        |  '****' AS acctbal_masked
        |FROM customer""".stripMargin,
    "q14_encrypt_roundtrip" ->
      "SELECT c_custkey, c_name AS name_rt FROM customer",
    "q17_nested_mask" ->
      """SELECT c_custkey,
        |  repeat('*', length(c_name)) AS name_masked,
        |  repeat('*', length(c_mktsegment)) AS seg_masked,
        |  c_acctbal AS bal
        |FROM customer""".stripMargin,
    "q15_conditional_count" ->
      """SELECT 'events' AS table_name, count(*) AS cnt
        |FROM events
        |WHERE value > 50 AND event_type = 'purchase'
        |  AND ts >= TIMESTAMP '2024-01-13 15:00:00'
        |  AND ts <= TIMESTAMP '2024-01-15 15:00:00'""".stripMargin,
    "q16_export_window" ->
      """SELECT event_id, ts, user_id, event_type
        |FROM events
        |WHERE ts >= TIMESTAMP '2024-01-16 15:00:00'
        |  AND ts <  TIMESTAMP '2024-01-19 15:00:00'""".stripMargin,
  )
}
