package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.{Command, InsertIntoStatement, LogicalPlan}

import graft.Tables

/** Ad-hoc SQL passthrough (reference POST /api/sql/execute,
  * pkg/api/router.go:49, auth_handler.go:1267-1660).
  *
  * The reference routes raw SQL to the source/target DBMS and decides
  * "is this a write?" by keyword sniffing (`auth_handler.go:1310-1316`).
  * Here the full Spark SQL front end replaces the passthrough, and
  * write detection inspects the PARSED LogicalPlan — `Command` /
  * insert nodes — instead of substring matching, so `SELECT 'delete'`
  * is correctly read-only and obfuscated writes are correctly blocked.
  */
object SqlGateway {

  final class WriteRejectedException(msg: String) extends RuntimeException(msg)

  /** Register every TESTDATA table as a temp view for the session. */
  def registerTables(spark: SparkSession, dir: String): Unit =
    Tables.all.foreach { t =>
      Tables(spark, dir, t).createOrReplaceTempView(t)
    }

  def isWrite(plan: LogicalPlan): Boolean = plan match {
    case _: Command => true
    case _: InsertIntoStatement => true
    case p => p.children.exists(isWrite)
  }

  /** Execute SQL; reject writes when readOnly (the gateway's default
    * posture for the monitoring API). */
  def execute(spark: SparkSession, sql: String, readOnly: Boolean = true): DataFrame = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    if (readOnly && isWrite(plan))
      throw new WriteRejectedException(s"write statement rejected in read-only mode")
    spark.sql(sql)
  }

  /** Oracle-checked passthrough query (regional order stats). */
  def regionRollup(spark: SparkSession, dir: String): DataFrame = {
    registerTables(spark, dir)
    execute(spark,
      """SELECT r_name,
        |  count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin)
  }
}
