package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality rules compiled to ONE aggregate pass —
  * the config-driven generalization of [[Relational.dqReport]]'s
  * fixed rule set. Every rule kind reduces to a violation count
  * (pass ⇔ 0), so a heterogeneous rule list shares one scan, one
  * 1-row aggregate, and one unpivot; adding a rule adds a column to
  * the aggregate, never a pass over the data. The engine's `dqTasks`
  * family schedules these and alerts per failed rule.
  */
object DataQuality {

  sealed trait Rule { def name: String; def column: String }
  /** Null values in `column`. */
  final case class NotNull(name: String, column: String) extends Rule
  /** Rows beyond the first per distinct `column` value. */
  final case class Unique(name: String, column: String) extends Rule
  /** Values below `bound`. */
  final case class MinValue(name: String, column: String, bound: Double) extends Rule
  /** Values above `bound`. */
  final case class MaxValue(name: String, column: String, bound: Double) extends Rule
  /** Values outside the allowed set (nulls are NotNull's business). */
  final case class InSet(name: String, column: String, allowed: Seq[String]) extends Rule

  private def violationCount(r: Rule): Column = (r match {
    case NotNull(_, c)     => count(lit(1)) - count(col(c))
    case Unique(_, c)      => count(lit(1)) - count_distinct(col(c))
    case MinValue(_, c, b) => count(when(col(c) < b, lit(1)))
    case MaxValue(_, c, b) => count(when(col(c) > b, lit(1)))
    case InSet(_, c, vs)   => count(when(col(c).isNotNull && !col(c).isin(vs: _*), lit(1)))
  }).as(r.name)

  /** One row per rule: (rule, column, n_rows, violations, passed). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "empty rule list")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    val one = df.agg(count(lit(1)).as("n_rows"), rules.map(violationCount): _*)
    val byName = rules.map(r => r.name -> r.column).toMap
    one.select(col("n_rows"), explode(array(rules.map(r =>
        struct(lit(r.name).as("rule"), lit(byName(r.name)).as("column"),
          col(r.name).as("violations"))).toIndexedSeq: _*)).as("v"))
      .select(col("v.rule").as("rule"), col("v.column").as("column"), col("n_rows"),
        col("v.violations").as("violations"),
        (col("v.violations") === 0L).as("passed"))
  }
}
