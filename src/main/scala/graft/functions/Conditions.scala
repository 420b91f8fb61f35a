package graft.functions

import java.time.LocalDateTime

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.model.CountCondition

/** Condition compiler (P6): the reference's JSON count-query conditions
  * → Catalyst `Column` predicates (reference
  * pkg/utils/query_counter.go:59-280).
  *
  * Semantics preserved:
  *  - operators `=`, `>`, `>=`, `<`, `<=`, `!=`/`<>`
  *  - numeric coercion: a value string is tried as long, then double,
  *    then kept as string (query_counter.go:185-244). Spark's binary
  *    comparison coercion then matches the reference's typed compare.
  *  - `dateRange` windows in JST with INCLUSIVE end (count semantics,
  *    query_counter.go:108-111).
  *  - per-table routing: a condition whose `table` differs from the
  *    queried table is skipped (query_counter.go:88-91).
  */
object Conditions {

  /** Reference numeric coercion: long, else double, else raw string. */
  def coerce(v: String): Any =
    v.toLongOption.getOrElse(v.toDoubleOption.getOrElse(v))

  def compileOne(c: CountCondition, anchorUtc: LocalDateTime): Column = {
    val field = col(c.field)
    c.operator match {
      case "dateRange" =>
        val range = c.dateRange.getOrElse(c.value)
        TimeWindows.countPredicate(field, TimeWindows.dateRangeWindow(range, anchorUtc))
      case op =>
        val l = lit(coerce(c.value))
        op match {
          case "="          => field === l
          case ">"          => field > l
          case ">="         => field >= l
          case "<"          => field < l
          case "<="         => field <= l
          case "!=" | "<>"  => field =!= l
          case other => throw new IllegalArgumentException(s"unknown operator: $other")
        }
    }
  }

  /** AND of all conditions routed to `table`; `lit(true)` when none
    * apply (the reference falls back to a full count,
    * query_counter.go:62-73). */
  def compile(conds: Seq[CountCondition], table: String, anchorUtc: LocalDateTime): Column =
    conds.filter(_.table == table) match {
      case Nil  => lit(true)
      case some => some.map(compileOne(_, anchorUtc)).reduce(_ && _)
    }
}
