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

  /** k-ANONYMITY risk profile — the privacy audit run before a table
    * (or a training corpus's metadata sidecar) is shared: rows are
    * grouped by their quasi-identifier combination and the GROUP-SIZE
    * DISTRIBUTION is reported, with every size below `k` flagged at
    * risk (a group of 1 is a re-identification; a group of 3 narrows
    * to three people). Generalization knobs (banding a continuous
    * column) are the caller's: pass the already-coarsened columns.
    * Two aggregates — per-QI sizes (one shuffle on the QI key, which
    * grows with the table) then the histogram over the groups frame —
    * plus one windowed share; nothing row-scale leaves the first
    * aggregate. */
  def kAnonymityProfile(df: DataFrame, quasiIds: Seq[String],
      k: Int = 5): DataFrame = {
    val groups = df.groupBy(quasiIds.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("group_size"))
    groups.groupBy(col("group_size"))
      .agg(count(lit(1)).as("n_groups"))
      .select(col("group_size"), col("n_groups"),
        (col("group_size") * col("n_groups")).as("n_rows"),
        (col("group_size") < k).as("at_risk"))
      .withColumn("row_share_micro",
        expr("n_rows * 1000000 div sum(n_rows) OVER ()"))
  }

  /** KEY-SKEW profile — the shuffle-planning diagnostic read before a
    * 100 TB join or aggregation on `key`: per-key row loads summarized
    * as an exact decile ladder (the load at each rank-decile position,
    * q159's deterministic rank convention) with each rung's ratio to
    * the FAIR SHARE (load·n_keys / total, integer micro) — a p100 rung
    * at 40× mean is the number that says "salt this key" before a
    * straggler says it in production. Two aggregates: per-key loads
    * (one shuffle on the key under test — the profile costs what one
    * round of the real job costs), then windows + an 11-row decile
    * join over the keys-sized frame. */
  def keySkewProfile(df: DataFrame, key: String): DataFrame = {
    val loads = df.groupBy(col(key).as("k"))
      .agg(count(lit(1)).as("load"))
    import org.apache.spark.sql.expressions.Window
    loads
      .withColumn("rn", row_number().over(
        Window.orderBy(col("load").asc, col("k").asc)))
      .withColumn("n_keys", count(lit(1)).over(Window.partitionBy()))
      .withColumn("total", sum(col("load")).over(Window.partitionBy()))
      .select(col("load"), col("rn"), col("n_keys"), col("total"),
        explode(sequence(lit(0), lit(10))).as("decile"))
      .filter(col("rn") === expr("greatest(1, (n_keys * decile) div 10)"))
      .select(col("decile").cast("long").as("decile"), col("load"),
        col("n_keys"),
        expr("load * n_keys * 1000000 div total").as("vs_mean_micro"))
  }

  /** Referential-integrity audit between a fact table and its parent:
    * orphan children (a foreign key no parent row carries) and
    * childless parents, as counts and micro rates — the FK check a
    * sync pipeline runs after every bulk apply (a partial snapshot
    * restore shows up here before any consumer joins into nulls).
    * One aggregate per side collapsed to keys, one full-outer merge
    * on the key, one 1-row fold — child rows never cross the join
    * twice. */
  def referentialIntegrity(children: DataFrame, childKey: String,
      parents: DataFrame, parentKey: String): DataFrame = {
    val c = children.groupBy(col(childKey).as("k"))
      .agg(count(lit(1)).as("child_rows"))
    val p = parents.select(col(parentKey).as("k"), lit(true).as("is_parent"))
    c.join(p, Seq("k"), "full_outer")
      .agg(
        coalesce(sum(col("child_rows")), lit(0L)).as("n_child_rows"),
        sum(when(col("is_parent").isNull, col("child_rows")).otherwise(0L))
          .as("n_orphan_rows"),
        count(when(col("is_parent").isNotNull, lit(1))).as("n_parents"),
        count(when(col("is_parent").isNotNull && col("child_rows").isNull,
          lit(1))).as("n_childless_parents"))
      .select(col("n_child_rows"), col("n_orphan_rows"),
        col("n_parents"), col("n_childless_parents"),
        expr("n_orphan_rows * 1000000 div n_child_rows").as("orphan_micro"),
        expr("n_childless_parents * 1000000 div n_parents").as("childless_micro"))
  }

  /** [[kAnonymityProfile]] over the customer table with the standard
    * quasi-identifier set — nation, market segment, and the
    * account balance coarsened to 1000-unit bands (the generalization
    * step done in-plan so the audit is one expression away from the
    * raw column). */
  def customerKAnonymity(spark: org.apache.spark.sql.SparkSession,
      dir: String, k: Int = 5): DataFrame =
    kAnonymityProfile(
      graft.Tables(spark, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_band")),
      Seq("c_nationkey", "c_mktsegment", "bal_band"), k)

  /** l-DIVERSITY risk profile — [[kAnonymityProfile]]'s companion
    * audit: k-anonymity bounds group SIZE, but a size-50 group whose
    * SENSITIVE attribute is constant still discloses it to anyone who
    * places a person in the group (the homogeneity attack). Rows are
    * grouped by the quasi-identifiers, each group's l-value is its
    * count of distinct sensitive values, and the l-value DISTRIBUTION
    * is reported with every group below `l` flagged. Generalization
    * (banding) of the sensitive column is the caller's, as in the
    * k-profile.
    *
    * Scale: one shuffle on the QI key carrying a SINGLE distinct
    * aggregate (no Expand — multi-distinct is what inflates q99's
    * exact profiler), then a histogram over the groups-sized frame
    * and one windowed share over the l-value-bounded result. */
  def lDiversityProfile(df: DataFrame, quasiIds: Seq[String],
      sensitive: String, l: Int = 5): DataFrame = {
    val groups = df.groupBy(quasiIds.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("group_size"),
        count_distinct(col(sensitive)).as("l_value"))
    groups.groupBy(col("l_value"))
      .agg(count(lit(1)).as("n_groups"), sum(col("group_size")).as("n_rows"))
      .select(col("l_value"), col("n_groups"), col("n_rows"),
        (col("l_value") < l).as("at_risk"),
        expr("n_rows * 1000000 div sum(n_rows) OVER ()").as("row_share_micro"))
  }

  /** [[lDiversityProfile]] over the customer table: quasi-identifiers
    * (nation, market segment), sensitive attribute the 1000-unit
    * account-balance band — the "does knowing someone's nation and
    * segment pin their balance" audit that complements
    * [[customerKAnonymity]]'s group-size view of the SAME sharing
    * decision. */
  def customerLDiversity(spark: org.apache.spark.sql.SparkSession,
      dir: String, l: Int = 5): DataFrame =
    lDiversityProfile(
      graft.Tables(spark, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_band")),
      Seq("c_nationkey", "c_mktsegment"), "bal_band", l)

  /** t-CLOSENESS audit — the third face of the privacy trio beside
    * [[kAnonymityProfile]] (group size) and [[lDiversityProfile]]
    * (sensitive-value variety): a group can be large AND diverse yet
    * still leak, when its sensitive-value DISTRIBUTION sits far from
    * the table's (a nation×segment cell where 90% of balances land in
    * the top band discloses "rich" to anyone who places a person in
    * the cell, whatever l says). Per QI group: the Earth Mover's
    * Distance between the group's and the global distribution over
    * the ORDERED sensitive bands — for an ordinal attribute on a
    * dense integer spine, EMD = Σᵢ|cum_p(i) − cum_q(i)| / (m−1),
    * computed entirely in integer micro (each side's cumulative count
    * ×1e6 div its own total — no float walk to drift cross-engine).
    * Groups with emd_micro > t·1e6 are flagged.
    *
    * Scale: one shuffle on the QI key folds per-(group, band) counts;
    * the spine explode, the cumulative windows, and the broadcast of
    * the global distribution all run on the groups×bands frame —
    * QI-cardinality-bounded, never row-scale. The band spine is
    * sequence(min, max) from two scalar folds (dense by construction
    * for a banded ordinal; absent bands MUST participate in the
    * cumulative walk, which a groups×bands equi-join spine provides
    * without any cartesian shape). */
  def tClosenessProfile(df: DataFrame, quasiIds: Seq[String],
      sensitive: String, t: Double = 0.2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val qis = quasiIds.map(col).toIndexedSeq
    val mm = df.agg(min(col(sensitive)).cast("long"),
      max(col(sensitive)).cast("long")).head()
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val denom = math.max(hi - lo, 1L) // single-band table: EMD ≡ 0
    val counts = df.groupBy(qis :+ col(sensitive).cast("long").as("band"): _*)
      .agg(count(lit(1)).as("cnt"))
    // dense (group × band) spine: every group row explodes the full
    // ordinal range, then picks up its observed counts by equi-join
    val groups = counts.groupBy(qis: _*).agg(sum(col("cnt")).as("group_size"))
    val spine = groups.select(qis :+ col("group_size") :+
      explode(sequence(lit(lo), lit(hi))).as("band"): _*)
    // cumulative counts ride Decimal(38) into the ×1e6 scaling — a
    // 100 TB table's row counts put cum·1e6 past int64. The global
    // side densifies onto the same spine (an interior band with zero
    // global mass must still carry its cumulative value into the join)
    val global = df.sparkSession.range(lo, hi + 1).select(col("id").as("band"))
      .join(counts.groupBy(col("band")).agg(sum(col("cnt")).as("gcnt")),
        Seq("band"), "left")
      .na.fill(0L, Seq("gcnt"))
      .withColumn("gtotal", sum(col("gcnt")).over(Window.partitionBy()))
      .withColumn("gcum", sum(col("gcnt")).over(Window.orderBy(col("band"))))
      .select(col("band"),
        expr("CAST(gcum AS DECIMAL(38,0)) * 1000000 div gtotal")
          .as("cum_q_micro"))
    val walked = spine
      .join(counts, quasiIds :+ "band", "left")
      .na.fill(0L, Seq("cnt"))
      .withColumn("cum_p", sum(col("cnt")).over(
        Window.partitionBy(qis: _*).orderBy(col("band"))))
      .join(broadcast(global), Seq("band"))
      .select(qis :+ col("group_size") :+
        abs(expr("CAST(cum_p AS DECIMAL(38,0)) * 1000000 div group_size")
          - col("cum_q_micro")).as("step"): _*)
    walked.groupBy(qis :+ col("group_size"): _*)
      .agg(expr(s"sum(step) div $denom").as("emd_micro"))
      .withColumn("at_risk", col("emd_micro") > (t * 1000000).toLong)
  }

  /** [[tClosenessProfile]] over the customer table — same QIs and
    * banded sensitive attribute as the k-anonymity / l-diversity
    * audits, so the three reports describe one sharing decision. */
  def customerTCloseness(spark: org.apache.spark.sql.SparkSession,
      dir: String, t: Double = 0.2): DataFrame =
    tClosenessProfile(
      graft.Tables(spark, dir, "customer")
        .select(col("c_nationkey"), col("c_mktsegment"),
          floor(col("c_acctbal") / 1000).cast("long").as("bal_band")),
      Seq("c_nationkey", "c_mktsegment"), "bal_band", t)

  /** LOCAL-DP RANDOMIZED RESPONSE over the customer→nation histogram —
    * the fourth privacy face beside k-anonymity (group sizes),
    * l-diversity (sensitive variety) and t-closeness (distribution
    * distance): those three audit a RELEASED table; this one builds
    * the release mechanism itself. Each customer's nation is reported
    * truthfully with probability 3/4, otherwise replaced by a
    * deterministic pseudo-random OTHER nation (uniform over the 24
    * alternatives) — generalized randomized response, ε =
    * ln(p·(k−1)/(1−p)) = ln(72). The per-nation debiased estimate
    * inverts the mechanism in closed form: with p = 3/4 and
    * q = (1−p)/(k−1) = 1/96, n̂_v = (c_v − n·q)/(p − q)
    * = (96·c_v − n)/71 — computed on the integer grid, clamped at 0
    * (a tiny true count can debias negative; Spark `div` truncates
    * toward zero while the oracle's `//` floors, so the clamp is
    * also the cross-engine determinism guard).
    *
    * Draws ride the md5 grid (the q67 salted-sample convention):
    * keep-draw = hash("rr-" ⧺ custkey) mod 10⁶ < 750 000; the
    * replacement index j = hash("rr2-" ⧺ custkey) mod 24, skipping
    * the customer's own nation by the shift j ≥ own → j+1 (nation
    * keys are dense 0..24). Output per nation: true count, observed
    * noisy count, debiased estimate, |estimate − true| — the
    * utility-loss readout a privacy engineer reads before shipping ε.
    *
    * Scale: one customer scan, two hash evaluations per row, one
    * 25-group aggregate each for true and noisy counts joined on the
    * nation key — no per-row state, no shuffle beyond the 25-key
    * agg. */
  def randomizedResponse(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val k = 25L
    val cust = graft.Tables(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey").cast("long").as("nat"))
    val keep = pmod(graft.functions.Text.md5Hash60(
      concat_ws("-", lit("rr"), col("c_custkey"))), lit(1000000L)) <
      lit(750000L)
    val alt = pmod(graft.functions.Text.md5Hash60(
      concat_ws("-", lit("rr2"), col("c_custkey"))), lit(k - 1))
    val noisy = cust
      .select(when(keep, col("nat"))
        .otherwise(when(alt >= col("nat"), alt + 1).otherwise(alt))
        .as("nat"))
      .groupBy(col("nat")).agg(count(lit(1)).as("n_obs"))
    val truth = cust.groupBy(col("nat")).agg(count(lit(1)).as("n_true"))
    truth.join(noisy, Seq("nat"), "full")
      .select(col("nat").as("nationkey"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"))
      .withColumn("n_total", sum(col("n_true")).over(
        org.apache.spark.sql.expressions.Window.partitionBy()))
      // counts at corpus scale push 96·c past int64 only beyond
      // ~9.6e16 rows; the Decimal widening keeps the headroom anyway
      .select(col("nationkey"), col("n_true"), col("n_obs"),
        expr("CAST(greatest(96 * CAST(n_obs AS DECIMAL(38,0)) - n_total, 0)" +
          " div 71 AS BIGINT)").as("n_est"))
      .withColumn("abs_err", abs(col("n_est") - col("n_true")))
      .orderBy(col("nationkey").asc)
  }

  /** Benford first-digit expectations log₁₀(1 + 1/d), d = 1..9, as
    * shared integer micro literals (the q192 DCG-weight convention:
    * the transcendental is frozen at authoring time, so neither
    * engine computes a log at query time). */
  val BenfordMicro: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  /** BENFORD first-digit screen over order totals — the forensic DQ
    * test for fabricated or truncated money columns: naturally-grown
    * multi-scale amounts follow log₁₀(1+1/d); a synthesized or
    * range-clamped column does not, and the per-digit deviation says
    * WHICH digits carry the anomaly (a spike at 1 and 9 reads as
    * clamping, a flat profile as synthesis). Deviation is |observed −
    * expected| in integer micro per digit — a deliberately bounded
    * screen, not a significance test (the χ² machinery is q196's).
    * Digits with no observations still report (zero-filled literal
    * spine): a MISSING digit is the loudest possible deviation.
    *
    * Scale: one scan folds to ≤9 groups (map-side combined); the
    * spine join is a 9-row literal frame. */
  /** ORDER-AMOUNT RECONCILIATION — the cross-table money audit beside
    * [[referentialIntegrity]]'s key audit and the q189 checksums'
    * content audit: per order, the denormalized `o_totalprice` is
    * recomputed from its line items (floor-cents, exact integers) and
    * the relative drift lands in log-decade buckets (<0.1%, <1%,
    * <10%, <100%, ≥100%), with line-less orders as their own bucket
    * (−1: an amount with NOTHING to reconcile against). A healthy
    * denormalization concentrates in bucket 0; mass in the high
    * buckets names how wrong the rollup is, not just that it is —
    * the triage detail a boolean FK check can't give.
    *
    * Scale: one lineitem hash-agg on the order key, one equi-join to
    * orders (the same shuffle any order-grain query pays), a ≤6-row
    * rollup. drift_micro = |recomputed − stored|·10⁶ // stored — all
    * BIGINT. */
  def orderAmountReconciliation(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val lines = graft.Tables(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(floor(col("l_extendedprice") * 100).cast("long")).as("line_cents"))
    graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"),
        floor(col("o_totalprice") * 100).cast("long").as("total_cents"))
      .join(lines, col("o_orderkey") === col("l_orderkey"), "left")
      .select(when(col("line_cents").isNull, lit(-1L)).otherwise(
        expr("""CASE
                WHEN abs(line_cents - total_cents) * 1000000 div total_cents < 1000 THEN 0
                WHEN abs(line_cents - total_cents) * 1000000 div total_cents < 10000 THEN 1
                WHEN abs(line_cents - total_cents) * 1000000 div total_cents < 100000 THEN 2
                WHEN abs(line_cents - total_cents) * 1000000 div total_cents < 1000000 THEN 3
                ELSE 4 END""")).as("bucket"),
        coalesce(abs(col("line_cents") - col("total_cents")), lit(0L))
          .as("drift_cents"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"), sum(col("drift_cents")).as("drift_cents"))
  }

  def benfordDigits(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val obs = graft.Tables(spark, dir, "orders")
      .filter(col("o_totalprice") >= 1)
      .select(substring(floor(col("o_totalprice")).cast("long")
        .cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n_orders"))
    val spine = org.apache.spark.sql.functions.explode(
      array(BenfordMicro.map { case (d, m) =>
        struct(lit(d.toLong).as("digit"), lit(m).as("benford_micro"))
      }: _*)).as("b")
    obs.sparkSession.range(1).select(spine)
      .select(col("b.digit").as("digit"), col("b.benford_micro").as("benford_micro"))
      .join(obs, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("benford_micro"))
      .withColumn("obs_micro", expr(
        "n_orders * 1000000 div sum(n_orders) OVER ()"))
      .select(col("digit"), col("n_orders"), col("obs_micro"),
        col("benford_micro"),
        abs(col("obs_micro") - col("benford_micro")).as("dev_micro"))
  }

  /** DISTRIBUTION-DRIFT MONITOR: per event type, the total-variation
    * distance (micro) between the value distribution of the stream's
    * FIRST time half and its SECOND — the "has the data under my
    * model moved" gauge a training pipeline checks before trusting
    * yesterday's thresholds (and the trigger that should precede any
    * `retrainTasks` schedule tightening). Values band into
    * fixed-width buckets (⌊value/width⌋ — the privacy profiles'
    * generalization knob); TVD = Σ|p_ref − p_cur| / 2 over the
    * buckets, in exact integer micro rates — χ²'s cross-product
    * numerator would outgrow Decimal(38) near 10¹²-count cells, TVD
    * never leaves [0, 10⁶]. The split point is the midpoint of the
    * observed time range: derived from the data (no clock), so both
    * engines and every re-run cut identically.
    *
    * Scale: one min/max scan (2-number driver fold), one
    * (type, bucket, half) count aggregate — map-side combined, state
    * bounded by types × buckets — and a types-sized TVD fold. */
  def valueDrift(spark: org.apache.spark.sql.SparkSession, dir: String,
      bucketWidth: Double = 5.0): DataFrame = {
    val ev = graft.Tables(spark, dir, "events")
    // 2-scalar driver fold (the pmiCollocations convention): the
    // midpoint that defines "before" vs "after", in epoch MICROS —
    // unix_micros ≙ the oracle's epoch_us, exact integers (epoch()
    // is DOUBLE in the oracle dialect and would re-open the float
    // rounding question this engine spent ten rounds closing)
    val mm = ev.agg(min(unix_micros(col("ts"))).as("lo"),
      max(unix_micros(col("ts"))).as("hi")).head()
    // an empty source has no midpoint and no drift — return the empty
    // profile (the oracle's GROUP BY agrees), not an NPE the watchdog
    // would page as "drift_audit_failed: null" every tick
    if (mm.isNullAt(0))
      return ev.select(col("event_type"), lit(0L).as("n_ref"),
        lit(0L).as("n_cur"), lit(0L).as("tvd_micro")).limit(0)
    val mid = (mm.getLong(0) + mm.getLong(1)) / 2
    val counts = ev.select(col("event_type"),
        floor(col("value") / lit(bucketWidth)).cast("long").as("bucket"),
        when(unix_micros(col("ts")) < mid, 1L).otherwise(0L).as("is_ref"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(sum(col("is_ref")).as("n_ref"),
        sum(lit(1L) - col("is_ref")).as("n_cur"))
    counts
      .withColumn("t_ref", sum(col("n_ref"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))))
      .withColumn("t_cur", sum(col("n_cur"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))))
      // a type absent from one half diverges totally; the greatest()
      // guard keeps the degenerate-window rate at 0 instead of erroring
      .select(col("event_type"), col("n_ref"), col("n_cur"),
        col("t_ref"), col("t_cur"),
        (expr("CAST(n_ref AS DECIMAL(38,0)) * 1000000 div greatest(t_ref, 1)") -
          expr("CAST(n_cur AS DECIMAL(38,0)) * 1000000 div greatest(t_cur, 1)"))
          .as("d"))
      .groupBy(col("event_type"))
      .agg(max(col("t_ref")).as("n_ref"), max(col("t_cur")).as("n_cur"),
        expr("CAST(sum(abs(d)) div 2 AS BIGINT)").as("tvd_micro"))
  }
}
