package graft.analytics

import graft.Ckpt.CutOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Distributed statistics operators (SURVEY.md §2.2) — closed-form
  * regression, distribution comparison, dependence measures, and a
  * mergeable count-min sketch. Every shape reduces the fact table to
  * a compact sufficient-statistic aggregate in ONE partial-agg pass
  * (map-side combinable), then finishes on the tiny aggregate; none
  * of them re-scan or sort raw rows, so each survives a 100× scale-up
  * unchanged.
  */
object Stats {

  /** §2.2 `q_linreg` — per-event-type OLS of value on the day index,
    * closed form from the five sufficient statistics (n, Σx, Σy, Σxy,
    * Σx², Σy²) collected in one partial-aggregated pass. x is centered
    * on day 20000 (~2014) so the normal-equation cross terms stay far
    * inside double's exact-integer range — the naive epoch-day sums
    * put n·Σx² near 2^55 where engine-dependent summation order would
    * flip rounded digits.
    */
  def qLinreg(spark: SparkSession, dir: String): DataFrame = {
    val x = (datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) - 20000)
      .cast("double")
    val n = col("n").cast("double")
    val varX = n * col("sxx") - col("sx") * col("sx")
    val covXY = n * col("sxy") - col("sx") * col("sy")
    val varY = n * col("syy") - col("sy") * col("sy")
    Tables.events(spark, dir)
      .select(col("event_type"), x.as("x"), col("value").as("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .select(col("event_type"),
        col("n").as("n_events"),
        // a degenerate group (single point, or zero x/y variance) has
        // no defined fit: emit null rather than an Inf/NaN that would
        // poison downstream consumers
        round(when(varX > 0, covXY / varX), 4).as("slope"),
        round(when(varX > 0,
          (col("sy") - (covXY / varX) * col("sx")) / n), 4).as("intercept"),
        round(when(varX > 0 && varY > 0,
          (covXY * covXY) / (varX * varY)), 4).as("r2"))
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_ks_test` — two-sample Kolmogorov–Smirnov distance of
    * each event type's value distribution against all other types.
    * The scan collapses to per-(type, value) cells first (values are
    * cent-quantized in this corpus; a continuous column would be
    * quantized here the same way), the cell set is densified over the
    * bounded type dimension, and both empirical CDFs are one window
    * cumsum over the compact cells — the raw fact rows are never
    * sorted. D is a max of exact integer-ratio differences, so the
    * result is bit-deterministic.
    */
  def qKsTest(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy(col("event_type"), col("value")).agg(count(lit(1)).as("c"))
      .cutLineage(eager = false) // lazy: blocks die with the RDD, no session-lifetime cache pin
    val types = cells.select(col("event_type")).distinct()
    val values = cells.groupBy(col("value")).agg(sum(col("c")).as("c_all"))
    // dense (type × value) grid: |types| is bounded, so this explode
    // is a constant-factor blowup of the compact cell set, not of the
    // fact table
    val grid = values.crossJoin(broadcast(types))
      .join(cells, Seq("event_type", "value"), "left")
      .na.fill(0L, Seq("c"))
    val wCdf = Window.partitionBy(col("event_type")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = grid
      .withColumn("cum_t", sum(col("c")).over(wCdf))
      .withColumn("cum_all", sum(col("c_all")).over(wCdf))
    val totals = cum.groupBy(col("event_type"))
      .agg(max(col("cum_t")).as("n_t"), max(col("cum_all")).as("n"))
    cum.join(broadcast(totals), Seq("event_type"))
      // a type that IS the whole corpus has an empty "rest" sample —
      // no KS distance is defined for it
      .filter(col("n_t") < col("n"))
      .select(col("event_type"), col("n_t"),
        abs(col("cum_t").cast("double") / col("n_t") -
          (col("cum_all") - col("cum_t")).cast("double") /
            (col("n") - col("n_t"))).as("d"))
      .groupBy(col("event_type"))
      .agg(max(col("n_t")).as("n_events"), round(max(col("d")), 4).as("ks_d"))
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_mutual_info` — mutual information (bits) between event
    * type and day-of-week, reported as each type's contribution
    * p(x)·KL(p(dow|x) ‖ p(dow)) — non-negative by Gibbs' inequality,
    * summing to I(type; dow). Same shape as `q_chi_square`: ONE pass
    * builds the ≤|types|×7 contingency table, marginals are window
    * sums over those few rows.
    */
  def qMutualInfo(spark: SparkSession, dir: String): DataFrame = {
    val dow = ((datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) + 3) % 7)
      .cast("long")
    val obs = Tables.events(spark, dir)
      .select(col("event_type"), dow.as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o"))
    obs
      .withColumn("row_n", sum(col("o")).over(Window.partitionBy(col("event_type"))))
      .withColumn("col_n", sum(col("o")).over(Window.partitionBy(col("dow"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
      .withColumn("contrib",
        (col("o").cast("double") / col("n")) *
          log2(col("o").cast("double") * col("n") /
            (col("row_n").cast("double") * col("col_n"))))
      .groupBy(col("event_type"))
      .agg(sum(col("o")).as("n_events"), round(sum(col("contrib")), 4).as("mi_bits"))
      .orderBy(col("event_type"))
  }

  // CMS geometry: d=4 pairwise-independent-ish integer hash rows of
  // w=256 counters. The (a·k + b) mod p mod w family is chosen over a
  // digest because it is pure 64-bit integer arithmetic, so the exact
  // same counters are reproducible in any engine (the oracle mirrors
  // it verbatim).
  private val CmsP = 2147483647L
  private val CmsW = 256
  private val CmsA = Seq(1103L, 12289L, 331L, 8191L)
  private val CmsB = Seq(12345L, 67L, 999331L, 271L)

  private def cmsBucket(d: Int, key: org.apache.spark.sql.Column) =
    ((key * CmsA(d) + CmsB(d)) % CmsP) % CmsW

  /** §2.2 `q_dataset_drift` — PSI (population stability index) drift
    * monitor: the event stream is split at its midpoint day, values
    * are binned to fixed width-50 buckets, and each event type's
    * before/after distributions are compared with
    * Σ (p−q)·ln(p/q) over bins present in both halves (exact — no
    * epsilon smoothing; a bin present in only one half is reported in
    * the dropped-bin count instead of distorting the sum). The fact
    * table collapses to (type, half, bin) cells in one pass; PSI > .2
    * is the conventional "retrain" alarm for a feature pipeline.
    */
  def qDatasetDrift(spark: SparkSession, dir: String): DataFrame = {
    val dayIdx = datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
    val bounds = Tables.events(spark, dir)
      .agg(min(dayIdx).as("d0"), max(dayIdx).as("d1"))
      .select(expr("(d0 + d1 + 1) div 2").as("mid"))
    val cells = Tables.events(spark, dir)
      .crossJoin(broadcast(bounds))
      .select(col("event_type"),
        when(dayIdx < col("mid"), lit("a")).otherwise(lit("b")).as("half"),
        floor(col("value") / 50).cast("long").as("bin"))
      .groupBy(col("event_type"), col("half"), col("bin"))
      .agg(count(lit(1)).as("c"))
    val tot = cells.groupBy(col("event_type"), col("half"))
      .agg(sum(col("c")).as("n"))
    val wide = cells.join(tot, Seq("event_type", "half"))
      .withColumn("p", col("c").cast("double") / col("n"))
      .groupBy(col("event_type"), col("bin"))
      .agg(max(when(col("half") === "a", col("p"))).as("pa"),
        max(when(col("half") === "a", col("n"))).as("na"),
        max(when(col("half") === "b", col("p"))).as("pb"),
        max(when(col("half") === "b", col("n"))).as("nb"))
    wide.groupBy(col("event_type"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        sum(when(col("pa").isNotNull && col("pb").isNotNull,
          (col("pa") - col("pb")) * log(col("pa") / col("pb")))
          .otherwise(0.0)).as("psi_raw"),
        sum(when(col("pa").isNull || col("pb").isNull, 1L).otherwise(0L))
          .as("n_dropped_bins"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(col("psi_raw"), 4).as("psi"), col("n_dropped_bins"))
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_ttest_ab` — Welch two-sample t on event values between
    * the even-user (A) and odd-user (B) cohorts, per event type: one
    * sufficient-statistics pass (n, Σy, Σy² per cohort), t =
    * (m_a−m_b)/√(s²_a/n_a + s²_b/n_b) assembled on the bounded
    * aggregate. The experiment-analysis shape: no row ever leaves the
    * map side unaggregated.
    */
  def qTtestAb(spark: SparkSession, dir: String): DataFrame = {
    val g = when(col("user_id") % 2 === 0, lit("a")).otherwise(lit("b"))
    val cohorts = Tables.events(spark, dir)
      .select(col("event_type"), g.as("grp"), col("value").as("y"))
      .groupBy(col("event_type"), col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"))
      .withColumn("m", col("sy") / col("n"))
      // unbiased variance from the raw moments
      .withColumn("v",
        (col("syy") - col("sy") * col("sy") / col("n")) / (col("n") - 1))
    cohorts.groupBy(col("event_type"))
      .agg(max(when(col("grp") === "a", col("n"))).as("n_a"),
        max(when(col("grp") === "b", col("n"))).as("n_b"),
        max(when(col("grp") === "a", col("m"))).as("m_a"),
        max(when(col("grp") === "b", col("m"))).as("m_b"),
        max(when(col("grp") === "a", col("v"))).as("v_a"),
        max(when(col("grp") === "b", col("v"))).as("v_b"))
      // Welch needs both cohorts, each with a defined variance
      .filter(col("n_a").isNotNull && col("n_b").isNotNull &&
        col("n_a") > 1 && col("n_b") > 1)
      .select(col("event_type"), col("n_a"), col("n_b"),
        round(col("m_a"), 4).as("mean_a"), round(col("m_b"), 4).as("mean_b"),
        round((col("m_a") - col("m_b")) /
          sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b")), 4).as("t"))
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_ab_cuped` — CUPED variance reduction for an A/B readout
    * (Deng et al.'s controlled-experiment standard): each user's
    * pre-period covariate x (days 1–15 value sum) adjusts their
    * post-period metric y (days 16+), y* = y − θ(x − x̄) with
    * θ = cov(x,y)/var(x) pooled over all users. Everything reduces to
    * ONE user-level shuffle producing exact sufficient sums (integer
    * cents; the second-order sums accumulate in decimal(38,0) so
    * cents² products never overflow), then θ, the
    * per-variant adjusted means, and the achieved variance-reduction
    * percentage assemble in closed form on a bounded aggregate.
    * The experimentation-platform shape at 10⁸ users: no second pass,
    * no per-user state after the sums.
    */
  def qAbCuped(spark: SparkSession, dir: String): DataFrame = {
    val vC = Money.cents(col("value"))
    val users = Tables.events(spark, dir)
      .select(col("user_id"),
        when(dayofmonth(col("ts")) <= 15, vC).otherwise(0L).as("x1"),
        when(dayofmonth(col("ts")) > 15, vC).otherwise(0L).as("y1"))
      .groupBy(col("user_id"))
      .agg(sum(col("x1")).as("x_c"), sum(col("y1")).as("y_c"))
    // second-order sums accumulate as decimal(38,0): cents-squared
    // products are ~10¹⁰ each, so a Long Σ overflows around 10⁹ users
    // — decimals stay exact (and match DuckDB's HUGEINT sums) at any
    // scale, and every consumer below reads them through a double cast
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(18,0)")
    val tot = users.agg(count(lit(1)).as("n"),
      sum(col("x_c")).as("sx"), sum(col("y_c")).as("sy"),
      sum(dec(col("x_c")) * dec(col("y_c"))).as("sxy"),
      sum(dec(col("x_c")) * dec(col("x_c"))).as("sxx"))
      .select(
        // zero pooled covariate variance (degenerate corpus) → no
        // adjustment, not a 0/0
        when(col("sxx").cast("double") - col("sx").cast("double") * col("sx") / col("n") === 0.0,
          lit(0.0))
          .otherwise(
            (col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double") / col("n")) /
            (col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double") / col("n")))
          .as("theta"),
        (col("sx").cast("double") / col("n")).as("mx"))
    val g = users.groupBy((col("user_id") % 2).cast("long").as("variant"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("x_c")).as("gx"), sum(col("y_c")).as("gy"),
        sum(dec(col("x_c")) * dec(col("x_c"))).as("gxx"),
        sum(dec(col("x_c")) * dec(col("y_c"))).as("gxy"),
        sum(dec(col("y_c")) * dec(col("y_c"))).as("gyy"))
    g.crossJoin(broadcast(tot))
      .select(col("variant"), col("n_users"),
        // exact-cents chains mirrored op-for-op in the oracle →
        // emitted unrounded (tie-attractor rule)
        (col("gy").cast("double") / col("n_users") / 100.0).as("mean_post"),
        ((col("gy").cast("double") - col("theta") *
          (col("gx").cast("double") - col("n_users") * col("mx"))) /
          col("n_users") / 100.0).as("mean_cuped"),
        // zero post-metric variance in a variant → nothing to reduce
        when(col("gyy").cast("double") -
            col("gy").cast("double") * col("gy") / col("n_users") === 0.0, lit(0.0))
          .otherwise(round(lit(100.0) * (lit(1.0) -
            (col("gyy").cast("double") - lit(2.0) * col("theta") * col("gxy") +
              col("theta") * col("theta") * col("gxx") -
              (col("gy").cast("double") - col("theta") * col("gx")) *
              (col("gy").cast("double") - col("theta") * col("gx")) / col("n_users")) /
            (col("gyy").cast("double") -
              col("gy").cast("double") * col("gy") / col("n_users"))), 4))
          .as("var_reduction_pct"))
      .orderBy(col("variant"))
  }

  /** §2.2 `q_did` — difference-in-differences: the quasi-experimental
    * twin of [[qAbCuped]]. Event values split by cohort (even/odd
    * user) × period (days 1–15 / 16+); the DiD estimate is
    * (treat_post − treat_pre) − (ctrl_post − ctrl_pre), removing any
    * shared time trend from the treatment readout. Four exact-cents
    * cell sums in ONE partial-agg pass — the whole query is a single
    * scan to one row regardless of scale.
    */
  def qDid(spark: SparkSession, dir: String): DataFrame = {
    val vC = Money.cents(col("value"))
    val treat = col("user_id") % 2 === 0
    val post = dayofmonth(col("ts")) > 15
    def cellMean(t: Boolean, p: Boolean): org.apache.spark.sql.Column = {
      val in = (if (t) treat else !treat) && (if (p) post else !post)
      sum(when(in, vC).otherwise(0L)).cast("double") /
        sum(when(in, 1L).otherwise(0L)) / 100.0
    }
    Tables.events(spark, dir)
      .agg(
        round(cellMean(t = true, p = false), 4).as("treat_pre"),
        round(cellMean(t = true, p = true), 4).as("treat_post"),
        round(cellMean(t = false, p = false), 4).as("ctrl_pre"),
        round(cellMean(t = false, p = true), 4).as("ctrl_post"),
        round((cellMean(t = true, p = true) - cellMean(t = true, p = false)) -
          (cellMean(t = false, p = true) - cellMean(t = false, p = false)), 4)
          .as("did"))
  }

  /** §2.2 `q_power_analysis` — experiment sizing from observed
    * moments: per event type, the per-arm sample size that gives 80%
    * power to detect a 5% lift of the mean at two-sided α = 0.05,
    * n = 2σ²(z₀.₉₇₅+z₀.₈)²/δ². Variance comes from the same exact
    * integer (cents) sufficient sums as the t-test, so both engines
    * assemble identical doubles; the z constants are literals. One
    * partial-agg pass, |types| output rows — the planning query run
    * before every experiment launch.
    */
  def qPowerAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val vC = Money.cents(col("value"))
    val za = 1.959963984540054 // z_{0.975}
    val zb = 0.8416212335729143 // z_{0.80}
    Tables.events(spark, dir)
      .select(col("event_type"), vC.as("v_c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_obs"), sum(col("v_c")).as("sv"),
        sum(col("v_c") * col("v_c")).as("svv"))
      .withColumn("mean_c", col("sv").cast("double") / col("n_obs"))
      .withColumn("var_c",
        (col("svv").cast("double") - col("sv").cast("double") * col("sv") / col("n_obs")) /
          (col("n_obs") - 1))
      .withColumn("delta_c", lit(0.05) * col("mean_c"))
      .select(col("event_type"), col("n_obs"),
        round(col("mean_c") / 100.0, 4).as("mean_value"),
        round(sqrt(col("var_c")) / 100.0, 4).as("sd_value"),
        ceil(lit(2.0) * col("var_c") * lit((za + zb) * (za + zb)) /
          (col("delta_c") * col("delta_c"))).cast("long").as("n_per_arm"))
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_gini` — Gini coefficient of per-user event-count
    * concentration via the rank formula G = 2·Σ(r·x)/(n·Σx) −
    * (n+1)/n, computed WITHOUT ranking users: a tied run of t users
    * at count x occupying ranks c+1..c+t contributes
    * x·(t·c + t(t+1)/2) regardless of within-tie order, so Σ(r·x)
    * folds to a closed form over the compact (count → t) cells. The
    * fact table collapses once; the only window is the cumulative
    * count over the distinct-activity cells — a bounded statistic
    * axis (max events per user), not the 10⁸-user dimension.
    * Integer sums stay exact while n·x_max·n < 2⁶³ (~10⁹ users at
    * 10³ events each); past that the sums move to decimals.
    */
  def qGini(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
      .groupBy(col("x")).agg(count(lit(1)).as("t"))
    val wCells = Window.orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    cells.withColumn("c", coalesce(sum(col("t")).over(wCells), lit(0L)))
      .agg(sum(col("t")).as("n_users"),
        sum(col("x") * col("t")).as("total_events"),
        sum(expr("x * (t * c + (t * (t + 1)) div 2)")).as("srx"))
      .select(col("n_users"), col("total_events"),
        round(lit(2.0) * col("srx") /
          (col("n_users") * col("total_events")) -
          (col("n_users") + 1).cast("double") / col("n_users"), 4).as("gini"))
  }

  /** §2.2 `q_survival_curve` — time-to-event survival analysis
    * (Nelson–Aalen): the event is each user's FIRST 'error', measured
    * in days from their first activity; users who never error are
    * right-censored at their last observed day. At each event time t:
    * n_risk = users still under observation at t, d = events at t,
    * cumulative hazard H(t) = Σ d/n_risk and survival exp(−H) —
    * chosen over the Kaplan–Meier product because it has no zero-term
    * edge case and is identical sufficient-statistics work. The fact
    * table collapses to per-user bounds in one pass, then to a
    * ≤|days| series; both windows run over that compact series.
    */
  def qSurvivalCurve(spark: SparkSession, dir: String): DataFrame = {
    val dayIdx = datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
    val obs = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(dayIdx).as("d0"), max(dayIdx).as("d1"),
        min(when(col("event_type") === "error", dayIdx)).as("e0"))
      .select(
        coalesce(col("e0") - col("d0"), col("d1") - col("d0"))
          .cast("long").as("t"),
        col("e0").isNotNull.cast("long").as("churned"))
    val byT = obs.groupBy(col("t"))
      .agg(count(lit(1)).as("n_at"), sum(col("churned")).as("d"))
    val wRisk = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wHaz = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT.withColumn("n_risk", sum(col("n_at")).over(wRisk))
      .filter(col("d") > 0)
      .withColumn("h", sum(col("d").cast("double") / col("n_risk")).over(wHaz))
      .select(col("t").as("t_days"), col("n_risk"), col("d").as("n_churn"),
        round(col("h"), 4).as("cum_hazard"),
        round(exp(-col("h")), 4).as("survival"))
      .orderBy(col("t_days"))
  }

  /** §2.2 `q_ucb_arms` — UCB1 bandit scores per event-type arm:
    * mean reward + √(2·ln N / n) exploration bonus, assembled from
    * one partial-agg pass and a broadcast total. The shape that turns
    * a 100 TB interaction log into an arm-selection policy nightly.
    */
  def qUcbArms(spark: SparkSession, dir: String): DataFrame = {
    val total = Tables.events(spark, dir).agg(count(lit(1)).as("big_n"))
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"))
      .crossJoin(broadcast(total))
      .select(col("event_type"), col("n"),
        round(col("sv") / col("n"), 4).as("mean_reward"),
        round(col("sv") / col("n") +
          sqrt(lit(2.0) * log(col("big_n").cast("double")) / col("n")), 4)
          .as("ucb1"))
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_seasonal_decompose` — classical additive decomposition
    * of the per-type daily value series: trend = 7-day centered
    * moving average (edges without a full window dropped), seasonal =
    * day-of-week mean of the detrended series, residual = what's
    * left. Reported per (type, dow): the seasonal component and the
    * mean absolute residual — the decomposition every capacity
    * planner runs before trusting a forecast. All windows run over
    * the ≤|days| compact series, never raw events.
    */
  /** §2.2 `q_holt_forecast` — Holt's linear-trend exponential
    * smoothing over the per-type daily count series, α = β = ½, with
    * the 7-day-ahead forecast. The recursion (level/trend fold along
    * the day axis) has no window-function form, so it runs as a
    * per-group fold over the COMPACT series — facts shrink to
    * |types|×|days| rows in one partial-agg pass first, and each
    * bounded series folds inside its task (`mapGroups`; ≤|days|
    * elements, never raw events). α = β = ½ keeps every update a
    * dyadic blend, and the oracle's recursive CTE replays the exact
    * IEEE operation order, so level/trend/forecast are bit-equal.
    * At 10⁸ keys the shape is unchanged: one shuffle of per-key
    * series cells, one bounded fold per key.
    */
  def qHoltForecast(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val day = datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long")
    Tables.events(spark, dir)
      .groupBy(col("event_type"), day.as("day"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("day"), col("n"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .mapGroups { (tpe, it) =>
        val ys = it.toArray.sortBy(_._2).map(_._3.toDouble)
        var l = ys(0)
        var b = if (ys.length > 1) ys(1) - ys(0) else 0.0
        var i = 1
        while (i < ys.length) {
          val lPrev = l
          l = 0.5 * ys(i) + 0.5 * (l + b)
          b = 0.5 * (l - lPrev) + 0.5 * b
          i += 1
        }
        (tpe, ys.length.toLong, l, b, l + 7.0 * b)
      }
      .toDF("event_type", "n_days", "level", "trend", "forecast_7d")
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_forecast_backtest` — rolling-origin backtest of the Holt
    * model ([[qHoltForecast]]): the same single fold along each type's
    * day axis also yields every prefix state, so the last 7 one-step
    * forecasts (state at day i predicting day i+1) cost nothing extra
    * — the standard time-series cross-validation, evaluated without
    * refitting. Emits the per-step (actual, forecast, |error|) rows —
    * bounded at 7×|types| — rather than a float aggregate, so no
    * accumulation-order noise can cross engines; the oracle reads the
    * identical prefix states out of its recursive CTE.
    */
  def qForecastBacktest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val day = datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long")
    Tables.events(spark, dir)
      .groupBy(col("event_type"), day.as("day"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("day"), col("n"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (tpe, it) =>
        val ys = it.toArray.sortBy(_._2).map(_._3.toDouble)
        val n = ys.length
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Double, Double)]
        var l = ys(0)
        var b = if (n > 1) ys(1) - ys(0) else 0.0
        // engine-identical rounding: Spark's round() is BigDecimal
        // HALF_UP over the shortest decimal repr — replicate it here
        def r6(x: Double): Double =
          java.math.BigDecimal.valueOf(x)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue
        // state after 1-based prefix i forecasts day i+1; keep the
        // last 7 origins
        def emit(i: Int): Unit =
          if (i >= n - 7 && i <= n - 1)
            out += ((tpe, i.toLong, ys(i).toLong,
              r6(l + b), r6(math.abs(ys(i) - (l + b)))))
        emit(1)
        var i = 1
        while (i < n) {
          val lPrev = l
          l = 0.5 * ys(i) + 0.5 * (l + b)
          b = 0.5 * (l - lPrev) + 0.5 * b
          i += 1
          emit(i)
        }
        out.iterator
      }
      .toDF("event_type", "step", "actual", "forecast", "abs_err")
      .orderBy(col("event_type"), col("step"))
  }

  def qSeasonalDecompose(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day"))
      .agg(sum(col("value")).as("v"))
    val wMa = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-3, 3)
    val detrended = daily
      .withColumn("n_win", count(lit(1)).over(wMa))
      .withColumn("trend", avg(col("v")).over(wMa))
      .filter(col("n_win") === 7)
      .withColumn("dt", col("v") - col("trend"))
      .withColumn("dow", (col("day") + 3) % 7)
    detrended
      .withColumn("seasonal_raw", avg(col("dt")).over(
        Window.partitionBy(col("event_type"), col("dow"))))
      .withColumn("resid", col("dt") - col("seasonal_raw"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("n_days"),
        round(max(col("seasonal_raw")), 4).as("seasonal"),
        round(avg(abs(col("resid"))), 4).as("mad_resid"))
      .orderBy(col("event_type"), col("dow"))
  }

  /** §2.2 `q_weighted_sample` — deterministic weighted sampling
    * without replacement (Efraimidis–Spirakis): each document draws a
    * hash-derived uniform u and is ranked by −ln(u)/w (equivalent to
    * max u^(1/w)), top 30 kept. Inclusion probability is proportional
    * to weight (n_chars), the draw is reproducible across runs and
    * engines (the uniform comes from md5, not an RNG), and the
    * selection is a TakeOrdered over a narrow map pass — the shape
    * for sampling a training mixture from a 100 TB corpus without a
    * global shuffle.
    */
  def qWeightedSample(spark: SparkSession, dir: String): DataFrame = {
    val u = ((conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
      .cast("long") % 1000000).cast("double") + lit(0.5)) / lit(1000000.0)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        round(-log(u) / col("n_chars"), 10).as("priority"))
      .orderBy(col("priority"), col("doc_id"))
      .limit(30)
  }

  /** §2.2 `q_equidepth_hist` — exact equi-depth (decile) histogram of
    * event values: the scan collapses to per-distinct-value cells,
    * the cumulative count over those cells assigns each distinct
    * value wholly to the decile its last row falls in (integer
    * arithmetic, bit-deterministic), and per-bucket bounds/counts
    * fall out of one bounded aggregation. This is how an optimizer's
    * column statistics are built: never a global sort of raw rows,
    * only of the compact cell set.
    */
  def qEquidepthHist(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(spark, dir)
      .groupBy(col("value")).agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = Tables.events(spark, dir).agg(count(lit(1)).as("n"))
    cells.withColumn("cum", sum(col("c")).over(wCum))
      .crossJoin(broadcast(n))
      // ceil(cum·10/n) in pure integer math: (cum·10 + n − 1) div n
      .withColumn("bucket", expr("(cum * 10 + n - 1) div n"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_distinct"), sum(col("c")).as("n_rows"),
        min(col("value")).as("lo"), max(col("value")).as("hi"))
      .orderBy(col("bucket"))
  }

  /** §2.2 `q_cms_estimate` — count-min sketch over user ids: the
    * whole fact table folds into a d×w=1024-cell counter table in one
    * map-side-combinable aggregation (the sketch is a monoid — per-
    * partition sketches merge by cell-wise +), then the 20 heaviest
    * users' estimates are min-over-depth lookups against the
    * broadcast counters. cms_n ≥ exact_n always; equality whenever no
    * bucket collision. This is the 100 TB heavy-hitter shape: the
    * shuffle carries 1024 rows no matter the input size.
    */
  def qCmsEstimate(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"))
    val hashes = array((0 until CmsA.length).map(d =>
      struct(lit(d).as("depth"), cmsBucket(d, col("user_id")).as("bucket"))): _*)
    val counters = ev.select(explode(hashes).as("h"))
      .select(col("h.depth").as("depth"), col("h.bucket").as("bucket"))
      .groupBy(col("depth"), col("bucket")).agg(count(lit(1)).as("c"))
    val top = ev.groupBy(col("user_id")).agg(count(lit(1)).as("exact_n"))
      .orderBy(col("exact_n").desc, col("user_id")).limit(20)
    top.select(col("user_id"), col("exact_n"), explode(hashes).as("h"))
      .select(col("user_id"), col("exact_n"),
        col("h.depth").as("depth"), col("h.bucket").as("bucket"))
      .join(broadcast(counters), Seq("depth", "bucket"))
      .groupBy(col("user_id"), col("exact_n"))
      .agg(min(col("c")).as("cms_n"))
      .orderBy(col("exact_n").desc, col("user_id"))
  }

  /** §2.2 `q_bootstrap_ci` — Poisson-bootstrap 95% CI for the mean
    * event value per type: the scale-correct bootstrap — resampling
    * weights are per-(row, replicate) Poisson(1) draws from a
    * deterministic md5 uniform, so all B=40 replicates ride ONE pass
    * over the facts (a narrow 40× replicate fan-out into a
    * partial-agg groupBy on (type, b)), never a shuffle per resample.
    * The CI is the exact 2.5/97.5 percentile of the 40 replicate
    * means — a |types|×40-row window input. This is how bootstrap CIs
    * are computed on data too large to materialize resamples.
    */
  def qBootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    // two md5 draws per ROW seed a per-row congruential walk across
    // the B replicates (u_b = (h0 + b·stride) mod 10⁶): each (row, b)
    // weight stays marginally Poisson(1)-from-uniform, but the hot
    // loop hashes 2× per row instead of B× — at B=40 that removed
    // ~80% of this query's wall time, and the replicate fan-out is
    // plain integer codegen
    val h0 = conv(substring(md5(concat(col("event_id").cast("string"),
      lit(":a"))), 1, 15), 16, 10).cast("long") % 1000000L
    val st = conv(substring(md5(concat(col("event_id").cast("string"),
      lit(":b"))), 1, 15), 16, 10).cast("long") % 999983L + 1L
    val u = (((col("h0") + col("b") * col("st")) % 1000000L).cast("double")
      + lit(0.5)) / lit(1000000.0)
    // Poisson(1) inverse CDF: cumulative e⁻¹·Σ 1/k! thresholds
    val wPois = when(col("u") < 0.36787944117144233, 0L)
      .when(col("u") < 0.73575888234288467, 1L)
      .when(col("u") < 0.9196986029286058, 2L)
      .when(col("u") < 0.98101184312384624, 3L)
      .when(col("u") < 0.99634015317265634, 4L)
      .otherwise(5L)
    val means = Tables.events(spark, dir)
      .select(col("event_type"), col("value"), h0.as("h0"), st.as("st"))
      .select(col("event_type"), col("value"), col("h0"), col("st"),
        explode(expr("sequence(1, 40)")).as("b"))
      .withColumn("u", u)
      .withColumn("w", wPois)
      .groupBy(col("event_type"), col("b"))
      .agg(sum(col("w") * col("value")).as("swv"), sum(col("w")).as("sw"))
      .select(col("event_type"), (col("swv") / col("sw")).as("mean_b"))
    val ci = means.groupBy(col("event_type"))
      .agg(round(expr("percentile(mean_b, 0.025)"), 4).as("ci_lo"),
        round(expr("percentile(mean_b, 0.975)"), 4).as("ci_hi"))
    val pt = Tables.events(spark, dir).groupBy(col("event_type"))
      // exact cents / n, unrounded — the money-mean tie-attractor class
      .agg((sum(graft.analytics.Money.cents(col("value"))).cast("double") /
        count(lit(1)) / 100.0).as("mean_value"))
    pt.join(ci, Seq("event_type")).orderBy(col("event_type"))
  }

  /** §2.2#275 — daily-volume trend per event type: OLS slope of the
    * daily count series against the day index. The fact scan reduces
    * map-side to (type, day) counts; the day index is re-based to
    * each type's first day (broadcast join on the bounded type axis)
    * so the sufficient sums Σx, Σxy, Σx² stay small exact longs —
    * good to ~10⁹ events/day over multi-year windows before the
    * cross-term would near the long range. ONE double division at
    * the end, identical IEEE ops in both engines. Degenerate
    * single-day series yield a null slope rather than a fake 0.
    */
  def qTrendSlope(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y"))
    val base = daily.groupBy(col("event_type")).agg(min(col("day")).as("d0"))
    daily.join(broadcast(base), Seq("event_type"))
      .select(col("event_type"), datediff(col("day"), col("d0")).cast("long").as("x"),
        col("y"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("event_type"), col("n_days"),
        ((col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double") /
          nullif((col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double"),
            lit(0.0)))
          .as("slope_per_day"),
        (col("sy").cast("double") / col("n_days")).as("mean_daily"))
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_mann_whitney` — Mann–Whitney U between the even-user (a)
    * and odd-user (b) cohorts per event type: the nonparametric twin
    * of [[qTtestAb]], robust to the heavy-tailed value distributions
    * an experiment readout actually sees. Identical scale shape to
    * [[qKsTest]]: one partial-agg pass collapses the fact table to
    * compact (type, value) cells with per-cohort counts, one window
    * cumsum over those cells yields, for each cell, how many b-values
    * lie strictly below — so 2·U_a = Σ_cells c_a·(2·below_b + ties_b)
    * is an EXACT integer (ties contribute the conventional ½ each,
    * pre-doubled), accumulated in decimal(38,0) so 10⁹×10⁹ pair
    * counts cannot wrap. The normal-approximation z assembles from
    * the exact integers with identical IEEE ops in both engines.
    * Raw rows are never sorted or paired — the U statistic's O(n²)
    * pair count is computed, never materialized.
    */
  def qMannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val isA = col("user_id") % 2 === 0
    val cells = Tables.events(spark, dir)
      .select(col("event_type"), isA.as("in_a"), col("value"))
      .groupBy(col("event_type"), col("value"))
      .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("in_a"), 1L).otherwise(0L)).as("cb"))
    val wCum = Window.partitionBy(col("event_type")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.withColumn("cum_cb", sum(col("cb")).over(wCum))
      .groupBy(col("event_type"))
      .agg(sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum((col("ca") * (lit(2L) * (col("cum_cb") - col("cb")) + col("cb")))
          .cast("decimal(38,0)")).cast("long").as("u2_a"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col("event_type"), col("n_a"), col("n_b"), col("u2_a"),
        ((col("u2_a").cast("double") / 2.0 -
          col("n_a").cast("double") * col("n_b") / 2.0) /
          sqrt(col("n_a").cast("double") * col("n_b") *
            (col("n_a") + col("n_b") + 1) / 12.0)).as("z"))
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_theil_sen` — Theil–Sen robust trend of daily revenue per
    * event type: the (lower-)median of all pairwise slopes, the
    * estimator with a 29% breakdown point where [[qTrendSlope]]'s OLS
    * breaks on one whale day. Pairwise slopes run over the bounded
    * |types|×|calendar-days|² frame (metadata scale, like
    * [[qKendallTau]]); each slope is ONE float division of exact
    * integers (cents difference / day difference), and the median is
    * an ORDER STATISTIC — row_number under a fully-deterministic
    * (slope, day-pair) order, no float summation anywhere — so the
    * result is bit-identical across engines and partitionings.
    */
  def qTheilSen(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(Money.cents(col("value"))).as("s"))
      .cutLineage(eager = false)
    val slopes = daily.as("x").join(daily.as("y"),
      col("x.event_type") === col("y.event_type") && col("x.day") < col("y.day"))
      .select(col("x.event_type").as("event_type"),
        ((col("y.s") - col("x.s")).cast("double") /
          datediff(col("y.day"), col("x.day"))).as("slope"),
        col("x.day").as("dx"), col("y.day").as("dy"))
    val wOrd = Window.partitionBy(col("event_type"))
      .orderBy(col("slope"), col("dx"), col("dy"))
    slopes
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n_pairs", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("rn") === expr("(n_pairs + 1) div 2"))
      .select(col("event_type"), col("n_pairs"),
        col("slope").as("slope_med_per_day"))
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_spearman` — Spearman rank correlation between daily
    * revenue and daily volume per event type: does money move with
    * traffic, monotonically, outlier-free? Both variables rank over
    * the bounded |types|×|days| daily frame with textbook
    * average-rank ties kept EXACT as doubled ranks (2·avg-rank =
    * 2·rank_min + ties − 1, an integer), then ρ is the Pearson
    * closed form over exact integer sufficient sums accumulated in
    * decimal(38,0) — identical IEEE assembly in both engines, the
    * [[graft.graph.GraphOps.graphAssortativity]] contract.
    */
  def qSpearman(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(Money.cents(col("value"))).as("u"), count(lit(1)).as("v"))
    def ranked2(c: String, out: String) = {
      val wRank = Window.partitionBy(col("event_type")).orderBy(col(c))
      val wTies = Window.partitionBy(col("event_type"), col(c))
      (df: DataFrame) => df
        .withColumn(out,
          lit(2L) * rank().over(wRank) + count(lit(1)).over(wTies) - 1)
    }
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    ranked2("v", "rv")(ranked2("u", "ru")(daily))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(dec(col("ru"))).as("sx"), sum(dec(col("rv"))).as("sy"),
        sum(dec(col("ru")) * col("rv")).as("sxy"),
        sum(dec(col("ru")) * col("ru")).as("sxx"),
        sum(dec(col("rv")) * col("rv")).as("syy"))
      .filter(col("n_days") > 1)
      .select(col("event_type"), col("n_days"),
        ((col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double") /
          nullif(sqrt((col("n_days") * col("sxx") - col("sx") * col("sx"))
              .cast("double") *
            (col("n_days") * col("syy") - col("sy") * col("sy")).cast("double")),
            lit(0.0))).as("rho"))
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_kendall_tau` — Kendall's τ-a between the day index and
    * the daily revenue total per event type: the rank-based trend
    * detector that backs [[qTrendSlope]]'s OLS with an
    * outlier-immune verdict (one whale day cannot flip it). Daily
    * totals are exact integer cents from ONE partial-agg pass; the
    * pairwise concordance scan then runs over the bounded
    * |types|×|calendar-days| frame — O(days²) per type over metadata,
    * invariant to fact-table scale. Concordant/discordant/tie counts
    * are exact integers; τ = 2(C−D)/(n(n−1)) is the one final float
    * division.
    */
  def qKendallTau(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(Money.cents(col("value"))).as("s"))
      .cutLineage(eager = false) // read once into the pairwise join's two sides
    val pairs = daily.as("x").join(daily.as("y"),
      col("x.event_type") === col("y.event_type") && col("x.day") < col("y.day"))
    val counts = pairs.groupBy(col("x.event_type").as("event_type"))
      .agg(sum(when(col("x.s") < col("y.s"), 1L).otherwise(0L)).as("concordant"),
        sum(when(col("x.s") > col("y.s"), 1L).otherwise(0L)).as("discordant"),
        sum(when(col("x.s") === col("y.s"), 1L).otherwise(0L)).as("ties"))
    val nDays = daily.groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
    nDays.join(counts, Seq("event_type"))
      .filter(col("n_days") > 1)
      .select(col("event_type"), col("n_days"), col("concordant"),
        col("discordant"), col("ties"),
        ((lit(2.0) * (col("concordant") - col("discordant"))) /
          (col("n_days") * (col("n_days") - 1))).as("tau"))
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_anova` — one-way ANOVA F over event values between the
    * event-type groups: does the type explain the value variance?
    * The experiment-analysis sibling of [[qTtestAb]] for k > 2 arms.
    *
    * One partial-aggregated pass reduces the fact table to k rows of
    * EXACT sufficient statistics (n, Σcents as long, Σcents² in
    * decimal(38,0) so the squares never wrap), then SSB/SSW/F
    * assemble in closed form on the bounded k-row aggregate. The one
    * order-sensitive float reduction — Σ_g S_g²/n_g — is quantized
    * per group to an exact integer (round to 1 cent², the
    * text_char_entropy convention; each per-group double is itself a
    * bit-exact mirrored chain) so the cross-group sum is exact and
    * order-free, and every float output is engine-bit-exact, emitted
    * unrounded. At 10¹² rows the plan is unchanged: the shuffles
    * carry k sufficient-statistic rows, never data.
    */
  def qAnova(spark: SparkSession, dir: String): DataFrame = {
    val c = Money.cents(col("value"))
    val g = Tables.events(spark, dir)
      .select(col("event_type"), c.as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        sum(col("c").cast("decimal(38,0)") * col("c")).as("ss"))
      // s_g²/n_g quantized to an exact long: the fold over groups must
      // not depend on aggregation arrival order (long, not decimal —
      // Spark's double→decimal goes through the shortest decimal repr,
      // which is not the binary value above 2^53; double→long is exact)
      .withColumn("tq",
        round(col("s").cast("double") * col("s") / col("n")).cast("long"))
    g.agg(count(lit(1)).as("n_groups"), sum(col("n")).as("n_total"),
        sum(col("s")).as("s_tot"), sum(col("ss")).as("ss_tot"),
        sum(col("tq")).as("t_exact"))
      .filter(col("n_groups") > 1 && col("n_total") > col("n_groups"))
      .withColumn("t", col("t_exact").cast("double"))
      .withColumn("ss_between",
        col("t") - col("s_tot").cast("double") * col("s_tot") / col("n_total"))
      .withColumn("ss_within", col("ss_tot").cast("double") - col("t"))
      .select(col("n_groups"), col("n_total").as("n"),
        col("ss_between"), col("ss_within"),
        ((col("ss_between") / (col("n_groups") - 1)) /
          (col("ss_within") / (col("n_total") - col("n_groups")))).as("f"))
  }

  /** §2.2#328 `q_rate_ztest` — two-sample Poisson rate z per event
    * type: did the arrival rate shift between the first and second
    * half of the observed span? The halves split on the day midpoint
    * as a pure integer comparison (day·2 ≤ d_min+d_max — no float
    * midpoint), counts are exact longs, and
    * z = (k₁−k₂)/√(k₁+k₂) is a mirrored chain of correctly-rounded
    * IEEE ops (subtract, add, sqrt, divide) over exact integers —
    * emitted unrounded per the tie rule.
    *
    * Scale: one events scan collapses to the bounded (type × day)
    * grid; the global span is a 1-row broadcast off that grid; the
    * final per-type reduction is k rows. No unbounded window, no
    * second fact scan.
    */
  def qRateZtest(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
      .cast("long")
    val byDay = Tables.events(spark, dir)
      .select(col("event_type"), day.as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"))
    val span = byDay.agg(min(col("day")).as("d_min"), max(col("day")).as("d_max"))
    byDay.crossJoin(broadcast(span))
      .groupBy(col("event_type"))
      .agg(
        sum(when(col("day") * 2 <= col("d_min") + col("d_max"), col("n"))
          .otherwise(lit(0L))).as("k_first"),
        sum(when(col("day") * 2 > col("d_min") + col("d_max"), col("n"))
          .otherwise(lit(0L))).as("k_second"))
      .select(col("event_type"), col("k_first"), col("k_second"),
        ((col("k_first") - col("k_second")).cast("double") /
          sqrt((col("k_first") + col("k_second")).cast("double"))).as("z"))
      .orderBy(col("event_type"))
  }
}
