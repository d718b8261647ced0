package graft.analytics

import graft.Ckpt.CutOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Product/event analytics operators (SURVEY.md §2.2 #84–86) — the
  * standard telemetry battery: outlier detection, cohort retention,
  * ordered funnels. All shapes are partial-agg + broadcast joins on
  * bounded keys (event types, cohort days, users).
  */
object EventAnalytics {

  /** §2.2#84 — z-score outliers per event type: per-type moments are
    * tiny and broadcast back over the scan; only counts and the
    * rounded max |z| leave the aggregation.
    */
  def qZscoreOutliers(spark: SparkSession, dir: String): DataFrame = {
    val stats = Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(avg(col("value")).as("mean_v"), stddev(col("value")).as("sd_v"))
    Tables.events(spark, dir)
      .join(broadcast(stats), Seq("event_type"))
      .select(col("event_type"),
        abs((col("value") - col("mean_v")) / col("sd_v")).as("absz"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("absz") > 3, 1L).otherwise(0L)).as("n_outliers"),
        round(max(col("absz")), 4).as("max_abs_z"))
      .orderBy(col("event_type"))
  }

  /** §2.2#85 — cohort retention: users grouped by first-seen day,
    * distinct actives per (cohort day, day offset). Bounded output
    * (days²), two shuffles (per-user min, then the cohort rollup).
    */
  def qRetentionCohort(spark: SparkSession, dir: String): DataFrame = {
    val firstDay = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    // the per-user first-seen frame scales with the user axis — no
    // broadcast hint; both sides hash on user_id (the distinct's
    // partitioning is reused) and AQE still picks broadcast when the
    // user set is actually small
    Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("active_day")).distinct()
      .join(firstDay, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("active_day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** §2.2#104 — month-over-month growth: monthly order volume with
    * lag-based deltas and percentage growth.
    */
  def qGrowthRate(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mon"))
      .agg(count(lit(1)).as("n_orders"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("yr"), col("mon"))
    monthly
      .withColumn("prev_n", lag(col("n_orders"), 1).over(w))
      .withColumn("delta", (col("n_orders") - col("prev_n")))
      .withColumn("pct_growth",
        round((col("n_orders") - col("prev_n")).cast("double") / col("prev_n") * 100, 4))
      .orderBy(col("yr"), col("mon"))
  }

  /** §2.2#99 — day-of-week seasonality, computed arithmetically from
    * epoch days ((d+3) mod 7, 0=Monday) — immune to the engines'
    * differing dayofweek/isodow conventions.
    */
  def qDowProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(((datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) + 3) % 7)
        .cast("long").as("dow"), col("value"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("dow"))

  /** §2.2#100 — Pearson correlation of quantity vs price per return
    * flag (the engines share the corr definition; rounded past
    * accumulation-order noise).
    */
  def qCorrelation(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("l_returnflag"))

  /** §2.2#144 — session transition matrix: first-order Markov
    * transition counts and probabilities between consecutive event
    * types per user (ordered by ts, event_id tiebreak). One window
    * pass partitioned by user, then a bounded |types|² rollup — the
    * standard journey-analysis shape; at 100 TB the per-user window
    * and the transition groupBy are the only shuffles and the output
    * stays 25 rows.
    */
  def qTransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
    val totals = org.apache.spark.sql.expressions.Window.partitionBy(col("prev_type"))
    trans
      // exact-count quotient, emitted unrounded (tie-attractor rule)
      .withColumn("p_trans",
        col("n_trans").cast("double") / sum(col("n_trans")).over(totals))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** §2.2#145 — exponentially weighted moving average per user
    * (α = 0.2): the recursive EWMA unrolled into its closed-form
    * geometric weighting over the per-user row number, so the whole
    * computation is one window pass plus one aggregation on the same
    * key (a single shuffle — the window partitioning is reused by the
    * groupBy). Weights decay past double precision after ~160 events,
    * so accumulation-order noise is bounded and the rounded output is
    * engine-stable.
    */
  def qEwma(spark: SparkSession, dir: String): DataFrame = {
    val alpha = 0.2
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    // Each term α(1−α)^(n−rn)·v is one pow+multiply. The pow must be
    // [[graft.functions.LibmPow]] (java.lang.Math.pow), NOT Spark's
    // built-in POWER: Spark's Pow evaluates via StrictMath/fdlibm,
    // which disagrees with DuckDB's correctly-rounded libm pow by
    // 1 ulp on real inputs (measured at 0.8^42 — it wobbled this
    // op's unrounded output at sf0.01). Math.pow matches libm on
    // this image; the PureFunctionProps pow pin (digest of 0.8^k
    // bits, k≤256) turns that platform assumption into a loud test.
    // Their SUM must not be a free-order float sum:
    // the mean of 2-decimal money values sits EXACTLY on .xxxx5
    // rounding boundaries (sum_cents/n), where engine-order drift
    // flips the 4th decimal (caught at sf0.1, the r11 modularity
    // class). The mean therefore uses exact integer cents with one
    // final division, and the EWMA folds in a FIXED-SHAPE two-level
    // reduction: terms fold in rn order inside data-independent
    // 1024-row blocks, block sums fold in block order — identical op
    // sequence in both engines at any partitioning, with every
    // collected array bounded (≤1024 terms / ≤n/1024 block sums), so
    // a hot user spills to more blocks, never a bigger buffer.
    val terms = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("term",
        (when(col("rn") === 1,
          graft.functions.MathFunctions.libm_pow(lit(1 - alpha), col("n") - 1))
          .otherwise(lit(alpha) *
            graft.functions.MathFunctions.libm_pow(lit(1 - alpha), col("n") - col("rn"))))
          * col("value"))
    val blockSums = terms
      .groupBy(col("user_id"), expr("(rn - 1) div 1024").as("blk"))
      .agg(sort_array(collect_list(struct(col("rn"), col("term")))).as("a"))
      .select(col("user_id"), col("blk"),
        aggregate(col("a"), lit(0.0), (acc, x) => acc + x.getField("term")).as("bs"))
    val ewma = blockSums
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("blk"), col("bs")))).as("b"))
      .select(col("user_id"),
        aggregate(col("b"), lit(0.0), (acc, x) => acc + x.getField("bs")).as("ew"))
    Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(graft.analytics.Money.cents(col("value"))).as("cents"))
      .join(ewma, Seq("user_id"))
      // NO final round: the fold and the exact-cents division produce
      // bit-identical doubles in both engines, while round(…, 4) at a
      // money-tie value (sum_cents/n ends in …5 by construction)
      // flips between Spark's shortest-repr HALF_UP and DuckDB's
      // binary-value rounding — identical inputs, different 4th digit
      .select(col("user_id"), col("n_events"),
        (col("ew") + lit(0.0)).as("ewma_value"),
        (col("cents").cast("double") / col("n_events") / 100.0).as("mean_value"))
      .orderBy(col("user_id"))
  }

  /** §2.2#86 — ordered funnel view→click→purchase: each stage's
    * earliest qualifying timestamp feeds the next stage's predicate
    * (strictly sequenced, not mere co-occurrence). Three
    * partial-aggregated passes over the events scan; one summary row.
    */
  def qFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val v = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("ts"))).as("v_ts"))
    // stage frames are per-USER — entity scale, never hint-broadcast:
    // every join and groupBy here keys on user_id, so the three passes
    // reuse one hash partitioning and degrade to co-partitioned
    // shuffles at scale (AQE broadcasts when a side is truly small)
    val c = ev.join(v, Seq("user_id"))
      .groupBy(col("user_id"), col("v_ts"))
      .agg(min(when(col("event_type") === "click" && col("ts") >= col("v_ts"), col("ts"))).as("c_ts"))
    val p = ev.join(c.select(col("user_id"), col("v_ts"), col("c_ts")), Seq("user_id"))
      .groupBy(col("user_id"), col("v_ts"), col("c_ts"))
      .agg(min(when(col("event_type") === "purchase" && col("ts") >= col("c_ts"), col("ts"))).as("p_ts"))
    p.agg(count(lit(1)).as("n_users"),
        sum(when(col("v_ts").isNotNull, 1L).otherwise(0L)).as("n_viewed"),
        sum(when(col("c_ts").isNotNull, 1L).otherwise(0L)).as("n_clicked_after_view"),
        sum(when(col("p_ts").isNotNull, 1L).otherwise(0L)).as("n_purchased_after_click"))
  }

  /** §2.2#152 — gaps-and-islands: maximal runs of consecutive active
    * days per user via the classic day − row_number grouping key.
    * Input is pre-shrunk to distinct (user, day) pairs (a partial-agg
    * distinct), so the window sorts |users|×|days| rows, not raw
    * events; everything shuffles once on user_id and the rollup
    * reuses that partitioning.
    */
  def qGapsIslands(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long").as("day"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"), max(col("len")).as("max_streak"),
        sum(col("len")).as("n_active_days"))
      .orderBy(col("user_id"))
  }

  /** §2.2#173 — autocorrelation function of the daily event count at
    * lags 1..7: the seasonality diagnostic (a weekly cycle shows as a
    * lag-7 peak). One partial-agg shrink to the bounded day axis,
    * then 7 lag columns over a ≤|days|-row window and one Pearson
    * corr per lag (both engines share the sample-corr definition;
    * rounded past accumulation noise like q_correlation).
    */
  def qAcf(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .cast("long").as("day"))
      .agg(count(lit(1)).cast("double").as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
    val lags = (1 to 7).foldLeft(daily) { (df, l) =>
      df.withColumn(s"lag$l", lag(col("n"), l).over(w))
    }
    val acfRows = (1 to 7).map { l =>
      struct(lit(l.toLong).as("lag_days"),
        col(s"corr$l").as("acf"), col(s"cnt$l").as("n_days"))
    }
    val aggs = (1 to 7).flatMap { l => Seq(
      (round(corr(col("n"), col(s"lag$l")), 4) + lit(0.0)).as(s"corr$l"),
      count(col(s"lag$l")).as(s"cnt$l"))
    }
    lags.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(acfRows: _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("lag_days"))
  }

  /** §2.2#164 — ordered sequence-pattern match (MATCH_RECOGNIZE-lite):
    * strictly consecutive view→click→purchase runs per user via two
    * leads over one per-user window pass — no joins, no state beyond
    * the 2-row lookahead, unlike the funnel operator which allows
    * intervening events.
    */
  def qEventPattern(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("nxt1", lead(col("event_type"), 1).over(w))
      .withColumn("nxt2", lead(col("event_type"), 2).over(w))
      .filter(col("event_type") === "view" &&
        col("nxt1") === "click" && col("nxt2") === "purchase")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_matches"),
        min(unix_micros(col("ts"))).as("first_match_us"))
      .orderBy(col("user_id"))
  }

  /** §2.2#155 — calendar densification: explode each user's
    * first..last activity span into a full day spine (`sequence` —
    * a narrow generator, no shuffle) and anti-join the observed
    * days to surface the gaps. The spine size is bounded by the
    * calendar, not the event volume, so the expansion is
    * |users|×|days| regardless of data scale.
    */
  def qCalendarDensify(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long")
    val ev = Tables.events(spark, dir).filter(col("user_id") <= 20)
    val spine = ev.groupBy(col("user_id"))
      .agg(min(day).as("first_day"), max(day).as("last_day"))
      .select(col("user_id"),
        explode(sequence(col("first_day"), col("last_day"))).as("day"))
    val active = ev.select(col("user_id"), day.as("day")).distinct()
    spine.join(active, Seq("user_id", "day"), "left_anti")
      .orderBy(col("user_id"), col("day"))
  }

  /** §2.2 `q_interpolate_gaps` — time-series repair by linear
    * interpolation: a sparse daily series per event type (a
    * deterministic event slice, so day-cells genuinely go missing at
    * small SF — the sensor-outage shape) is densified onto its
    * [first, last] day spine, and every missing day gets the linear
    * blend of its nearest observed neighbors. The carry windows
    * (last/first non-null) run on ONE event_type shuffle over the
    * bounded day grid; the blend is `floor(1000·((next_day−day)·prev
    * + (day−prev_day)·next) / gap)` computed in identical IEEE order
    * on both engines. At 10⁸ keys the same shape holds — the grid is
    * |keys|×|days|, never raw facts, and the fill stays windowed
    * (no self-join per gap).
    */
  def qInterpolateGaps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long")
    val obs = Tables.events(spark, dir)
      .filter(col("event_id") % 11 === 0 && col("value") > 130)
      .groupBy(col("event_type"), day.as("day"))
      .agg(count(lit(1)).as("n"))
    val spine = obs.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val grid = spine.join(obs, Seq("event_type", "day"), "left")
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsDay = when(col("n").isNotNull, col("day"))
    grid
      .withColumn("prev_day", last(obsDay, ignoreNulls = true).over(wPrev))
      .withColumn("prev_n", last(col("n"), ignoreNulls = true).over(wPrev))
      .withColumn("next_day", first(obsDay, ignoreNulls = true).over(wNext))
      .withColumn("next_n", first(col("n"), ignoreNulls = true).over(wNext))
      .select(col("event_type"), col("day"), col("n"),
        when(col("n").isNotNull, col("n") * 1000L)
          .otherwise(floor(lit(1000.0) *
            ((col("next_day") - col("day")) * col("prev_n") +
             (col("day") - col("prev_day")) * col("next_n")) /
            (col("next_day") - col("prev_day"))).cast("long")).as("filled_e3"),
        col("n").isNull.as("is_interp"))
      .orderBy(col("event_type"), col("day"))
  }

  /** §2.2#156 — set-similarity between groups: Jaccard overlap of
    * user sets across event-type pairs. Never materializes a set —
    * distinct (type, user) pairs self-join on user_id (the
    * equi-join key), so the work is proportional to co-occurrence,
    * and per-type totals broadcast onto the bounded |types|² output.
    */
  def qTypeUserOverlap(spark: SparkSession, dir: String): DataFrame = {
    val tu = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id")).distinct()
    val totals = tu.groupBy(col("event_type")).agg(count(lit(1)).as("n_users"))
    val both = tu.as("a").join(tu.as("b"),
        col("a.user_id") === col("b.user_id") &&
        col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"), col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    both
      .join(broadcast(totals.withColumnRenamed("event_type", "type_a")
        .withColumnRenamed("n_users", "n_a")), Seq("type_a"))
      .join(broadcast(totals.withColumnRenamed("event_type", "type_b")
        .withColumnRenamed("n_users", "n_b")), Seq("type_b"))
      .select(col("type_a"), col("type_b"), col("n_both"), col("n_a"), col("n_b"),
        round(col("n_both").cast("double") /
          (col("n_a") + col("n_b") - col("n_both")), 4).as("jaccard"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** §2.2#160 — chi-square independence test of event type vs
    * day-of-week: observed counts from one partial-agg pass, expected
    * counts from broadcast row/column marginals, per-type χ²
    * contributions on the bounded |types|×7 contingency table. All
    * inputs are exact integer counts so both engines derive identical
    * doubles.
    *
    * Convention: contributions are summed over OBSERVED cells only —
    * an empty (type, dow) cell's (0−E)²/E = E mass is excluded, so a
    * scipy.stats.chi2_contingency cross-check will read higher
    * whenever a type misses a weekday. This is deliberate for the
    * per-type diagnostic rows (an all-zero stripe is better surfaced
    * by its absence); [[qCramersV]], the thresholded statistic,
    * densifies via the closed-form n − Σ_observed E correction.
    */
  def qChiSquare(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dow = ((datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) + 3) % 7)
      .cast("long")
    // ONE pass over events builds the ≤|types|×7 contingency table;
    // marginals are window sums over those few rows, never a re-scan
    // of the fact table (the join formulation scanned events 4×).
    val obs = Tables.events(spark, dir)
      .select(col("event_type"), dow.as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o"))
    obs
      .withColumn("row_n", sum(col("o")).over(Window.partitionBy(col("event_type"))))
      .withColumn("col_n", sum(col("o")).over(Window.partitionBy(col("dow"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
      .withColumn("exp", col("row_n").cast("double") * col("col_n") / col("n"))
      .withColumn("contrib",
        (col("o") - col("exp")) * (col("o") - col("exp")) / col("exp"))
      .groupBy(col("event_type"))
      .agg(sum(col("o")).as("n_events"), round(sum(col("contrib")), 4).as("chi2_contrib"))
      .orderBy(col("event_type"))
  }

  /** §2.2#161 — Shannon entropy of each user's event-type mix
    * (bits): a behavioral-diversity score from exact integer counts,
    * two aggregations on the same user key (exchange reuse), log2
    * applied once per bounded (user, type) row.
    */
  def qUserEntropy(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(spark, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val totals = counts.groupBy(col("user_id")).agg(sum(col("c")).as("n"))
    counts.join(totals, Seq("user_id"))
      .withColumn("p", col("c").cast("double") / col("n"))
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n_events"),
        count(lit(1)).as("n_types"),
        (round(-sum(col("p") * log2(col("p"))), 4) + lit(0.0)).as("entropy_bits"))
      .orderBy(col("user_id"))
  }

  /** §2.2#153 — running distinct-user count per day. COUNT(DISTINCT)
    * over a running window is unsupported (and unscalable — it would
    * re-scan the frame per row); the equivalent formulation
    * aggregates each user's first-seen day (one shuffle on user_id,
    * partial-agg min) and takes a running sum of the per-day new-user
    * counts. The final window is over the bounded day axis — a few
    * hundred rows at any data scale.
    */
  def qRunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long")
    val newPerDay = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(min(day).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
    val daily = Tables.events(spark, dir)
      .select(day.as("day"), col("user_id"))
      .groupBy(col("day")).agg(countDistinct(col("user_id")).as("n_active"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    daily.join(newPerDay, Seq("day"), "left")
      .withColumn("n_new", coalesce(col("n_new"), lit(0L)))
      .withColumn("cum_distinct_users", sum(col("n_new")).over(w))
      .orderBy(col("day"))
  }

  /** §2.2#193 — time-weighted average: each reading weighted by how
    * long it was "current" (gap to the type's next event), the
    * metric-rollup semantic for irregularly-sampled gauges. One
    * shuffle (window on event_type), and the weighted sum runs on
    * integer milli-value × µs-gap products accumulated in
    * decimal(38,0) — exact at any row count and partition order, so
    * the only float op is the final single division. The per-type
    * output is bounded regardless of scale.
    */
  /** §2.2#196 — differentially-private-style count release: per
    * (event_type, day) counts plus Laplace(b=2) noise drawn via the
    * inverse CDF from a uniform that is *deterministically* derived
    * from the cell key (md5 → [0,1)), so the release is reproducible
    * and oracle-checkable while exercising the exact DP mechanism
    * shape (hash→uniform→inverse-CDF is also how a production
    * pipeline gets per-key stable noise without a stateful RNG).
    * Pure partial-agg + narrow float expression; no extra shuffle
    * beyond the count itself.
    */
  def qDpCounts(spark: SparkSession, dir: String): DataFrame = {
    val day = to_date(col("ts"))
    val counts = Tables.events(spark, dir)
      .groupBy(col("event_type"), day.as("day"))
      .agg(count(lit(1)).as("n_true"))
    val u = ((conv(substring(md5(concat(col("event_type"), lit("|"),
      col("day").cast("string"))), 1, 15), 16, 10).cast("long") % 1000000)
      .cast("double") + lit(0.5)) / lit(1000000.0)
    val x = u - lit(0.5)
    val noise = when(x < 0, lit(1.0)).otherwise(lit(-1.0)) *
      log(lit(1.0) - lit(2.0) * abs(x))
    counts
      .select(col("event_type"), col("day"), col("n_true"),
        round(col("n_true") + lit(2.0) * noise, 4).as("n_released"))
      .orderBy(col("event_type"), col("day"))
  }

  def qTimeWeightedAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"), col("ts"),
        round(col("value") * 1000).cast("long").as("v_milli"),
        unix_micros(col("ts")).as("us"))
      .withColumn("dt_us", lead(col("us"), 1).over(w) - col("us"))
      .filter(col("dt_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dt_us")).as("total_us"),
        sum(col("v_milli").cast("decimal(38,0)") * col("dt_us")).as("swv"))
      .select(col("event_type"), col("n_intervals"), col("total_us"),
        round(col("swv").cast("double") / col("total_us") / lit(1000.0), 6)
          .as("twa_value"))
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_d7_retention` — D7 rolling retention: of the users first
    * seen on day d, how many were active exactly on d+7. Two compact
    * aggregations (per-user first day; distinct active days) joined
    * on the user key — the exchange is reused — then a bounded cohort
    * rollup. The growth metric every product dashboard leads with.
    */
  def qD7Retention(spark: SparkSession, dir: String): DataFrame = {
    val day = to_date(col("ts"))
    val first = Tables.events(spark, dir)
      .groupBy(col("user_id")).agg(min(day).as("d0"))
    val active = Tables.events(spark, dir)
      .select(col("user_id"), day.as("d")).distinct()
    val retained = active.select(col("user_id").as("r_user"), col("d").as("d7"))
    first
      .join(retained,
        col("user_id") === col("r_user") &&
          col("d7") === date_add(col("d0"), 7), "left_outer")
      .groupBy(col("d0").as("cohort_day"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("d7").isNotNull, 1L).otherwise(0L)).as("n_retained"))
      // exact-count quotient chain, emitted unrounded (tie rule)
      .withColumn("pct_retained",
        col("n_retained").cast("double") / col("n_users") * 100)
      .orderBy(col("cohort_day"))
  }

  /** §2.2 `q_attribution` — last-touch attribution: every purchase
    * credits the user's most recent preceding non-purchase event (the
    * "channel"). One window pass per user carries the last-seen
    * channel forward (ignore-nulls last over the event sequence), so
    * the attribution is a single shuffle on user_id regardless of
    * channel cardinality; the rollup after it is bounded by the
    * channel set.
    */
  def qAttribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("channel",
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("channel").isNotNull)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 2).as("attributed_value"))
      .orderBy(col("channel"))
  }

  /** §2.2 `q_decay_score` — recency-weighted user activity: each
    * event contributes value·2^(−age/7d) against the corpus's newest
    * timestamp (half-life one week). One scan, one partial agg; the
    * reference instant is a 1-row broadcast scalar, so the score is a
    * pure map-side expression ahead of the user rollup — the standard
    * "hotness" ranking shape for feeds and cache-admission policies.
    */
  def qDecayScore(spark: SparkSession, dir: String): DataFrame = {
    val ref = Tables.events(spark, dir)
      .agg(max(unix_micros(col("ts"))).as("ref_us"))
    Tables.events(spark, dir)
      .crossJoin(broadcast(ref))
      .select(col("user_id"),
        (col("value") * pow(lit(2.0),
          -(col("ref_us") - unix_micros(col("ts"))).cast("double")
            / (7.0 * 86400e6))).as("w"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("w")), 4).as("decay_score"))
      .orderBy(col("user_id"))
  }

  /** §2.2 `q_daily_anomaly` — seasonal volume anomaly detection:
    * daily event counts scored against their day-of-week baseline
    * (mean/std over the day-count series, not raw events), |z| ≥ 2
    * flagged. The fact table collapses to one row per day in the
    * first pass; everything after runs on that bounded series, so the
    * monitor costs one scan regardless of input size.
    */
  def qDailyAnomaly(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("dow",
        ((datediff(col("day"), lit("1970-01-01").cast("date")) + 3) % 7)
          .cast("long"))
    val w = Window.partitionBy(col("dow"))
    daily
      .withColumn("mu", avg(col("n_events")).over(w))
      .withColumn("sd", stddev_samp(col("n_events")).over(w))
      .filter(col("sd").isNotNull && col("sd") > 0)
      .select(col("day"), col("dow"), col("n_events"),
        round((col("n_events") - col("mu")) / col("sd"), 4).as("z"))
      .withColumn("is_anomaly", abs(col("z")) >= 2.0)
      .orderBy(col("day"))
  }

  /** §2.2 `q_new_vs_returning` — daily active users split into new
    * (first-seen that day) vs returning: the standard growth
    * decomposition. Input shrinks to distinct (user, day) pairs
    * first; the first-seen join is user-key co-partitioned with the
    * distinct's own shuffle, and the day rollup is bounded.
    */
  def qNewVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val days = Tables.events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      .cutLineage(eager = false) // lazy: blocks die with the RDD, no session-lifetime cache pin
    val firstDay = days.groupBy(col("user_id")).agg(min(col("day")).as("first_day"))
    days.join(firstDay, Seq("user_id"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
      .orderBy(col("day"))
  }

  /** §2.2 `q_changepoint` — CUSUM mean-shift detection on the daily
    * event-count series: cumulative deviation from the series mean,
    * peak |CUSUM| marks the most likely changepoint. The fact table
    * collapses to one row per day in pass one; the windows run over
    * that bounded series (same contract as [[qDailyAnomaly]]). The
    * deviation is exact-integer cumsum minus rn·mean — ONE float
    * multiply per row, no float accumulation to drift cross-engine.
    */
  def qChangepoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
    val stats = daily.agg(sum(col("n_events")).as("tot"), count(lit(1)).as("nd"))
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily.crossJoin(broadcast(stats))
      .withColumn("rn", row_number().over(Window.orderBy(col("day"))).cast("long"))
      .withColumn("cum", sum(col("n_events")).over(wCum))
      .select(col("day"), col("n_events"),
        // exact-int chain (cum − rn·(tot/nd)), mirrored op order in the
        // oracle → emitted unrounded (tie-attractor rule)
        (col("cum") - col("rn") * (col("tot").cast("double") / col("nd")))
          .as("cusum"))
    val wPeak = Window.orderBy(abs(col("cusum")).desc, col("day"))
    scored.withColumn("is_peak", row_number().over(wPeak) === 1)
      .orderBy(col("day"))
  }

  /** §2.2 `q_session_path_topk` — journey mining: the 10 most common
    * opening event-type paths (first three events per user, ts then
    * event_id order). One user_id window pass, then the path rollup
    * is bounded by |types|³ — the standard first-k-steps sequence
    * summary. Path assembly sorts the collected (rn, type) structs,
    * so it is insensitive to aggregation arrival order.
    */
  def qSessionPathTopk(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val paths = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .groupBy(col("user_id"))
      .agg(expr("concat_ws('>', transform(array_sort(collect_list(" +
        "struct(rn, event_type))), x -> x.event_type))").as("path"))
    paths.groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(10)
  }

  /** §2.2 `q_churn_by_engagement` — does low activity predict churn?
    * Users whose last event predates corpus max ts by >7 days are
    * churned; users are quartiled by lifetime event count and churn
    * rate reported per quartile. One per-user aggregation (the only
    * fact-table shuffle), a 1-row broadcast reference ts, a
    * DISTRIBUTED exact quartile ([[Ranks.ntileBanded]] — the band IS
    * the event count, a bounded activity axis; the per-band
    * row_number is partitioned, never a single-task sort of 10⁸
    * users), and a 4-row rollup; time math in integer µs.
    */
  def qChurnByEngagement(spark: SparkSession, dir: String): DataFrame = {
    val ref = Tables.events(spark, dir).agg(max(unix_micros(col("ts"))).as("max_us"))
    val perUser = Tables.events(spark, dir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), max(unix_micros(col("ts"))).as("last_us"))
    Ranks.ntileBanded(perUser.crossJoin(broadcast(ref)), col("n_events"),
        Seq(col("n_events"), col("user_id")), 4, "quartile")
      .select(col("quartile"), col("n_events"),
        when(col("last_us") < col("max_us") - lit(7L * 86400L * 1000000L), 1L)
          .otherwise(0L).as("churned"))
      .groupBy(col("quartile"))
      .agg(count(lit(1)).as("n_users"), sum(col("churned")).as("n_churned"),
        sum(col("n_events")).as("tot_events"))
      // exact-count quotient, emitted unrounded (tie-attractor rule)
      .withColumn("churn_rate",
        col("n_churned").cast("double") / col("n_users"))
      .orderBy(col("quartile"))
  }

  /** §2.2 `q_basket_lift` — market-basket association rules over
    * order baskets: support / confidence / lift for co-purchased part
    * pairs, global top-20 by lift: rules need item supports ≥ 20 and
    * pair support ≥ 3. The pair fan-out is bounded by basket size²
    * (≤7 lines per TPC-H order), so all shuffles are
    * partial-aggregated counts on bounded keys (part, part-pair),
    * and item supports join in AFTER the pair cut on the bounded
    * rule set — the pair shuffle carries only the two part ids.
    */
  def qBasketLift(spark: SparkSession, dir: String): DataFrame = {
    // ONE fact-table shuffle (the basket collect; collect_set dedups,
    // no distinct pre-pass) feeding three narrow consumers: pair
    // explode, item supports, basket count — same layout as
    // [[graft.graph.GraphOps.copurchaseJaccard]]. Pairs are a
    // combination explode bounded by basket size² (≤7 lines per
    // order), never a lineitem self-join. The support cuts apply
    // AFTER pair counting (identical rule set — a rule needs sup_a,
    // sup_b AND sup_ab over their thresholds), keeping any broadcast
    // barrier off the fact-table path; with unbounded basket sizes,
    // swap to an apriori pre-filter instead.
    val baskets = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .groupBy(col("ok")).agg(sort_array(collect_set(col("pk"))).as("parts"))
      .cutLineage(eager = false) // lazy: blocks die with the RDD, no session-lifetime cache pin
    val sup = baskets.select(explode(col("parts")).as("pk"))
      .groupBy(col("pk")).agg(count(lit(1)).as("sup"))
    val pairsOf = expr(
      """flatten(transform(parts, (x, i) ->
        |  transform(slice(parts, i + 2, size(parts) - i - 1),
        |    y -> struct(x AS pa, y AS pb))))""".stripMargin)
    val pairs = baskets.select(explode(pairsOf).as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("sup_ab"))
      .filter(col("sup_ab") >= 3)
    val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
    pairs
      // per-part supports scale with the catalog — shuffle-join them
      // (the copurchaseJaccard shape); AQE broadcasts small catalogs
      .join(sup.select(col("pk").as("pa"), col("sup").as("sup_a")), Seq("pa"))
      .join(sup.select(col("pk").as("pb"), col("sup").as("sup_b")), Seq("pb"))
      .filter(col("sup_a") >= 20 && col("sup_b") >= 20)
      .crossJoin(broadcast(nOrders))
      .select(col("pa"), col("pb"), col("sup_ab"), col("sup_a"), col("sup_b"),
        round(col("sup_ab").cast("double") / col("sup_a"), 4).as("confidence"),
        round(col("sup_ab").cast("double") * col("n_orders") /
          (col("sup_a") * col("sup_b")), 4).as("lift"))
      .orderBy(col("lift").desc, col("pa"), col("pb"))
      .limit(20)
  }

  /** §2.2 `q_rfm_segments` — RFM customer segmentation: per-customer
    * recency (days since last order vs corpus max date), frequency
    * (order count), monetary (lifetime spend in exact cents), each
    * quintiled, then rolled up per (r, f, m) cell. Quintiles are the
    * DISTRIBUTED exact ranks of [[Ranks.ntileBanded]] — per-metric
    * band statistics plus band-partitioned row_numbers, never a
    * single-task sort of the customer axis — with a unique
    * (metric, custkey) sort so bucket assignment is reproducible
    * cross-engine and bit-identical to the window-function `ntile`.
    * Bands are statistic axes (months of recency, order counts,
    * $50k revenue cells), bounded by metric range, not customer
    * count. Monetary stays integer cents until the final division.
    */
  def qRfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val maxDay = orders.agg(max(to_date(col("o_orderdate"))).as("max_day"))
    val cust = orders.groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(Money.cents(col("o_totalprice"))).as("mon_cents"))
      .crossJoin(broadcast(maxDay))
      .select(col("o_custkey"),
        datediff(col("max_day"), col("last_day")).cast("long").as("recency"),
        col("freq"), col("mon_cents"))
    val r = Ranks.ntileBanded(cust, expr("recency div 30"),
      Seq(col("recency"), col("o_custkey")), 5, "rq")
    val rf = Ranks.ntileBanded(r, col("freq"),
      Seq(col("freq"), col("o_custkey")), 5, "fq")
    val scored = Ranks.ntileBanded(rf, expr("mon_cents div 5000000"),
      Seq(col("mon_cents"), col("o_custkey")), 5, "mq")
    scored.groupBy(col("rq"), col("fq"), col("mq"))
      .agg(count(lit(1)).as("n_cust"),
        (Money.dollars(sum(col("mon_cents")), 100.0) / count(lit(1)))
          .as("avg_monetary"))
      .orderBy(col("rq"), col("fq"), col("mq"))
  }

  /** §2.2 `q_cohort_ltv` — cohort lifetime-value curve: customers
    * grouped by first-order month, revenue accumulated by month-age,
    * reported as cumulative dollars per cohort member. Two shuffles
    * (per-customer first month, then the bounded cohort×age rollup);
    * the running sum windows over ≤|months| rows per cohort. Month
    * arithmetic is yr·12+mon integers — immune to engine date-diff
    * conventions. Revenue is exact cents until the final division.
    */
  def qCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val om = (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
      .cast("long")
    val orders = Tables.orders(spark, dir)
      .select(col("o_custkey"), om.as("mon"), Money.cents(col("o_totalprice")).as("cents"))
    val firstMon = orders.groupBy(col("o_custkey")).agg(min(col("mon")).as("cohort_mon"))
    val sizes = firstMon.groupBy(col("cohort_mon")).agg(count(lit(1)).as("n_cust"))
    val aged = orders.join(firstMon, Seq("o_custkey"))
      .groupBy(col("cohort_mon"), (col("mon") - col("cohort_mon")).as("age"))
      .agg(sum(col("cents")).as("rev_cents"))
    val w = Window.partitionBy(col("cohort_mon")).orderBy(col("age"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    aged.withColumn("cum_cents", sum(col("rev_cents")).over(w))
      .join(broadcast(sizes), Seq("cohort_mon"))
      // floor-divide in exact cents first: cents/100.0/n lands on
      // half-cent boundaries that the engines round apart
      .select(col("cohort_mon"), col("age"), col("n_cust"),
        Money.dollars(expr("cum_cents div n_cust"), 100.0).as("ltv_per_cust"))
      .orderBy(col("cohort_mon"), col("age"))
  }

  /** §2.2 `q_funnel_latency` — time-to-convert between funnel steps:
    * per user, the first view→click and click→purchase transitions
    * (ordered, same contract as [[qFunnel]]), reported per step pair
    * as count / mean / exact p50/p90 over the per-user latency in
    * microseconds (integer µs end-to-end — no float time math). The
    * percentile input is the user dimension, not raw events; the
    * heavy passes are the three conditional-min aggregations on
    * user_id, which all reuse one shuffle partitioning.
    */
  def qFunnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("us"))).as("v_us"))
    // per-user stage frames, same no-hint contract as [[qFunnel]]
    val c = ev.join(v, Seq("user_id"))
      .groupBy(col("user_id"), col("v_us"))
      .agg(min(when(col("event_type") === "click" && col("us") >= col("v_us"),
        col("us"))).as("c_us"))
    val p = ev.join(c.select(col("user_id"), col("v_us"), col("c_us")),
        Seq("user_id"))
      .groupBy(col("user_id"), col("v_us"), col("c_us"))
      .agg(min(when(col("event_type") === "purchase" && col("us") >= col("c_us"),
        col("us"))).as("p_us"))
      .cutLineage(eager = false) // lazy: blocks die with the RDD, no session-lifetime cache pin
    val steps = Seq(
      ("view_to_click", col("c_us") - col("v_us")),
      ("click_to_purchase", col("p_us") - col("c_us")))
    steps.map { case (name, delta) =>
      p.select(delta.as("d")).filter(col("d").isNotNull)
        .agg(count(lit(1)).as("n_users"),
          // exact long sum, ONE double division: avg() would
          // accumulate µs-magnitude doubles whose order-dependent
          // ulp (~0.03 at 2e14) exceeds the 2-decimal contract
          (sum(col("d")).cast("double") / count(lit(1))).as("mean_us"),
          round(expr("percentile(d, 0.5)"), 2).as("p50_us"),
          round(expr("percentile(d, 0.9)"), 2).as("p90_us"))
        .select(lit(name).as("step"), col("n_users"), col("mean_us"),
          col("p50_us"), col("p90_us"))
    }.reduce(_ union _).orderBy(col("step"))
  }

  /** §2.2#263 — weekly stickiness (avg DAU / WAU): the canonical
    * engagement ratio. Two distinct-user aggregations off one scan —
    * per (week, day) and per week — joined on the bounded week axis.
    * Distinct counts shuffle on (week[, day], user): partial-distinct
    * map-side combine keeps the exchange at user-cardinality, and the
    * join is broadcast (weeks are calendar-bounded at any data scale).
    */
  def qStickiness(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select(to_date(date_trunc("week", col("ts"))).as("week"),
        to_date(col("ts")).as("day"), col("user_id"))
    val daily = e.groupBy(col("week"), col("day"))
      .agg(countDistinct(col("user_id")).as("dau"))
    val weekly = e.groupBy(col("week"))
      .agg(countDistinct(col("user_id")).as("wau"))
    daily.groupBy(col("week"))
      .agg(count(lit(1)).as("n_days"), sum(col("dau")).as("sum_dau"))
      .join(broadcast(weekly), Seq("week"))
      // exact long sums, one double division each — deterministic
      // across engines (identical IEEE ops, no accumulation order)
      .select(col("week"), col("n_days"), col("wau"),
        (col("sum_dau").cast("double") / col("n_days")).as("avg_dau"),
        (col("sum_dau").cast("double") / col("n_days") / col("wau"))
          .as("stickiness"))
      .orderBy(col("week"))
  }

  /** §2.2#264 — peak detection on the daily series: days whose event
    * count strictly exceeds both calendar neighbors, per event type.
    * The lag/lead window partitions by the bounded type axis and
    * orders the calendar-bounded day axis — a few thousand rows per
    * partition at ANY corpus size, since the fact scan is already
    * reduced to (type, day) counts map-side.
    */
  def qPeakDays(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("day"))
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("prev_n", lag(col("n_events"), 1).over(w))
      .withColumn("next_n", lead(col("n_events"), 1).over(w))
      .filter(col("prev_n").isNotNull && col("next_n").isNotNull &&
        col("n_events") > col("prev_n") && col("n_events") > col("next_n"))
      .select(col("event_type"), col("day"), col("n_events"))
      .orderBy(col("event_type"), col("day"))
  }

  /** §2.2#265 — inter-event gap profile: per-user consecutive-event
    * gaps (lag over the user-partitioned, (ts, event_id)-ordered
    * window — distributed and spillable), aggregated per type of the
    * LATER event. Gaps are exact µs longs; the mean does ONE double
    * division over exact integer sums, so both engines run identical
    * IEEE ops (same fence as q_funnel_latency).
    */
  def qInterEventGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .filter(col("prev_us").isNotNull)
      .withColumn("gap_us", col("us") - col("prev_us"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        (sum(col("gap_us")).cast("double") / count(lit(1)) / 1e6)
          .as("avg_gap_s"),
        expr("min(gap_us) div 1000000").as("min_gap_s"),
        expr("max(gap_us) div 1000000").as("max_gap_s"))
      .orderBy(col("event_type"))
  }

  /** §2.2#266 — modal hour-of-day per event type (mode as a two-level
    * aggregation): (type, hour) counts reduce map-side, then the mode
    * is a packed `max(struct(n, -hour))` in the second HashAggregate —
    * ties break to the SMALLEST hour, same as the oracle's
    * `row_number() ... ORDER BY n DESC, hr`. No window, no sort; both
    * aggregates stay in whole-stage codegen.
    */
  /** §2.2#280 — weekend effect: per event type, average daily volume
    * on weekend days vs weekdays and the lift ratio between them —
    * the seasonality sanity check behind any day-level alerting
    * threshold. Exact long sums over the map-side-reduced (type, day)
    * axis; the division into "avg per day class" and the lift are the
    * only IEEE ops, written in the same order as the oracle. A type
    * with no weekend days (degenerate short windows) yields nulls.
    */
  def qWeekendEffect(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      // Spark dayofweek: 1 = Sunday, 7 = Saturday
      .withColumn("is_weekend", dayofweek(col("day")).isin(1, 7))
      .groupBy(col("event_type"))
      .agg(sum(when(col("is_weekend"), col("n"))).as("weekend_events"),
        count(when(col("is_weekend"), lit(1))).as("weekend_days"),
        sum(when(!col("is_weekend"), col("n"))).as("weekday_events"),
        count(when(!col("is_weekend"), lit(1))).as("weekday_days"))
      .select(col("event_type"), col("weekend_days"), col("weekday_days"),
        round(col("weekend_events").cast("double") /
          nullif(col("weekend_days").cast("double"), lit(0.0)), 2)
          .as("avg_weekend"),
        round(col("weekday_events").cast("double") /
          nullif(col("weekday_days").cast("double"), lit(0.0)), 2)
          .as("avg_weekday"),
        round(col("weekend_events").cast("double") * col("weekday_days") /
          nullif(col("weekday_events").cast("double") * col("weekend_days"),
            lit(0.0)), 4)
          .as("weekend_lift"))
      .orderBy(col("event_type"))

  /** §2.2#277 — top weekly movers: for each event type, the calendar
    * week with the largest absolute week-over-week volume swing. The
    * fact scan reduces map-side to (type, week) counts; the lag runs
    * on the type-partitioned, calendar-bounded week axis; the winner
    * per type is a packed `max(struct(abs_delta, -epoch_week_day))`
    * in a second HashAggregate (ties → earliest week) — no rank
    * window over anything unbounded.
    */
  def qTopMovers(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("week"))
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        to_date(date_trunc("week", col("ts"))).as("week"))
      .agg(count(lit(1)).as("n"))
      .withColumn("prev_n", lag(col("n"), 1).over(w))
      .filter(col("prev_n").isNotNull)
      .withColumn("delta", col("n") - col("prev_n"))
      .withColumn("wd", datediff(col("week"), lit("1970-01-01")).cast("long"))
      .groupBy(col("event_type"))
      .agg(max(struct(abs(col("delta")).as("a"), (-col("wd")).as("nwd"),
        col("delta").as("d"), col("n").as("n"), col("prev_n").as("p"))).as("m"))
      .select(col("event_type"),
        date_add(lit("1970-01-01").cast("date"), (-col("m.nwd")).cast("int"))
          .as("week"),
        col("m.p").as("prev_week_n"), col("m.n").as("week_n"),
        col("m.d").as("delta"),
        round(col("m.d").cast("double") /
          nullif(col("m.p").cast("double"), lit(0.0)) * 100, 2)
          .as("pct_change"))
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_rolling_retention_matrix` — the full N×N cohort
    * retention grid in ONE pass: users cohorted by first-activity
    * week, each later active week counted into (cohort_week,
    * week_offset) with its share of the cohort. This is the rolling
    * retention heatmap every growth dashboard renders; the naive form
    * runs one self-join per offset column (N scans), this runs one.
    *
    * Scale shape: one narrow distinct over (user, week) — map-side
    * combine on the projected pair, never the event payload — then
    * the cohort min and the matrix rollup BOTH group by user_id, so
    * AQE/planner reuses one user-keyed exchange; the final grid is
    * bounded by weeks² (calendar axis), and the cohort-size join for
    * the share column joins grid-to-grid, never back to the corpus.
    */
  def qRollingRetentionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val uw = Tables.events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("week"))
      .distinct()
      .cutLineage(eager = false) // feeds the cohort min AND the grid rollup
    val first = uw.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val grid = uw.join(first, Seq("user_id"))
      .groupBy(col("cohort_week"),
        floor(datediff(col("week"), col("cohort_week")) / 7).cast("long")
          .as("week_offset"))
      // (user, week) pairs are already distinct, so a plain count IS
      // the distinct-user count — no second distinct shuffle
      .agg(count(lit(1)).as("n_users"))
    val sizes = grid.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    grid.join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        // exact-count quotient, emitted unrounded (tie-attractor rule)
        (col("n_users").cast("double") / col("cohort_size"))
          .as("retained_share"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  def qModalHour(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(max(struct(col("n"), (-col("hr")).as("neg_hr"))).as("m"),
        sum(col("n")).as("total"))
      .select(col("event_type"), (-col("m.neg_hr")).as("modal_hour"),
        col("m.n").as("n_at_mode"),
        (col("m.n").cast("double") / col("total")).as("mode_share"))
      .orderBy(col("event_type"))

  /** §2.2 `q_cramers_v` — Cramér's V association strength of the
    * event_type × day-of-week contingency table: the normalized
    * effect-size readout [[qChiSquare]]'s per-type χ² contributions
    * feed into (χ² alone grows with n; V = √(χ²/(n·min(r−1,c−1)))
    * is comparable across corpus sizes — the statistic a drift
    * monitor actually thresholds on).
    *
    * Same single-pass shape as qChiSquare: ONE scan builds the
    * ≤|types|×7 table, marginals are window sums over those bounded
    * rows. χ² sums float cell contributions in no guaranteed order,
    * so both outputs keep round(·,4) as the ulp-drift absorber (the
    * float-accumulation branch of the rounding rule, not the
    * exact-quotient branch).
    *
    * Unlike [[qChiSquare]] (whose per-type rows are a diagnostic
    * readout and document their observed-cells-only convention), V is
    * the thresholded statistic, so this op densifies the grid: an
    * EMPTY (type, dow) cell contributes (0−E)²/E = E, and since the
    * expected counts of the FULL r×c grid always sum to exactly n
    * (ΣᵣΣ꜀ row_n·col_n/n = n·n/n), the total empty-cell mass is
    * n − Σ_observed E in closed form — the dense-grid χ² without
    * materializing a single empty cell (r15, ADVICE r14: the sparse
    * convention understated V whenever a type missed a weekday, which
    * a scipy cross-check would flag as a bug).
    */
  def qCramersV(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dow = ((datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) + 3) % 7)
      .cast("long")
    val obs = Tables.events(spark, dir)
      .select(col("event_type"), dow.as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o"))
    val cells = obs
      .withColumn("row_n", sum(col("o")).over(Window.partitionBy(col("event_type"))))
      .withColumn("col_n", sum(col("o")).over(Window.partitionBy(col("dow"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
      .withColumn("exp", col("row_n").cast("double") * col("col_n") / col("n"))
      .withColumn("contrib",
        (col("o") - col("exp")) * (col("o") - col("exp")) / col("exp"))
    cells
      .agg(max(col("n")).as("n_events"),
        countDistinct(col("event_type")).as("n_rows"),
        countDistinct(col("dow")).as("n_cols"),
        sum(col("contrib")).as("chi2_obs"),
        sum(col("exp")).as("exp_obs"))
      .filter(least(col("n_rows"), col("n_cols")) > 1)
      // dense-grid χ²: empty cells contribute E each, and the full
      // grid's ΣE is exactly n — so add n − Σ_observed E
      .withColumn("chi2_raw",
        col("chi2_obs") + (col("n_events").cast("double") - col("exp_obs")))
      .select(col("n_events"), col("n_rows"), col("n_cols"),
        round(col("chi2_raw"), 4).as("chi2"),
        round(sqrt(col("chi2_raw") /
          (col("n_events") * (least(col("n_rows"), col("n_cols")) - 1))), 4)
          .as("cramers_v"))
  }
}
