package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Money._

/** Relational analytics core (SURVEY.md §2.2).
  *
  * Every query is declarative DataFrame code so Catalyst handles
  * predicate pushdown, column pruning, and join planning; small
  * dimension tables are explicitly `broadcast` so the fact-table scan
  * never shuffles for them. Aggregate outputs are rounded to fixed
  * decimals (matching the DuckDB oracle SQL in [[graft.SparkEntry]])
  * because double summation order differs between engines, and every
  * result carries a deterministic total ORDER BY.
  *
  * Scale notes (100 TB): the only shuffles here are on the
  * aggregation keys themselves (bounded-cardinality flags, nations,
  * priorities) after map-side partial aggregation, plus the one
  * unavoidable fact-fact shuffle in q3/q5 on the join key. Nothing
  * collects to the driver; nothing sorts globally except bounded
  * top-N (TakeOrdered).
  */
object Relational {

  /** Q1-shape pricing summary: single scan, partial-agg groupBy on a
    * 6-value composite key. No join, no wide shuffle.
    */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dollars(sum(priceC), 100.0).as("sum_base_price"),
        dollars(sum(netE4), 10000.0).as("sum_disc_price"),
        dollars(sum(chargeE6), 1000000.0).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (sum(priceC).cast("double") / lit(100.0) / count(lit(1))).as("avg_price"),
        (sum(discC).cast("double") / lit(100.0) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q3-shape shipping priority: broadcast the filtered customer dim,
    * shuffle orders↔lineitem on the order key once, bounded top-N via
    * TakeOrderedAndProject (no global sort).
    */
  def q3TopnJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(spark, dir).filter(col("o_orderdate") < lit("1998-07-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir).filter(col("l_shipdate") > lit("1998-07-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      // filtered customer still scales with SF — no hint, AQE decides
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dollars(sum(netE4), 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Q5-shape snowflake: region→nation→(customer, supplier) are all
    * broadcast; the single shuffle is lineitem↔orders on the order
    * key. Requires customer and supplier in the same nation.
    */
  def q5SnowflakeJoin(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.region(spark, dir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, dir)
    val cust = Tables.customer(spark, dir)
    val supp = Tables.supplier(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, dir)
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      // customer/supplier scale with SF — un-hinted (AQE broadcasts
      // them while they fit); nation/region are bounded dims
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp,
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dollars(sum(netE4), 10000.0).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Q6-shape forecast: pure pushed-down filter + scalar aggregate.
    * The parquet scan should show PushedFilters on shipdate/discount/
    * quantity and a 4-column ReadSchema.
    */
  def q6FilterSum(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(dollars(sum(discRevenueE4), 10000.0).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** EXISTS as left-semi join: orders having any near-full-quantity
    * line, aggregated by priority so output stays bounded.
    */
  def qExistsSemi(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir).filter(col("l_quantity") >= 49)
      .select(col("l_orderkey"))
    Tables.orders(spark, dir)
      .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        dollars(sum(cents(col("o_totalprice"))), 100.0).as("total_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** NOT EXISTS as left-anti join: customers with no orders at all,
    * per market segment. The orders side is reduced to its distinct
    * keys before the anti-join.
    */
  def qNotExistsAnti(spark: SparkSession, dir: String): DataFrame = {
    val ordKeys = Tables.orders(spark, dir).select(col("o_custkey")).distinct()
    Tables.customer(spark, dir)
      .join(ordKeys, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        dollars(sum(cents(col("c_acctbal"))), 100.0).as("sum_acctbal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Conditional (CASE-filtered) aggregates: codegen'd CASE inside the
    * partial aggregate, one scan.
    */
  def qConditionalAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
        sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
        dollars(sum(when(col("o_totalprice") > 200000, cents(col("o_totalprice"))).otherwise(lit(0L))), 100.0).as("big_total"),
        (sum(when(col("o_orderstatus") === "F", cents(col("o_totalprice"))).otherwise(lit(0L))).cast("double")
          / lit(100.0)
          / sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L))).as("avg_finished_price"))
      .orderBy(col("o_orderpriority"))

  /** §2.2#118 — explicit GROUPING SETS (the generalization rollup and
    * cube are sugar for): independent subtotal planes over order
    * priority and order status in ONE scan + one partial-agg shuffle,
    * instead of a UNION of two aggregations reading the fact twice.
    * Null group markers are coalesced to a sentinel so cross-engine
    * null-ordering differences can't touch the compare.
    */
  def qGroupingSets(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupingSets(
        Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
        col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        dollars(sum(cents(col("o_totalprice"))), 100.0).as("total_price"))
      .select(
        coalesce(col("o_orderpriority"), lit("(all)")).as("priority"),
        coalesce(col("o_orderstatus"), lit("(all)")).as("status"),
        col("n_orders"), col("total_price"))
      .orderBy(col("priority"), col("status"))

  /** Hierarchical rollup region→nation over customer balances.
    * GROUPING() disambiguates the subtotal rows exactly as the DuckDB
    * oracle does.
    */
  def qRollup(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(spark, dir)
    val nat = broadcast(Tables.nation(spark, dir))
    val reg = broadcast(Tables.region(spark, dir))
    cust.join(nat, col("c_nationkey") === col("n_nationkey"))
      .join(reg, col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        dollars(sum(cents(col("c_acctbal"))), 100.0).as("sum_acctbal"),
        grouping(col("r_name")).as("g_r"), grouping(col("n_name")).as("g_n"))
      .select(
        when(col("g_r") === 1, lit("ALL")).otherwise(col("r_name")).as("region_name"),
        when(col("g_n") === 1, lit("ALL")).otherwise(col("n_name")).as("nation_name"),
        col("n_customers"), col("sum_acctbal"))
      .orderBy(col("region_name"), col("nation_name"))
  }

  /** Pivot event_type counts per calendar day (fixed, known pivot key
    * set so the plan is a single partial-agg pass; the oracle uses
    * FILTERed counts).
    */
  def qPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(to_date(col("ts")).as("event_date"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("event_date"))

  /** Exact interpolated percentiles + dispersion per event type —
    * computed by the distributed rank join ([[Quantiles.exact]]), not
    * the `percentile` aggregate whose per-group in-memory value
    * buffer is the 100 TB OOM. Semantics match DuckDB `quantile_cont`.
    */
  def qPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val quants = Quantiles.exact(ev, "event_type", "value",
      Seq("p50" -> 0.5, "p90" -> 0.9, "p99" -> 0.99))
    val stats = ev.groupBy(col("event_type"))
      .agg(round(stddev(col("value")), 4).as("sd"),
        // money mean = exact cents / n, UNROUNDED: sum_cents/n is the
        // .xxxx5-attractor class where engine round() legitimately
        // disagrees (the r12 q_ewma lesson); the quotient itself is
        // bit-identical in both engines
        (sum(graft.analytics.Money.cents(col("value"))).cast("double") /
          count(lit(1)) / 100.0).as("mean"))
    quants.join(stats, Seq("event_type"))
      .select(col("event_type"),
        round(col("p50"), 4).as("p50"),
        round(col("p90"), 4).as("p90"),
        round(col("p99"), 4).as("p99"),
        col("sd"), col("mean"))
      .orderBy(col("event_type"))
  }

  /** Approximate-percentile scale path (t-digest sketch, memory
    * O(accuracy) per group instead of O(n) — the form that survives
    * unbounded group sizes at 100 TB). Sketch values are
    * engine-specific, so the oracle-checked surface is the accuracy
    * CONTRACT: the realized rank of each sketched quantile must sit
    * within 1% of the requested rank (t-digest at accuracy 10000
    * guarantees ~0.01%).
    */
  def qPercentilesApprox(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val approx = ev.groupBy(col("event_type"))
      .agg(expr("approx_percentile(value, array(0.5D, 0.9D, 0.99D), 10000)").as("ap"),
        count(lit(1)).as("n_events"))
      .select(col("event_type"), col("n_events"),
        element_at(col("ap"), 1).as("a50"),
        element_at(col("ap"), 2).as("a90"),
        element_at(col("ap"), 3).as("a99"))
    def realized(bound: Column): Column =
      sum(when(col("value") <= bound, 1L).otherwise(0L)).cast("double") / count(lit(1))
    val ranks = ev.join(broadcast(approx), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(realized(col("a50")).as("r50"),
        realized(col("a90")).as("r90"),
        realized(col("a99")).as("r99"))
    approx.join(ranks, Seq("event_type"))
      .select(col("event_type"), col("n_events"),
        (abs(col("r50") - 0.5) <= 0.01).as("p50_ok"),
        (abs(col("r90") - 0.9) <= 0.01).as("p90_ok"),
        (abs(col("r99") - 0.99) <= 0.01).as("p99_ok"))
      .orderBy(col("event_type"))
  }

  /** Exact distinct cardinality per event type (the approx/HLL twin is
    * exercised in ApproxSpec; the oracle checks the exact path).
    */
  def qDistinctHll(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))

  /** §2.2#114 — the HLL sketch path of distinct counting: the custom
    * mergeable [[graft.functions.HllAgg]] aggregate next to the exact
    * count. The oracle reproduces the md5 register construction in
    * SQL and checks BOTH the register digest and the estimate — the
    * sketch is engine-exact, not just "approximately right".
    */
  def qDistinctHllSketch(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"),
        graft.functions.HllAggFunctions.hll_sketch(col("user_id").cast("string")).as("hll"))
      .select(col("event_type"), col("n_exact"),
        round(col("hll.estimate"), 2).as("hll_estimate"),
        col("hll.reg_digest").as("reg_digest"))
      .orderBy(col("event_type"))

  /** §2.2#181 — decile concentration report: customers ranked into
    * revenue deciles, each decile's share of total revenue — the
    * "top 10% drives X%" deliverable. Per-customer partials shuffle
    * once; deciles come from the DISTRIBUTED exact rank of
    * [[Ranks.ntileBanded]] over $100k revenue bands — the band axis
    * is bounded by the revenue RANGE, not the customer count, so no
    * task ever sorts the whole customer dimension (the old global
    * ntile did; bit-identical buckets either way). Revenue shares
    * divide by a broadcast exact total; the decile rollup is 10 rows.
    */
  def qDecileReport(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
    val tot = perCust.agg(sum(col("rev_c")).as("tot_rev_c"))
    Ranks.ntileBanded(perCust, expr("-(rev_c div 10000000)"),
        Seq(col("rev_c").desc, col("o_custkey")), 10, "decile")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("rev_c")).as("decile_rev_c"))
      .crossJoin(broadcast(tot))
      .withColumn("rev_share",
        round(col("decile_rev_c").cast("double") / col("tot_rev_c"), 4))
      .drop("tot_rev_c")
      .orderBy(col("decile"))
  }

  /** §2.2#180 — incremental re-aggregation (materialized-view
    * maintenance): yesterday's stored partial aggregates merge with
    * today's delta by summing partials — no rescan of history. Sums
    * and counts are decomposable; the oracle computes the DIRECT
    * full aggregation, so the pass proves partial+delta ≡ direct.
    * The pattern that turns a daily 100 TB re-aggregation into a
    * delta-sized one.
    */
  def qIncrementalReagg(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).cast("long")
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), day.as("day"),
        round(col("value") * 10000).cast("long").as("value_e4"))
    val cutoff = 19730L // 2024-01-18: splits the 30-day window
    def partial(df: DataFrame): DataFrame = df.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value_e4")).as("sum_e4"))
    val stored = partial(ev.filter(col("day") < cutoff))
    val delta = partial(ev.filter(col("day") >= cutoff))
    stored.unionByName(delta)
      .groupBy(col("event_type"))
      .agg(sum(col("n")).as("n_events"), sum(col("sum_e4")).as("sum_value_e4"))
      .orderBy(col("event_type"))
  }

  /** §2.2#174 — Benford first-digit test over order totals: observed
    * leading-digit frequencies vs Benford's log10(1+1/d) expectation —
    * the classic fabricated-data / quality screen. First digits come
    * from exact integer cents (never double→string formatting), one
    * partial-agg pass, 9 output rows.
    */
  def qBenford(spark: SparkSession, dir: String): DataFrame = {
    val fd = substring(cents(col("o_totalprice")).cast("string"), 1, 1).cast("long")
    val counts = Tables.orders(spark, dir)
      .select(fd.as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy()
    counts
      // exact-count quotient, emitted unrounded (tie-attractor rule);
      // p_benford keeps its round as the log10 drift absorber
      .withColumn("p_observed",
        col("n").cast("double") / sum(col("n")).over(tot))
      .withColumn("p_benford",
        round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 4))
      .withColumn("abs_delta", round(abs(col("p_observed") - col("p_benford")), 4))
      .orderBy(col("digit"))
  }

  /** §2.2#167 — table profiler: per-column null counts, exact
    * distinct cardinality, and typed min/max over orders in ONE
    * aggregation pass (multiple COUNT DISTINCT → one Expand, no
    * per-column scans). Numeric bounds stay numeric and date/string
    * bounds stay strings — cross-engine double→string formatting is
    * never relied on. A nullable derived column keeps the null path
    * honest on a null-free table. At 100 TB the exact distincts
    * become HLL sketches (see q_distinct_hll_sketch); the one-pass
    * long-format shape is unchanged.
    */
  def qProfileTable(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .withColumn("o_prio_null",
        when(col("o_orderkey") % 7 === 0, lit(null: String))
          .otherwise(col("o_orderpriority")))
    val numCols = Seq(
      "o_orderkey" -> col("o_orderkey").cast("double"),
      "o_custkey" -> col("o_custkey").cast("double"),
      "o_totalprice" -> col("o_totalprice"))
    val strCols = Seq(
      "o_orderstatus" -> col("o_orderstatus"),
      "o_orderpriority" -> col("o_orderpriority"),
      "o_prio_null" -> col("o_prio_null"),
      "o_orderdate" -> to_date(col("o_orderdate")).cast("string"))
    // melt → (col_name, value) → two-level aggregate: the first level
    // partial-aggs on (col, value) so distinct counting, null counts,
    // and bounds all come out of ONE shuffled pass per type branch —
    // the naive 7×COUNT(DISTINCT) single-agg form planned an Expand
    // that ran 4× slower than the whole rest of the profile
    def profile[T](cols: Seq[(String, Column)], isNum: Boolean): DataFrame = {
      val melted = base.select(explode(array(cols.map { case (n, c) =>
        struct(lit(n).as("c"), c.as("v"))
      }: _*)).as("p")).select(col("p.c").as("col_name"), col("p.v").as("v"))
      melted.groupBy(col("col_name"), col("v")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("col_name"))
        .agg(sum(when(col("v").isNull, col("cnt")).otherwise(0L)).as("n_nulls"),
          sum(when(col("v").isNotNull, 1L).otherwise(0L)).as("n_distinct"),
          min(col("v")).as("mn"), max(col("v")).as("mx"))
        .select(col("col_name"), col("n_nulls"), col("n_distinct"),
          (if (isNum) col("mn") else lit(null: String).cast("double")).as("min_num"),
          (if (isNum) col("mx") else lit(null: String).cast("double")).as("max_num"),
          (if (isNum) lit(null: String) else col("mn")).as("min_str"),
          (if (isNum) lit(null: String) else col("mx")).as("max_str"))
    }
    profile(numCols, isNum = true)
      .unionByName(profile(strCols, isNum = false))
      .orderBy(col("col_name"))
  }

  /** §2.2#166 — HLL sketch algebra: union/intersection distinct-user
    * estimates across event-type pairs from the RAW registers
    * ([[graft.functions.HllRegsAgg]]). The fact table is scanned
    * ONCE to build one 64-byte sketch per type; unions are
    * element-wise register max (`zip_with`+`greatest`) over the
    * bounded |types|² pairs and intersections follow by
    * inclusion-exclusion — the whole algebra is a post-pass on
    * sketches, which is what makes cross-segment overlap questions
    * O(segments) instead of O(data) at 100 TB. Exact intersection
    * counts ride along for error reference.
    */
  def qHllSetops(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.HllAggFunctions.hll_registers
    val ev = Tables.events(spark, dir).select(col("event_type"), col("user_id"))
    val regs = ev.groupBy(col("event_type"))
      .agg(hll_registers(col("user_id").cast("string")).as("regs"))
    def est(regsCol: String): Column = {
      val sInt = expr(
        s"aggregate($regsCol, CAST(0 AS BIGINT), (acc, r) -> acc + CAST(pow(2, 30 - r) AS BIGINT))")
      val vZero = expr(
        s"aggregate($regsCol, CAST(0 AS BIGINT), (acc, r) -> acc + (CASE WHEN r = 0 THEN 1 ELSE 0 END))")
      val raw = lit(0.709 * 4096.0 * 1073741824.0) / sInt.cast("double")
      when(raw <= 160.0 && vZero > 0,
        lit(64.0) * log(lit(64.0) / vZero.cast("double"))).otherwise(raw)
    }
    val a = regs.select(col("event_type").as("type_a"), col("regs").as("ra"))
    val b = regs.select(col("event_type").as("type_b"), col("regs").as("rb"))
    val du = ev.distinct()
    val exactBoth = du.as("x").join(du.as("y"),
        col("x.user_id") === col("y.user_id") &&
        col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_exact_intersect"))
    a.crossJoin(broadcast(b))
      .filter(col("type_a") < col("type_b"))
      .withColumn("ru", zip_with(col("ra"), col("rb"), (x, y) => greatest(x, y)))
      .withColumn("est_a", est("ra"))
      .withColumn("est_b", est("rb"))
      .withColumn("est_u", est("ru"))
      .join(exactBoth, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"),
        coalesce(col("n_exact_intersect"), lit(0L)).as("n_exact_intersect"),
        round(col("est_u"), 2).as("hll_union_est"),
        round(col("est_a") + col("est_b") - col("est_u"), 2).as("hll_intersect_est"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** Batch twin of the streaming windowed aggregation (SURVEY §2.7):
    * hourly tumbling windows per event type.
    */
  def qStreamBatchTwin(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("hour_start"), col("event_type"))

  /** §2.2#58 — Q10-shape returned-item report: top 20 customers by
    * revenue lost to returns in a quarter. Fact-fact shuffle on the
    * order key, broadcast customer/nation dims, bounded top-N.
    */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      // customer scales with SF — no hint (AQE decides); nation is bounded
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(dollars(sum(netE4), 10000.0).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** §2.2#54 — CUBE over status × priority with money-exact totals;
    * GROUPING() labels the subtotal planes.
    */
  def qCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        dollars(sum(cents(col("o_totalprice"))), 100.0).as("total_price"),
        grouping(col("o_orderstatus")).as("g_s"), grouping(col("o_orderpriority")).as("g_p"))
      .select(
        when(col("g_s") === 1, lit("ALL")).otherwise(col("o_orderstatus")).as("status"),
        when(col("g_p") === 1, lit("ALL")).otherwise(col("o_orderpriority")).as("priority"),
        col("n_orders"), col("total_price"))
      .orderBy(col("status"), col("priority"))

  /** §2.2#55 — deterministic hash sampling: keep rows whose md5 of a
    * stable composite key starts below a hex threshold (≈10%). Unlike
    * `sample()`, this is reproducible across engines, runs and
    * cluster layouts — the right way to cut an experimentation slice
    * from a 100 TB table.
    */
  def qSampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(substring(md5(concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string"))), 1, 2) < "1a")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))

  /** §2.2 — stratified deterministic sampling: a different hash
    * threshold per stratum (return flag), so rare classes keep a
    * higher fraction than dominant ones — the class-balancing sampler
    * a training-data pipeline runs ahead of an expensive stage. Same
    * md5-prefix device as [[qSampleHash]]: one narrow scan, no
    * shuffle before the aggregate, reproducible across engines and
    * runs (no RNG state), and at 100 TB the filter evaluates inside
    * the scan.
    */
  def qSampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val h = substring(md5(concat(col("l_orderkey").cast("string"), lit("-"),
      col("l_linenumber").cast("string"))), 1, 2)
    // per-stratum keep-fractions as hex-prefix thresholds:
    // A ≈ 10% ("1a"/256), N ≈ 2% ("05"/256), R ≈ 5% ("0d"/256)
    val keep = when(col("l_returnflag") === "A", h < "1a")
      .when(col("l_returnflag") === "N", h < "05")
      .otherwise(h < "0d")
    Tables.lineitem(spark, dir)
      .filter(keep)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** §2.2#56 — set operations: building-segment customers who placed
    * a big order but never a finished one (INTERSECT then EXCEPT,
    * explicit order).
    */
  def qSetOps(spark: SparkSession, dir: String): DataFrame = {
    val building = Tables.customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("custkey"))
    val big = Tables.orders(spark, dir)
      .filter(col("o_totalprice") > 100000).select(col("o_custkey").as("custkey"))
    val finished = Tables.orders(spark, dir)
      .filter(col("o_orderstatus") === "F").select(col("o_custkey").as("custkey"))
    building.intersect(big).except(finished).orderBy(col("custkey"))
  }

  /** §2.2#57 — scalar-subquery shape: orders above twice the global
    * mean price, per priority. The scalar aggregate is broadcast into
    * the scan's filter rather than collected on the driver.
    */
  def qScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val avgPrice = Tables.orders(spark, dir).agg(avg(col("o_totalprice")).as("avg_price"))
    Tables.orders(spark, dir)
      .crossJoin(broadcast(avgPrice))
      .filter(col("o_totalprice") > col("avg_price") * 2)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_big"),
        dollars(sum(cents(col("o_totalprice"))), 100.0).as("big_total"))
      .orderBy(col("o_orderpriority"))
  }

  /** §2.2#61 — full outer join: per-nation customer/supplier balance
    * comparison where either side may be absent; COALESCE'd keys and
    * grouped totals.
    */
  def qFullOuter(spark: SparkSession, dir: String): DataFrame = {
    val custN = Tables.customer(spark, dir)
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        dollars(sum(cents(col("c_acctbal"))), 100.0).as("cust_bal"))
    val suppN = Tables.supplier(spark, dir)
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        dollars(sum(cents(col("s_acctbal"))), 100.0).as("supp_bal"))
    custN.withColumnRenamed("nationkey", "c_nk")
      .join(suppN.withColumnRenamed("nationkey", "s_nk"),
        col("c_nk") === col("s_nk"), "full_outer")
      .select(coalesce(col("c_nk"), col("s_nk")).as("nationkey"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"),
        col("cust_bal"), col("supp_bal"))
      .orderBy(col("nationkey"))
  }

  /** §2.2#62 — datetime decomposition: order counts by calendar
    * hierarchy (year, quarter, month) plus day-of-month extremes.
    */
  def qDateParts(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mon"))
      .agg(count(lit(1)).as("n_orders"),
        min(dayofmonth(col("o_orderdate"))).cast("long").as("first_dom"),
        max(dayofmonth(col("o_orderdate"))).cast("long").as("last_dom"))
      .select(col("yr").cast("long").as("yr"), col("qtr").cast("long").as("qtr"),
        col("mon").cast("long").as("mon"), col("n_orders"), col("first_dom"), col("last_dom"))
      .orderBy(col("yr"), col("qtr"), col("mon"))

  /** §2.2#63 — string-function projection over part names: the
    * engine-portable core string surface in one pass.
    */
  def qStringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(col("p_partkey"),
        upper(col("p_brand")).as("brand_upper"),
        lower(col("p_type")).as("type_lower"),
        length(col("p_name")).cast("long").as("name_len"),
        substring(col("p_name"), 1, 5).as("name_prefix"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        reverse(col("p_brand")).as("brand_rev"),
        replace(col("p_type"), lit(" "), lit("_")).as("type_snake"),
        instr(col("p_type"), "BRASS").cast("long").as("brass_pos"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  /** §2.2#72 — fixed-width histogram over order totals: bucket
    * arithmetic is plain floor division (identical in every engine,
    * unlike width_bucket variants), partial-agg counts.
    */
  def qHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(least(floor(col("o_totalprice") / 50000), lit(9)).cast("long").as("bucket"),
        col("o_totalprice"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        dollars(sum(cents(col("o_totalprice"))), 100.0).as("bucket_total"))
      .orderBy(col("bucket"))

  /** §2.2#75 — correlated aggregate (orders above their own
    * customer's average) rewritten as a window: the scalable form of
    * `price > (SELECT avg(...) WHERE custkey = outer.custkey)` — one
    * shuffle on the correlation key instead of a re-executed
    * subquery.
    */
  def qCorrelatedAgg(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
    Tables.orders(spark, dir)
      .withColumn("cust_avg", avg(col("o_totalprice")).over(w))
      .filter(col("o_totalprice") > col("cust_avg"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_above_avg"),
        dollars(sum(cents(col("o_totalprice"))), 100.0).as("above_total"))
      .orderBy(col("o_orderpriority"))
  }

  /** §2.2#77 — JSON property extraction (`props` carries a JSON
    * payload): parse once in the scan projection, aggregate the
    * extracted field. At 100 TB the lesson is the shape: extraction
    * lives in the codegen'd projection, never a UDF.
    */
  def qJsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        countDistinct(col("k")).as("n_distinct_k"))
      .orderBy(col("event_type"))

  /** §2.2#78 — argmin/argmax aggregates: which user produced the
    * extreme value per event type. The comparison key is made unique
    * (value cents ⊕ event id) so the answer is deterministic in any
    * engine.
    */
  def qMinmaxBy(spark: SparkSession, dir: String): DataFrame = {
    val uniq = (cents(col("value")) * 10000000L + col("event_id")).as("m")
    Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id"), uniq)
      .groupBy(col("event_type"))
      .agg(max_by(col("user_id"), col("m")).as("top_value_user"),
        min_by(col("user_id"), col("m")).as("bottom_value_user"),
        count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** §2.2#79 — built-in session windows: Spark's `session_window`
    * (30-minute gap) aggregated per user; the oracle reproduces the
    * semantics with the portable lag→cumsum formulation, pinning the
    * two definitions to each other.
    */
  def qSessionWindow(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("n_events")).as("max_session_events"))
      .orderBy(col("user_id"))

  /** §2.2#83 — MERGE/upsert semantics without a table format:
    * current dim ⟗ incoming changes, change rows win, inserts append
    * — the declarative core of `MERGE INTO`. Changes are derived
    * deterministically (every 7th customer re-balanced, every 13th a
    * new row) and the merged view is aggregated per segment for a
    * compact oracle.
    */
  def qUpsertMerge(spark: SparkSession, dir: String): DataFrame = {
    val current = Tables.customer(spark, dir)
      .select(col("c_custkey").as("key"), col("c_mktsegment").as("segment"),
        cents(col("c_acctbal")).as("bal_c"))
    val changes = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey").as("key"), lit("UPDATED").as("segment"),
        (cents(col("c_acctbal")) + 100000L).as("bal_c"))
      .unionByName(Tables.customer(spark, dir)
        .filter(col("c_custkey") % 13 === 0)
        .select((col("c_custkey") + 1000000L).as("key"), lit("INSERTED").as("segment"),
          cents(col("c_acctbal")).as("bal_c")))
    val merged = current.withColumnRenamed("key", "c_key").as("cur")
      .join(changes.withColumnRenamed("key", "u_key").as("upd"),
        col("c_key") === col("u_key"), "full_outer")
      .select(coalesce(col("u_key"), col("c_key")).as("key"),
        coalesce(col("upd.segment"), col("cur.segment")).as("segment"),
        coalesce(col("upd.bal_c"), col("cur.bal_c")).as("bal_c"))
    merged.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_rows"), dollars(sum(col("bal_c")), 100.0).as("total_bal"))
      .orderBy(col("segment"))
  }

  /** §2.2#91 — HAVING: post-aggregation predicate on the aggregate
    * itself (parts appearing on 40+ order lines).
    */
  def qHaving(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"), sum(col("l_quantity")).as("total_qty"))
      .filter(col("n_lines") >= 40)
      .orderBy(col("l_partkey"))

  /** §2.2#92 — null-handling semantics: nulls derived via NULLIF,
    * then COALESCE defaults, null-safe equality (`<=>` / IS NOT
    * DISTINCT FROM), and null-aware counting — the exact corner
    * semantics ports get wrong.
    */
  def qNullSemantics(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority"),
        nullif(col("o_orderstatus"), lit("P")).as("status_np"),
        nullif(col("o_orderstatus"), lit("O")).as("status_no"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("status_np")).as("n_nonnull_np"),
        count(col("status_no")).as("n_nonnull_no"),
        sum(when(col("status_np") <=> col("status_no"), 1L).otherwise(0L)).as("n_nullsafe_eq"),
        sum(when(coalesce(col("status_no"), lit("X")) === "X", 1L).otherwise(0L)).as("n_defaulted"))
      .orderBy(col("o_orderpriority"))

  /** §2.2#97 — robust dispersion: median absolute deviation around
    * the per-type median. Both medians come from the distributed rank
    * join ([[Quantiles.exact]]) — no per-group value buffering.
    */
  def qMedianAbsDev(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val med = Quantiles.exact(ev, "event_type", "value", Seq("med" -> 0.5))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .select(col("event_type"), abs(col("value") - col("med")).as("absdev"))
    val mad = Quantiles.exact(dev, "event_type", "absdev", Seq("mad" -> 0.5))
    dev.groupBy(col("event_type"))
      .agg(round(avg(col("absdev")), 4).as("mean_abs_dev"),
        count(lit(1)).as("n_events"))
      .join(broadcast(mad), Seq("event_type"))
      .select(col("event_type"), round(col("mad"), 4).as("mad"),
        col("mean_abs_dev"), col("n_events"))
      .orderBy(col("event_type"))
  }

  /** §2.2 `q_basket_size_hist` — order-size distribution: lines per
    * order (naturally small and bounded) rolled into a histogram with
    * per-size order counts, revenue share, and average order value —
    * the basket-shape readout behind pricing/bundling analysis. Two
    * partial aggs on one order-key shuffle; the output is ~a dozen rows at
    * any scale.
    */
  def qBasketSizeHist(spark: SparkSession, dir: String): DataFrame = {
    val perOrder = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"), sum(Money.priceC).as("price_c"))
    perOrder.groupBy(col("n_lines"))
      .agg(count(lit(1)).as("n_orders"),
        Money.dollars(sum(col("price_c")), 100.0).as("revenue"))
      .select(col("n_lines"), col("n_orders"), col("revenue"),
        round(col("revenue") / col("n_orders"), 4).as("avg_order_value"))
      .orderBy(col("n_lines"))
  }

  /** §2.2 `q_order_aging` — open-order aging report: orders still
    * open (`o_orderstatus = 'O'`) bucketed by age at the corpus
    * as-of date (max order date) into the standard 90/180/365/365+
    * day bands, per priority — counts and exact-cents value. The
    * as-of date is a one-row broadcast scalar; the rest is a pushed
    * status filter and one partial-agg pass to a bounded
    * |priorities|×4 grid (the receivables/backlog dashboard shape).
    */
  def qOrderAging(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val asOf = orders.agg(max(to_date(col("o_orderdate"))).as("as_of"))
    val age = datediff(col("as_of"), to_date(col("o_orderdate"))).cast("long")
    orders.filter(col("o_orderstatus") === "O")
      .crossJoin(broadcast(asOf))
      .select(col("o_orderpriority").as("priority"),
        when(age <= 90, "000-090").when(age <= 180, "091-180")
          .when(age <= 365, "181-365").otherwise("365+").as("age_band"),
        Money.cents(col("o_totalprice")).as("price_c"))
      .groupBy(col("priority"), col("age_band"))
      .agg(count(lit(1)).as("n_orders"),
        Money.dollars(sum(col("price_c")), 100.0).as("open_value"))
      .orderBy(col("priority"), col("age_band"))
  }

  /** §2.2 `q_winsorized_mean` — robust mean via winsorization: values
    * clamped to their type's exact [p5, p95] band before averaging
    * (the outlier-resistant aggregate a metrics pipeline publishes
    * next to the raw mean), plus the share of rows the clamp touched.
    * The percentile bounds come from the distributed exact-quantile
    * rank join ([[Quantiles.exact]]) and broadcast back over the scan
    * — two passes, no per-group buffering, same shape at any key
    * cardinality.
    */
  def qWinsorizedMean(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val bounds = Quantiles.exact(ev, "event_type", "value",
      Seq("lo" -> 0.05, "hi" -> 0.95))
    ev.join(broadcast(bounds), Seq("event_type"))
      .select(col("event_type"), col("value"), col("lo"), col("hi"),
        greatest(col("lo"), least(col("hi"), col("value"))).as("wv"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // raw money mean: exact cents / n, unrounded (tie-attractor
        // class); the winsorized mean keeps its round — clamped rows
        // take interpolated quantile bounds, so its sum is a genuine
        // float accumulation and round() is the drift absorber
        (sum(graft.analytics.Money.cents(col("value"))).cast("double") /
          count(lit(1)) / 100.0).as("raw_mean"),
        round(avg(col("wv")), 4).as("winsorized_mean"),
        (sum(when(col("value") < col("lo") || col("value") > col("hi"), 1L)
          .otherwise(0L)).cast("double") / count(lit(1)) * 100).as("pct_clamped"))
      .orderBy(col("event_type"))
  }

  /** Skew-resistant join, hot-key-only (the production pattern; the
    * r9 version exploded the ENTIRE dimension ×8, a self-inflicted 8×
    * shuffle at 100 TB). A deterministic ~1/4 hash sample of the fact
    * side estimates per-key frequencies; only keys above the hot
    * threshold — cut to the top [[HotKeyTopK]] by estimate, so the
    * hot set is bounded by a LITERAL, not by the corpus — are salted:
    * hot fact rows take a row-derived salt, hot dimension rows alone
    * are exploded across the salt replicas, and the cold long tail
    * joins unsalted (salt 0). The ≤[[HotKeyTopK]]-row hot set is
    * COLLECTED ONCE into a driver-side literal `isin` predicate, so
    * both join sides consume the SAME hot-key choice by construction
    * — the former two-broadcast form evaluated the (merge-order-
    * sensitive) Misra–Gries frame twice and was only consistent via
    * broadcast-exchange reuse, an optimizer optimization rather than
    * a contract (r10 ADVICE). Result is provably identical to the
    * unsalted join for ANY single hot-key choice — the oracle IS the
    * plain join, so the engine-specific sampling hash never leaks
    * into correctness. AQE's skew handling covers the runtime case;
    * this operator is the explicit/static variant for engines or key
    * distributions where AQE can't see the skew.
    */
  def qJoinSkewSalt(spark: SparkSession, dir: String): DataFrame = {
    val salts = 8
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
    // bounded pushdown parameter: ≤ HotKeyTopK longs on the driver
    val hotSet: Array[Long] = hotKeys(li, col("l_orderkey"), col("l_linenumber"), salts)
      .collect().map(_.getLong(0))
    def isHot(key: Column): Column =
      if (hotSet.isEmpty) lit(false) else key.isInCollection(hotSet)
    val liS = li.withColumn("salt",
      when(isHot(col("l_orderkey")), pmod(col("l_linenumber"), lit(salts)))
        .otherwise(lit(0)).cast("int"))
    val ordS = ord.withColumn("salt", explode(when(isHot(col("o_orderkey")),
      lit((0 until salts).toArray)).otherwise(array(lit(0)))))
    liS.join(ordS, liS("l_orderkey") === ordS("o_orderkey") && liS("salt") === ordS("salt"))
      .groupBy(col("o_orderstatus"))
      .agg(dollars(sum(netE4), 10000.0).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderstatus"))
  }

  /** The hot-key readout behind [[qJoinSkewSalt]]: per-key fact-side
    * frequencies estimated by the Misra–Gries sketch on a
    * deterministic 1/4 hash row-sample — ONE narrow pass with an
    * O(capacity) buffer and map-side combine (no shuffle keyed by the
    * key axis: the first cut of this readout ran a groupBy over every
    * sampled key, a |keys|-cardinality shuffle that cost more than
    * the salting saved). Any key above HotKeyRowThreshold is
    * guaranteed to survive the sketch whenever threshold >
    * sampled-rows/(capacity+1) — comfortably true for skew heavy
    * enough to need salting — and the frame is bounded by the LITERAL
    * capacity at any corpus size. MG undercounts by at most that same
    * bound, so the estimate is scaled back up before the threshold
    * cut; false negatives near the threshold are harmless (those keys
    * simply join unsalted, exactly like AQE missing mild skew).
    */
  val HotKeyRowThreshold = 16L
  val HotKeyCapacity = 256
  /** Final cut: only the top-64 keys by estimated frequency are
    * salted. Salting buys nothing below the very top of the skew
    * curve, and the cut makes the driver-side literal provably tiny.
    */
  val HotKeyTopK = 64
  def hotKeys(fact: DataFrame, key: Column, rowDiscriminator: Column,
      salts: Int): DataFrame =
    fact.filter(pmod(hash(key, rowDiscriminator), lit(4)) === 0)
      .agg(graft.functions.FreqItemsAggFunctions
        .freq_items_sketch(key.cast("string"), HotKeyCapacity).as("sketch"))
      .select(explode(col("sketch")).as(Seq("hot_key_s", "est")))
      .filter(col("est") * 4 >= HotKeyRowThreshold)
      .orderBy(col("est").desc, col("hot_key_s"))
      .limit(HotKeyTopK)
      .select(col("hot_key_s").cast("long").as("hot_key"))

  /** §2.2#150 — unpivot (wide → long): the four lineitem money/qty
    * measures melt into (measure, cents) rows via the native
    * `Dataset.unpivot` (Catalyst `Unpivot` node — a narrow 4×
    * row-expansion, no shuffle), then a bounded |flags|×|measures|
    * rollup. All measures are exact integer hundredths so the sums
    * are order-independent at any parallelism.
    */
  def qUnpivot(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(col("l_returnflag"),
        cents(col("l_quantity")).as("qty_c"),
        priceC.as("price_c"), discC.as("disc_c"), taxC.as("tax_c"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("qty_c"), col("price_c"), col("disc_c"), col("tax_c")),
        "measure", "cents")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("total_c"))
      .orderBy(col("l_returnflag"), col("measure"))

  /** §2.2#157 — higher-order moments: per-flag skewness (g1) and
    * excess kurtosis (g2) derived from exact integer power sums
    * s1..s4 over whole-unit quantities, so the partial aggregation is
    * order-independent and both engines compute the identical IEEE
    * doubles from the identical integers. s4 ≤ 50⁴·n keeps BIGINT
    * headroom to ~10¹² rows; past that the same shape runs on
    * DECIMAL(38,0) sums.
    */
  def qMoments(spark: SparkSession, dir: String): DataFrame = {
    val q = round(col("l_quantity")).cast("long")
    val agg = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), q.as("q"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s1"),
        sum(col("q") * col("q")).as("s2"),
        sum(col("q") * col("q") * col("q")).as("s3"),
        sum(col("q") * col("q") * col("q") * col("q")).as("s4"))
    val n = col("n").cast("double")
    val mean = col("s1") / n
    val m2 = col("s2") / n - mean * mean
    val m3 = col("s3") / n - lit(3) * mean * col("s2") / n + lit(2) * mean * mean * mean
    val m4 = col("s4") / n - lit(4) * mean * col("s3") / n +
      lit(6) * mean * mean * col("s2") / n - lit(3) * mean * mean * mean * mean
    agg.select(col("l_returnflag"), col("n"),
        round(mean, 4).as("mean_qty"),
        round(m3 / pow(m2, 1.5), 4).as("skewness"),
        round(m4 / (m2 * m2) - lit(3), 4).as("excess_kurtosis"))
      .orderBy(col("l_returnflag"))
  }

  /** §2.2#158 — ratio-to-report: each nation's share of global
    * revenue. Exact integer partial sums shuffle once on the bounded
    * nation key; the global total is a window over those ≤25 rows,
    * one IEEE division per row at the end.
    */
  def qPercentOfTotal(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.lineitem(spark, dir)
      // supplier scales with SF — no hint (AQE decides); nation is bounded
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(netE4).as("rev_e4"))
    rev.withColumn("pct_share",
        round(col("rev_e4").cast("double") * 100 /
          sum(col("rev_e4")).over(Window.partitionBy()).cast("double"), 4))
      .select(col("n_name"), dollars(col("rev_e4"), 10000.0).as("revenue"), col("pct_share"))
      .orderBy(col("n_name"))
  }

  /** §2.2#159 — fuzzy self-join (record linkage): near-identical
    * part names by Jaro-Winkler similarity. The scale shape is
    * dedupe-then-block: distinct names first (the expensive pairwise
    * metric runs once per distinct pair, not per row pair), blocked
    * on the first name token so candidate generation is an equi-join
    * — never an all-pairs crossJoin. The metric itself is the native
    * [[graft.functions.JaroWinkler]] expression.
    */
  def qFuzzyJoin(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.JaroWinkler.jaro_winkler
    graft.plans.FuzzyPrefilter.ensureRegistered(spark)
    val names = Tables.part(spark, dir)
      .select(col("p_name").as("name"))
      .groupBy(col("name")).agg(count(lit(1)).as("n_parts"))
      .withColumn("blk", split(col("name"), " ").getItem(0))
    val a = names.select(col("blk"), col("name").as("name_a"), col("n_parts").as("n_a"))
    val b = names.select(col("blk"), col("name").as("name_b"), col("n_parts").as("n_b"))
    a.join(b, Seq("blk"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("jw", round(jaro_winkler(col("name_a"), col("name_b")), 4))
      .filter(col("jw") >= 0.88)
      .select(col("name_a"), col("name_b"), col("n_a"), col("n_b"), col("jw"))
      .orderBy(col("name_a"), col("name_b"))
  }

  /** §2.2#151 — weighted median: the smallest quantity whose
    * cumulative extended-price weight reaches half the group total.
    * Weights are pre-aggregated per (flag, value) — a scalable
    * partial-agg shuffle that shrinks the window input from row
    * count to value cardinality (≤ |flags|×|distinct qty|, ~150
    * rows at any data scale) — then one running-sum window finds the
    * crossing value. The mid-run crossing of the ungrouped
    * formulation lands on the same value: cumulative weight at a
    * value's full run bounds every prefix of that run.
    */
  def qWeightedMedian(spark: SparkSession, dir: String): DataFrame = {
    val grouped = Tables.lineitem(spark, dir)
      .select(col("l_returnflag"), cents(col("l_quantity")).as("qty_c"), priceC.as("w"))
      .groupBy(col("l_returnflag"), col("qty_c"))
      .agg(sum(col("w")).as("w"))
    val run = Window.partitionBy(col("l_returnflag")).orderBy(col("qty_c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy(col("l_returnflag"))
    grouped.withColumn("cum_w", sum(col("w")).over(run))
      .withColumn("tot_w", sum(col("w")).over(whole))
      .filter(col("cum_w") * 2 >= col("tot_w"))
      .groupBy(col("l_returnflag"))
      .agg(min(col("qty_c")).as("wmedian_qty_c"), max(col("tot_w")).as("tot_weight_c"))
      .orderBy(col("l_returnflag"))
  }

  /** §2.2#267 — Pareto concentration: the smallest customer prefix
    * (by revenue, descending) covering ≥80% of total revenue. The
    * global rank AND running revenue sum come from
    * [[Ranks.globalRankCumSum]] — banded, never a single-task sort of
    * the customer dimension. The 80% cut compares exact longs
    * (`5·(cum−rev) < 4·tot`): a customer is IN while the revenue
    * before them is under the threshold, identical to the oracle's
    * window-cumsum filter. Revenue cents at 100 TB are ~10¹⁶, two
    * orders under the scaled-compare overflow bound.
    */
  def qParetoShare(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("rev_c"))
    val tot = perCust.agg(sum(col("rev_c")).as("tot_rev_c"),
      count(lit(1)).as("n_customers"))
    Ranks.globalRankCumSum(perCust, expr("-(rev_c div 10000000)"),
        Seq(col("rev_c").desc, col("o_custkey")), col("rev_c"),
        "rnk", "cum_rev_c")
      .crossJoin(broadcast(tot))
      .filter((col("cum_rev_c") - col("rev_c")) * 5 < col("tot_rev_c") * 4)
      .groupBy(col("n_customers"), col("tot_rev_c"))
      .agg(max(col("rnk")).as("n_top"), max(col("cum_rev_c")).as("top_rev_c"))
      // exact count/cents quotients, emitted unrounded (tie rule)
      .select(col("n_customers"), col("n_top"),
        (col("n_top").cast("double") / col("n_customers"))
          .as("cust_share"),
        col("top_rev_c"), col("tot_rev_c"),
        (col("top_rev_c").cast("double") / col("tot_rev_c"))
          .as("rev_share"))
  }

  /** §2.2#268 — repeat-purchase cadence: days between consecutive
    * orders per customer (lag over the customer-partitioned window —
    * distributed), bucketed into bounded recency bands. The mean per
    * band is one double division over an exact day-count sum.
    */
  def qRepeatInterval(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("d"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("d"))
      .withColumn("prev_d", lag(col("d"), 1).over(w))
      .filter(col("prev_d").isNotNull)
      .withColumn("gap_days", datediff(col("d"), col("prev_d")).cast("long"))
      .withColumn("bucket",
        when(col("gap_days") <= 7, "a_0_7")
          .when(col("gap_days") <= 30, "b_8_30")
          .when(col("gap_days") <= 90, "c_31_90")
          .otherwise("d_90_plus"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        (sum(col("gap_days")).cast("double") / count(lit(1))).as("avg_days"),
        min(col("gap_days")).as("min_days"), max(col("gap_days")).as("max_days"))
      .orderBy(col("bucket"))
  }

  /** §2.2 `q_hhi` — Herfindahl–Hirschman revenue-concentration index
    * per nation: HHI = Σᵢ shareᵢ² over each nation's suppliers — the
    * sourcing-concentration readout (1/HHI is the "effective supplier
    * count") that complements [[qParetoShare]]'s top-decile view.
    *
    * Shares never materialize: with exact integer revenues rᵢ
    * (netE4 units), HHI = Σrᵢ² / (Σrᵢ)², so one shuffle reduces
    * lineitem to (nation, supplier) exact sums, a second bounded agg
    * accumulates Σr and Σr² in decimal(38,0) (rᵢ ~10¹³ → rᵢ² ~10²⁶,
    * far past long), and the single float op is the final division —
    * exact-quotient, emitted unrounded. The supplier→nation map is a
    * broadcast dim join; nothing data-scale crosses the network twice.
    */
  def qHhi(spark: SparkSession, dir: String): DataFrame = {
    val bySupp = Tables.lineitem(spark, dir)
      .select(col("l_suppkey"), Money.netE4.as("r"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("r")).as("r"))
    val suppNation = Tables.supplier(spark, dir)
      .select(col("s_suppkey"), col("s_nationkey"))
    val nation = Tables.nation(spark, dir)
      .select(col("n_nationkey"), col("n_name"))
    bySupp.join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      // both reductions in decimal(38,0): Σr alone passes 2^63 around
      // 10⁵× this corpus, and Σr² already at sf0.001
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("r").cast("decimal(38,0)")).as("rev_sum"),
        sum(col("r").cast("decimal(38,0)") * col("r")).as("rev_sq"))
      .select(col("n_name"), col("n_suppliers"),
        Money.dollars(col("rev_sum"), 10000.0).as("revenue"),
        (col("rev_sq").cast("double") /
          (col("rev_sum").cast("double") * col("rev_sum").cast("double")))
          .as("hhi"))
      .orderBy(col("n_name"))
  }

  /** §2.2#329 `q_abc_class` — ABC inventory classification: parts
    * ranked by gross revenue, classed A (inside the top 80% of
    * cumulative revenue), B (80–95%], C (rest). Class boundaries are
    * pure integer comparisons on exact cents (cum·5 ≤ tot·4,
    * cum·20 ≤ tot·19) so the partition of parts is engine-exact; the
    * part/revenue shares are exact count/cents quotients emitted
    * unrounded (tie rule).
    *
    * Scale: the global revenue cumsum over the entity-scale part axis
    * goes through [[Ranks.globalRankCumSum]] — per-band partitioned
    * windows plus a broadcast band-offset join, never one
    * unpartitioned window over all parts.
    */
  def qAbcClass(spark: SparkSession, dir: String): DataFrame = {
    val perPart = Tables.lineitem(spark, dir)
      .select(col("l_partkey"), cents(col("l_extendedprice")).as("r"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("r")).as("rev_c"))
    val tot = perPart.agg(sum(col("rev_c")).as("tot_c"),
      count(lit(1)).as("n_total"))
    Ranks.globalRankCumSum(perPart, expr("-(rev_c div 10000000)"),
        Seq(col("rev_c").desc, col("l_partkey")), col("rev_c"),
        "rnk", "cum_c")
      .crossJoin(broadcast(tot))
      .withColumn("cls",
        when(col("cum_c") * 5 <= col("tot_c") * 4, "A")
          .when(col("cum_c") * 20 <= col("tot_c") * 19, "B")
          .otherwise("C"))
      .groupBy(col("cls"), col("n_total"), col("tot_c"))
      .agg(count(lit(1)).as("n_parts"), sum(col("rev_c")).as("class_rev_c"))
      .select(col("cls"), col("n_parts"),
        (col("n_parts").cast("double") / col("n_total")).as("part_share"),
        col("class_rev_c"),
        (col("class_rev_c").cast("double") / col("tot_c")).as("rev_share"))
      .orderBy(col("cls"))
  }

  /** §2.2#334 `q7_volume_shipping` — Q7-shape bilateral trade matrix:
    * revenue between every ordered (supplier nation, customer nation)
    * pair by ship year, supp ≠ cust, over a two-year ship window.
    * One lineitem↔orders shuffle on the order key; supplier/customer
    * are SF-scaled and left un-hinted (AQE broadcasts while they
    * fit); the nation dim is joined TWICE (both roles) as an explicit
    * broadcast. Output is bounded by nations² × years. Revenue is the
    * exact-cents sum divided once ([[Money]] convention).
    */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
    li.join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
      .join(broadcast(nation.select(col("n_nationkey").as("cn_key"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dollars(sum(netE4), 10000.0).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** §2.2#335 `q8_market_share` — Q8-shape national market share: of
    * the AMERICA-region PROMO-part market, the revenue share captured
    * by one nation's suppliers, per order year. Numerator and
    * denominator are both exact-cents longs from ONE aggregation pass
    * (conditional partial agg, no second scan); the share is their
    * single mirrored IEEE division, emitted unrounded. Bounded dims
    * (nation, region) broadcast; part is SF-scaled and un-hinted.
    */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val nation = Tables.nation(spark, dir)
    val americaCust = Tables.customer(spark, dir)
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(americaCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(Tables.part(spark, dir).filter(col("p_type") === "PROMO")
        .select(col("p_partkey")), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("supp_nation") === "NATION_5", netE4).otherwise(lit(0L)))
          .as("nat_e4"),
        sum(netE4).as("tot_e4"))
      .select(col("o_year"),
        (col("nat_e4").cast("double") / col("tot_e4").cast("double"))
          .as("mkt_share"),
        dollars(col("tot_e4"), 10000.0).as("total_revenue"))
      .orderBy(col("o_year"))
  }
}
