package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Money._

/** Window / sessionization operators (SURVEY.md §2.2 #17–20).
  *
  * Every window partitions by a bounded-cardinality business key
  * (suppkey, brand, custkey, user_id) — never an unpartitioned global
  * window, which would serialize on one task at scale. Window ORDER BY
  * keys are made unique (tie-broken by primary keys) so row_number and
  * running frames are deterministic and engine-portable.
  */
object Windows {

  /** Running revenue per supplier in ship-date order. The frame is
    * ROWS unbounded-preceding..current over a unique ordering, which
    * both Spark and DuckDB evaluate identically.
    */
  def qWindowRunning(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 5)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        to_date(col("l_shipdate")).as("ship_date"),
        netE4.as("net_e4"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l_suppkey"))
          .orderBy(col("ship_date"), col("l_orderkey"), col("l_linenumber"))).cast("long"))
      .withColumn("running_net_e4", sum(col("net_e4")).over(
        Window.partitionBy(col("l_suppkey"))
          .orderBy(col("ship_date"), col("l_orderkey"), col("l_linenumber"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("l_suppkey"), col("rn"), col("ship_date"), col("net_e4"), col("running_net_e4"))
      .orderBy(col("l_suppkey"), col("rn"))

  /** Top-3 parts by revenue within each brand: partial-agg then a
    * rank window over the (brand) partition; ties broken by partkey so
    * the cut is deterministic.
    */
  def qWindowTopn(spark: SparkSession, dir: String): DataFrame = {
    // part is an SF-scaling dim — no forced broadcast; stats/AQE pick
    // broadcast when it fits, shuffle on partkey when it doesn't
    val rev = Tables.lineitem(spark, dir)
      .join(Tables.part(spark, dir), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_partkey"))
      .agg(dollars(sum(netE4), 10000.0).as("revenue"))
    val w = Window.partitionBy(col("p_brand")).orderBy(col("revenue").desc, col("p_partkey"))
    rev.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .orderBy(col("p_brand"), col("rnk"))
  }

  /** Per-customer order-date deltas via lag. Output restricted to a
    * bounded key range to keep the verify dump small; the plan shape
    * is identical at any scale.
    */
  def qWindowLag(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 100)
      .select(col("o_custkey"), col("o_orderkey"), to_date(col("o_orderdate")).as("order_date"))
      .withColumn("prev_date", lag(col("order_date"), 1).over(
        Window.partitionBy(col("o_custkey")).orderBy(col("order_date"), col("o_orderkey"))))
      .withColumn("gap_days", datediff(col("order_date"), col("prev_date")).cast("long"))
      .orderBy(col("o_custkey"), col("order_date"), col("o_orderkey"))

  /** §2.2#80 — ranking-function family over a unique total order:
    * dense_rank, ntile quartiles, percent_rank, cume_dist per
    * customer-bounded slice.
    */
  def qRankFamily(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .filter(col("o_custkey") <= 50)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("drank", dense_rank().over(w).cast("long"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  /** §2.2#103 — first/last/nth window values over the whole
    * partition (full frame, unique ordering): each supplier's first,
    * last, and second order lines by ship date.
    */
  def qWindowFirstLast(spark: SparkSession, dir: String): DataFrame = {
    val frame = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 20)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .withColumn("first_order", first(col("l_orderkey")).over(frame))
      .withColumn("last_order", last(col("l_orderkey")).over(frame))
      .withColumn("second_order", nth_value(col("l_orderkey"), 2).over(frame))
      .groupBy(col("l_suppkey"), col("first_order"), col("last_order"), col("second_order"))
      .agg(count(lit(1)).as("n_lines"))
      .orderBy(col("l_suppkey"))
  }

  /** §2.2#82 — moving RANGE-frame aggregate: 7-day rolling net
    * revenue per supplier over daily pre-aggregates. RANGE frames on
    * integer epoch days (not ROWS — days can be missing) after a
    * partial daily rollup, so the window input is bounded by
    * suppliers × days, not line items.
    */
  def qMovingWindow(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= 5)
      .groupBy(col("l_suppkey"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01").cast("date"))
          .cast("long").as("epoch_day"))
      .agg(sum(netE4).as("day_e4"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("epoch_day"))
      .rangeBetween(-6, 0)
    daily.withColumn("move7_e4", sum(col("day_e4")).over(w))
      .orderBy(col("l_suppkey"), col("epoch_day"))
  }

  /** Event sessionization with a 30-minute inactivity gap: lag →
    * boundary flag → running sum = session id, then per-user session
    * stats. Two window passes over the same (user_id, ts) shuffle —
    * Spark reuses the exchange. Durations in exact integer
    * microseconds so the oracle compare is float-free.
    */
  def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sessions = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new", when(col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 30L * 60 * 1000000, 1L).otherwise(0L))
      .withColumn("session_id", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("duration_us"),
        round(sum(col("value")), 2).as("session_value"))
    sessions.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("n_events")).as("n_events"),
        max(col("duration_us")).as("max_duration_us"),
        round(sum(col("session_value")), 2).as("total_value"))
      .orderBy(col("user_id"))
  }

  /** §2.2#154 — time-RANGE window frame: per-event trailing 1-hour
    * count and value sum per user, RANGE over epoch microseconds (not
    * ROWS — event spacing is irregular, and RANGE peers make the
    * result independent of tie order). Values are summed as exact e4
    * integers so the sliding sums are order-independent. One window
    * shuffle on user_id; output bounded by the user filter for the
    * verify dump, plan shape identical at any scale.
    */
  def qWindowTimeRange(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-3600L * 1000000 + 1, 0)
    Tables.events(spark, dir)
      .filter(col("user_id") <= 20)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 10000).cast("long").as("value_e4"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h_e4", sum(col("value_e4")).over(w))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }
}
