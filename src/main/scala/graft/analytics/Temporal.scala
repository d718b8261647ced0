package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Temporal join operators (SURVEY.md §2.2 #45–46): as-of join and
  * bucketed range join — the two join shapes Spark lacks as
  * primitives, composed here from equi-shuffles + windows so Catalyst
  * still plans them (preference (a) of the custom-operator ladder).
  *
  * All time comparisons run on integer microseconds (`unix_micros`)
  * so the oracle compare is float- and timezone-free.
  */
object Temporal {

  /** §2.2#45 — as-of join: each purchase matched to the same user's
    * most recent click at-or-before it. Shape: union the two streams,
    * one shuffle on user_id, one ordered window pass carrying the
    * last click forward (`last(..., ignoreNulls)` over rows
    * unbounded-preceding..current) — exactly the merge phase of a
    * sort-merge as-of join, with no per-key cartesian blowup.
    */
  def qAsofJoin(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        col("ts").as("purchase_ts"), col("last_click_ts"),
        (unix_micros(col("ts")) - unix_micros(col("last_click_ts"))).as("gap_us"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** §2.2#117 — as-of join with a match tolerance: a prior click only
    * counts if it happened within the last 10 minutes (the finance
    * "asof ... tolerance" semantic — stale matches become misses).
    * Same single-shuffle carry-forward shape as [[qAsofJoin]]; the
    * tolerance is a residual predicate on the carried value, and the
    * per-user summary keeps the output bounded.
    */
  def qAsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val TolUs = 10L * 60 * 1000000
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"),
        (col("last_click_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("last_click_ts")) <= TolUs).as("matched"),
        when(col("last_click_ts").isNotNull &&
          unix_micros(col("ts")) - unix_micros(col("last_click_ts")) <= TolUs,
          unix_micros(col("ts")) - unix_micros(col("last_click_ts"))).as("gap_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_purchases"),
        sum(when(col("matched"), 1L).otherwise(0L)).as("n_matched"),
        max(col("gap_us")).as("max_matched_gap_us"))
      .orderBy(col("user_id"))
  }

  /** §2.2#46 — range join, bucketed: for every error event, how many
    * same-user events landed in the preceding 5 minutes. A naive
    * range join is a per-key cartesian; instead both sides key on
    * (user, 5-minute epoch bucket), the probe side explodes into the
    * two buckets its window can straddle, and the residual time
    * predicate filters after the equi-join — the standard way to make
    * an interval join shuffle-partitionable at 100 TB.
    */
  def qRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val WindowUs = 5L * 60 * 1000000
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    // a probe in bucket b can satisfy errors in buckets b and b+1
    // (integer `div`, not double division — µs epochs are near 2^53)
    val probes = ev
      .withColumn("bucket", explode(array(expr(s"us div $WindowUs"), expr(s"us div $WindowUs") + 1)))
    val errors = Tables.events(spark, dir)
      .filter(col("event_type") === "error")
      .select(col("user_id").as("e_user"), col("event_id").as("e_id"),
        unix_micros(col("ts")).as("e_us"))
      .withColumn("bucket", expr(s"e_us div $WindowUs"))
    errors.join(probes,
        col("e_user") === col("user_id") && errors("bucket") === probes("bucket") &&
          col("us") > col("e_us") - WindowUs && col("us") <= col("e_us") &&
          col("event_id") =!= col("e_id"))
      .groupBy(col("e_user").as("user_id_out"), col("e_id"))
      .agg(count(lit(1)).as("n_prior_5min"))
      .select(col("user_id_out").as("user_id"), col("e_id").as("event_id"), col("n_prior_5min"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** §2.2#189 — type-2 slowly-changing-dimension history build: the
    * warehouse-standard "attribute timeline" (Kimball SCD2). Each
    * customer's order-priority changes become versioned validity
    * intervals `[valid_from, valid_to)` with an open current row.
    * Shape: lag-compare to keep change rows, then version/lead over
    * the survivors — both windows share the `o_custkey` partitioning,
    * so the whole history builds in ONE shuffle regardless of scale,
    * and a 100 TB fact table never joins: the dimension stays
    * per-key-local.
    */
  def qScd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .withColumn("prev", lag(col("o_orderpriority"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("o_orderpriority"))
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
      .select(col("o_custkey"), col("version"),
        col("o_orderpriority").as("priority"),
        col("o_orderdate").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("o_custkey"), col("version"))
  }
}
