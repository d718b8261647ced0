package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Pareto-frontier (skyline) and interval-sweep operators.
  *
  * Both are classic "needs a global order" problems; the naive
  * formulation is a single-partition window over the whole input,
  * which is exactly what must NOT happen at 100 TB. Each operator
  * here therefore runs a distributed prune/prefix stage first and
  * keeps the unavoidable global step bounded:
  *
  *  - skyline: a 64-bucket range histogram proves most points
  *    dominated before the exact single-partition pass, which then
  *    runs over only the un-pruned survivors (frontier-sized, not
  *    input-sized);
  *  - max-concurrency: the running sum is computed per
  *    (event_type, day) partition — fully parallel — and stitched
  *    with per-day carry-in offsets (a prefix sum over the tiny
  *    (type × day) axis), the textbook two-level scan decomposition.
  */
object Frontier {

  /** §2 beyond-survey — Pareto frontier of customers on
    * (total spend, order count), both maximised: the "best customers"
    * set no other customer beats on both axes.
    *
    * Plan shape: one shuffle to aggregate orders per customer, a
    * second tiny shuffle to collapse duplicate (spend, n_orders)
    * points, then the bucket prune: points are range-bucketed on
    * spend (64 buckets off a broadcast min/max), each bucket's max
    * order-count is computed (64-row aggregate), and a point whose
    * order count is ≤ the running max over strictly-higher spend
    * buckets is provably dominated (higher bucket ⇒ strictly higher
    * spend). Survivors — a superset of the frontier, typically a few
    * dozen rows — go through the exact dominance window. The exact
    * window is single-partition but only ever sees survivor-sized
    * input, so the plan holds at any input scale.
    */
  def qSkyline(spark: SparkSession, dir: String): DataFrame = {
    val pts = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(
        sum(round(col("o_totalprice") * 100).cast("long")).as("spend_c"),
        count(lit(1)).as("n_orders"))
    // collapse duplicate points so dominance is strict by construction;
    // persisted because bounds/bucket/threshold/survivor branches all
    // reuse it — one scan of orders, not four (the point set is
    // customer-cardinality, orders of magnitude below the input)
    val d = pts.groupBy(col("spend_c"), col("n_orders"))
      .agg(count(lit(1)).as("n_customers"), min(col("o_custkey")).as("min_custkey"))
      .persist()
    paretoFrontier(d)
  }

  /** Frontier kernel over a deduped point frame with long columns
    * `spend_c` (x, maximised) and `n_orders` (y, maximised); extra
    * columns ride along. Exposed separately so the bucket-prune logic
    * is property-testable on arbitrary point sets.
    */
  def paretoFrontier(d: DataFrame): DataFrame = {
    val bounds = d.agg(min(col("spend_c")).as("lo"), max(col("spend_c")).as("hi"))
    val bucketed = d.crossJoin(broadcast(bounds))
      .withColumn("b",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(expr("((spend_c - lo) * 64) div (hi - lo + 1)")))
      .drop("lo", "hi")
    // running max order-count over strictly-higher spend buckets:
    // 64-row window, then broadcast back as the prune threshold
    val wB = Window.orderBy(col("b").desc).rowsBetween(Window.unboundedPreceding, -1)
    val thr = bucketed.groupBy(col("b")).agg(max(col("n_orders")).as("bmax"))
      .withColumn("thr", max(col("bmax")).over(wB))
      .select(col("b"), col("thr"))
    val survivors = bucketed.join(broadcast(thr), Seq("b"))
      .filter(col("thr").isNull || col("n_orders") > col("thr"))
      .drop("b", "thr")
    // exact pass on the survivor set: in (spend desc, orders desc)
    // order a distinct point is dominated iff some earlier row has
    // n_orders >= its own (earlier ⇒ strictly better on one axis)
    val wX = Window.orderBy(col("spend_c").desc, col("n_orders").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    survivors
      .withColumn("runmax", max(col("n_orders")).over(wX))
      .filter(col("runmax").isNull || col("n_orders") > col("runmax"))
      .drop("runmax")
      .orderBy(col("spend_c").desc)
  }

  /** §2 beyond-survey — peak concurrency per event type: each event
    * opens a [ts, ts+5min) interval; report the maximum number of
    * simultaneously-open intervals and the first instant the peak is
    * reached.
    *
    * The sweep (+1 at start, −1 at end, running sum in time order) is
    * decomposed two-level so no partition ever holds a full type's
    * history: within-day running sums run in parallel across
    * (type, day) partitions, and each day's carry-in is the prefix
    * sum of per-day delta totals over the tiny (type × day) axis,
    * broadcast back. End events sort before starts at the same
    * instant (delta asc) so half-open interval semantics are exact.
    * The peak row is recovered with a broadcast join against the
    * per-type max rather than a whole-partition window.
    */
  def qMaxConcurrency(spark: SparkSession, dir: String): DataFrame =
    sweepPeaks(Tables.events(spark, dir)
      .select(col("event_type"), unix_micros(col("ts")).as("us")))

  /** Sweep kernel over an (event_type, us) frame — separated so the
    * day-carry stitching is testable on synthetic boundary-straddling
    * inputs (intervals opened just before midnight must count into
    * the next day's concurrency via the carry, not the local sum).
    */
  def sweepPeaks(ev: DataFrame): DataFrame = {
    // one scan: each event explodes into its (+1 at start, −1 at end)
    // sweep deltas (vs a unionAll of two scans of the source)
    val deltas = ev
      .select(col("event_type"), explode(array(
        struct(col("us").as("t"), lit(1L).as("delta")),
        struct((col("us") + 300000000L).as("t"), lit(-1L).as("delta")))).as("d"))
      .select(col("event_type"), col("d.t").as("t"), col("d.delta").as("delta"))
      .withColumn("day", expr("t div 86400000000"))
    val wDay = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wCarry = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // within-day running sums, plus the per-day carry totals. Catalyst
    // prunes the (unused) window out of the carry branch and partial-
    // aggregates BELOW its exchange, so the carry side costs a second
    // 2-column scan but ships only |type×day| rows through its
    // shuffle — cheaper at scale than sharing the full-width delta
    // exchange between both consumers
    val withRun = deltas.withColumn("run", sum(col("delta")).over(wDay))
    val carry = withRun.groupBy(col("event_type"), col("day"))
      .agg(sum(col("delta")).as("dtot"))
      .withColumn("carry", coalesce(sum(col("dtot")).over(wCarry), lit(0L)))
      .select(col("event_type"), col("day"), col("carry"))
    // peak + first instant in ONE aggregate: max of (conc, −t) struct
    // is lexicographic, so ties on peak resolve to the earliest time —
    // no join-back against a second evaluation of the sweep
    withRun.join(broadcast(carry), Seq("event_type", "day"))
      .withColumn("conc", col("run") + col("carry"))
      .groupBy(col("event_type"))
      .agg(max(struct(col("conc"), (-col("t")).as("neg_t"))).as("m"))
      .select(col("event_type"), col("m.conc").as("peak_concurrency"),
        (-col("m.neg_t")).as("first_peak_us"))
      .orderBy(col("event_type"))
  }
}
