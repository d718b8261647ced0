package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Ckpt.CutOps

/** Distributed exact global ranks (SURVEY.md §2.2 scale fix for the
  * dimension-rank family: `q_rfm_segments`, `q_churn_by_engagement`,
  * `q_decile_report`, `io_shard_balance`).
  *
  * A bare `Window.orderBy(...)` serializes its whole input through ONE
  * task — fine over a bounded statistic table, fatal over a dimension
  * that grows with the data (10⁸–10⁹ customers / users / documents at
  * 100 TB). This helper computes the SAME 1-based `row_number` without
  * any single-task sort, by the classic range-partition + offset
  * construction, expressed declaratively:
  *
  *   1. each row is assigned to a BAND — any coarse monotone function
  *      of the leading sort key (value div width). The band axis is a
  *      STATISTIC axis: its cardinality is bounded by the metric's
  *      range / width, not by the number of entities;
  *   2. per-band counts aggregate map-side; the cumulative offset of
  *      each band is a window over that bounded band table (the one
  *      remaining unpartitioned window runs over ~10²–10⁴ band rows,
  *      documented and allow-listed in PlanAuditSpec);
  *   3. offsets broadcast back, and `row_number` PARTITIONED by band
  *      (a distributed, spillable sort) plus the band offset is the
  *      exact global rank.
  *
  * Determinism: callers must pass a tie-breaking unique trailing sort
  * key (custkey / user_id / doc_id), same as the single-window form.
  * Skew: a band is at most (width × densest value run); widths below
  * are picked so the densest band at 100 TB holds ≪ one executor's
  * spill budget, and AQE re-splits any residual straggler.
  */
object Ranks {

  /** Exact non-negative integral division as a Column: `(a − a mod b) ∕ b`
    * — the float step is exact while the dividend stays under 2⁵³
    * (ranks/counts at 100 TB are ~10¹², five orders inside the bound).
    */
  private def idiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** Exact global 1-based `row_number` over `orderCols`, distributed.
    *
    * @param band  monotone NON-DECREASING function of the leading
    *              order column (use a negated div for descending
    *              orders) — rows in band b all sort before rows in
    *              band b' > b.
    */
  def globalRowNumber(df: DataFrame, band: Column, orderCols: Seq[Column],
      out: String): DataFrame = {
    // lazy lineage cut (r15, guide §2.4/§5): the banded frame feeds
    // BOTH the band-count aggregate and the rank join below — without
    // the cut every caller's whole input lineage executed twice per
    // rank level (and ntile chains like q_rfm_segments re-ran it
    // 2^levels times). The first consuming job materializes the
    // partitions; no dedicated job is scheduled.
    val banded = df.withColumn("__band", band.cast("long"))
      .cutLineage(eager = false)
    val counts = banded.groupBy(col("__band")).agg(count(lit(1)).as("__bc"))
    // cumulative offset over the bounded band-statistic axis
    val wBands = Window.orderBy(col("__band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = counts
      .withColumn("__off", coalesce(sum(col("__bc")).over(wBands), lit(0L)))
      .select(col("__band"), col("__off"))
    val wIn = Window.partitionBy(col("__band")).orderBy(orderCols: _*)
    banded.join(broadcast(offsets), Seq("__band"))
      .withColumn(out, col("__off") + row_number().over(wIn).cast("long"))
      .drop("__band", "__off")
  }

  /** Exact global 1-based rank AND inclusive running sum of `value`
    * in the same global order, both distributed via the banded
    * construction: per-band count/sum offsets cumulate over the
    * bounded band axis, within-band `row_number` + running sum run
    * under the band-partitioned (spillable) sort. `value` must be
    * integral — the running sum stays an exact long.
    */
  def globalRankCumSum(df: DataFrame, band: Column, orderCols: Seq[Column],
      value: Column, rankOut: String, cumOut: String): DataFrame = {
    // lazy cut for the same two-consumer reason as globalRowNumber
    val banded = df.withColumn("__band", band.cast("long"))
      .withColumn("__v", value.cast("long"))
      .cutLineage(eager = false)
    val stats = banded.groupBy(col("__band"))
      .agg(count(lit(1)).as("__bc"), sum(col("__v")).as("__bs"))
    val wBands = Window.orderBy(col("__band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = stats
      .withColumn("__offc", coalesce(sum(col("__bc")).over(wBands), lit(0L)))
      .withColumn("__offs", coalesce(sum(col("__bs")).over(wBands), lit(0L)))
      .select(col("__band"), col("__offc"), col("__offs"))
    val wIn = Window.partitionBy(col("__band")).orderBy(orderCols: _*)
    val wRun = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    banded.join(broadcast(offsets), Seq("__band"))
      .withColumn(rankOut, col("__offc") + row_number().over(wIn).cast("long"))
      .withColumn(cumOut, col("__offs") + sum(col("__v")).over(wRun))
      .drop("__band", "__v", "__offc", "__offs")
  }

  /** Spark/DuckDB `ntile(n)` bucket from an exact 1-based rank and the
    * total row count: the first `total % n` buckets hold
    * `total div n + 1` rows, the rest `total div n` — pure integer
    * arithmetic, bit-identical to the window function on every engine.
    * (`total div n` can be 0 when total < n; the CaseWhen guard means
    * the small-quotient branch is never evaluated then.)
    */
  def ntileFromRank(rank: Column, total: Column, n: Int): Column = {
    val q = idiv(total.cast("long"), lit(n.toLong))
    val rem = total.cast("long") % lit(n.toLong)
    val bigSpan = (q + 1) * rem // rows living in the (q+1)-sized buckets
    when(rank <= bigSpan, idiv(rank - 1, q + 1) + 1)
      .otherwise(rem + idiv(rank - bigSpan - 1, q) + 1)
  }

  /** `ntile` over a banded distributed rank in one call: exact global
    * rank via [[globalRowNumber]], total via a broadcast 1-row count,
    * bucket via [[ntileFromRank]].
    */
  def ntileBanded(df: DataFrame, band: Column, orderCols: Seq[Column],
      n: Int, out: String): DataFrame = {
    // lazy cut: `df` feeds the total-count aggregate AND the banded
    // rank (which itself consumes it twice — see globalRowNumber)
    val cut = df.cutLineage(eager = false)
    val total = cut.agg(count(lit(1)).as("__tot"))
    val ranked = globalRowNumber(cut, band, orderCols, "__rank")
    ranked.crossJoin(broadcast(total))
      .withColumn(out, ntileFromRank(col("__rank"), col("__tot"), n))
      .drop("__rank", "__tot")
  }
}
