package graft.analytics

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Runtime-filter-style join pruning (SURVEY.md §2.2 addition).
  *
  * At 100 TB the dominant join cost is shuffling fact rows that the
  * dim side will discard anyway. Spark's optimizer can inject a bloom
  * runtime filter itself when thresholds line up; this operator builds
  * the same prefilter EXPLICITLY with the engine's own
  * `BloomFilterAggregate` / `BloomFilterMightContain` expressions
  * (exposed as `graft_bloom_agg` / `graft_bloom_contains`), so the
  * pruning is a declared part of the plan instead of an optimizer
  * heuristic: bloom over the selective dim's keys (one-row binary,
  * broadcast as a scalar subquery) → fact scan filtered before the
  * shuffle → exact join afterwards. False positives pass the bloom
  * but die in the join, so the result is byte-equal to the plain
  * join while the shuffle carries only ~selectivity of the fact.
  */
object RuntimeFilters {

  private val seq = new AtomicInteger(0)

  /** §2.2#126 — bloom-prefiltered fact-dim join: lineitem rows
    * surviving a bloom of the urgent orders' keys, then exactly
    * joined and aggregated. Oracle is the plain join — the bloom must
    * be invisible in the result.
    */
  def qBloomPrefilter(spark: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(spark)
    val n = seq.incrementAndGet()
    val dimV = s"graft_bloom_dim_$n"
    val factV = s"graft_bloom_fact_$n"
    Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
      .createOrReplaceTempView(dimV)
    Tables.lineitem(spark, dir).createOrReplaceTempView(factV)
    // the bloom rides in as a scalar subquery (BloomFilterMightContain
    // requires a constant or scalar-subquery bloom side)
    val df = spark.sql(
      s"""SELECT l_returnflag, count(*) AS n_lines,
         |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         |FROM $factV l JOIN $dimV o ON l.l_orderkey = o.o_orderkey
         |WHERE graft_bloom_contains(
         |    (SELECT graft_bloom_agg(xxhash64(o_orderkey)) FROM $dimV),
         |    xxhash64(l.l_orderkey))
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    // spark.sql analyzes eagerly — the views are resolved into the
    // plan above, so dropping them immediately keeps the catalog from
    // accumulating one pair per invocation in a long-lived session
    spark.catalog.dropTempView(dimV)
    spark.catalog.dropTempView(factV)
    df
  }
}
