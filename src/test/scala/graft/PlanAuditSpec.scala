package graft

import graft.analytics.{Relational, Windows}
import graft.similarity.Ann
import graft.sources.Tables
import graft.text.TextAnalysis

/** Scale-design audits: assert the *plan shapes* the 100 TB design
  * depends on — pushdown reaching the scan, dimensions broadcast,
  * partial aggregation — so a regression in plan quality fails CI,
  * not just a benchmark.
  */
class PlanAuditSpec extends GraftSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q6: filters are pushed into the parquet scan and schema is pruned") {
    val plan = planOf(Relational.q6FilterSum(spark, sf))
    assert(plan.contains("PushedFilters: ["), plan.take(2000))
    assert(plan.contains("l_shipdate"), "shipdate filter not pushed")
    // only the needed columns are read
    assert(!plan.contains("l_orderkey"), "scan reads columns the query never uses")
  }

  test("q5: all dimension joins are broadcast, no shuffle for dims") {
    val plan = planOf(Relational.q5SnowflakeJoin(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("q3: top-N compiles to a bounded TakeOrdered, not a global sort") {
    val plan = planOf(Relational.q3TopnJoin(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q1: aggregation is partial (map-side combine) before the exchange") {
    val plan = planOf(Relational.q1Agg(spark, sf))
    assert(plan.contains("HashAggregate"), plan.take(2000))
    assert(plan.contains("Exchange hashpartitioning"), plan.take(2000))
  }

  test("bounded-rank top-k paths keep WindowGroupLimit (rank-limit pushdown)") {
    val audited = Seq(
      "ann_bruteforce_topk" -> Ann.annBruteforceTopk(spark, sf),
      "ann_lsh_topk" -> Ann.annLshTopk(spark, sf),
      "ann_ivf_topk" -> Ann.annIvfTopk(spark, sf),
      "q_window_topn" -> Windows.qWindowTopn(spark, sf),
      "text_ngram_stats" -> TextAnalysis.textNgramStats(spark, sf),
      "ann_pq_adc" -> graft.similarity.Pq.annPqAdc(spark, sf))
    audited.foreach { case (name, df) =>
      val plan = planOf(df)
      assert(plan.contains("WindowGroupLimit"),
        s"$name lost the WindowGroupLimit optimization:\n${plan.take(2000)}")
    }
  }

  test("rebalanced is a true no-op on an already-parallel input") {
    val par = spark.sparkContext.defaultParallelism
    val base = Tables.documents(spark, sf).repartition(par)
    // same object back — no RoundRobin exchange appended
    assert(Tables.rebalanced(base) eq base)
    // and a single-partition scan does get spread across cores
    val single = Tables.documents(spark, sf).coalesce(1)
    assert(Tables.rebalanced(single).rdd.getNumPartitions >= par)
  }

  test("IVF probe prunes to the probed cells and never rebuilds the index inline") {
    val plan = planOf(Ann.annIvfTopk(spark, sf))
    assert(plan.contains("PartitionFilters") && plan.contains("assigned_centroid"),
      s"probe scan is not partition-pruned:\n${plan.take(3000)}")
    assert(!plan.contains("posexplode"),
      s"probe plan recomputes centroids inline:\n${plan.take(3000)}")
  }

  test("AQE is active: adaptive plans appear after execution") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    val df = Relational.q5SnowflakeJoin(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AdaptiveSparkPlan"), plan.take(500))
  }
}
