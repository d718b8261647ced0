package graft

import graft.analytics.Relational

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

  test("AQE is active: adaptive plans appear after execution") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") === "true")
    val df = Relational.q5SnowflakeJoin(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AdaptiveSparkPlan"), plan.take(500))
  }
}
