package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.TopK
import graft.sources.Tables

class TopKPlanSpec extends GraftSpec {

  private def revenue = Tables.lineitem(spark, sf)
    .join(broadcast(Tables.part(spark, sf)), col("l_partkey") === col("p_partkey"))
    .groupBy(col("p_brand"), col("p_partkey"))
    .agg(sum(col("l_extendedprice")).as("revenue"))

  test("custom TopKPerGroup matches the window row_number formulation") {
    val fast = TopK.perGroup(revenue, Seq("p_brand"),
      Seq(("revenue", false), ("p_partkey", true)), 3)
    val w = Window.partitionBy(col("p_brand")).orderBy(col("revenue").desc, col("p_partkey"))
    val windowed = revenue.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).drop("rn")
    assert(fast.exceptAll(windowed).count() === 0)
    assert(windowed.exceptAll(fast).count() === 0)
    assert(fast.count() === windowed.count())
  }

  test("the physical plan uses the heap exec, an exchange, and no sort") {
    val fast = TopK.perGroup(revenue, Seq("p_brand"), Seq(("revenue", false)), 3)
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan.take(2000))
    assert(plan.contains("Exchange"), plan.take(2000))
    // the window plan needs a full Sort before running; the heap exec must not
    val planLines = plan.linesIterator.toSeq
    val execIdx = planLines.indexWhere(_.contains("TopKPerGroup"))
    val sortAbove = planLines.take(execIdx).exists(_.contains("Sort "))
    assert(!sortAbove, s"unexpected sort feeding TopKPerGroup:\n$plan")
  }

  test("k larger than every group returns everything") {
    val all = TopK.perGroup(revenue, Seq("p_brand"), Seq(("revenue", false)), 1000000)
    assert(all.count() === revenue.count())
  }

  test("ties at the cut are broken deterministically by the order columns") {
    import spark.implicits._
    val df = Seq(("g", 1L, 5.0), ("g", 2L, 5.0), ("g", 3L, 5.0), ("g", 4L, 1.0))
      .toDF("grp", "id", "score")
    val top2 = TopK.perGroup(df, Seq("grp"), Seq(("score", false), ("id", true)), 2)
      .select(col("id")).collect().map(_.getLong(0)).toSet
    assert(top2 === Set(1L, 2L))
  }

  test("unpartitioned (global) window top-k is left to the window plan — no rewrite, no crash") {
    import org.apache.spark.sql.expressions.Window
    TopK.ensureRegistered(spark)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val before = classic.experimental.extraOptimizations
    try {
      classic.experimental.extraOptimizations = before :+ graft.plans.RewriteWindowTopK
      val w = Window.orderBy(col("revenue").desc, col("p_partkey"))
      val global = revenue.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
      // ClusteredDistribution(Nil) is rejected by Spark — the rule
      // must skip the empty-partition shape entirely
      assert(global.count() === 3)
      assert(!global.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    } finally classic.experimental.extraOptimizations = before
  }

  test("RewriteWindowTopK turns the naive window-filter-drop pattern into the heap operator") {
    import org.apache.spark.sql.expressions.Window
    TopK.ensureRegistered(spark)
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val before = classic.experimental.extraOptimizations
    try {
      classic.experimental.extraOptimizations = before :+ graft.plans.RewriteWindowTopK
      val w = Window.partitionBy(col("p_brand")).orderBy(col("revenue").desc, col("p_partkey"))
      val naive = revenue.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
      val plan = naive.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), s"rule did not fire:\n${plan.take(2000)}")
      // result identical to the un-rewritten run
      classic.experimental.extraOptimizations = before
      val reference = revenue.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3).drop("rn")
      assert(naive.exceptAll(reference).count() === 0)
      assert(naive.count() === reference.count())
    } finally classic.experimental.extraOptimizations = before
  }
}
