package graft

import org.apache.spark.sql.functions._

import graft.functions.HllAggFunctions.hll_sketch

/** The custom HLL aggregate: estimate quality, merge correctness
  * under partial aggregation, and determinism across partitionings.
  */
class HllSketchSpec extends GraftSpec {

  test("estimate is within HLL error bounds of the exact count") {
    val r = graft.sources.Tables.events(spark, sf)
      .agg(countDistinct(col("user_id")).as("exact"),
        hll_sketch(col("user_id").cast("string")).as("hll"))
      .select(col("exact"), col("hll.estimate").as("est"))
      .collect().head
    val exact = r.getLong(0).toDouble
    val est = r.getDouble(1)
    // 64 registers → ~13% standard error; 3σ bound
    assert(math.abs(est - exact) / exact < 0.4, s"est=$est exact=$exact")
  }

  test("sketch state is identical regardless of partitioning (merge exactness)") {
    val ev = graft.sources.Tables.events(spark, sf).select(col("user_id").cast("string").as("u"))
    def digestOf(df: org.apache.spark.sql.DataFrame): String =
      df.agg(hll_sketch(col("u")).as("hll"))
        .select(col("hll.reg_digest")).collect().head.getString(0)
    val one = digestOf(ev.coalesce(1))
    val many = digestOf(ev.repartition(13))
    assert(one === many)
  }

  test("duplicates do not move the registers") {
    import spark.implicits._
    val base = Seq("a", "b", "c", "d").toDF("u")
    val dup = (Seq("a", "b", "c", "d") ++ Seq("a", "a", "d")).toDF("u")
    def digestOf(df: org.apache.spark.sql.DataFrame): String =
      df.agg(hll_sketch(col("u")).as("hll"))
        .select(col("hll.reg_digest")).collect().head.getString(0)
    assert(digestOf(base) === digestOf(dup))
  }
}
