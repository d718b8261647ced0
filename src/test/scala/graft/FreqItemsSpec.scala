package graft

import org.apache.spark.sql.functions._

import graft.functions.FreqItemsAggFunctions.freq_items_sketch

/** Misra–Gries sketch behavior BEYOND the exact regime the DuckDB
  * oracle covers: bounded candidate set, heavy-hitter survival with
  * the classic n/(capacity+1) undercount bound, and map-side-combine
  * equivalence (the aggregate must not care how its input is
  * partitioned).
  */
class FreqItemsSpec extends GraftSpec {

  private def sketchOf(parts: Int, capacity: Int): Map[String, Long] = {
    import spark.implicits._
    // skewed stream: "hot" 400 times, 50 singleton cold keys → 450
    // items over 51 distinct keys, far above a capacity-4 summary
    val items = Seq.fill(400)("hot") ++ (0 until 50).map(i => s"cold$i")
    val m = items.toDF("token").repartition(parts)
      .agg(freq_items_sketch(col("token"), capacity).as("s"))
      .collect()(0).getMap[String, Long](0)
    Map.empty ++ m
  }

  test("over capacity: candidate set stays bounded and the heavy hitter survives") {
    val s = sketchOf(parts = 8, capacity = 4)
    assert(s.size <= 4)
    assert(s.contains("hot"))
    // n = 450, capacity+1 = 5 → undercount at most 90
    assert(s("hot") >= 400L - 90L)
    assert(s("hot") <= 400L)
  }

  test("sketch contents do not depend on input partitioning") {
    // exact regime (capacity ≥ distinct): every partitioning must
    // produce identical exact counts
    import spark.implicits._
    val items = Seq.fill(40)("a") ++ Seq.fill(7)("b") ++ Seq.fill(1)("c")
    def run(parts: Int) = Map.empty ++ items.toDF("token").repartition(parts)
      .agg(freq_items_sketch(col("token"), 8).as("s"))
      .collect()(0).getMap[String, Long](0)
    val one = run(1)
    assert(one === Map("a" -> 40L, "b" -> 7L, "c" -> 1L))
    assert(run(8) === one)
  }
}
