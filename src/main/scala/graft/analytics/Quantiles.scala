package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact quantiles (SURVEY.md §2.2 #23/#97 scale fix).
  *
  * Spark's `percentile` aggregate buffers every (value, count) pair of
  * a group in an in-memory map — over continuous doubles that is the
  * whole group resident per task, an OOM at 100 TB and the slowest
  * query of the round-1 bench. This helper computes the SAME
  * linear-interpolated quantiles (Spark `percentile` ≡ DuckDB
  * `quantile_cont` semantics) from a rank join instead:
  *
  *   1. one window `row_number` sort per key (spills to disk, no
  *      unbounded heap);
  *   2. the tiny (key × quantile) bracket table [floor/ceil of
  *      (n−1)·q] is broadcast against the ranked rows;
  *   3. interpolate `v_lo + frac · (v_hi − v_lo)` on the ≤ 2
  *      surviving rows per (key, q).
  *
  * The per-group sort is still one task per key (keys here are
  * bounded: event types); for unbounded keys the t-digest path
  * ([[Relational.qPercentilesApprox]]) is the scale answer, with
  * memory O(accuracy) per group instead of O(n).
  */
object Quantiles {

  /** Exact quantiles per key, one output column per (name, q). */
  def exact(df: DataFrame, key: String, value: String,
      qs: Seq[(String, Double)]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(value))
    val ranked = df.select(col(key), col(value))
      .withColumn("rk", row_number().over(w).cast("long") - 1)
    val need = df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .select(col(key), explode(array(qs.map { case (nm, q) =>
        struct(lit(nm).as("qname"), ((col("n") - 1) * lit(q)).as("pos"))
      }: _*)).as("qq"))
      .select(col(key), col("qq.qname").as("qname"), col("qq.pos").as("pos"))
      .withColumn("lo", floor(col("pos")).cast("long"))
      .withColumn("hi", ceil(col("pos")).cast("long"))
    ranked.join(broadcast(need), Seq(key))
      .filter(col("rk") === col("lo") || col("rk") === col("hi"))
      .groupBy(col(key), col("qname"), col("pos"), col("lo"))
      .agg(min(when(col("rk") === col("lo"), col(value))).as("v_lo"),
        min(when(col("rk") === col("hi"), col(value))).as("v_hi"))
      .select(col(key), col("qname"),
        (col("v_lo") + (col("pos") - col("lo")) * (col("v_hi") - col("v_lo"))).as("qv"))
      .groupBy(col(key)).pivot("qname", qs.map(_._1)).agg(first(col("qv")))
  }
}
