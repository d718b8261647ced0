package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine_sim
import graft.similarity.VectorOps
import graft.sources.Tables

class VectorExprSpec extends GraftSpec {

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))

  test("native CosineSimilarity is bit-identical to the HOF composition") {
    val a = vecs.as("a")
    val b = vecs.as("b")
    val both = a.join(b, col("a.vec_id") < col("b.vec_id"))
      .limit(5000)
      .select(
        cosine_sim(col("a.v"), col("b.v")).as("native"),
        VectorOps.cosine(col("a.v"), col("b.v")).as("hof"))
    // bitwise equality: the expressions share accumulation order
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
  }

  test("self-similarity is exactly 1.0 and orthogonal-ish pairs are bounded") {
    val self = vecs.select(cosine_sim(col("v"), col("v")).as("c"))
      .agg(min(col("c")), max(col("c"))).collect()(0)
    assert(self.getDouble(0) > 0.9999999 && self.getDouble(1) < 1.0000001)
    val range = vecs.as("a").join(vecs.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .limit(2000)
      .select(cosine_sim(col("a.v"), col("b.v")).as("c"))
      .agg(min(col("c")), max(col("c"))).collect()(0)
    assert(range.getDouble(0) >= -1.0000001 && range.getDouble(1) <= 1.0000001)
  }

  test("expression survives whole-stage codegen (plan contains the fused loop)") {
    val df = vecs.as("a").join(vecs.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(cosine_sim(col("a.v"), col("b.v")).as("c"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cosinesimilarity") || plan.contains("CosineSimilarity"), plan.take(1500))
    assert(df.limit(10).count() === 10) // and it executes
  }
}
