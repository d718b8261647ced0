package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.{CosineSimilarity, JaccardSorted, MinHashSigs, SimHash32}

/** SQL-surface registration for the native expressions, so
  * `spark.sql("SELECT graft_cosine(a, b) ...")` works alongside the
  * Column API.
  *
  * Two entry points:
  *   - [[GraftExtensions]] for cluster bootstrap via
  *     `spark.sql.extensions=graft.GraftExtensions` or
  *     `.withExtensions(new GraftExtensions)`;
  *   - [[GraftFunctions.register]] for an already-running session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      e.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          builder.getClass.getName, name),
        builder))
    }
    e.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    e.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
  }
}

object GraftFunctions {

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (exprs => CosineSimilarity(exprs(0), exprs(1))),
    "graft_simhash32" -> (exprs => SimHash32(exprs(0))),
    "graft_minhash" -> (exprs => MinHashSigs(exprs(0),
      exprs(1).eval().asInstanceOf[Int])),
    "graft_jaccard_sorted" -> (exprs => JaccardSorted(exprs(0), exprs(1))),
  )

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      org.apache.spark.sql.graftshim.Shim.registerFunction(spark, name, builder)
    }
}
