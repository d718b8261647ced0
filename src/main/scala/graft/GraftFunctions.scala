package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression

import graft.functions.{CosineSimilarity, JaccardSorted, MinHashSigs, NGramSpanHashes, SimHash32}

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
    e.injectOptimizerRule(_ => graft.plans.JaroWinklerLengthPrune)
  }
}

object GraftFunctions {

  private def requireArity(name: String, exprs: Seq[Expression], n: Int): Unit =
    if (exprs.length != n) {
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" ->
          s"$name expects $n argument(s), got ${exprs.length}"))
    }

  /** Extract a positive Int from a foldable integral literal argument
    * (accepting INT or BIGINT, as a SQL user may write either), with a
    * clear analysis error instead of a ClassCastException/NPE for
    * non-foldable or wrongly-typed expressions.
    */
  private def foldableInt(name: String, arg: String, e: Expression): Int = {
    def fail(why: String): Nothing =
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "INTERNAL_ERROR",
        messageParameters = Map("message" -> s"$name: $arg must be $why, got ${e.sql}"))
    if (!e.foldable) fail("a constant integer")
    e.eval() match {
      case i: Int => i
      case l: Long if l.isValidInt => l.toInt
      case s: Short => s.toInt
      case b: Byte => b.toInt
      case _ => fail("an integer literal")
    }
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> (exprs => {
      requireArity("graft_cosine", exprs, 2); CosineSimilarity(exprs(0), exprs(1))
    }),
    "graft_simhash32" -> (exprs => {
      requireArity("graft_simhash32", exprs, 1); SimHash32(exprs(0))
    }),
    "graft_minhash" -> (exprs => {
      requireArity("graft_minhash", exprs, 2)
      MinHashSigs(exprs(0), foldableInt("graft_minhash", "k", exprs(1)))
    }),
    "graft_jaccard_sorted" -> (exprs => {
      requireArity("graft_jaccard_sorted", exprs, 2); JaccardSorted(exprs(0), exprs(1))
    }),
    // Explicit bloom-prefilter surface: Spark ships these expressions
    // for its own runtime-filter rewrite but does not register them in
    // the public function registry; exposing them lets a pipeline
    // build the classic semi-join prefilter by hand (build a bloom
    // over the small side's join keys, prune the fact scan BEFORE the
    // shuffle, then join exactly — false positives are removed by the
    // join, so results are exact while shuffle input shrinks by the
    // filter's selectivity).
    "graft_bloom_agg" -> (exprs => {
      requireArity("graft_bloom_agg", exprs, 1)
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(exprs(0))
    }),
    "graft_bloom_contains" -> (exprs => {
      requireArity("graft_bloom_contains", exprs, 2)
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))
    }),
    "graft_ngram_spans" -> (exprs => {
      requireArity("graft_ngram_spans", exprs, 2)
      NGramSpanHashes(exprs(0), foldableInt("graft_ngram_spans", "n", exprs(1)))
    }),
  )

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      org.apache.spark.sql.graftshim.Shim.registerFunction(spark, name, builder)
    }
}
