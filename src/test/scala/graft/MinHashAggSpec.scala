package graft

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.functions.MinHashAggFunctions.minhash_agg
import graft.functions.TextFunctions.minhash_sigs
import graft.sources.Tables
import graft.text.TextAnalysis.tokensCol

class MinHashAggSpec extends GraftSpec {

  private def shingled = Tables.documents(spark, sf)
    .select(col("lang"), col("doc_id"), tokensCol(col("text")).as("toks"))
    .select(col("lang"), col("doc_id"), Dedup.shinglesOf(col("toks")).as("sh"))

  test("sketch is invariant to partitioning (partial merge is exact)") {
    def sketch(parts: Int) = shingled.repartition(parts)
      .groupBy(col("lang")).agg(minhash_agg(col("sh"), 12).as("sigs"))
      .orderBy(col("lang")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(sketch(1) === sketch(32))
  }

  test("single-row group sketch equals the scalar MinHashSigs expression") {
    val viaAgg = shingled.groupBy(col("doc_id")).agg(minhash_agg(col("sh"), 12).as("s"))
      .orderBy(col("doc_id")).collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    val viaExpr = shingled.select(col("doc_id"), minhash_sigs(col("sh"), 12).as("s"))
      .orderBy(col("doc_id")).collect().map(r => r.getLong(0) -> r.getSeq[String](1))
    assert(viaAgg.toSeq === viaExpr.toSeq)
  }

  test("group sketch dominates (is <=) every member's sketch element-wise") {
    val groups = Dedup.dedupMinhashByLang(spark, sf).collect()
      .map(r => r.getString(0) -> (0 until 12).map(i => r.getString(i + 1))).toMap
    val perDoc = shingled.select(col("lang"), minhash_sigs(col("sh"), 12).as("s"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    perDoc.foreach { case (lang, sigs) =>
      sigs.zip(groups(lang)).foreach { case (doc, grp) =>
        assert(grp <= doc, s"group sketch not minimal for $lang")
      }
    }
  }
}
