package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** Degenerate-document corpus: empty text, single tokens, and
  * below-shingle-width docs must flow through every n-gram-deriving
  * operator without crashing (bare `sequence(1, n)` with n < 1 yields
  * a descending [1, 0, ...] whose indices break `element_at`; the
  * `idxSeq` guard must degrade to "no n-grams" instead).
  */
class EdgeCorpusSpec extends GraftSpec {

  private lazy val edgeDir: String = {
    val dir = Files.createTempDirectory("graft_edge").toString
    val docs = Seq(
      (0L, "", "en", "edge", 0L),
      (1L, "one", "en", "edge", 3L),
      (2L, "two words", "en", "edge", 9L),
      (3L, "three word doc", "en", "edge", 14L),
      (4L, "a full four token document for the operators", "en", "edge", 44L))
    spark.createDataFrame(docs).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("3-gram shingles degrade to empty arrays below 3 tokens") {
    val toks = TextAnalysis.tokensCol(col("text"))
    val shingles = graft.sources.Tables.documents(spark, edgeDir)
      .select(col("doc_id"), Dedup.shinglesOf(toks).as("sh"))
      .orderBy(col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).length).toMap
    assert(shingles(0L) === 0)
    assert(shingles(1L) === 0)
    assert(shingles(2L) === 0)
    assert(shingles(3L) === 1)
    assert(shingles(4L) === 6)
  }

  test("minhash/LSH pipeline runs over degenerate docs") {
    // must not throw; every doc still gets a signature row
    assert(Dedup.dedupMinhashLsh(spark, edgeDir).collect().nonEmpty)
    assert(Dedup.dedupSimhash(spark, edgeDir).count() === 5)
  }

  test("bigram operators run over 0/1-token docs") {
    val ng = TextAnalysis.textNgramStats(spark, edgeDir).collect()
    assert(ng.forall(_.getAs[String]("bigram").nonEmpty))
    // bigram model has a support threshold; just must not throw
    TextAnalysis.textBigramModel(spark, edgeDir).collect()
    val hist = TextAnalysis.textTokenLenHist(spark, edgeDir).collect()
    assert(hist.nonEmpty)
  }

  test("winnowing handles below-window and non-BMP text by code points") {
    import graft.functions.TextFunctions.winnow_fingerprints
    val df = spark.createDataFrame(Seq(
      (1L, "short"), // below k
      (2L, "a regular ascii sentence long enough to window"),
      (3L, "emoji 😀😁😂 inside the text to split surrogate pairs")))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      size(winnow_fingerprints(col("text"), 8, 4)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(1L) === 0)
    assert(out(2L) > 0)
    assert(out(3L) > 0)
  }
}
