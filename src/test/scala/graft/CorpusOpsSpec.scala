package graft

import org.apache.spark.sql.functions._

import graft.text.CorpusOps
import graft.sources.Tables

class CorpusOpsSpec extends GraftSpec {

  test("pack chunks: offsets are a gapless token-exact packing per stream") {
    val r = CorpusOps.textPackChunks(spark, sf).cache()
    // first doc of every (lang, shard) stream starts at offset 0
    val firsts = r.groupBy(col("lang"), col("shard"))
      .agg(min(col("start_off")).as("first_off")).collect()
    firsts.foreach(row => assert(row.getAs[Long]("first_off") === 0L))
    // offsets are cumulative: start + n_tokens of the last doc equals
    // the stream's total token count, and every doc spans >= 1 seq
    val totals = r.groupBy(col("lang"), col("shard"))
      .agg(max(col("start_off") + col("n_tokens")).as("end_off"),
        sum(col("n_tokens")).as("tok_sum"),
        max(col("seq_last")).as("last_seq")).collect()
    totals.foreach { row =>
      assert(row.getAs[Long]("end_off") === row.getAs[Long]("tok_sum"))
      // last sequence index is exactly ceil(total/512) - 1
      assert(row.getAs[Long]("last_seq") === (row.getAs[Long]("tok_sum") - 1) / 512)
    }
    assert(r.filter(col("n_seqs_spanned") < 1).isEmpty)
    r.unpersist()
  }

  test("contamination: benchmark docs are excluded and flags match counts") {
    val r = CorpusOps.textContamination(spark, sf).cache()
    assert(r.filter(col("doc_id") % 97 === 0).isEmpty)
    assert(r.filter(col("contaminated") =!= (col("n_contam_spans") > 0)).isEmpty)
    assert(r.filter(col("n_contam_spans") > col("n_spans")).isEmpty)
    val total = Tables.documents(spark, sf).filter(col("doc_id") % 97 =!= 0).count()
    assert(r.count() === total)
    r.unpersist()
  }

  test("mixture: shares sum to ~1e6 ppm and weights invert the realized share") {
    val rows = CorpusOps.corpusMixture(spark, sf).collect()
    val shareSum = rows.map(_.getAs[Long]("share_ppm")).sum
    // floor division loses < 1 ppm per cell
    assert(shareSum <= 1000000L && shareSum > 1000000L - rows.length)
    rows.foreach { row =>
      val w = row.getAs[Long]("weight_ppm")
      assert(w > 0L)
      // weight * cells * cell_share ~ 1e6 (up to floor loss)
      val back = w * rows.length * row.getAs[Long]("n_docs")
      val nTotal = rows.map(_.getAs[Long]("n_docs")).sum
      assert(back <= 1000000L * nTotal)
      assert(back > (1000000L - w) * nTotal - w * rows.length)
    }
  }

  test("url dedup: canonical clusters partition the corpus and keys are normalized") {
    val r = CorpusOps.dedupUrlNorm(spark, sf).cache()
    val total = Tables.documents(spark, sf).count()
    assert(r.agg(sum(col("n_docs"))).first().getLong(0) === total)
    r.collect().foreach { row =>
      val u = row.getAs[String]("norm_url")
      assert(u == u.toLowerCase)
      assert(!u.contains("?") && !u.contains("#") && !u.startsWith("www.") &&
        !u.startsWith("http") && !u.endsWith("/"))
    }
    r.unpersist()
  }

  test("DSIR selection ranks the target language first and is repartition-invariant") {
    val top = CorpusOps.corpusDsirSelect(spark, sf).cache()
    assert(top.count() === 50)
    // the importance ratio targets English: en must be the plurality
    // language of the selected set
    val byLang = top.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") === byLang.values.max)
    // exact integer micro-nat scores: no nulls, strictly ordered output
    val scores = top.select(col("score_micro")).collect().map(_.getLong(0))
    assert(scores.sameElements(scores.sorted(Ordering[Long].reverse)))
    top.unpersist()
  }

  test("source overlap: full C(n,2) grid, symmetric-free, jaccard bounded by counts") {
    val r = graft.text.CorpusOps.corpusSourceOverlap(spark, sf).collect()
    val sources = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source")).distinct().count().toInt
    assert(r.length === sources * (sources - 1) / 2, "grid must be complete")
    r.foreach { row =>
      assert(row.getAs[String]("source_a") < row.getAs[String]("source_b"))
      val shared = row.getAs[Long]("n_shared")
      val (a, b) = (row.getAs[Long]("sh_a"), row.getAs[Long]("sh_b"))
      assert(shared <= math.min(a, b), "shared vocab exceeds a side's vocab")
      val j = row.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      if (shared == 0) assert(j === 0.0)
    }
  }

  test("bpe tokens: counts bracketed by words and characters, merges actually apply") {
    import org.apache.spark.sql.functions._
    val merges = graft.text.CorpusOps.bpeMerges(spark, sf).collect()
    assert(merges.length <= 256)
    assert(merges.forall(_.getString(0).length == 2))
    // the table is frequency-ranked: counts non-increasing
    val counts = merges.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    val rows = graft.text.CorpusOps.textBpeTokens(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length === graft.sources.Tables.documents(spark, sf).count())
    rows.foreach { case (id, ws, chars, bpe, ppm) =>
      // one piece per word at least; never more pieces than characters
      assert(bpe >= ws, s"doc $id: fewer pieces than words")
      assert(bpe <= math.max(chars, ws), s"doc $id: more pieces than characters")
      assert(ppm === 1000000L * bpe / ws)
    }
    // merges must actually merge: strictly fewer pieces than the
    // no-merge worst case (one piece per character) corpus-wide
    assert(rows.map(_._4).sum < rows.map(r => math.max(r._3, r._2)).sum)
  }

  test("bpe token budget: spends at least the 60% budget, shares bounded, ranking axis shared") {
    val rows = graft.text.CorpusOps.corpusTokenBudgetBpe(spark, sf).collect()
    assert(rows.nonEmpty)
    val spent = rows.map(_.getAs[Long]("toks_selected")).sum.toDouble
    val total = rows.map(_.getAs[Long]("lang_toks")).sum.toDouble
    assert(spent / total >= 0.6, "greedy prefix must reach the budget")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_docs"))
      val share = r.getAs[Double]("tok_share")
      assert(share > 0.0 && share <= 1.0)
    }
  }
}
