package graft

import org.apache.spark.sql.functions._

/** Invariant coverage for the round-15 widening ops: the curriculum
  * schedule over the token budget and the IVF-routed semantic
  * contamination probe. As with every round spec, the tests are
  * cross-operator conservation laws pinning the new ops to the ops
  * they compose (corpus_token_budget, text_readability's count
  * definitions, ann_ivf_topk's probe discipline) — not just to the
  * DuckDB oracle the driver checks.
  */
class Round15OpsSpec extends GraftSpec {

  test("curriculum order: phases exactly partition the token-budget selection") {
    val phases = graft.text.CorpusOps.corpusCurriculumOrder(spark, sf).collect()
    assert(phases.map(_.getLong(0)).toSeq === (1L to 5L).toSeq)
    // phase doc counts follow the ntile contract: sizes differ by at
    // most 1 and earlier phases get the remainder
    val counts = phases.map(_.getLong(1))
    assert(counts.max - counts.min <= 1L, "ntile phases are equal-count ±1")
    assert(counts.toSeq === counts.sortBy(-_).toSeq, "remainder rows land in the earliest phases")
    // conservation: Σ phase docs/tokens == the budget selection that
    // corpus_token_budget reports (same greedy prefix by construction)
    val budget = graft.text.CorpusOps.corpusTokenBudget(spark, sf).collect()
    assert(counts.sum === budget.map(_.getLong(2)).sum,
      "curriculum phases must cover exactly the selected docs")
    assert(phases.map(_.getLong(2)).sum === budget.map(_.getLong(4)).sum,
      "curriculum phases must cover exactly the selected tokens")
    // the curriculum is monotone: each phase's ease range sits at or
    // below the previous phase's (easiest first; ranges may touch at
    // a shared boundary value but never invert)
    phases.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(3) <= a.getLong(4),
        s"phase ${b.getLong(0)} ease_hi must not exceed phase ${a.getLong(0)} ease_lo")
    }
    phases.foreach { r =>
      assert(r.getLong(3) >= r.getLong(4), "ease_hi >= ease_lo within a phase")
      val mq = r.getDouble(5)
      assert(mq > 0.0 && mq <= 1.0, s"mean quality in (0,1]: $mq")
    }
  }

  test("semantic contamination: probe discipline and flag threshold agree with a direct recompute") {
    val rows = graft.similarity.Ann.annSemanticContamination(spark, sf).collect()
    assert(rows.nonEmpty)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val nEval = emb.filter(col("vec_id") % 97 === 0).count()
    // every eval vector gets exactly k=5 ranked neighbors
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size.toLong === nEval, "one probe report per eval vector")
    byQ.values.foreach { qs =>
      assert(qs.map(_.getLong(1)).sorted.toSeq === (1L to 5L).toSeq, "ranks 1..5 per query")
      // ranked by cos desc with vec_id tie-break
      val ordered = qs.sortBy(_.getLong(1))
      ordered.sliding(2).foreach { case Array(a, b) =>
        val (ca, cb) = (a.getDouble(3), b.getDouble(3))
        assert(ca > cb || (ca == cb && a.getLong(2) < b.getLong(2)),
          "neighbors ordered by (cos desc, vec_id)")
      }
    }
    rows.foreach { r =>
      assert(r.getLong(2) % 97 != 0L, "neighbors come from the corpus side only")
      assert(r.getBoolean(4) === (r.getDouble(3) >= 0.45),
        "contaminated flag is exactly the 0.45 threshold on the rounded cosine")
    }
  }

  test("q7 volume shipping: pair revenues sum to a direct cross-nation recompute") {
    import graft.sources.Tables
    val rows = graft.analytics.Relational.q7VolumeShipping(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) !== r.getString(1), "supp_nation != cust_nation")
      assert(Seq(1996, 1997).contains(r.getInt(2)), "ship years inside the window")
    }
    // conservation: Σ pair revenue == windowed cross-nation revenue
    // recomputed through an independent plan (single join chain, no
    // per-pair grouping), both in exact cents before ONE division
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .agg(sum(graft.analytics.Money.netE4).as("e4")).collect()(0).getLong(0)
    val got = rows.map(r => math.round(r.getDouble(3) * 10000)).sum
    assert(got === direct,
      s"q7 pair sum $got != direct windowed cross-nation revenue $direct")
  }

  test("q8 market share: share bounded and consistent with its own totals") {
    val rows = graft.analytics.Relational.q8MarketShare(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val share = r.getDouble(1)
      assert(share >= 0.0 && share <= 1.0, s"share in [0,1]: $share")
      assert(r.getDouble(2) > 0.0, "non-empty market per emitted year")
    }
  }

  test("dup provenance: matrix is canonical and conserves the full pair count") {
    val rows = graft.dedup.Dedup.corpusDupProvenance(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0) <= r.getString(1), "unordered pairs keyed (min, max)")
      assert(r.getLong(2) > 0L, "zero cells are not emitted")
    }
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct.length === rows.length)
    // conservation: Σ n_pairs over source pairs == total full-graph
    // candidate pairs, assembled along the multiplicity path (group
    // cliques + edge blow-ups) rather than the source split
    val g = graft.dedup.Dedup.candGraph(spark, sf)
    val intra = g.docMap.groupBy(col("rep_id")).agg(count(lit(1)).as("n"))
      .agg(sum(expr("n * (n - 1) div 2"))).collect()(0).getLong(0)
    val cross = g.edges.agg(sum(col("na") * col("nb"))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(2)).sum === intra + cross,
      "source-pair matrix must partition the full candidate pair set")
  }
}
