package graft

import org.apache.spark.sql.functions._

import graft.analytics.EventAnalytics
import graft.sources.{Io, Tables}

/** Structural invariants of the round-6 event/io operators that the
  * value-level DuckDB oracle doesn't express.
  */
class EventOpsSpec extends GraftSpec {

  test("transition matrix: probabilities sum to 1 per source state, counts account for every non-first event") {
    val rows = EventAnalytics.qTransitionMatrix(spark, sf).collect()
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.values.foreach { g =>
      val pSum = g.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-3, s"p_trans sums to $pSum")
    }
    val nTrans = rows.map(_.getLong(2)).sum
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select(col("user_id")).distinct().count()
    assert(nTrans === expected) // every event except each user's first is a transition
  }

  test("ewma is a convex combination: bounded by each user's min/max value") {
    val ewma = EventAnalytics.qEwma(spark, sf)
      .select(col("user_id"), col("ewma_value")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val bounds = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(ewma.keySet === bounds.keySet)
    ewma.foreach { case (u, e) =>
      val (lo, hi) = bounds(u)
      assert(e >= lo - 1e-4 && e <= hi + 1e-4, s"user $u: ewma $e outside [$lo, $hi]")
    }
  }

  test("line dedup: keep ratio consistent with counts, boilerplate bounded by segments") {
    graft.text.TextAnalysis.textLineDedup(spark, sf).collect().foreach { r =>
      val (nSeg, nBp, keep) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nBp <= nSeg)
      assert(math.abs(keep - (nSeg - nBp).toDouble / nSeg) < 1e-4)
    }
  }

  test("incremental reagg: partial+delta merge equals the direct aggregation") {
    val merged = graft.analytics.Relational.qIncrementalReagg(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val direct = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 10000).cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(merged === direct)
  }

  test("langid confusion: shares sum to 1 per true language, doc counts total the corpus") {
    val rows = graft.text.TextAnalysis.textLangidConfusion(spark, sf).collect()
    rows.groupBy(_.getString(0)).values.foreach { g =>
      assert(math.abs(g.map(_.getDouble(3)).sum - 1.0) < 0.01)
    }
    val total = rows.map(_.getLong(2)).sum
    assert(total === graft.sources.Tables.documents(spark, sf).count())
  }

  test("label outliers: outlier cos is the per-label minimum, mean dominates it") {
    graft.similarity.Ann.vecLabelOutliers(spark, sf).collect().foreach { r =>
      assert(r.getDouble(2) >= r.getDouble(4), "mean must be >= min")
      assert(r.getDouble(4) >= -1.0 && r.getDouble(2) <= 1.0)
    }
  }

  test("acf: bounded in [-1,1], counts shrink with lag") {
    val rows = EventAnalytics.qAcf(spark, sf).collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1)) <= 1.0 + 1e-9)
    }
    val counts = rows.sortBy(_.getLong(0)).map(_.getLong(2))
    counts.sliding(2).foreach { p => assert(p(1) === p(0) - 1) }
  }

  test("benford: observed probabilities sum to 1, expectation sums to ~1, digits 1-9") {
    val rows = graft.analytics.Relational.qBenford(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet.subsetOf((1L to 9L).toSet))
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 0.01)
    val benfordSum = rows.map(_.getDouble(3)).sum
    assert(rows.length < 9 || math.abs(benfordSum - 1.0) < 0.01)
    assert(rows.map(_.getLong(1)).sum === Tables.orders(spark, sf).count())
  }

  test("perplexity proxy: non-negative, and repeated-text docs score lower than average") {
    val rows = graft.text.TextAnalysis.textPerplexity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) >= 0.0, s"doc ${r.getLong(0)} negative nll"))
    // docs with high duplicate-bigram ratio (looping text) should sit
    // below the corpus mean nll: their bigrams are locally frequent
    val rep = graft.text.TextAnalysis.textRepetition(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val nll = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val mean = nll.values.sum / nll.size
    val loopy = rep.filter(_._2 > 0.5).keys.filter(nll.contains)
    if (loopy.nonEmpty) {
      val loopyMean = loopy.map(nll).sum / loopy.size
      assert(loopyMean < mean, s"loopy docs mean $loopyMean !< corpus mean $mean")
    }
  }

  test("bfs layers: level 0 is exactly the seed set, levels are disjoint and positive") {
    val rows = graft.graph.GraphOps.graphBfsLayers(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) > 0))
    val dists = rows.map(_.getLong(0))
    assert(dists.toSet === (0L until dists.length).toSet) // contiguous levels
    val p = graft.dedup.Dedup.minhashCandidatePairs(spark, sf)
    val seeds = p.select(explode(array(col("doc_a"), col("doc_b"))).as("n"))
      .distinct().filter(col("n") % 29 === 0).count()
    assert(rows.find(_.getLong(0) == 0L).map(_.getLong(1)).contains(seeds))
  }

  test("pagerank: mass is conserved (ranks sum to 1), all ranks positive") {
    val rows = graft.graph.GraphOps.graphPagerank(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(1) > 0.0))
    val total = rows.map(_.getDouble(1)).sum
    // undirected graph has no dangling nodes, so each damped step
    // preserves total mass exactly (up to the output rounding)
    assert(math.abs(total - 1.0) < 1e-3, s"rank mass $total")
  }

  test("zipf fit: slope is negative for every language (frequency decays with rank)") {
    val rows = graft.text.TextAnalysis.textZipfFit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= 200L)
      assert(r.getDouble(2) < 0.0, s"lang ${r.getString(0)} slope ${r.getDouble(2)}")
    }
  }

  test("schema evolution: old-generation rows surface the added column as null") {
    val rows = Io.ioSchemaEvolution(spark, sf).collect()
    val orders = Tables.orders(spark, sf)
    val nullRow = rows.filter(_.isNullAt(0))
    assert(nullRow.length === 1)
    assert(nullRow.head.getLong(1) === orders.filter(col("o_orderkey") % 2 === 0).count())
    assert(rows.map(_.getLong(1)).sum === orders.count())
  }

  test("gaps-islands: island days reconstruct each user's distinct active days; streaks are consistent") {
    val rows = EventAnalytics.qGapsIslands(spark, sf).collect()
    val expected = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("d")).distinct()
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getLong(0)).toSet === expected.keySet)
    rows.foreach { r =>
      val (u, nIslands, maxStreak, nDays) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDays === expected(u), s"user $u day total")
      assert(maxStreak >= 1 && maxStreak <= nDays)
      assert(nIslands >= 1 && nIslands <= nDays)
      // islands partition the days: max streak can't exceed days - (islands - 1)
      assert(maxStreak <= nDays - (nIslands - 1))
    }
  }

  test("calendar densify: missing days + active days = span days per user") {
    val missing = EventAnalytics.qCalendarDensify(spark, sf).collect()
      .groupBy(_.getLong(0)).map { case (u, rs) => u -> rs.length.toLong }
    val spans = Tables.events(spark, sf).filter(col("user_id") <= 20)
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .groupBy(col("user_id"))
      .agg((datediff(max(col("d")), min(col("d"))) + 1).cast("long").as("span"),
        countDistinct(col("d")).as("active"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    spans.foreach { case (u, span, active) =>
      assert(missing.getOrElse(u, 0L) === span - active, s"user $u")
    }
  }

  test("type-user overlap: jaccard consistent with counts, n_both bounded by set sizes") {
    val rows = EventAnalytics.qTypeUserOverlap(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nBoth, nA, nB, j) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nBoth <= math.min(nA, nB))
      assert(math.abs(j - nBoth.toDouble / (nA + nB - nBoth)) < 1e-4)
    }
  }

  test("event pattern: matches verified by brute force per user") {
    val got = EventAnalytics.qEventPattern(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byUser = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .groupBy(_.getLong(0))
    val expected = byUser.flatMap { case (u, rows) =>
      val types = rows.sortBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
        .map(_.getString(3))
      val n = types.sliding(3).count(w => w.length == 3 &&
        w(0) == "view" && w(1) == "click" && w(2) == "purchase")
      if (n > 0) Some(u -> n.toLong) else None
    }
    assert(got === expected)
  }

  test("hll set ops: union dominates each side, bounded by sum; estimates near exact") {
    val rows = graft.analytics.Relational.qHllSetops(spark, sf).collect()
    assert(rows.nonEmpty)
    val perType = graft.analytics.Relational.qDistinctHllSketch(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val exactByType = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (nIx, estU) = (r.getLong(2), r.getDouble(3))
      assert(estU >= math.max(perType(a), perType(b)) - 1e-9, s"($a,$b) union below max side")
      assert(estU <= perType(a) + perType(b) + 1e-9, s"($a,$b) union above sum")
      val exactU = exactByType(a) + exactByType(b) - nIx
      assert(math.abs(estU - exactU) / exactU < 0.35,
        s"($a,$b) union est $estU vs exact $exactU")
    }
  }

  test("chi-square: contributions non-negative, event counts account for every event") {
    val rows = EventAnalytics.qChiSquare(spark, sf).collect()
    assert(rows.forall(_.getDouble(2) >= 0.0))
    assert(rows.map(_.getLong(1)).sum === Tables.events(spark, sf).count())
  }

  test("user entropy: bounded by log2 of the type count, zero iff single-type") {
    EventAnalytics.qUserEntropy(spark, sf).collect().foreach { r =>
      val (u, nTypes, h) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      assert(h >= 0.0, s"user $u negative entropy")
      assert(h <= math.log(nTypes.toDouble) / math.log(2) + 1e-4,
        s"user $u entropy $h exceeds log2($nTypes)")
      if (nTypes == 1) assert(h === 0.0)
    }
  }

  test("running distinct: final cumulative count equals total distinct users, monotone non-decreasing") {
    val rows = EventAnalytics.qRunningDistinct(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val totalUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(rows.last._4 === totalUsers)
    assert(rows.map(_._3).sum === totalUsers) // every user is new exactly once
    rows.sliding(2).foreach { pair =>
      val (a, b) = (pair(0), pair(1))
      assert(b._4 >= a._4, s"cumulative dipped at day ${b._1}")
    }
    rows.foreach { case (d, nActive, nNew, cum) =>
      assert(nNew <= nActive, s"day $d: more new users than active")
      assert(nActive <= cum, s"day $d: actives exceed cumulative distinct")
    }
  }

  test("time-weighted average lies inside the value range; intervals = n-1 per type") {
    val twa = EventAnalytics.qTimeWeightedAvg(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_intervals"), r.getAs[Double]("twa_value")))).toMap
    val perType = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("lo"), max(col("value")).as("hi"))
      .collect()
    assert(perType.nonEmpty)
    perType.foreach { r =>
      val t = r.getAs[String]("event_type")
      val (nIntervals, v) = twa(t)
      assert(nIntervals === r.getAs[Long]("n") - 1, s"type $t interval count")
      // milli-quantization of values can move the bound by at most 1e-3
      assert(v >= r.getAs[Double]("lo") - 1e-3 && v <= r.getAs[Double]("hi") + 1e-3,
        s"type $t twa $v outside value range")
    }
  }
}
