package graft

import org.apache.spark.sql.functions._

import graft.analytics.{EventAnalytics, Stats}
import graft.multimodal.Media
import graft.similarity.Ann
import graft.sources.Tables
import graft.syncer.SyncOps
import graft.text.{CorpusOps, TextAnalysis}

/** Invariant coverage for the second round-7 batch: token-budget
  * corpus selection, the sampled pairwise-cosine histogram, and the
  * per-type daily trend slope. Each test cross-checks the distributed
  * result against a local recomputation or a conservation law.
  */
class Round7bOpsSpec extends GraftSpec {

  test("token budget: greedy 60% prefix matches a local sort, per-lang conserved") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map { r =>
        val toks = r.getString(2).trim.toLowerCase.split("\\s+")
        val stop = toks.count(t => t == "the" || t == "a").toDouble
        val n = toks.length.toDouble
        val q = BigDecimal((1.0 - stop / n) * math.min(1.0, n / 50.0))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (r.getLong(0), r.getString(1), toks.length.toLong,
          math.round(q * 10000))
      }
    val budget = docs.map(_._3).sum * 6 / 10
    val ordered = docs.sortBy { case (id, _, _, qs) => (-qs, id) }
    var cum = 0L
    val sel = ordered.takeWhile { case (_, _, t, _) =>
      val take = cum < budget; cum += t; take
    }
    val localByLang = sel.groupBy(_._2).map { case (l, ds) =>
      l -> ((ds.length.toLong, ds.map(_._3).sum))
    }
    val rows = CorpusOps.corpusTokenBudget(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, t) = localByLang(r.getString(0))
      assert(r.getAs[Long]("n_selected") === n)
      assert(r.getAs[Long]("toks_selected") === t)
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_docs"))
      val share = r.getAs[Double]("tok_share")
      assert(share > 0 && share <= 1.0)
    }
    // the greedy prefix covers at least the budget overall
    assert(rows.map(_.getAs[Long]("toks_selected")).sum >= budget)
  }

  test("cosine hist: pair accounting over the hash sample, shares sum to 1") {
    val rows = Ann.vecCosineHist(spark, sf).collect()
    val nSample = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 19 === 0).count()
    val expectPairs = nSample * (nSample - 1) / 2
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === expectPairs)
    assert(math.abs(rows.map(_.getAs[Double]("share")).sum - 1.0) < 0.01)
    rows.foreach { r =>
      val band = r.getAs[Long]("band")
      assert(band >= -10 && band <= 10)
      assert(math.abs(r.getAs[Double]("cos_lo") - band / 10.0) < 1e-9)
    }
  }

  test("trend slope: matches a local OLS fit per event type") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("y")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val local = daily.groupBy(_._1).map { case (t, ds) =>
      val d0 = ds.map(_._2).min
      val xy = ds.map { case (_, d, y) =>
        (java.time.temporal.ChronoUnit.DAYS.between(d0, d), y)
      }
      val n = xy.length.toLong
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxy = xy.map { case (x, y) => x * y }.sum
      val sxx = xy.map { case (x, _) => x * x }.sum
      t -> ((n, (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble))
    }
    val rows = Stats.qTrendSlope(spark, sf).collect()
    assert(rows.length === local.size)
    rows.foreach { r =>
      val (n, slope) = local(r.getString(0))
      assert(r.getAs[Long]("n_days") === n)
      assert(math.abs(r.getAs[Double]("slope_per_day") - slope) < 1e-3)
    }
  }

  test("catchup eta: backlog matches oldest-pending, eta = pending/rate") {
    val rows = SyncOps.syncCatchupEta(spark, sf).collect()
    val pendingByCf = SyncOps.syncOldestPending(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("pending_bytes")).toMap
    assert(rows.map(r => r.getString(0) -> r.getAs[Long]("pending_bytes")).toMap
      === pendingByCf)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("rate_bytes_s"))) {
        val rate = r.getAs[Double]("rate_bytes_s")
        val eta = r.getAs[Double]("eta_s")
        assert(rate > 0)
        // eta ≈ pending / rate (both rounded independently)
        val expect = r.getAs[Long]("pending_bytes") / rate
        assert(math.abs(eta - expect) / math.max(expect, 1.0) < 0.01)
      }
    }
  }

  test("top movers: the reported swing is the max |WoW delta| per type") {
    val weekly = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        to_date(date_trunc("week", col("ts"))).as("week"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val local = weekly.groupBy(_._1).map { case (t, ws) =>
      val sorted = ws.sortBy(_._2.toEpochDay).toList
      val deltas = sorted.sliding(2).collect {
        case List((_, _, p), (_, wk, n)) => (wk, n, p, n - p)
      }.toSeq
      t -> deltas.minBy { case (wk, _, _, d) => (-math.abs(d), wk.toEpochDay) }
    }
    val rows = EventAnalytics.qTopMovers(spark, sf).collect()
    assert(rows.length === local.size)
    rows.foreach { r =>
      val (wk, n, p, d) = local(r.getString(0))
      assert(r.getDate(1).toLocalDate === wk)
      assert(r.getAs[Long]("week_n") === n)
      assert(r.getAs[Long]("prev_week_n") === p)
      assert(r.getAs[Long]("delta") === d)
    }
  }

  test("sim threshold sweep: monotone, consistent with the cosine histogram") {
    val rows = Ann.vecSimThresholdSweep(spark, sf).collect()
    assert(rows.length === 4)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_edges") >= b.getAs[Long]("n_edges"))
        assert(a.getAs[Long]("n_nodes") >= b.getAs[Long]("n_nodes"))
      case _ => ()
    }
    // edges at the loosest threshold ≤ all sampled pairs
    val nSample = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 19 === 0).count()
    assert(rows.head.getAs[Long]("n_edges") <= nSample * (nSample - 1) / 2)
    assert(rows.head.getAs[Long]("n_nodes") <= nSample)
  }

  test("weekend effect: day accounting conserved, lift consistent with averages") {
    val rows = EventAnalytics.qWeekendEffect(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDays = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts"))).distinct().count()
    assert(rows.map(r => r.getAs[Long]("weekend_days") +
      r.getAs[Long]("weekday_days")).sum === nDays)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("weekend_lift"))) {
        val lift = r.getAs[Double]("weekend_lift")
        val ratio = r.getAs[Double]("avg_weekend") / r.getAs[Double]("avg_weekday")
        assert(math.abs(lift - ratio) < 0.01, s"lift $lift vs ratio $ratio")
      }
    }
  }

  test("char entropy: bounds and exact small-case value") {
    val rows = TextAnalysis.textCharEntropy(spark, sf).collect()
    assert(rows.length === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val h = r.getAs[Double]("char_entropy")
      val k = r.getAs[Long]("n_distinct_chars")
      assert(h >= -1e-4, s"entropy must be non-negative: $h")
      assert(h <= math.log(k.toDouble) / math.log(2.0) + 1e-4,
        s"entropy $h exceeds log2($k)")
    }
    // local recomputation on a handful of docs
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).limit(5).collect()
    val byId = rows.map(r => r.getLong(0) -> r.getAs[Double]("char_entropy")).toMap
    docs.foreach { d =>
      val cs = d.getString(1).toCharArray.groupBy(identity).map(_._2.length.toDouble)
      val n = d.getString(1).length.toDouble
      val h = math.log(n) / math.log(2) -
        cs.map(c => c * math.log(c) / math.log(2)).sum / n
      assert(math.abs(byId(d.getLong(0)) - h) < 1e-3)
    }
  }

  test("snapshot diff: appended slice counted, compaction row-invisible") {
    val rows = graft.sources.TxnLog.ioSnapshotDiff(spark, sf).collect()
    assert(rows.length === 2)
    val late = Tables.orders(spark, sf)
      .filter(to_date(col("o_orderdate")) >= lit("1998-01-01").cast("date"))
      .count()
    val r01 = rows.find(_.getAs[Long]("from_version") == 0L).get
    assert(r01.getAs[Long]("rows_added") === late)
    assert(r01.getAs[Long]("rows_removed") === 0L)
    val r12 = rows.find(_.getAs[Long]("from_version") == 1L).get
    assert(r12.getAs[Long]("rows_added") === 0L)
    assert(r12.getAs[Long]("rows_removed") === 0L)
    assert(r12.getAs[Long]("added_value_c") === 0L)
  }

  test("top terms: at most 3 per doc, scores non-increasing, terms from the doc") {
    val rows = TextAnalysis.textTopTerms(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.values.forall(_.length <= 3))
    byDoc.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Long]("rnk")).toSeq === (1L to sorted.length).toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("tfidf") >= b.getAs[Double]("tfidf") - 1e-9)
        case _ => ()
      }
    }
    val doc0 = Tables.documents(spark, sf).filter(col("doc_id") === 0L)
      .select(col("text")).head().getString(0)
      .trim.toLowerCase.split("\\s+").toSet
    byDoc(0L).foreach(r => assert(doc0.contains(r.getAs[String]("term"))))
  }

  test("near-dup by source: doc accounting conserved, involvement matches pairs") {
    val rows = graft.dedup.Dedup.corpusNearDupBySource(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    val involved = graft.dedup.Dedup.minhashCandidatePairs(spark, sf)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_near_dup")).sum === involved)
    rows.foreach { r =>
      val rate = r.getAs[Double]("near_dup_rate")
      assert(rate >= 0 && rate <= 1.0)
      assert(r.getAs[Long]("n_near_dup") <= r.getAs[Long]("n_docs"))
    }
  }

  test("minhash calibration: estimates bounded, pair count matches candidates") {
    val rows = graft.dedup.Dedup.dedupMinhashCalibration(spark, sf).collect()
    assert(rows.nonEmpty)
    val k = graft.dedup.Dedup.MinhashK
    rows.foreach { r =>
      val agree = r.getAs[Long]("n_agree")
      assert(agree >= 0 && agree <= k)
      val est = r.getAs[Double]("est_jaccard")
      assert(math.abs(est - agree.toDouble / k) < 5e-5) // est rounded to 4dp
      val mj = r.getAs[Double]("mean_exact_jaccard")
      assert(mj >= 0 && mj <= 1.0)
    }
    // buckets partition the candidate-pair set (over representatives)
    val reps = graft.dedup.Dedup.minhashSignaturesOf(
      Tables.documents(spark, sf).groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id")))
    val nCand = graft.dedup.Dedup.minhashCandidatePairsOf(reps).count()
    assert(rows.map(_.getAs[Long]("n_pairs")).sum === nCand)
  }

  test("size outliers: bounded rate, chebyshev cap for 2-sigma") {
    val rows = Media.mmSizeOutliers(spark, sf).collect()
    assert(rows.length === 3)
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_assets")).sum === nDocs)
    rows.foreach { r =>
      val rate = r.getAs[Double]("outlier_rate")
      // Chebyshev: P(|X-mu| > 2 sigma) <= 1/4
      assert(rate >= 0 && rate <= 0.25 + 1e-9)
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n_assets"))
    }
  }

  test("format profile: byte accounting conserved across mimes") {
    val rows = Media.mmFormatProfile(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq
      === Seq("audio/wav", "image/png", "video/mp4"))
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_assets")).sum === nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_bytes") <= r.getAs[Long]("max_bytes"))
      val avg = r.getAs[Double]("avg_bytes")
      assert(avg >= r.getAs[Long]("min_bytes").toDouble - 1 &&
        avg <= r.getAs[Long]("max_bytes").toDouble + 1)
      assert(r.getAs[Long]("n_geometries") >= 1 &&
        r.getAs[Long]("n_geometries") <= r.getAs[Long]("n_assets"))
    }
  }
}
