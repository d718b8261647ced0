package graft

import org.apache.spark.sql.functions._

import graft.analytics.EventAnalytics
import graft.sources.Tables
import graft.text.TextAnalysis

/** Invariant coverage for the round-6 product-analytics batch:
  * basket lift, RFM segmentation, cohort LTV, funnel latency, and
  * the tf-idf document-kNN.
  */
class ProductAnalyticsSpec extends GraftSpec {

  test("basket lift: supports respect the apriori cuts and confidence is consistent") {
    val rows = EventAnalytics.qBasketLift(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("pa") < r.getAs[Long]("pb"))
      assert(r.getAs[Long]("sup_ab") >= 3)
      assert(r.getAs[Long]("sup_a") >= 20 && r.getAs[Long]("sup_b") >= 20)
      val conf = r.getAs[Double]("confidence")
      assert(conf > 0 && conf <= 1.0)
      assert(math.abs(conf -
        r.getAs[Long]("sup_ab").toDouble / r.getAs[Long]("sup_a")) < 1e-4)
      assert(r.getAs[Double]("lift") > 0)
    }
    // output is ranked by lift
    val lifts = rows.map(_.getAs[Double]("lift")).toSeq
    assert(lifts === lifts.sorted.reverse)
  }

  test("rfm segments: quintile labels in range and every customer lands in one cell") {
    val rows = EventAnalytics.qRfmSegments(spark, sf).collect()
    val nCust = Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_cust")).sum === nCust)
    rows.foreach { r =>
      Seq("rq", "fq", "mq").foreach { c =>
        val q = r.getAs[Long](c); assert(q >= 1 && q <= 5)
      }
      assert(r.getAs[Long]("n_cust") > 0)
      assert(r.getAs[Double]("avg_monetary") > 0)
    }
  }

  test("cohort ltv: cumulative value is non-decreasing in age within each cohort") {
    val rows = EventAnalytics.qCohortLtv(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("cohort_mon")).values.foreach { g =>
      val byAge = g.sortBy(_.getAs[Long]("age"))
      assert(byAge.head.getAs[Long]("age") === 0L)
      val curve = byAge.map(_.getAs[Double]("ltv_per_cust")).toSeq
      assert(curve.zip(curve.tail).forall { case (a, b) => b >= a })
      assert(g.map(_.getAs[Long]("n_cust")).distinct.length === 1)
    }
  }

  test("funnel latency: ordered steps yield non-negative latencies with p50 <= p90") {
    val rows = EventAnalytics.qFunnelLatency(spark, sf).collect()
    assert(rows.map(_.getAs[String]("step")).toSet ===
      Set("view_to_click", "click_to_purchase"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") > 0)
      assert(r.getAs[Double]("mean_us") >= 0)
      assert(r.getAs[Double]("p50_us") <= r.getAs[Double]("p90_us"))
      assert(r.getAs[Double]("p50_us") >= 0)
    }
  }

  test("changepoint: cusum starts near the first deviation and ends at ~0, exactly one peak") {
    val rows = EventAnalytics.qChangepoint(spark, sf).collect()
    assert(rows.length > 1)
    // CUSUM of deviations from the series mean telescopes to 0
    assert(math.abs(rows.last.getAs[Double]("cusum")) < 0.01)
    assert(rows.count(_.getAs[Boolean]("is_peak")) === 1)
    val peak = rows.filter(_.getAs[Boolean]("is_peak")).head.getAs[Double]("cusum")
    assert(rows.forall(r => math.abs(r.getAs[Double]("cusum")) <= math.abs(peak)))
  }

  test("session paths: at most 10 paths of <=3 known steps, counts cover <= user total") {
    val rows = EventAnalytics.qSessionPathTopk(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val types = Set("signup", "view", "click", "purchase", "error")
    rows.foreach { r =>
      val steps = r.getAs[String]("path").split(">")
      assert(steps.length <= 3 && steps.forall(types.contains))
      assert(r.getAs[Long]("n_users") > 0)
    }
    val ns = rows.map(_.getAs[Long]("n_users")).toSeq
    assert(ns === ns.sorted.reverse)
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(ns.sum <= nUsers)
  }

  test("churn by engagement: quartiles partition all users and rates are consistent") {
    val rows = EventAnalytics.qChurnByEngagement(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("quartile")).toSeq === Seq(1L, 2L, 3L, 4L))
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum === nUsers)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_churned") <= r.getAs[Long]("n_users"))
      val rate = r.getAs[Double]("churn_rate")
      assert(rate >= 0 && rate <= 1)
    }
    // mean events/user is non-decreasing in quartile (sorted buckets)
    val avg = rows.sortBy(_.getAs[Long]("quartile"))
      .map(r => r.getAs[Long]("tot_events").toDouble / r.getAs[Long]("n_users"))
    assert(avg.zip(avg.tail).forall { case (a, b) => b >= a })
  }

  test("bootstrap ci: interval brackets the point mean with positive width") {
    val rows = graft.analytics.Stats.qBootstrapCi(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      val (lo, m, hi) = (r.getAs[Double]("ci_lo"),
        r.getAs[Double]("mean_value"), r.getAs[Double]("ci_hi"))
      assert(lo < hi)
      // Poisson-bootstrap CI of the mean brackets the sample mean
      assert(lo <= m && m <= hi)
    }
  }

  test("bandwidth windows: every window under cap with contiguous generation ranges") {
    val backlog = graft.syncer.SyncOps.syncDiffUpload(spark, sf)
      .agg(sum(col("size_bytes")), max(col("size_bytes"))).collect().head
    val (total, maxFile) = (backlog.getLong(0), backlog.getLong(1))
    val rows = graft.syncer.SyncOps.syncBandwidthWindows(spark, sf).collect()
    assert(rows.length === ((total - 1) / 16777216L + 1))
    assert(rows.map(_.getAs[Long]("window_bytes")).sum === total)
    val byIdx = rows.sortBy(_.getAs[Long]("window_idx"))
    assert(byIdx.map(_.getAs[Long]("window_idx")).toSeq ===
      (0L until rows.length).toSeq)
    byIdx.foreach { r =>
      // a window only exceeds the cap by at most its straddling file
      assert(r.getAs[Long]("window_bytes") <= 16777216L + maxFile)
      assert(r.getAs[Long]("first_gen") <= r.getAs[Long]("last_gen"))
    }
    // generation ranges are disjoint and ordered across windows
    assert(byIdx.sliding(2).forall {
      case Array(a, b) => a.getAs[Long]("last_gen") < b.getAs[Long]("first_gen")
      case _ => true
    })
  }

  test("vad segments: run-length accounting is internally consistent per doc") {
    val rows = graft.multimodal.Media.mmVadSegments(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nf, na, ns, mr) = (r.getAs[Long]("n_frames"), r.getAs[Long]("n_active"),
        r.getAs[Long]("n_segments"), r.getAs[Long]("max_run"))
      assert(nf > 0 && na <= nf)
      assert((ns == 0) === (na == 0))
      assert(mr <= na && ns <= na)
      // segments are maximal runs: k segments need >= k active frames
      // and can't be longer than the longest run times the count
      assert(na <= ns * mr || ns == 0)
    }
    // threshold actually separates: some docs mixed
    assert(rows.exists(r => r.getAs[Long]("n_segments") > 1))
  }

  test("lexical complexity: ratios in valid ranges per language") {
    val rows = TextAnalysis.textLexicalComplexity(spark, sf).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0)
      assert(r.getAs[Double]("avg_word_len") >= 1.0)
      assert(r.getAs[Double]("avg_syl_per_word") > 0)
      val lwr = r.getAs[Double]("long_word_ratio")
      assert(lwr >= 0 && lwr <= 1)
      val ttr = r.getAs[Double]("type_token_ratio")
      assert(ttr > 0 && ttr <= 1)
    }
  }

  test("assortativity: endpoint count is twice the edge count, r in [-1, 1]") {
    val r = graft.graph.GraphOps.graphAssortativity(spark, sf).collect().head
    assert(r.getAs[Long]("n_endpoints") % 2 === 0 && r.getAs[Long]("n_endpoints") > 0)
    if (!r.isNullAt(r.fieldIndex("assortativity"))) {
      val a = r.getAs[Double]("assortativity")
      assert(a >= -1.0 && a <= 1.0)
    }
  }

  test("new vs returning: actives decompose exactly and new users sum to the user count") {
    val rows = EventAnalytics.qNewVsReturning(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") ===
        r.getAs[Long]("n_new") + r.getAs[Long]("n_returning"))
    }
    val first = rows.minBy(_.getAs[java.sql.Date]("day").getTime)
    assert(first.getAs[Long]("n_returning") === 0L)
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_new")).sum === nUsers)
  }

  test("stream sketch distinct: streamed HLL windows match the batch sketch per window") {
    val streamed = graft.streaming.StreamWatcher
      .streamSketchDistinctQuery(spark, sf).collect()
    assert(streamed.nonEmpty)
    streamed.foreach(r => assert(r.getAs[Double]("hll_estimate") > 0))
    // the streamed register state must equal a batch recompute of the
    // same sketch on the same windows — merge order must not matter
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(graft.functions.HllAggFunctions
        .hll_sketch(col("user_id").cast("string")).as("hll"))
      .select(col("hour_start"), col("event_type"),
        col("hll.reg_digest").as("reg_digest"))
      .collect()
      .map(r => (r.get(0).toString, r.getString(1)) -> r.getString(2)).toMap
    streamed.foreach { r =>
      val key = (r.get(0).toString, r.getString(1))
      assert(batch(key) === r.getAs[String]("reg_digest"))
    }
  }

  test("tfidf knn: dense ranks per doc, no self-pairs, cosine in (0, 1]") {
    val rows = TextAnalysis.textTfidfKnn(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") !== r.getAs[Long]("nbr_id"))
      val c = r.getAs[Double]("cos")
      // weights are positive (idf > ln(10) under the df cap)
      assert(c > 0 && c <= 1.0001)
    }
    rows.groupBy(_.getAs[Long]("doc_id")).values.foreach { g =>
      val byRnk = g.sortBy(_.getAs[Long]("rnk"))
      assert(byRnk.map(_.getAs[Long]("rnk")).toSeq === (1L to g.length))
      val cs = byRnk.map(_.getAs[Double]("cos")).toSeq
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }
}
