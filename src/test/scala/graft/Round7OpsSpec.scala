package graft

import org.apache.spark.sql.functions._

import graft.analytics.{EventAnalytics, Relational}
import graft.similarity.Ann
import graft.sources.Tables
import graft.syncer.SyncOps
import graft.text.TextAnalysis

/** Invariant coverage for the round-7 batch: engagement/cadence
  * analytics (stickiness, peaks, gaps, modal hour, Pareto, repeat
  * interval), corpus hapax QA, IVF cell balance, per-dim embedding
  * stats, and the sync backlog-age report. Each test cross-checks the
  * distributed result against an independent local recomputation or a
  * conservation law the operator must satisfy.
  */
class Round7OpsSpec extends GraftSpec {

  test("stickiness: ratio bounded by 1, day accounting conserved") {
    val rows = EventAnalytics.qStickiness(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDays = Tables.events(spark, sf)
      .select(to_date(col("ts"))).distinct().count()
    assert(rows.map(_.getAs[Long]("n_days")).sum === nDays)
    rows.foreach { r =>
      val st = r.getAs[Double]("stickiness")
      assert(st > 0 && st <= 1.0, s"stickiness out of range: $st")
      // a day's actives never exceed the week's actives
      assert(r.getAs[Double]("avg_dau") <= r.getAs[Long]("wau").toDouble + 1e-9)
    }
  }

  test("peak days: every reported day strictly beats both neighbors") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getDate(1).toLocalDate) -> r.getLong(2))
      .toMap
    val peaks = EventAnalytics.qPeakDays(spark, sf).collect()
    assert(peaks.nonEmpty)
    peaks.foreach { r =>
      val t = r.getString(0); val d = r.getDate(1).toLocalDate
      val n = r.getAs[Long]("n_events")
      assert(daily((t, d)) === n)
      assert(n > daily((t, d.minusDays(1))) && n > daily((t, d.plusDays(1))))
    }
  }

  test("inter-event gaps: gap conservation (events minus users) and ordering") {
    val rows = EventAnalytics.qInterEventGaps(spark, sf).collect()
    val e = Tables.events(spark, sf)
    val expectGaps = e.count() - e.select(col("user_id")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_gaps")).sum === expectGaps)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_gap_s") >= 0)
      assert(r.getAs[Long]("min_gap_s") <= r.getAs[Long]("max_gap_s"))
      val avg = r.getAs[Double]("avg_gap_s")
      assert(avg >= r.getAs[Long]("min_gap_s").toDouble - 1 &&
        avg <= r.getAs[Long]("max_gap_s").toDouble + 1)
    }
  }

  test("modal hour: matches a local mode with smallest-hour tie-break") {
    val local = Tables.events(spark, sf)
      .groupBy(col("event_type"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) =>
        val best = rs.map(r => (r.getAs[Long]("n"), r.getAs[Int]("hr")))
          .minBy { case (n, h) => (-n, h) }
        t -> best
      }
    val rows = EventAnalytics.qModalHour(spark, sf).collect()
    assert(rows.length === local.size)
    rows.foreach { r =>
      val (n, h) = local(r.getString(0))
      assert(r.getAs[Long]("modal_hour") === h.toLong)
      assert(r.getAs[Long]("n_at_mode") === n)
      val share = r.getAs[Double]("mode_share")
      assert(share > 0 && share <= 1.0)
    }
  }

  test("pareto share: banded rank+cumsum equals the local exact 80% cut") {
    val revs = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // local reference: sort desc by (rev, custkey asc), take until >= 80%
    val sorted = revs.sortBy { case (k, v) => (-v, k) }
    val tot = sorted.map(_._2).sum
    var cum = 0L; var nTop = 0
    for ((_, v) <- sorted if cum * 5 < tot * 4) { cum += v; nTop += 1 }
    val r = Relational.qParetoShare(spark, sf).collect()
    assert(r.length === 1)
    assert(r(0).getAs[Long]("n_customers") === revs.length.toLong)
    assert(r(0).getAs[Long]("n_top") === nTop.toLong)
    assert(r(0).getAs[Long]("top_rev_c") === cum)
    assert(r(0).getAs[Long]("tot_rev_c") === tot)
    assert(r(0).getAs[Double]("rev_share") >= 0.8)
  }

  test("repeat interval: gap conservation (orders minus customers), buckets closed") {
    val rows = Relational.qRepeatInterval(spark, sf).collect()
    val o = Tables.orders(spark, sf)
    val expectGaps = o.count() - o.select(col("o_custkey")).distinct().count()
    assert(rows.map(_.getAs[Long]("n_gaps")).sum === expectGaps)
    val buckets = Set("a_0_7", "b_8_30", "c_31_90", "d_90_plus")
    rows.foreach { r =>
      assert(buckets.contains(r.getString(0)))
      assert(r.getAs[Long]("min_days") <= r.getAs[Long]("max_days"))
    }
  }

  test("hapax ratio: per-lang vocabulary accounting matches a local count") {
    val rows = TextAnalysis.textHapaxRatio(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
    val local = docs.groupBy(_.getString(0)).map { case (lang, ds) =>
      val tf = scala.collection.mutable.Map.empty[String, Long]
      ds.foreach(_.getString(1).trim.toLowerCase.split("\\s+")
        .foreach(t => tf(t) = tf.getOrElse(t, 0L) + 1L))
      lang -> ((tf.size.toLong, tf.valuesIterator.count(_ == 1L).toLong,
        tf.valuesIterator.sum))
    }
    rows.foreach { r =>
      val (vocab, hapax, toks) = local(r.getString(0))
      assert(r.getAs[Long]("vocab_size") === vocab)
      assert(r.getAs[Long]("n_hapax") === hapax)
      assert(r.getAs[Long]("n_tokens") === toks)
    }
  }

  test("cell balance: occupancy conserves the corpus and shares sum to 1") {
    val rows = Ann.annCellBalance(spark, sf).collect()
    val nVecs = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum === nVecs)
    val shareSum = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shareSum - 1.0) < 0.01)
    rows.foreach(r => assert(r.getAs[Double]("imbalance") > 0))
  }

  test("dim stats: one row per dimension, each counting every vector") {
    val rows = Ann.vecDimStats(spark, sf).collect()
    val e = Tables.embeddings(spark, sf)
    val nVecs = e.count()
    val dim = e.select(size(col("embedding"))).head().getInt(0)
    assert(rows.length === dim)
    assert(rows.map(_.getAs[Long]("dim")).sorted.toSeq === (0L until dim).toSeq)
    rows.foreach { r =>
      assert(r.getAs[Long]("n") === nVecs)
      assert(r.getAs[Double]("min_x") <= r.getAs[Double]("mean_x") + 1e-4)
      assert(r.getAs[Double]("mean_x") <= r.getAs[Double]("max_x") + 1e-4)
      assert(r.getAs[Double]("sd_x") >= 0)
    }
  }

  test("oldest pending: per-cf counts equal the upload diff, mtimes ordered") {
    val rows = SyncOps.syncOldestPending(spark, sf).collect()
    val diffByCf = SyncOps.syncDiffUpload(spark, sf)
      .groupBy(col("cf")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getString(0) -> r.getAs[Long]("n_pending")).toMap
      === diffByCf)
    rows.foreach { r =>
      assert(r.getAs[Long]("oldest_mtime_us") <= r.getAs[Long]("newest_mtime_us"))
      assert(r.getAs[Long]("pending_bytes") >= 0)
    }
  }
}
