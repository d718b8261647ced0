package graft

import org.apache.spark.sql.functions._

import graft.analytics.Stats
import graft.sources.Tables

/** Mathematical invariants of the distributed-statistics operators
  * that the value-level DuckDB oracle doesn't express.
  */
class StatsSpec extends GraftSpec {

  test("linreg: r2 in [0,1] and the fitted line passes through each type's (x̄, ȳ)") {
    val rows = Stats.qLinreg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val r2 = r.getDouble(4)
      assert(r2 >= 0.0 && r2 <= 1.0, s"${r.getString(0)}: r2=$r2")
    }
    // slope·x̄ + intercept ≈ ȳ (the OLS normal equations force this)
    val means = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(avg(datediff(to_date(col("ts")), lit("1970-01-01").cast("date")) - 20000)
        .as("mx"), avg(col("value")).as("my"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (mx, my) = means(r.getString(0))
      val fitted = r.getDouble(2) * mx + r.getDouble(3)
      assert(math.abs(fitted - my) < 0.01,
        s"${r.getString(0)}: fitted mean $fitted vs actual $my")
    }
  }

  test("ks test: D in [0,1], and identical-sample D would be 0") {
    val rows = Stats.qKsTest(spark, sf).collect()
    assert(rows.length >= 2)
    rows.foreach { r =>
      val d = r.getDouble(2)
      assert(d >= 0.0 && d <= 1.0, s"${r.getString(0)}: ks_d=$d")
    }
    // n_events per type must account for the whole fact table
    val total = rows.map(_.getLong(1)).sum
    assert(total === Tables.events(spark, sf).count())
  }

  test("mutual info: each per-type contribution is non-negative (Gibbs)") {
    val rows = Stats.qMutualInfo(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // p(x)·KL(p(dow|x) ‖ p(dow)) ≥ 0; rounding can dip 1 ulp below 0
      assert(r.getDouble(2) >= -1e-4, s"${r.getString(0)}: mi=${r.getDouble(2)}")
    }
  }

  test("cms estimate: never undercounts, and is exact absent collisions") {
    val rows = Stats.qCmsEstimate(spark, sf).collect()
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(rows.length === math.min(20L, nUsers))
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"user ${r.getLong(0)}: cms ${r.getLong(2)} < exact ${r.getLong(1)}")
    }
    // the sketch's total mass per depth equals the event count, so the
    // mean overestimate is bounded by n/w per collision row
    val n = Tables.events(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(2) - r.getLong(1) <= n,
        s"user ${r.getLong(0)}: overestimate exceeds table size")
    }
  }

  test("decay score: positive and bounded by the undecayed per-user sum") {
    val scores = graft.analytics.EventAnalytics.qDecayScore(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(2))
    val plain = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(sum(col("value")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.nonEmpty)
    scores.foreach { case (u, d) =>
      assert(d > 0.0 && d <= plain(u) + 1e-6, s"user $u: decay $d vs plain ${plain(u)}")
    }
  }

  test("copurchase jaccard: common bounded by each side's order count, jaccard in (0,1]") {
    val rows = graft.graph.GraphOps.copurchaseJaccard(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (common, na, nb, j) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(common >= 2 && common <= math.min(na, nb))
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("equidepth histogram: buckets partition the table with monotone bounds") {
    val rows = Stats.qEquidepthHist(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === (1L to 10L))
    assert(rows.map(_.getLong(2)).sum === Tables.events(spark, sf).count())
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(4) < b.getDouble(3),
        s"bucket ${a.getLong(0)} hi ${a.getDouble(4)} overlaps ${b.getDouble(3)}")
    case _ => ()
    }
  }

  test("weighted sample: deterministic, ordered, and biased toward heavy docs") {
    val a = Stats.qWeightedSample(spark, sf).collect()
    val b = Stats.qWeightedSample(spark, sf).collect()
    assert(a.map(_.getLong(0)).toSeq === b.map(_.getLong(0)).toSeq)
    val prios = a.map(_.getDouble(2))
    assert(prios.sameElements(prios.sorted))
    assert(prios.forall(_ > 0.0))
  }

  test("attribution: purchases credited only to non-purchase channels, none lost mid-stream") {
    val rows = graft.analytics.EventAnalytics.qAttribution(spark, sf).collect()
    assert(rows.nonEmpty)
    val channels = rows.map(_.getString(0)).toSet
    assert(!channels.contains("purchase"))
    val attributed = rows.map(_.getLong(1)).sum
    val purchases = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    // only purchases with no prior event at all go uncredited
    assert(attributed <= purchases && attributed > purchases / 2)
  }

  test("dataset drift: PSI is non-negative (every common-bin term is)") {
    val rows = Stats.qDatasetDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0, s"${r.getString(0)}: psi=${r.getDouble(3)}")
      assert(r.getLong(1) > 0 && r.getLong(2) > 0)
    }
  }

  test("welch t-test: cohort sizes account for every event; t is finite") {
    val rows = Stats.qTtestAb(spark, sf).collect()
    val totals = Tables.events(spark, sf).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) === totals(r.getString(0)))
      assert(!r.getDouble(5).isNaN && !r.getDouble(5).isInfinite)
    }
  }

  test("gini: in [0,1) and zero for a perfectly uniform distribution") {
    val row = Stats.qGini(spark, sf).collect().head
    val g = row.getDouble(2)
    assert(g >= 0.0 && g < 1.0, s"gini=$g")
    // uniform fixture: every key exactly once → G = 0
    import spark.implicits._
    val uniform = Seq.tabulate(40)(i => (i.toLong, 1L)).toDF("user_id", "x")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("x"), col("user_id"))
    val g0 = uniform.withColumn("r", row_number().over(w))
      .agg((lit(2.0) * sum(col("r") * col("x")) /
        (count(lit(1)) * sum(col("x"))) -
        (count(lit(1)) + 1).cast("double") / count(lit(1))).as("g"))
      .collect().head.getDouble(0)
    assert(math.abs(g0) < 1e-9)
  }

  test("shard balance: 16 shards cover all docs with bounded byte skew") {
    val rows = graft.sources.Io.ioShardBalance(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSet === (0L until 16L).toSet)
    assert(rows.map(_.getLong(1)).sum === Tables.documents(spark, sf).count())
    val sizes = rows.map(_.getLong(2))
    assert(sizes.max.toDouble / sizes.min < 1.5,
      s"skew ${sizes.max}/${sizes.min}")
  }

  test("survival curve: hazard accumulates, survival decays monotonically, risk set shrinks") {
    val rows = Stats.qSurvivalCurve(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(0) < b.getLong(0))
        assert(a.getLong(1) > b.getLong(1), "n_risk must shrink with t")
        assert(a.getDouble(3) <= b.getDouble(3), "cumulative hazard must not decrease")
        assert(a.getDouble(4) >= b.getDouble(4), "survival must not increase")
      case _ => ()
    }
    rows.foreach { r =>
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(2) <= r.getLong(1), "more churns than at-risk users")
    }
  }

  test("ucb1: exploration bonus strictly positive, shrinking with pulls") {
    val rows = Stats.qUcbArms(spark, sf).collect()
    assert(rows.nonEmpty)
    val bonuses = rows.map(r => r.getLong(1) -> (r.getDouble(3) - r.getDouble(2)))
    bonuses.foreach { case (n, bonus) => assert(bonus > 0.0, s"n=$n bonus=$bonus") }
    // bigger n → smaller bonus (within rounding)
    bonuses.sortBy(_._1).sliding(2).foreach {
      case Array((n1, b1), (n2, b2)) if n1 < n2 => assert(b1 >= b2 - 1e-4)
      case _ => ()
    }
  }

  test("ivf recall sweep: recall is monotone non-decreasing in nprobe") {
    val rows = graft.similarity.Ann.annIvfRecallSweep(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L))
    val recalls = rows.map(_.getDouble(2))
    recalls.foreach(r => assert(r >= 0.0 && r <= 1.0))
    recalls.sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-9,
        s"recall fell from $a to $b as nprobe grew")
      case _ => ()
    }
  }

  test("d7 retention: retained never exceeds cohort size, cohorts cover all users") {
    val rows = graft.analytics.EventAnalytics.qD7Retention(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val users = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(rows.map(_.getLong(1)).sum === users)
  }

  test("tuning sweeps: survivors shrink monotonically as thresholds tighten") {
    val dedup = graft.dedup.Dedup.dedupThresholdSweep(spark, sf).collect()
    assert(dedup.length === 4)
    dedup.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getLong(1) >= b.getLong(1), "n_pairs must not grow with threshold")
        assert(a.getLong(2) >= b.getLong(2), "n_dup_docs must not grow with threshold")
      case _ => ()
    }
    dedup.foreach(r => assert(r.getLong(2) <= 2 * r.getLong(1) ||
      (r.getLong(1) == 0 && r.getLong(2) == 0)))
    val quality = graft.text.TextAnalysis.textQualitySweep(spark, sf).collect()
    assert(quality.length === 4)
    quality.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(1) >= b.getLong(1))
      case _ => ()
    }
  }

  test("lang weights: capped at 3x, shares sum to 1, rare langs upweighted") {
    val rows = graft.text.CorpusOps.corpusLangWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 0.01)
    val target = 1.0 / rows.length
    rows.foreach { r =>
      assert(r.getDouble(3) <= 3.0 + 1e-9)
      if (r.getDouble(2) < target / 3) assert(r.getDouble(3) === 3.0)
      if (r.getDouble(2) > target) assert(r.getDouble(3) < 1.0)
    }
  }

  test("seasonal decomposition: full dow coverage per type, non-negative residual spread") {
    val rows = Stats.qSeasonalDecompose(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 0 && r.getLong(1) <= 6)
      assert(r.getLong(2) >= 1)
      assert(r.getDouble(4) >= 0.0)
    }
  }

  test("centroid drift: halves of the same label stay aligned, counts cover the corpus") {
    val rows = graft.similarity.Ann.vecCentroidDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    assert(total === Tables.documents(spark, sf).sparkSession
      .read.parquet(s"$sf/embeddings.parquet").count())
    // at tiny scale the halves are a handful of near-centered vectors,
    // so only the cosine's range is a stable invariant
    rows.foreach(r => assert(r.getDouble(3) >= -1.0 && r.getDouble(3) <= 1.0,
      s"label ${r.get(0)}: half-cosine ${r.getDouble(3)}"))
  }

  test("daily anomaly: one row per day with a defined baseline; flag agrees with z") {
    val rows = graft.analytics.EventAnalytics.qDailyAnomaly(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getDate(0)).distinct.length === rows.length)
    rows.foreach { r =>
      assert(r.getBoolean(4) === (math.abs(r.getDouble(3)) >= 2.0))
    }
  }

  test("holt forecast: level tracks the series scale; forecast = level + 7*trend") {
    val rows = graft.analytics.Stats.qHoltForecast(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, l, b, f) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(n >= 1L)
      assert(f === l + 7.0 * b)
      // smoothing keeps the level inside the observed count range
      val tpe = r.getString(0)
      val daily = graft.sources.Tables.events(spark, sf)
        .filter(org.apache.spark.sql.functions.col("event_type") === tpe)
        .groupBy(org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")))
        .count().collect().map(_.getLong(1))
      assert(l >= daily.min.toDouble - math.abs(b) * daily.length &&
        l <= daily.max.toDouble + math.abs(b) * daily.length)
    }
  }

  test("interpolate gaps: observed rows pass through; gaps blend between neighbors") {
    val rows = graft.analytics.EventAnalytics.qInterpolateGaps(spark, sf).collect()
    assert(rows.nonEmpty)
    // spine is contiguous per type
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val days = rs.map(_.getLong(1)).sorted
      assert(days.zip(days.head to days.last).forall { case (a, b) => a == b })
    }
    rows.foreach { r =>
      if (!r.getBoolean(4)) assert(r.getLong(3) === r.getLong(2) * 1000L)
      else assert(r.isNullAt(2))
    }
    // every interpolated value lies between its neighbors' extremes
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (_, rs) =>
      val obs = rs.filter(!_.getBoolean(4)).map(_.getLong(3))
      if (obs.nonEmpty) {
        val (lo, hi) = (obs.min, obs.max)
        rs.filter(_.getBoolean(4)).foreach { r =>
          assert(r.getLong(3) >= lo - 1000 && r.getLong(3) <= hi + 1000)
        }
      }
    }
  }

  test("cuped: both variants present; adjusted mean shifts by theta * covariate gap") {
    val rows = graft.analytics.Stats.qAbCuped(spark, sf).collect()
    assert(rows.map(_.getLong(0)).sorted === Array(0L, 1L))
    rows.foreach { r =>
      assert(r.getLong(1) > 0)
      // CUPED re-centers, it does not rescale: adjusted mean stays in
      // the neighborhood of the raw mean
      assert(math.abs(r.getDouble(3) - r.getDouble(2)) <
        math.max(1.0, math.abs(r.getDouble(2))))
    }
    // the adjustment is a pure transfer: weighted adjusted means
    // average back to the weighted raw means (theta centers on x-bar)
    val wRaw = rows.map(r => r.getDouble(2) * r.getLong(1)).sum
    val wAdj = rows.map(r => r.getDouble(3) * r.getLong(1)).sum
    assert(math.abs(wRaw - wAdj) < 0.01 * rows.map(_.getLong(1)).sum)
  }

  test("power analysis: sample size scales with variance over squared effect") {
    val rows = graft.analytics.Stats.qPowerAnalysis(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, mean, sd, req) = (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))
      assert(n > 1 && mean > 0 && sd > 0 && req > 0)
      // closed form recheck at spec precision
      val za = 1.959963984540054; val zb = 0.8416212335729143
      val exp = math.ceil(2.0 * sd * sd * (za + zb) * (za + zb) /
        (0.05 * mean * 0.05 * mean))
      assert(math.abs(req - exp) <= math.max(2.0, exp * 0.01),
        s"${r.getString(0)}: got $req expected ~$exp")
    }
  }

  test("forecast backtest: 7 one-step evals per type, errors consistent with forecasts") {
    val rows = graft.analytics.Stats.qForecastBacktest(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.length <= 7)
      val steps = rs.map(_.getLong(1)).sorted
      assert(steps.zip(steps.head to steps.last).forall { case (a, b) => a == b })
    }
    rows.foreach { r =>
      val (actual, forecast, err) = (r.getLong(2), r.getDouble(3), r.getDouble(4))
      assert(math.abs(math.abs(actual - forecast) - err) < 2e-6)
    }
  }

  test("did: the estimate is exactly the double difference of the cell means") {
    val r = graft.analytics.Stats.qDid(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    val (tp, tq, cp, cq, did) = (row.getDouble(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3), row.getDouble(4))
    assert(math.abs(did - ((tq - tp) - (cq - cp))) < 5e-4)
    Seq(tp, tq, cp, cq).foreach(m => assert(m > 0.0 && m < 1e6))
  }
}
