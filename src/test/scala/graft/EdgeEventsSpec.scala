package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.analytics.{EventAnalytics, Stats}

/** Degenerate event corpus: one user, one event type, one day. Every
  * statistics operator must either produce a well-defined row (null
  * where the estimate is undefined) or an empty result — never an
  * Inf/NaN or an exception. This is the "single-tenant shard" /
  * "first day of telemetry" case a library meets in production.
  */
class EdgeEventsSpec extends GraftSpec {

  private lazy val edgeDir: String = {
    val dir = Files.createTempDirectory("graft_edge_events").toString
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val rows = Seq(
      (1L, t0, 7L, "click", 5.0, "{}"),
      (2L, new Timestamp(t0.getTime + 60000), 7L, "click", 6.0, "{}"),
      (3L, new Timestamp(t0.getTime + 120000), 7L, "click", 7.0, "{}"))
    spark.createDataFrame(rows)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ks test is empty when one type is the whole corpus (no rest sample)") {
    assert(Stats.qKsTest(spark, edgeDir).collect().isEmpty)
  }

  test("welch t-test is empty when one cohort is missing") {
    // user 7 is odd → cohort A has no members
    assert(Stats.qTtestAb(spark, edgeDir).collect().isEmpty)
  }

  test("linreg on a zero-x-variance group yields null fit, not Inf") {
    val r = Stats.qLinreg(spark, edgeDir).collect()
    assert(r.length === 1)
    assert(r.head.isNullAt(2) && r.head.isNullAt(3) && r.head.isNullAt(4))
    assert(r.head.getLong(1) === 3L)
  }

  test("gini of a single user is exactly zero") {
    val r = Stats.qGini(spark, edgeDir).collect().head
    assert(r.getLong(0) === 1L)
    assert(r.getDouble(2) === 0.0)
  }

  test("drift, survival, cms, mutual info, decay, anomaly all run on the degenerate corpus") {
    // single half / single cell / single arm inputs must not throw
    Stats.qDatasetDrift(spark, edgeDir).collect()
    Stats.qSurvivalCurve(spark, edgeDir).collect()
    Stats.qCmsEstimate(spark, edgeDir).collect()
    Stats.qMutualInfo(spark, edgeDir).collect().foreach { r =>
      assert(r.getDouble(2) === 0.0) // single type ⇒ MI is exactly 0
    }
    EventAnalytics.qDecayScore(spark, edgeDir).collect()
    EventAnalytics.qDailyAnomaly(spark, edgeDir).collect()
    EventAnalytics.qAttribution(spark, edgeDir).collect()
  }

  test("holt on a one-day series: zero trend, forecast equals level") {
    val r = Stats.qHoltForecast(spark, edgeDir).collect()
    assert(r.length === 1)
    assert(r.head.getLong(1) === 1L) // one day
    assert(r.head.getDouble(3) === 0.0) // trend
    assert(r.head.getDouble(4) === r.head.getDouble(2)) // forecast = level
  }

  test("interpolation with no sampled observations returns empty, not a crash") {
    // event_ids 1..3 never hit the %11 slice
    assert(EventAnalytics.qInterpolateGaps(spark, edgeDir).collect().isEmpty)
  }

  test("cuped and power analysis survive the single-user corpus") {
    val c = Stats.qAbCuped(spark, edgeDir).collect()
    assert(c.length === 1 && c.head.getLong(0) === 1L) // user 7 -> variant 1
    // single user ⇒ zero pooled covariate variance ⇒ theta guards to 0
    // and the adjustment is the identity; all events are pre-period so
    // the post-metric mean is exactly zero
    assert(c.head.getDouble(2) === 0.0)
    assert(c.head.getDouble(3) === c.head.getDouble(2))
    assert(c.head.getDouble(4) === 0.0)
    val pw = Stats.qPowerAnalysis(spark, edgeDir).collect()
    assert(pw.length === 1 && pw.head.getLong(4) > 0L)
  }
}
