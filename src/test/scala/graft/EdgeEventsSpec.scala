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
}
