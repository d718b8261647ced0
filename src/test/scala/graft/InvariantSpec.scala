package graft

import org.apache.spark.sql.functions._

import graft.analytics.{EventAnalytics, Relational}
import graft.similarity.Ann
import graft.syncer.SyncOps

/** Semantic invariants for operators whose oracle check only proves
  * engine equivalence — these prove the answers make sense.
  */
class InvariantSpec extends GraftSpec {

  test("funnel stages are monotone non-increasing") {
    val r = EventAnalytics.qFunnel(spark, sf).collect()(0)
    val viewed = r.getAs[Long]("n_viewed")
    val clicked = r.getAs[Long]("n_clicked_after_view")
    val purchased = r.getAs[Long]("n_purchased_after_click")
    assert(r.getAs[Long]("n_users") >= viewed)
    assert(viewed >= clicked)
    assert(clicked >= purchased)
    assert(purchased >= 0)
  }

  test("recall@k lies in [0,1] and hits never exceed k") {
    Ann.annRecallAtK(spark, sf).collect().foreach { r =>
      val hits = r.getAs[Long]("n_hits")
      val recall = r.getAs[Double]("recall_at_5")
      assert(hits >= 0 && hits <= 5)
      assert(recall >= 0.0 && recall <= 1.0)
      assert(math.abs(recall - hits / 5.0) < 1e-12)
    }
  }

  test("retention day-0 actives equal the cohort sizes and offsets are non-negative") {
    val rows = EventAnalytics.qRetentionCohort(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("day_offset") >= 0))
    val day0 = rows.filter(_.getAs[Long]("day_offset") == 0L)
      .map(r => r.getAs[java.sql.Date]("cohort_day") -> r.getAs[Long]("n_active")).toMap
    // every user appears in their cohort on day 0
    val cohortSizes = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("cohort_day"))
      .groupBy(col("cohort_day")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getAs[java.sql.Date]("cohort_day") -> r.getAs[Long]("n")).toMap
    assert(day0 === cohortSizes)
  }

  test("upsert merge conserves rows: current + inserts") {
    val r = Relational.qUpsertMerge(spark, sf).collect()
    val totalRows = r.map(_.getAs[Long]("n_rows")).sum
    val current = graft.sources.Tables.customer(spark, sf).count()
    val inserts = graft.sources.Tables.customer(spark, sf)
      .filter(col("c_custkey") % 13 === 0).count()
    assert(totalRows === current + inserts)
  }

  test("generation-gap audit: holes are non-negative and bounded by the span") {
    SyncOps.syncGenerationGaps(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("total_holes") >= 0)
      assert(r.getAs[Long]("max_holes") >= 0)
    }
  }

  test("slot schedule covers every planned upload exactly once") {
    val slots = SyncOps.syncSlotSchedule(spark, sf).collect()
    val totalScheduled = slots.map(_.getAs[Long]("n_files")).sum
    assert(totalScheduled === SyncOps.syncDiffUpload(spark, sf).count())
    assert(slots.forall(r => r.getAs[Long]("slot") >= 0 && r.getAs[Long]("slot") < 4))
  }

  test("LWW merge emits at most one row per key, never a tombstoned one") {
    val r = SyncOps.syncLwwMerge(spark, sf)
    assert(r.groupBy(col("row_key")).count().filter(col("count") > 1).count() === 0)
    assert(r.count() > 0)
  }

  test("compaction plan tiers partition the durable file count") {
    val plan = SyncOps.syncCompactionPlan(spark, sf).collect()
    val total = plan.map(_.getAs[Long]("n_files")).sum
    assert(total === graft.syncer.FileInventory.durable(spark, sf).count())
  }
}
