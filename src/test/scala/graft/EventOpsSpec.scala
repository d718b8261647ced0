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
}
