package graft

import org.apache.spark.sql.functions._

import graft.analytics.{Relational, RuntimeFilters}
import graft.graph.GraphOps
import graft.streaming.StreamWatcher

class GraphBloomStreamSpec extends GraftSpec {

  test("degree histogram accounts for every candidate-graph node") {
    val pairs = graft.dedup.Dedup.minhashCandidatePairs(spark, sf).cache()
    val nNodes = pairs.select(col("doc_a")).union(pairs.select(col("doc_b")))
      .distinct().count()
    val hist = GraphOps.graphDegreeHist(spark, sf)
    val histTotal = hist.agg(sum(col("n_nodes"))).first().getLong(0)
    assert(histTotal === nNodes)
    pairs.unpersist()
  }

  test("triangle profile equals the full-graph computation (clique blow-up check)") {
    val row = GraphOps.graphTriangles(spark, sf).first()
    val nEdges = row.getAs[Long]("n_edges")
    val nNodes = row.getAs[Long]("n_nodes")
    val nTris = row.getAs[Long]("n_triangles")
    // independent full-graph ground truth from the reference pair set
    // (the pre-r8 algorithm) — the closed-form multiplicity
    // corrections must reproduce it exactly
    val e = graft.dedup.Dedup.minhashCandidatePairs(spark, sf).localCheckpoint()
    val fullTris = e.as("e1")
      .join(e.as("e2"), col("e1.doc_b") === col("e2.doc_a"))
      .join(e.as("e3"),
        col("e3.doc_a") === col("e1.doc_a") && col("e3.doc_b") === col("e2.doc_b"))
      .count()
    val fullNodes = e.select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .distinct().count()
    val fullEdges = e.count()
    assert(nNodes === fullNodes)
    assert(nEdges === fullEdges)
    assert(nTris === fullTris)
    if (nTris > 0) assert(nEdges >= 3 && nNodes >= 3)
  }

  test("pagerank equals the full-graph iteration (clique blow-up check)") {
    // graphPagerank's oracle replays the COLLAPSED iteration (float
    // multiset reasons), so unlike triangles/BFS/k-core its blow-up
    // equivalence is not oracle-verified — this is that check: the
    // pre-r8 full-graph iteration over the uncollapsed candidate pair
    // set must agree per doc to within end-rounding.
    val collapsed = GraphOps.graphPagerank(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("pagerank")).toMap
    val e = graft.dedup.Dedup.minhashCandidatePairs(spark, sf).localCheckpoint()
    val sym = e.select(col("doc_a").as("s"), col("doc_b").as("t"))
      .union(e.select(col("doc_b").as("s"), col("doc_a").as("t")))
      .localCheckpoint()
    val deg = sym.groupBy(col("s")).agg(count(lit(1)).as("d")).localCheckpoint()
    val n = deg.count() // full-graph node count (docs incident to an edge)
    var r = deg.select(col("s").as("node"), lit(1.0 / n).as("r"))
    for (_ <- 1 to 5) {
      r = sym.join(r.withColumnRenamed("node", "s"), Seq("s"))
        .join(deg, Seq("s"))
        .select(col("t").as("node"), (col("r") / col("d")).as("m"))
        .groupBy(col("node")).agg(sum(col("m")).as("contrib"))
        .select(col("node"),
          (lit(0.15 / n) + lit(0.85) * col("contrib")).as("r"))
        .localCheckpoint()
    }
    val full = r.collect().map(x => x.getAs[Long]("node") -> x.getAs[Double]("r")).toMap
    assert(collapsed.keySet === full.keySet,
      s"node sets differ: ${(collapsed.keySet diff full.keySet).take(5)} / ${(full.keySet diff collapsed.keySet).take(5)}")
    // collapsed output is rounded to 6 decimals; the full iteration
    // here is not — allow end-rounding plus fold-order ulp drift
    val maxDiff = collapsed.map { case (k, v) => math.abs(v - full(k)) }.max
    assert(maxDiff <= 2e-6, s"max pagerank divergence vs full graph: $maxDiff")
  }

  test("bloom prefilter is invisible in the join result") {
    val withBloom = RuntimeFilters.qBloomPrefilter(spark, sf).collect()
    val plain = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("l_returnflag")).collect()
    assert(withBloom.map(_.toSeq).toSeq === plain.map(_.toSeq).toSeq)
  }

  test("bloom prefilter plan actually contains the might_contain prune") {
    val df = RuntimeFilters.qBloomPrefilter(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
      s"no bloom prefilter in plan:\n$plan")
  }

  test("streaming session windows converge to the batch session definition") {
    val streamed = StreamWatcher.streamSessionWindowQuery(spark, sf).collect()
    val batch = Relational.qSessionWindow(spark, sf).collect()
    assert(streamed.map(_.toSeq).toSeq === batch.map(_.toSeq).toSeq)
  }

  test("k-core peel: survivors never grow, and every survivor of a settled round keeps degree >= k") {
    val prof = GraphOps.graphKcore(spark, sf).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[Long]("n_removed"),
        r.getAs[Long]("n_remaining"))).sortBy(_._1)
    assert(prof.length === 4)
    prof.sliding(2).foreach {
      case Array((_, _, rem1), (_, removed2, rem2)) =>
        assert(rem2 <= rem1, "survivor count grew between rounds")
        assert(removed2 >= 0)
      case _ =>
    }
    // if the peel settled (last round removed nothing), the survivor
    // count is a fixpoint of the degree->=k filter
    val last = prof.last
    if (last._2 === 0L) assert(last._3 === prof(prof.length - 2)._3)
  }

  test("label propagation: 3 rounds reach the CC histogram on this small graph") {
    val got = graft.graph.GraphOps.graphLabelProp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // cluster sizes cover every node of the candidate graph exactly once
    val p = graft.dedup.Dedup.minhashCandidatePairs(spark, sf)
    val nNodes = p.select(org.apache.spark.sql.functions.explode(
      org.apache.spark.sql.functions.array(
        org.apache.spark.sql.functions.col("doc_a"),
        org.apache.spark.sql.functions.col("doc_b"))).as("d"))
      .distinct().count()
    assert(got.map { case (size, n) => size * n }.sum === nNodes)
    // every cluster in the candidate graph has >= 2 nodes (edges only)
    assert(got.keys.forall(_ >= 2L))
    // bounded-round labels can only be coarser than or equal to full CC:
    // the number of label classes is >= the number of true components
    val ccClusters = graft.dedup.Dedup.dedupCcClusters(spark, sf)
      .select("cluster_id").distinct().count()
    assert(got.values.sum >= ccClusters)
  }
}
