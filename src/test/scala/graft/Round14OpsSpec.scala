package graft

import graft.graph.GraphOps

/** Invariant coverage for the round-14 graph companions — the
  * float-free rows that bracket every surface `graph_modularity`'s Q
  * is assembled from (ROUND_AUDIT_r14 §1). Each test is a
  * cross-operator conservation law, so the companions and Q are
  * pinned to EACH OTHER, not just to the oracle.
  */
class Round14OpsSpec extends GraftSpec {

  test("community members: partition covers the full graph and refines by label minimality") {
    val members = GraphOps.graphCommunityMembers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(members.nonEmpty)
    // every label is itself a member node (labels are min-reachable ids)
    val nodes = members.map(_._1).toSet
    val labels = members.map(_._2).toSet
    assert(labels.subsetOf(nodes), "each community label must be one of its reachable nodes")
    // a label never exceeds the node it labels (min-label propagation)
    members.foreach { case (n, l) => assert(l <= n, s"label $l > node $n") }
    // community sizes must reproduce the label-prop histogram exactly
    val sizes = members.groupBy(_._2).map(_._2.length.toLong).toSeq
      .groupBy(identity).map { case (s, xs) => (s, xs.length.toLong) }
    val hist = GraphOps.graphLabelProp(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sizes === hist, "members partition must reproduce graph_label_prop's histogram")
  }

  test("communities: per-community stats re-aggregate to the modularity sums row") {
    val comms = GraphOps.graphCommunities(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val sums = GraphOps.graphModularitySums(spark, sf).collect()(0)
    assert(comms.length.toLong === sums.getLong(0), "n_communities")
    assert(comms.map(_._3).sum === sums.getLong(2), "Σe_c == intra_edges")
    assert(comms.map(d => d._4 * d._4).sum === sums.getLong(3), "Σd_c² == s2")
    // handshake law on the full graph: Σd_c == 2m
    assert(comms.map(_._4).sum === 2 * sums.getLong(1), "Σd_c must be twice m")
    // per-community sanity: e_c ≤ C(n_members, 2), d_c ≥ 2·e_c
    comms.foreach { case (c, n, e, d) =>
      assert(e <= n * (n - 1) / 2, s"community $c: e_c=$e exceeds clique bound for n=$n")
      assert(d >= 2 * e, s"community $c: degree mass $d below 2·e_c")
    }
    // member counts agree with the members op
    val bySize = GraphOps.graphCommunityMembers(spark, sf).collect()
      .groupBy(_.getLong(1)).map { case (l, xs) => (l, xs.length.toLong) }
    assert(comms.map(c => (c._1, c._2)).toMap === bySize,
      "communities.n_members must match the members partition")
  }

  test("restore bandwidth: windows exactly partition the as-of restore set") {
    import org.apache.spark.sql.functions._
    val win = graft.syncer.SyncOps.syncRestoreBandwidth(spark, sf).collect()
    assert(win.nonEmpty)
    // contiguous window indexes from 0
    assert(win.map(_.getLong(0)).toSeq === (0L until win.length).toSeq)
    // conservation: every restore file lands in exactly one window
    val rs = graft.syncer.SyncOps.syncRestoreSet(spark, sf)
      .agg(count(lit(1)), sum(col("size_bytes"))).collect()(0)
    assert(win.map(_.getLong(1)).sum === rs.getLong(0), "file count conserved")
    assert(win.map(_.getLong(2)).sum === rs.getLong(1), "byte total conserved")
    // the cap binds: a window ends within cap bytes of the boundary it
    // crossed, so every window but the last holds > 0 bytes and the
    // running construction means no window's START offset skips a cap
    win.foreach(r => assert(r.getLong(2) > 0))
  }

  test("rerank sweep (text): reranked top-1 dominates the BM25 baseline and is monotone in depth") {
    val sweep = graft.text.TextAnalysis.textRerankSweep(spark, sf).collect()
    assert(sweep.map(_.getLong(0)).toSeq === Seq(5L, 10L, 20L))
    val nq = sweep.head.getLong(1)
    assert(sweep.forall(_.getLong(1) === nq), "query count constant across depths")
    val base = sweep.head.getLong(2)
    assert(sweep.forall(_.getLong(2) === base), "BM25 baseline is depth-invariant")
    val rr = sweep.map(_.getLong(3)).toSeq
    assert(rr === rr.sorted, "re-ranked top-1 mass monotone in depth")
    // per query the re-ranked top-1 maximizes jacq over a set that
    // CONTAINS the BM25 top-1, so the sum dominates the baseline
    sweep.foreach(r => assert(r.getLong(3) >= base,
      "re-ranking a set containing the retriever's #1 can only help"))
  }

  test("events.value is exactly 2-decimal money (the cents-quantization premise)") {
    import org.apache.spark.sql.functions._
    // q_percentiles' mean (and every cents/n conversion) is the exact
    // statistic ONLY because value*100 is integral — pin the premise
    // (r13 advice) so a finer-precision corpus fails loudly instead of
    // silently turning those means into quantized means
    val worst = graft.sources.Tables.events(spark, sf)
      .select(abs(col("value") * 100 - round(col("value") * 100)).as("d"))
      .agg(max(col("d"))).collect()(0).getDouble(0)
    assert(worst < 1e-6, s"events.value must be 2-decimal: max residual $worst")
  }

  test("modularity sums: Q is exactly the one-division assembly of the integer sums") {
    val sums = GraphOps.graphModularitySums(spark, sf).collect()(0)
    val (m, s1, s2) = (sums.getLong(1), sums.getLong(2), sums.getLong(3))
    val q = GraphOps.graphModularity(spark, sf).collect()(0).getDouble(3)
    val expected = (4.0 * m * s1 - s2) / (4.0 * m * m)
    assert(java.lang.Double.doubleToLongBits(q) ===
      java.lang.Double.doubleToLongBits(expected),
      s"Q must be bit-identical to the closed-form assembly: $q vs $expected")
  }
}
