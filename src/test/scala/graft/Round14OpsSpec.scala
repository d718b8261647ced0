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

  test("communities: per-community stats re-aggregate to the modularity row's global sums") {
    val comms = GraphOps.graphCommunities(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // graph_modularity's leading columns ARE the former sums row
    // (n_communities, m_edges, intra_edges, s2) — folded in r15
    val sums = GraphOps.graphModularity(spark, sf).collect()(0)
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

  test("modularity: the e12 quotient is exactly the truncated integer assembly of the sums") {
    val row = GraphOps.graphModularity(spark, sf).collect()(0)
    val (m, s1, s2) = (row.getLong(1), row.getLong(2), row.getLong(3))
    val e12 = row.getLong(4)
    // BigInt `/` truncates toward zero, the same semantics as Spark's
    // decimal `div` and DuckDB's HUGEINT `//` (verified r15)
    val expected = (BigInt(4) * m * s1 - s2) * BigInt("1000000000000") /
      (BigInt(4) * m * m)
    assert(BigInt(e12) === expected,
      s"modularity_e12 must equal the pure-integer quotient: $e12 vs $expected")
    // and it sits in Q's a-priori range, scaled: Q ∈ (−0.5, 1]
    assert(e12 > -500000000000L && e12 <= 1000000000000L)
  }

  test("anova: SSB + SSW reproduces the total sum of squares; F agrees with a direct recompute") {
    import org.apache.spark.sql.functions._
    val r = graft.analytics.Stats.qAnova(spark, sf).collect()(0)
    val (k, n) = (r.getLong(0), r.getLong(1))
    val (ssb, ssw, f) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(k > 1 && n > k && ssb >= 0 && ssw > 0 && f > 0)
    // recompute SST = Σc² − S²/N on collected cents (tiny at sf0.001)
    val cents = graft.sources.Tables.events(spark, sf)
      .select(round(col("value") * 100).cast("long").as("c"),
        col("event_type")).collect()
    val s = cents.map(_.getLong(0)).sum
    val ss = cents.map(x => x.getLong(0).toDouble * x.getLong(0)).sum
    val sst = ss - s.toDouble * s / n
    // the Σ s_g²/n_g quantization moves SSB and SSW by < 0.5 cent² per
    // group, and SST itself is float-assembled here — compare loosely
    assert(math.abs(ssb + ssw - sst) / sst < 1e-9,
      s"SSB+SSW=${ssb + ssw} must reproduce SST=$sst")
    val byG = cents.groupBy(_.getString(1)).values.map { xs =>
      val sg = xs.map(_.getLong(0)).sum; (xs.length, sg.toDouble * sg / xs.length)
    }
    val t = byG.map(_._2).sum
    val fDirect = ((t - s.toDouble * s / n) / (k - 1)) / ((ss - t) / (n - k))
    assert(math.abs(f - fDirect) / fDirect < 1e-6, s"F=$f vs direct $fDirect")
  }

  test("cramers v: bounded by [0,1] and consistent with the chi-square op's contributions") {
    val r = graft.analytics.EventAnalytics.qCramersV(spark, sf).collect()(0)
    val (nEvents, nRows, nCols) = (r.getLong(0), r.getLong(1), r.getLong(2))
    val (chi2, v) = (r.getDouble(3), r.getDouble(4))
    assert(nRows > 1 && nCols > 1 && nCols <= 7)
    assert(v >= 0.0 && v <= 1.0, s"V=$v out of [0,1]")
    // same contingency table as q_chi_square: the global χ² must equal
    // the sum of its per-type contributions (each rounded to 4dp)
    val perType = graft.analytics.EventAnalytics.qChiSquare(spark, sf).collect()
    assert(perType.map(_.getLong(1)).sum === nEvents)
    val chiSum = perType.map(_.getDouble(2)).sum
    assert(math.abs(chi2 - chiSum) < 1e-3 * perType.length,
      s"global chi2 $chi2 vs per-type sum $chiSum")
    // V is the normalized chi2, exactly
    val vDirect = math.sqrt(chi2 / (nEvents * (math.min(nRows, nCols) - 1)))
    assert(math.abs(v - vDirect) < 1e-4)
  }

  test("hhi: concentration bounded by [1/n, 1] and exact on a direct per-supplier recompute") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.Relational.qHhi(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nSupp, hhi) = (r.getLong(1), r.getDouble(3))
      assert(hhi >= 1.0 / nSupp - 1e-12 && hhi <= 1.0 + 1e-12,
        s"${r.getString(0)}: hhi=$hhi outside [1/$nSupp, 1]")
    }
    // exact recompute for the first nation from raw revenues
    val name = rows.head.getString(0)
    val revs = graft.sources.Tables.lineitem(spark, sf)
      .join(graft.sources.Tables.supplier(spark, sf),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.sources.Tables.nation(spark, sf),
        col("s_nationkey") === col("n_nationkey"))
      .filter(col("n_name") === name)
      .groupBy(col("l_suppkey"))
      .agg(sum(graft.analytics.Money.netE4).as("r"))
      .collect().map(_.getLong(1))
    val bigSq = revs.map(x => BigInt(x) * BigInt(x)).sum
    val bigS = revs.map(BigInt(_)).sum
    val direct = bigSq.toDouble / (bigS.toDouble * bigS.toDouble)
    assert(java.lang.Double.doubleToLongBits(rows.head.getDouble(3)) ===
      java.lang.Double.doubleToLongBits(direct),
      s"hhi must be bit-identical to the exact-integer assembly for $name")
  }

  test("age tiering: tiers partition the live set; shares sum to 1 per cf") {
    import org.apache.spark.sql.functions._
    val rows = graft.syncer.SyncOps.ioAgeTiering(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => Set("a_hot", "b_warm", "c_cold")(r.getString(1))))
    // conservation against the live set
    val live = graft.syncer.SyncOps.syncLiveSet(spark, sf)
      .agg(count(lit(1)), sum(col("size_bytes"))).collect()(0)
    assert(rows.map(_.getLong(2)).sum === live.getLong(0), "live file count conserved")
    assert(rows.map(_.getLong(3)).sum === live.getLong(1), "live byte total conserved")
    // per-cf byte shares sum to 1 exactly-ish (each is an exact quotient)
    rows.groupBy(_.getString(0)).values.foreach { cf =>
      val s = cf.map(_.getDouble(4)).sum
      assert(math.abs(s - 1.0) < 1e-12, s"shares of ${cf.head.getString(0)} sum to $s")
    }
  }

  test("ngram novelty: novel counts partition the distinct-shingle vocabulary; rates in (0,1]") {
    import org.apache.spark.sql.functions._
    val rows = graft.text.TextAnalysis.textNgramNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "novel ≤ instances per lang")
      val rate = r.getDouble(3)
      // >= 0: a language whose every distinct shingle debuts in
      // another language legally has zero novelty (r14 advice); the
      // partition assertion below is the correctness check
      assert(rate >= 0.0 && rate <= 1.0, s"${r.getString(0)}: rate=$rate")
    }
    // every distinct shingle is novel in exactly one language
    val toks = graft.text.TextAnalysis.tokensCol(col("text"))
    val vocab = graft.sources.Tables.documents(spark, sf)
      .select(toks.as("t"))
      .filter(size(col("t")) >= 5)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 4), " +
          "i -> concat_ws(' ', t[i-1], t[i], t[i+1], t[i+2], t[i+3]))")).as("g"))
      .distinct().count()
    assert(rows.map(_.getLong(2)).sum === vocab,
      "Σ novel over langs must equal the distinct 5-gram vocabulary")
  }

  test("rate ztest: halves partition each type's events; z is the exact-integer assembly") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.Stats.qRateZtest(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = graft.sources.Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.map(_.getString(0)).toSet === byType.keySet)
    rows.foreach { r =>
      val (t, k1, k2, z) = (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(k1 + k2 === byType(t), s"$t: halves must partition the type's events")
      val direct = (k1 - k2).toDouble / math.sqrt((k1 + k2).toDouble)
      assert(java.lang.Double.doubleToLongBits(z) ===
        java.lang.Double.doubleToLongBits(direct),
        s"$t: z must be bit-identical to the exact-count assembly")
    }
  }

  test("abc class: classes partition the part axis; the 80/95 cuts hold as exact integers") {
    import org.apache.spark.sql.functions._
    val rows = graft.analytics.Relational.qAbcClass(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === rows.map(_.getString(0)).toSeq.sorted)
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("A", "B", "C")))
    val pp = graft.sources.Tables.lineitem(spark, sf)
      .groupBy(col("l_partkey"))
      .agg(sum(graft.analytics.Money.cents(col("l_extendedprice"))).as("r"))
      .agg(count(lit(1)), sum(col("r"))).collect()(0)
    val (nTotal, totC) = (pp.getLong(0), pp.getLong(1))
    assert(rows.map(_.getLong(1)).sum === nTotal, "classes must partition the parts")
    assert(rows.map(_.getLong(3)).sum === totC, "class revenues must sum to the total")
    rows.groupBy(_ => ()).values.foreach { rs =>
      val shareSum = rs.map(_.getDouble(2)).sum
      assert(math.abs(shareSum - 1.0) < 1e-12, s"part shares sum to $shareSum")
    }
    val byCls = rows.map(r => (r.getString(0), r.getLong(3))).toMap
    // the 80% boundary is an exact-integer cut: A's cumulative mass
    // never crosses 4/5 of the total, A+B never crosses 19/20
    assert(byCls.getOrElse("A", 0L) * 5 <= totC * 4, "A mass must stay within 80%")
    assert((byCls.getOrElse("A", 0L) + byCls.getOrElse("B", 0L)) * 20 <= totC * 19,
      "A+B mass must stay within 95%")
    rows.foreach { r =>
      val direct = r.getLong(3).toDouble / totC
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ===
        java.lang.Double.doubleToLongBits(direct), "rev_share exact quotient")
    }
  }

  test("readability: integer totals conserve against a direct recompute; ease is the exact assembly") {
    import org.apache.spark.sql.functions._
    val rows = graft.text.TextAnalysis.textReadability(spark, sf).collect()
    assert(rows.nonEmpty)
    val direct = graft.sources.Tables.documents(spark, sf)
      .select(col("lang"),
        size(graft.text.TextAnalysis.tokensCol(col("text"))).cast("long").as("w"),
        size(expr("regexp_extract_all(text, '[.!?]+', 0)")).cast("long").as("s"))
      .groupBy(col("lang")).agg(sum(col("w")), sum(col("s")))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    rows.foreach { r =>
      val (lang, w, s, y) = (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))
      assert((w, s) === direct(lang), s"$lang: word/sentence totals must conserve")
      assert(y > 0, s"$lang: a text corpus has vowel groups")
      val ease = 206.835 - 1.015 * (w.toDouble / math.max(s, 1L).toDouble) -
        84.6 * (y.toDouble / math.max(w, 1L).toDouble)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(5)) ===
        java.lang.Double.doubleToLongBits(ease),
        s"$lang: reading ease must be bit-identical to the exact-sum assembly")
    }
  }

  test("pq distortion: one row per subspace over the full corpus; mse is the exact quotient") {
    val rows = graft.similarity.Pq.vecPqDistortion(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq === (0L until graft.similarity.Pq.M.toLong).toSeq)
    val n = rows.head.getLong(1)
    assert(rows.forall(_.getLong(1) === n), "every subspace covers every vector")
    assert(n === graft.sources.Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      assert(r.getLong(2) >= 0L)
      val direct = r.getLong(2).toDouble / n / 1e6
      assert(java.lang.Double.doubleToLongBits(r.getDouble(3)) ===
        java.lang.Double.doubleToLongBits(direct), "mse exact quotient")
    }
    // cross-op tie to ann_pq_codes' err_u = floor(Σ_m min_m · 1e6):
    // a sum of per-m floors undershoots the floor of the sum by < M per
    // vector (modulo float ulp), so the two µ-unit totals straddle
    val codesErr = graft.similarity.Pq.annPqCodes(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("err_u")).collect()(0).getLong(0)
    val perMSum = rows.map(_.getLong(2)).sum
    assert(perMSum <= codesErr + n, "per-subspace floors cannot exceed the total-error floor")
    assert(codesErr - perMSum <= (graft.similarity.Pq.M + 1L) * n,
      "floor gap bounded by M per vector")
  }
}
