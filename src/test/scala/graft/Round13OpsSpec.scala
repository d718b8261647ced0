package graft

import org.apache.spark.sql.functions._

import graft.similarity.Pq
import graft.sources.{Tables, TxnLog}

/** Invariant coverage for the round-13 operators: the Bloom/NDV
  * stats-prune audit and the rerank depth sweep. Each test
  * cross-checks the distributed result against an independent local
  * recomputation or a cross-operator conservation law.
  */
class Round13OpsSpec extends GraftSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("stats-prune bloom: local recomputation; true <= bloom <= minmax per bucket") {
    val li = Tables.lineitem(spark, sf)
      .select(to_date(col("l_shipdate")).as("d"), col("l_orderkey")).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val mn = li.map(_._1).min(Ordering.by[java.time.LocalDate, Long](_.toEpochDay))
    val span = li.map(_._1.toEpochDay).max - mn.toEpochDay
    def fileOf(d: java.time.LocalDate): Long = (d.toEpochDay - mn.toEpochDay) * 16 / (span + 1)
    val cells = li.groupBy { case (d, ok) => (fileOf(d), ok) }
      .map { case ((f, ok), xs) => (f, ok, xs.size.toLong) }.toSeq
    val stats = cells.groupBy(_._1).map { case (f, xs) =>
      f -> (xs.map(_._2).min, xs.map(_._2).max, xs.map(_._3).sum)
    }
    val bloom = cells.map { case (f, ok, _) => (f, md5hex(s"$ok|1").take(4)) }.toSet ++
      cells.map { case (f, ok, _) => (f, md5hex(s"$ok|2").take(4)) }.toSet
    val truth = cells.map { case (f, ok, _) => (f, ok) }.toSet
    val probes = li.map(_._2).filter(ok => ok % 997 == 1 && ok < 100000).distinct
    case class B(var np: Long = 0, var mmF: Long = 0, var blF: Long = 0,
      var trF: Long = 0, var mmR: Long = 0, var blR: Long = 0)
    val want = scala.collection.mutable.Map[Long, B]()
    probes.foreach { ok =>
      val b = want.getOrElseUpdate(ok % 7, B())
      b.np += 1
      val (p1, p2) = (md5hex(s"$ok|1").take(4), md5hex(s"$ok|2").take(4))
      stats.foreach { case (f, (lo, hi, nRows)) =>
        val amm = ok >= lo && ok <= hi
        val abl = amm && bloom((f, p1)) && bloom((f, p2))
        if (amm) { b.mmF += 1; b.mmR += nRows }
        if (abl) { b.blF += 1; b.blR += nRows }
        if (truth((f, ok))) b.trF += 1
      }
    }
    val got = TxnLog.ioStatsPruneBloom(spark, sf).collect()
    assert(got.length === want.size)
    got.foreach { r =>
      val b = want(r.getLong(0))
      assert(r.getLong(1) === b.np, s"n_probes(${r.getLong(0)})")
      assert(r.getLong(2) === b.mmF, s"minmax_file_admits(${r.getLong(0)})")
      assert(r.getLong(3) === b.blF, s"bloom_file_admits(${r.getLong(0)})")
      assert(r.getLong(4) === b.trF, s"true_file_hits(${r.getLong(0)})")
      assert(r.getLong(5) === b.mmR, s"minmax_rows_scanned(${r.getLong(0)})")
      assert(r.getLong(6) === b.blR, s"bloom_rows_scanned(${r.getLong(0)})")
      // a Bloom has false positives, never false negatives
      assert(b.trF <= b.blF && b.blF <= b.mmF, "true <= bloom <= minmax")
      assert(b.blR <= b.mmR, "bloom never scans more rows than minmax")
    }
    // the audit must be non-degenerate: probes exist and minmax admits
    // more than the truth somewhere (the uncorrelated-key premise)
    assert(want.values.map(_.np).sum > 0, "probe slice non-empty")
    assert(want.values.map(_.mmF).sum > want.values.map(_.trF).sum,
      "min/max stats over-admit on an unclustered key")
  }

  test("rerank sweep: monotone in depth; depth-10/depth-3 rows tie to ann_pq_rerank") {
    val sweep = Pq.annRerankSweep(spark, sf).collect()
    assert(sweep.map(_.getInt(0)).toSeq === Pq.SweepDepths)
    val np = sweep.head.getLong(1)
    assert(sweep.forall(_.getLong(1) === np), "n_probes constant across depths")
    // monotone non-decreasing in depth, and bounded
    Seq(2, 3, 4).foreach { c =>
      val vals = sweep.map(_.getLong(c)).toSeq
      assert(vals === vals.sorted, s"col $c monotone in depth")
    }
    sweep.foreach { r =>
      assert(r.getLong(2) <= np, "best_retrieved <= n_probes")
      assert(r.getLong(3) <= r.getLong(2),
        "an ADC top-1 hit is itself a retrieved true-nearest")
      assert(r.getLong(4) <= 3 * np, "recall mass bounded by 3 per probe")
    }
    // the ADC-order baseline is depth-invariant (rnk==1 survives every
    // depth cut) — the re-ranker's value is best_retrieved minus this
    assert(sweep.map(_.getLong(3)).distinct.length === 1,
      "adc_top1_hits must not depend on the sweep depth")
    // cross-op conservation: the per-probe readout of ann_pq_rerank
    // sums to the sweep's depth-10 row (same candidates, same rerank),
    // and its raw-ADC column is the depth-3 row (re-ranking exactly
    // the ADC top-3 permutes the set, so the top-3 SET is unchanged)
    val rerank = Pq.annPqRerank(spark, sf).collect()
    assert(np === rerank.length.toLong)
    val d3 = sweep.find(_.getInt(0) === 3).get
    val d10 = sweep.find(_.getInt(0) === 10).get
    assert(d3.getLong(4) === rerank.map(_.getLong(1)).sum, "depth-3 == raw ADC recall")
    assert(d10.getLong(4) === rerank.map(_.getLong(2)).sum, "depth-10 == reranked recall")
  }
}
