package graft

import org.apache.spark.sql.functions._

import graft.analytics.Stats
import graft.graph.GraphOps
import graft.sources.{Tables, ZOrder}
import graft.syncer.{FileInventory, SyncOps}

/** Invariant coverage for the round-12 operators: TWCS compaction
  * planning, graph transitivity, Mann–Whitney U, Kendall τ-a, and the
  * z-order prune-effectiveness audit. Each test cross-checks the
  * distributed result against an independent local recomputation or a
  * cross-operator conservation law (never against the op's own
  * machinery).
  */
class Round12OpsSpec extends GraftSpec {

  test("twcs: windows partition the durable inventory, exactly one current window per cf") {
    val inv = FileInventory.durable(spark, sf)
      .select(col("cf"), col("snap_date"), col("size_bytes")).collect()
      .map(r => (r.getString(0), r.getDate(1), r.getLong(2)))
    val got = SyncOps.syncTwcsCompaction(spark, sf).collect()
    // local recomputation of the whole plan
    val byBucket = inv.groupBy(x => (x._1, x._2))
    val maxDay = inv.groupBy(_._1).map { case (cf, xs) => cf -> xs.map(_._2.toLocalDate).max }
    assert(got.length === byBucket.size)
    got.foreach { r =>
      val (cf, day) = (r.getString(0), r.getDate(1))
      val xs = byBucket((cf, day))
      assert(r.getLong(2) === xs.size.toLong, s"n_files($cf,$day)")
      assert(r.getLong(3) === xs.map(_._3).sum, s"total_bytes($cf,$day)")
      val isCur = day.toLocalDate == maxDay(cf)
      assert(r.getBoolean(4) === isCur, s"is_current($cf,$day)")
      assert(r.getBoolean(5) === (!isCur && xs.size > 1), s"needs_major($cf,$day)")
      assert(r.getBoolean(6) === (isCur && xs.size >= 4), s"stcs_trigger($cf,$day)")
    }
    val currents = got.filter(_.getBoolean(4)).map(_.getString(0))
    assert(currents.toSeq.sorted === currents.distinct.toSeq.sorted,
      "exactly one current window per cf")
  }

  test("transitivity: wedges obey the degree-histogram conservation law, C = 3T/W") {
    val t = GraphOps.graphTransitivity(spark, sf).collect()
    assert(t.length === 1)
    val (nTri, nWedges) = (t(0).getLong(0), t(0).getLong(1))
    // wedges from the independently-computed degree histogram:
    // sum over cells of n_nodes * d*(d-1)/2
    val hist = GraphOps.graphDegreeHist(spark, sf).collect()
    val wedgesFromHist = hist.map(r => r.getLong(1) * r.getLong(0) * (r.getLong(0) - 1) / 2).sum
    assert(nWedges === wedgesFromHist, "wedge count matches the degree histogram")
    // triangles from the independently-shipped triangles op
    val tri = GraphOps.graphTriangles(spark, sf).collect()(0).getLong(2)
    assert(nTri === tri, "triangle count matches graph_triangles")
    assert(3 * nTri <= nWedges, "every triangle contributes 3 closed wedges")
    if (nWedges > 0) {
      val c = t(0).getDouble(2)
      assert(c >= 0.0 && c <= 1.0)
      // unrounded emission: exact ints + one IEEE division → bit equality
      val want = 3.0 * nTri / nWedges
      assert(java.lang.Double.doubleToLongBits(c) ===
        java.lang.Double.doubleToLongBits(want))
    }
  }

  test("mann-whitney: u2 equals the brute-force doubled pair count, per type") {
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val got = Stats.qMannWhitney(spark, sf).collect()
    val byType = ev.groupBy(_._1)
    got.foreach { r =>
      val ty = r.getString(0)
      val a = byType(ty).filter(_._2 % 2 == 0).map(_._3)
      val b = byType(ty).filter(_._2 % 2 != 0).map(_._3)
      assert(r.getLong(1) === a.size.toLong, s"n_a($ty)")
      assert(r.getLong(2) === b.size.toLong, s"n_b($ty)")
      // 2*U_a = sum over (x in a, y in b) of 2*[x>y] + 1*[x==y]
      val u2 = a.iterator.map { x =>
        2L * b.count(y => x > y) + b.count(y => x == y)
      }.sum
      assert(r.getLong(3) === u2, s"u2_a($ty) exact")
      // z is emitted unrounded; mirror the exact IEEE assembly
      val (na, nb) = (a.size.toLong, b.size.toLong)
      val zWant = (u2 / 2.0 - na.toDouble * nb / 2.0) /
        math.sqrt(na.toDouble * nb * (na + nb + 1) / 12.0)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(4)) ===
        java.lang.Double.doubleToLongBits(zWant), s"z($ty) bit-exact")
    }
    assert(got.map(_.getString(0)).toSet === byType.keySet.filter { ty =>
      byType(ty).exists(_._2 % 2 == 0) && byType(ty).exists(_._2 % 2 != 0)
    }, "one row per type with both cohorts present")
  }

  test("kendall tau: concordance counts equal the brute-force pairwise scan") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(x => (x._1, x._2)).map { case ((ty, d), xs) => (ty, d, xs.map(_._3).sum) }
      .toSeq
    val got = Stats.qKendallTau(spark, sf).collect()
    val byType = daily.groupBy(_._1)
    got.foreach { r =>
      val ty = r.getString(0)
      val s = byType(ty).sortBy(_._2.toEpochDay)
      val pairs = for (i <- s.indices; j <- i + 1 until s.size) yield (s(i)._3, s(j)._3)
      assert(r.getLong(1) === s.size.toLong, s"n_days($ty)")
      assert(r.getLong(2) === pairs.count(p => p._1 < p._2).toLong, s"concordant($ty)")
      assert(r.getLong(3) === pairs.count(p => p._1 > p._2).toLong, s"discordant($ty)")
      assert(r.getLong(4) === pairs.count(p => p._1 == p._2).toLong, s"ties($ty)")
      val n = s.size.toLong
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) === n * (n - 1) / 2,
        s"pair conservation($ty)")
    }
  }

  test("theil-sen: slope is the lower median of the brute-force pairwise slope set") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(x => (x._1, x._2)).map { case ((ty, d), xs) => (ty, d, xs.map(_._3).sum) }
      .toSeq
    val got = Stats.qTheilSen(spark, sf).collect()
    val byType = daily.groupBy(_._1)
    got.foreach { r =>
      val ty = r.getString(0)
      val s = byType(ty).sortBy(_._2.toEpochDay)
      val slopes = (for (i <- s.indices; j <- i + 1 until s.size)
        yield (s(j)._3 - s(i)._3).toDouble / (s(j)._2.toEpochDay - s(i)._2.toEpochDay))
        .sorted
      assert(r.getLong(1) === slopes.size.toLong, s"n_pairs($ty)")
      // unrounded emission: the lower-median slope is ONE exact-int
      // division picked by an order statistic → bit equality
      val want = slopes((slopes.size + 1) / 2 - 1)
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2)) ===
        java.lang.Double.doubleToLongBits(want), s"lower-median slope($ty)")
    }
    assert(got.map(_.getString(0)).toSet === byType.keySet)
  }

  test("spearman: rho matches a local average-rank recomputation, |rho| <= 1") {
    val daily = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).as("day"),
        round(col("value") * 100).cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
      .groupBy(x => (x._1, x._2))
      .map { case ((ty, d), xs) => (ty, d, xs.map(_._3).sum, xs.size.toLong) }
      .toSeq
    def ranks2(vs: Seq[Long]): Seq[Long] = {
      // doubled average ranks: 2*avg = 2*rank_min + ties - 1
      val byV = vs.sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, xs) => v -> (2L * (xs.map(_._2).min + 1) + xs.size - 1) }
      vs.map(byV)
    }
    val got = Stats.qSpearman(spark, sf).collect()
    val byType = daily.groupBy(_._1)
    got.foreach { r =>
      val ty = r.getString(0)
      val s = byType(ty)
      val (ru, rv) = (ranks2(s.map(_._3)), ranks2(s.map(_._4)))
      val n = s.size.toLong
      assert(r.getLong(1) === n, s"n_days($ty)")
      val (sx, sy) = (ru.sum, rv.sum)
      val sxy = ru.zip(rv).map { case (a, b) => a * b }.sum
      val sxx = ru.map(a => a * a).sum
      val syy = rv.map(a => a * a).sum
      val den = math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
      if (den > 0) {
        // unrounded emission: both sides assemble the same exact
        // integers through the same IEEE op chain → 1e-12, not 2e-4
        // (a wrong 4th decimal must FAIL this parity test)
        val want = (n * sxy - sx * sy).toDouble / den
        assert(math.abs(r.getDouble(2) - want) < 1e-12, s"rho($ty)")
        assert(math.abs(r.getDouble(2)) <= 1.0, s"|rho|<=1 ($ty)")
      }
    }
  }

  test("clustering depth: boundary sweep matches a local per-point stab count") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (maxP, maxS) = (li.map(_._1).max, li.map(_._2).max)
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val coded = li.map { case (p, s) =>
      val x8 = p * 256 / (maxP + 1); val y8 = s * 256 / (maxS + 1)
      (x8, y8, morton(x8, y8))
    }
    def expect(fileOf: ((Long, Long, Long)) => Long): (Long, Long, Double) = {
      val files = coded.groupBy(fileOf).values
        .map(xs => (xs.map(_._1).min, xs.map(_._1).max)).toSeq
      // stab count per grid point, brute force
      val depths = (0L until 256L).map(p => files.count(f => f._1 <= p && p <= f._2))
      (files.size.toLong, depths.max.toLong,
        BigDecimal(files.map(f => f._2 - f._1 + 1).sum.toDouble / 256.0)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val want = Map("linear" -> expect(_._1 / 4), "zorder" -> expect(_._3 / 1024))
    val got = ZOrder.ioClusteringDepth(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq === Seq("linear", "zorder"))
    got.foreach { r =>
      val e = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getDouble(3)) === e,
        s"layout ${r.getString(0)}")
    }
    // the claim itself: the linear layout is perfectly clustered on
    // its own sort key; z-order pays bounded extra x-depth for 2-D
    // pruning (tiles stack vertically)
    val byLayout = got.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byLayout("linear") <= byLayout("zorder"))
  }

  test("prune effectiveness: matches a local footer-stats simulation, box rows conserved") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val (maxP, maxS) = (li.map(_._1).max, li.map(_._2).max)
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val coded = li.map { case (p, s) =>
      val x8 = p * 256 / (maxP + 1); val y8 = s * 256 / (maxS + 1)
      (x8, y8, morton(x8, y8))
    }
    def simulate(fileOf: ((Long, Long, Long)) => Long): (Long, Long, Long, Long) = {
      val files = coded.groupBy(fileOf)
      val read = files.filter { case (_, xs) =>
        !(xs.map(_._1).max < 96 || xs.map(_._1).min > 127 ||
          xs.map(_._2).max < 96 || xs.map(_._2).min > 127)
      }
      val hits = coded.count(c => c._1 >= 96 && c._1 <= 127 && c._2 >= 96 && c._2 <= 127)
      (files.size.toLong, read.size.toLong, read.values.map(_.size.toLong).sum, hits.toLong)
    }
    val expect = Map(
      "linear" -> simulate(_._1 / 4),
      "zorder" -> simulate(_._3 / 1024))
    val got = ZOrder.ioPruneEffectiveness(spark, sf).collect()
    assert(got.map(_.getString(0)).toSeq === Seq("linear", "zorder"))
    got.foreach { r =>
      val e = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) === e,
        s"layout ${r.getString(0)}")
    }
    // the measured claim itself: z-order never reads more than linear
    // on this box (tiles vs a full x-slab), and both see every match
    val rowsRead = got.map(r => r.getString(0) -> r.getLong(3)).toMap
    got.foreach(r => assert(r.getLong(3) >= r.getLong(4), "reads cover matches"))
    assert(rowsRead("zorder") <= rowsRead("linear"),
      "z-order pruning dominates the single-key layout on a 2-D box")
  }
}
