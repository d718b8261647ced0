package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.analytics.Frontier
import graft.sources.{Tables, ZOrder}

/** Skyline, max-concurrency, and z-order layout. */
class FrontierZOrderSpec extends GraftSpec {

  test("q_skyline matches brute-force dominance on sf0.001") {
    val pts = Tables.orders(spark, sf)
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("s"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val distinctPts = pts.toSet
    val brute = distinctPts.filter { case (x, y) =>
      !distinctPts.exists { case (qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y)
      }
    }
    val got = Frontier.qSkyline(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute)
    assert(brute.nonEmpty)
  }

  test("skyline rows are mutually non-dominating and sorted") {
    val rows = Frontier.qSkyline(spark, sf).collect()
    val xs = rows.map(_.getLong(0))
    assert(xs.sameElements(xs.sorted(Ordering[Long].reverse)), "spend strictly desc")
    // along descending spend, order count must strictly increase
    val ys = rows.map(_.getLong(1))
    assert(ys.zip(ys.tail).forall { case (a, b) => b > a },
      "orders strictly increase as spend decreases on a frontier")
  }

  test("paretoFrontier matches brute force on 50 random point sets") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 50).foreach { trial =>
      val n = 1 + rnd.nextInt(120)
      // small coordinate ranges force heavy duplicate collapse and
      // degenerate shapes (all-same-x, all-same-point, single bucket)
      val xr = 1 + rnd.nextInt(if (trial % 5 == 0) 3 else 1000)
      val yr = 1 + rnd.nextInt(if (trial % 7 == 0) 2 else 50)
      val pts = (0 until n).map(i =>
        (rnd.nextInt(xr).toLong, rnd.nextInt(yr).toLong, i.toLong))
      val d = pts.toDF("spend_c", "n_orders", "k")
        .groupBy("spend_c", "n_orders")
        .agg(count(lit(1)).as("n_customers"), min(col("k")).as("min_custkey"))
      val got = Frontier.paretoFrontier(d).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val dp = pts.map(p => (p._1, p._2)).toSet
      val brute = dp.filter { case (x, y) =>
        !dp.exists { case (qx, qy) => qx >= x && qy >= y && (qx > x || qy > y) }
      }
      assert(got === brute, s"trial $trial (n=$n xr=$xr yr=$yr)")
    }
  }

  test("q_max_concurrency matches a single-partition global sweep") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"))
      .as[(String, Long)].collect()
    val expected = ev.groupBy(_._1).map { case (t, es) =>
      val deltas = es.flatMap { case (_, u) => Seq((u, 1L), (u + 300000000L, -1L)) }
        .sortBy(d => (d._1, d._2))
      var run = 0L; var peak = Long.MinValue; var firstAt = 0L
      deltas.foreach { case (u, d) =>
        run += d
        if (run > peak) { peak = run; firstAt = u }
      }
      t -> ((peak, firstAt))
    }
    val got = Frontier.qMaxConcurrency(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    assert(got.values.forall(_._1 >= 1L))
  }

  test("sweep day-carry counts intervals opened before midnight into the next day") {
    import spark.implicits._
    val day = 86400000000L // us
    // 3 intervals open at 23:58 (still open after midnight), 2 more
    // open at 00:01 next day: peak = 5 just after 00:01, carried
    // across the partition boundary. A second type checks isolation.
    val ev = Seq(
      ("a", day - 120000000L), ("a", day - 110000000L), ("a", day - 100000000L),
      ("a", day + 60000000L), ("a", day + 70000000L),
      ("b", 1000L)
    ).toDF("event_type", "us")
    val got = Frontier.sweepPeaks(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got("a") === ((5L, day + 70000000L)))
    assert(got("b") === ((1L, 1000L)))
  }

  test("z-order layout prunes on BOTH dimensions; linear sort only on one") {
    val out = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    val zDir = s"$out/z"
    val linDir = s"$out/linear"
    val coded = ZOrder.writeZOrdered(spark, sf, zDir, 16)
    // linear layout: same file count, sorted on the first key only
    coded.repartitionByRange(16, col("x8")).sortWithinPartitions(col("x8"))
      .write.mode("overwrite").parquet(linDir)

    def avgSpan(dir: String, dim: String): Double = {
      val files = new java.io.File(dir).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
      val spans = files.flatMap { f =>
        val r = spark.read.parquet(f).agg(min(col(dim)), max(col(dim))).head()
        if (r.isNullAt(0)) None
        else Some((r.getLong(1) - r.getLong(0) + 1) / 256.0)
      }
      spans.sum / spans.length
    }
    val zX = avgSpan(zDir, "x8"); val zY = avgSpan(zDir, "y8")
    val linX = avgSpan(linDir, "x8"); val linY = avgSpan(linDir, "y8")
    // 16 z-range files tile the 256x256 grid: both dims bounded
    assert(zX < 0.6 && zY < 0.6, s"z-order spans x=$zX y=$zY should be narrow")
    // the linear layout is narrow on its sort key but blind on the other
    assert(linX < 0.3, s"linear primary span $linX")
    assert(linY > 0.8, s"linear secondary span $linY should cover ~full range")
    assert(zY < linY / 2, "z-order at least halves the secondary-dim span")
  }

  test("morton code is a bijection on the 16-bit grid (spot grid)") {
    import spark.implicits._
    val grid = (0 until 256 by 17).flatMap(x => (0 until 256 by 13).map(y => (x.toLong, y.toLong)))
    val df = grid.toDF("x", "y")
      .withColumn("z", ZOrder.morton8(col("x"), col("y")))
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._3).distinct.length === rows.length, "distinct codes")
    rows.foreach { case (x, y, z) =>
      // de-interleave and check round-trip
      val xr = (0 until 8).map(i => ((z >> (2 * i)) & 1L) << i).sum
      val yr = (0 until 8).map(i => ((z >> (2 * i + 1)) & 1L) << i).sum
      assert(xr === x && yr === y, s"roundtrip ($x,$y) -> $z")
    }
  }
}
