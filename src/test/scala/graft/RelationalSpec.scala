package graft

import org.apache.spark.sql.functions._

import graft.analytics.{Relational, Windows}
import graft.sources.Tables

class RelationalSpec extends GraftSpec {

  test("stratified sample keeps per-stratum fractions near their targets, deterministically") {
    val totals = Tables.lineitem(spark, sf).groupBy(col("l_returnflag")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Relational.qSampleStratified(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = Map("A" -> 26.0 / 256, "N" -> 5.0 / 256, "R" -> 13.0 / 256)
    sampled.foreach { case (flag, n) =>
      val frac = n.toDouble / totals(flag)
      assert(math.abs(frac - target(flag)) < 0.6 * target(flag),
        s"stratum $flag sampled fraction $frac vs target ${target(flag)}")
    }
    // md5 thresholding has no RNG state: two runs agree exactly
    val again = Relational.qSampleStratified(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === sampled)
  }

  test("q1 produces the flag x status groups with exact count totals") {
    val r = Relational.q1Agg(spark, sf).collect()
    assert(r.nonEmpty)
    val total = r.map(_.getAs[Long]("count_order")).sum
    assert(total === Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp")).count())
  }

  test("salted join equals the plain join it replaces") {
    val salted = Relational.qJoinSkewSalt(spark, sf)
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n_lines"))
    val s = salted.select(col("o_orderstatus"), col("n_lines")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val p = plain.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s === p)
  }

  test("window top-n keeps at most 3 parts per brand, ranked correctly") {
    val r = Windows.qWindowTopn(spark, sf)
    assert(r.groupBy(col("p_brand")).count().filter(col("count") > 3).count() === 0)
    assert(r.filter(col("rnk") < 1 || col("rnk") > 3).count() === 0)
  }

  test("sessionize conserves events") {
    val total = Windows.qSessionize(spark, sf)
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    assert(total === Tables.events(spark, sf).count())
  }

  test("rollup grand total equals customer count") {
    val grand = Relational.qRollup(spark, sf)
      .filter(col("region_name") === "ALL" && col("nation_name") === "ALL")
      .collect()
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("n_customers") === Tables.customer(spark, sf).count())
  }

  test("exact distinct matches approx HLL within its error bound") {
    val exact = Relational.qDistinctHll(spark, sf).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    val approx = Tables.events(spark, sf).groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.02).as("approx_users")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_users")).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n).toDouble / n < 0.1, s"$k: exact=$n approx=${approx(k)}")
    }
  }

  test("unpivot: every measure column keeps its full row count and exact total") {
    val li = Tables.lineitem(spark, sf)
    val nLines = li.count()
    val rows = Relational.qUnpivot(spark, sf).collect()
    assert(rows.map(_.getLong(2)).sum === nLines * 4) // 4 measures × every line
    val qtyTotal = rows.filter(_.getString(1) == "qty_c").map(_.getLong(3)).sum
    val expectedQty = li.agg(sum(round(col("l_quantity") * 100).cast("long"))).head.getLong(0)
    assert(qtyTotal === expectedQty)
  }

  test("weighted median: at least half the weight sits on each side of the chosen value") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        round(col("l_quantity") * 100).cast("long").as("qty_c"),
        round(col("l_extendedprice") * 100).cast("long").as("w"))
    Relational.qWeightedMedian(spark, sf).collect().foreach { r =>
      val (flag, med, tot) = (r.getString(0), r.getLong(1), r.getLong(2))
      val below = li.filter(col("l_returnflag") === flag && col("qty_c") <= med)
        .agg(sum(col("w"))).head.getLong(0)
      val above = li.filter(col("l_returnflag") === flag && col("qty_c") >= med)
        .agg(sum(col("w"))).head.getLong(0)
      assert(below * 2 >= tot, s"$flag: weight below median too small")
      assert(above * 2 >= tot, s"$flag: weight above median too small")
    }
  }

  test("time-range window frame: every trailing 1h count matches a self-join recount") {
    val out = graft.analytics.Windows.qWindowTimeRange(spark, sf)
    val ev = Tables.events(spark, sf).filter(col("user_id") <= 20)
      .select(col("user_id").as("u"), unix_micros(col("ts")).as("us"))
    val recount = out.join(ev, out("user_id") === col("u") &&
        col("us") >= out("ts_us") - (3600L * 1000000 - 1) && col("us") <= out("ts_us"))
      .groupBy(out("user_id"), out("event_id"), out("n_1h"))
      .agg(count(lit(1)).as("recount"))
      .filter(col("n_1h") =!= col("recount"))
    assert(recount.count() === 0)
  }

  test("moments from integer power sums match Spark's builtin skewness/kurtosis") {
    val builtin = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), round(col("l_quantity")).cast("long").as("q"))
      .groupBy(col("l_returnflag"))
      .agg(skewness(col("q").cast("double")).as("sk"),
        kurtosis(col("q").cast("double")).as("ku"))
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    Relational.qMoments(spark, sf).collect().foreach { r =>
      val (sk, ku) = builtin(r.getString(0))
      assert(math.abs(r.getDouble(3) - sk) < 1e-3, s"${r.getString(0)} skewness")
      assert(math.abs(r.getDouble(4) - ku) < 1e-3, s"${r.getString(0)} kurtosis")
    }
  }

  test("percent of total: shares sum to 100") {
    val rows = Relational.qPercentOfTotal(spark, sf).collect()
    assert(rows.length > 1)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 100.0) < 0.01)
  }

  test("table profiler: null counts, distincts, and bounds check out against direct queries") {
    val prof = Relational.qProfileTable(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val orders = Tables.orders(spark, sf)
    val n = orders.count()
    assert(prof("o_orderkey").getLong(1) === 0L)
    assert(prof("o_orderkey").getLong(2) === n) // pk is unique
    assert(prof("o_prio_null").getLong(1) ===
      orders.filter(col("o_orderkey") % 7 === 0).count())
    assert(prof("o_orderstatus").getLong(2) ===
      orders.select(col("o_orderstatus")).distinct().count())
    assert(prof("o_totalprice").getDouble(3) <= prof("o_totalprice").getDouble(4))
    assert(prof("o_orderdate").getString(5) <= prof("o_orderdate").getString(6))
  }

  test("decile report: shares sum to 1, monotone non-increasing revenue per decile") {
    val rows = Relational.qDecileReport(spark, sf).collect()
    assert(rows.length === 10)
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 0.01)
    val revs = rows.sortBy(_.getLong(0)).map(_.getLong(2))
    revs.sliding(2).foreach { p =>
      assert(p(0) >= p(1), "deciles must be ordered by revenue")
    }
    assert(rows.map(_.getLong(1)).sum ===
      Tables.orders(spark, sf).select(col("o_custkey")).distinct().count())
  }

  test("quota forecast: positive growth rate and days-to-double within the observed span") {
    graft.syncer.SyncOps.syncQuotaForecast(spark, sf).collect().foreach { r =>
      val (nDays, rate, dtd) = (r.getLong(1), r.getDouble(3), r.getDouble(4))
      assert(rate > 0.0, s"cf ${r.getString(0)}: non-positive growth")
      assert(dtd > 0.0 && dtd < nDays * 3, s"cf ${r.getString(0)}: implausible days-to-double $dtd")
    }
  }

  test("typed Aggregator matches the untyped aggregation") {
    import spark.implicits._
    import graft.analytics.{EventRow, TypedAggs}
    val typed = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), col("value")).as[EventRow]
      .groupByKey(_.user_id)
      .agg(TypedAggs.userStats)
      .collect().map { case (u, s) => u -> ((s.n_events, s.n_purchases, math.round(s.total_value * 100))) }.toMap
    val untyped = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"),
        sum(col("value")).as("t"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), math.round(r.getDouble(3) * 100)))).toMap
    assert(typed === untyped)
  }

  test("winsorized mean: clamped mean is pulled toward the center, ~10% rows clamped") {
    val rows = graft.analytics.Relational.qWinsorizedMean(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, win, pct) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      // clamping a right-skewed positive distribution lowers the mean
      assert(win <= raw + 1e-9)
      assert(pct >= 0.0 && pct <= 20.0)
    }
  }

  test("order aging: bands partition the open orders; closed orders excluded") {
    val rows = graft.analytics.Relational.qOrderAging(spark, sf).collect()
    assert(rows.nonEmpty)
    val openTotal = graft.sources.Tables.orders(spark, sf)
      .filter(org.apache.spark.sql.functions.col("o_orderstatus") === "O").count()
    assert(rows.map(_.getLong(2)).sum === openTotal)
    val bands = Set("000-090", "091-180", "181-365", "365+")
    rows.foreach(r => assert(bands.contains(r.getString(1))))
    rows.foreach(r => assert(r.getDouble(3) > 0.0))
  }

  test("basket size histogram: conserves orders and lines") {
    val rows = graft.analytics.Relational.qBasketSizeHist(spark, sf).collect()
    assert(rows.nonEmpty)
    val li = graft.sources.Tables.lineitem(spark, sf)
    assert(rows.map(_.getLong(1)).sum ===
      li.select("l_orderkey").distinct().count())
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === li.count())
    rows.foreach(r => assert(r.getDouble(3) > 0.0))
  }
}
