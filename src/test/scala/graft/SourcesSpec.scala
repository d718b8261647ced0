package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Io
import graft.syncer.FileInventory

class SourcesSpec extends GraftSpec {

  test("orc roundtrip preserves counts, money, and timestamps vs the parquet source") {
    val got = Io.ioOrcRoundtrip(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.get(3).toString)).toSeq
    val exp = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderstatus") =!= "P")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        graft.analytics.Money.dollars(
          sum(graft.analytics.Money.cents(col("o_totalprice"))), 100.0).as("t"),
        max(col("o_orderdate")).as("d"))
      .orderBy(col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.get(3).toString)).toSeq
    assert(got === exp)
  }

  test("partitioned inventory round-trips and prunes partitions on snap_date") {
    val dir = Files.createTempDirectory("graft-inv").toString
    val inv = FileInventory.inventory(spark, sf)
    Io.writeInventoryPartitioned(inv, dir)
    val back = Io.readInventoryPartitioned(spark, dir)
    assert(back.count() === inv.count())
    val pruned = back.filter(col("snap_date") === lit("2024-01-05").cast("date"))
    // partition pruning reaches the scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan.take(1500))
    assert(pruned.count() ===
      inv.filter(col("snap_date") === lit("2024-01-05").cast("date")).count())
  }

  test("csv and json round-trip with explicit schemas") {
    val dir = Files.createTempDirectory("graft-io").toString
    val live = graft.syncer.SyncOps.syncLiveSet(spark, sf)
    Io.writeCsv(live, s"$dir/csv")
    Io.writeJson(live, s"$dir/json")
    val csv = Io.readCsv(spark, s"$dir/csv", live.schema)
    val json = Io.readJson(spark, s"$dir/json", live.schema)
    assert(csv.count() === live.count())
    assert(json.count() === live.count())
    assert(csv.schema === live.schema)
    assert(json.exceptAll(live).count() === 0)
  }

  test("bucketed tables join without any exchange") {
    Io.writeBucketed(graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity")), "li_b", "l_orderkey", 8)
    Io.writeBucketed(graft.sources.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_totalprice")), "ord_b", "o_orderkey", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      joined.write.format("noop").mode("overwrite").save()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${plan.take(2000)}")
      assert(joined.count() === graft.sources.Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("compaction preserves every row and actually shrinks the file count") {
    val rows = graft.sources.Io.ioCompactSmallFiles(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows("fragmented")._1 > rows("compacted")._1)
    assert(rows("compacted")._1 === 4L)
    assert(rows("fragmented")._2 === rows("compacted")._2) // row counts equal
    assert(rows("fragmented")._3 === rows("compacted")._3) // content sums equal
  }
}
