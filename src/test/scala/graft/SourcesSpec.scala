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

  test("dynamic overwrite rewrites only the touched partition's files") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Files.createTempDirectory("graft_dynover_spec_").toString
    def rollup(src: org.apache.spark.sql.DataFrame) = src
      .groupBy(col("o_orderpriority").as("pri"),
        date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
    rollup(graft.sources.Tables.orders(spark, sf))
      .write.partitionBy("pri").mode("overwrite").parquet(root)
    def filesOf(part: String): Map[String, Long] =
      Files.list(Paths.get(root, part)).iterator.asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString -> Files.getLastModifiedTime(p).toMillis)
        .toMap
    val lowBefore = filesOf("pri=5-LOW")
    val urgentBefore = filesOf("pri=1-URGENT")
    rollup(graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 1000))
      .write.partitionBy("pri").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(root)
    assert(filesOf("pri=5-LOW") === lowBefore, "untouched partition was rewritten")
    assert(filesOf("pri=1-URGENT").keySet.intersect(urgentBefore.keySet).isEmpty,
      "touched partition kept its old files")
    // read-back: urgent corrected, everything else original
    val back = spark.read.parquet(root)
    val urgentRows = back.filter(col("pri") === "1-URGENT")
      .agg(sum(col("n_orders"))).collect().head.getLong(0)
    val expected = graft.sources.Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 1000)
      .count()
    assert(urgentRows === expected)
  }

  test("secondary index returns exactly the LWW rows in the probed buckets") {
    val viaIndex = graft.syncer.SyncOps.cassSecondaryIndex(spark, sf).collect()
    assert(viaIndex.forall(r => r.getLong(0) == 0L || r.getLong(0) == 1L))
    val direct = graft.syncer.SyncOps.syncLwwMerge(spark, sf)
      .filter(floor(col("latest_value") / 50) <= 1)
      .collect().map(_.getLong(0)).toSet
    assert(viaIndex.map(_.getLong(1)).toSet === direct)
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
