package graft

import java.io.File

import org.apache.spark.sql.functions._

import graft.sources.{Tables, TxnLog}
import graft.syncer.SyncOps

class LakeFormatSpec extends GraftSpec {

  test("txn log: time travel reads each version; compaction is content-invisible") {
    val rows = TxnLog.ioTxnLog(spark, sf).collect()
    assert(rows.length === 3)
    val byV = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val all = Tables.orders(spark, sf).count()
    val old = Tables.orders(spark, sf)
      .filter(to_date(col("o_orderdate")) < lit("1998-01-01").cast("date")).count()
    assert(byV(0L)._1 === old)
    assert(byV(1L)._1 === all)
    // v2 rewrote v0's files but must read back identical content
    assert(byV(2L) === byV(1L))
  }

  test("txn log: compaction changed the physical file set, not the row set") {
    val root = TxnLog.txnFixture(spark, sf)
    val v1 = TxnLog.liveFiles(spark, root, Some(1))
    val v2 = TxnLog.liveFiles(spark, root, Some(2))
    assert(v1.length === 4) // 2 files per insert batch
    assert(v2.length === 3) // v0's two files replaced by one compacted
    val b0 = v1.filter(_.contains("/b0/"))
    assert(b0.length === 2 && b0.forall(f => !v2.contains(f)))
    assert(v2.count(_.contains("/b2/")) === 1)
  }

  test("txn log: committing an existing version is refused (optimistic concurrency)") {
    val root = TxnLog.txnFixture(spark, sf)
    val e = intercept[IllegalStateException] {
      TxnLog.commit(root, 1, Seq(TxnLog.Action("add", "/nope", 1L)))
    }
    assert(e.getMessage.contains("conflict"))
    // the losing commit left no partial state behind
    val logFiles = new File(s"$root/_txn_log").listFiles().map(_.getName).sorted
    assert(logFiles.toSeq === Seq("v00000.json", "v00001.json", "v00002.json"))
  }

  test("txn log: remove-then-re-add replays in version order (file is live again)") {
    val root = java.nio.file.Files.createTempDirectory("graft_txn_readd_").toString
    TxnLog.commit(root, 0, Seq(
      TxnLog.Action("add", "/data/a", 10L), TxnLog.Action("add", "/data/b", 10L)))
    TxnLog.commit(root, 1, Seq(TxnLog.Action("remove", "/data/a", 0L)))
    TxnLog.commit(root, 2, Seq(TxnLog.Action("add", "/data/a", 12L)))
    assert(TxnLog.liveFiles(spark, root, Some(0)) === Seq("/data/a", "/data/b"))
    assert(TxnLog.liveFiles(spark, root, Some(1)) === Seq("/data/b"))
    // global set-subtraction would keep /data/a dead forever; ordered
    // replay resurrects it at the re-add version
    assert(TxnLog.liveFiles(spark, root, Some(2)) === Seq("/data/a", "/data/b"))
    // same-version add+remove is a net no-op
    TxnLog.commit(root, 3, Seq(
      TxnLog.Action("add", "/data/c", 5L), TxnLog.Action("remove", "/data/c", 0L)))
    assert(TxnLog.liveFiles(spark, root, Some(3)) === Seq("/data/a", "/data/b"))
  }

  test("txn log: file paths with quotes/backslashes survive the commit round-trip") {
    val root = java.nio.file.Files.createTempDirectory("graft_txn_esc_").toString
    val nasty = "/data/we\"ird\\path\tx"
    TxnLog.commit(root, 0, Seq(TxnLog.Action("add", nasty, 1L)))
    assert(TxnLog.liveFiles(spark, root, Some(0)) === Seq(nasty))
  }

  test("deletion vectors: rows vanish without touching data files") {
    val root = TxnLog.dvFixture(spark, sf)
    val dataFiles = new File(s"$root/data").listFiles((_, n) => n.endsWith(".parquet"))
    val mtimes = dataFiles.map(f => f.getName -> f.lastModified()).toMap
    val got = TxnLog.ioDeleteVectors(spark, sf)
      .agg(sum(col("n_orders"))).collect()(0).getLong(0)
    val exp = Tables.orders(spark, sf).filter(col("o_orderkey") % 10 =!= 0).count()
    assert(got === exp)
    // merge-on-read: the "delete" wrote only the sidecar
    dataFiles.foreach(f => assert(f.lastModified() === mtimes(f.getName)))
  }

  test("deletion vectors: the anti-join broadcasts the vector side") {
    val plan = TxnLog.ioDeleteVectors(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      plan.take(2000))
  }

  test("stats pruning skips most files and loses no rows") {
    val (total, hit) = TxnLog.statsPruneCounts(spark, sf)
    assert(total === 8)
    assert(hit < total, s"pruning did nothing: $hit of $total files hit")
    val got = TxnLog.ioStatsPruneScan(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val exp = Tables.lineitem(spark, sf)
      .filter(to_date(col("l_shipdate")).between(
        lit("1996-01-01").cast("date"), lit("1996-06-30").cast("date")))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(graft.analytics.Money.cents(col("l_quantity"))).as("q"))
      .orderBy(col("l_returnflag")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === exp)
  }

  test("leveled compaction: levels partition the durable set with 10x targets") {
    val rows = SyncOps.syncLeveledCompaction(spark, sf).collect()
    val durable = graft.syncer.FileInventory.durable(spark, sf).count()
    assert(rows.map(_.getLong(2)).sum === durable) // every file leveled once
    rows.foreach { r =>
      val (level, n, cap, overflow, over) =
        (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5), r.getBoolean(6))
      assert(cap === Seq(4L, 40L, 400L, 4000L)(level.toInt))
      assert(overflow === math.max(n - cap, 0L))
      assert(over === (n > cap))
      // recency-decade occupancy never exceeds the decade width
      if (level < 3) assert(n <= Seq(9L, 90L, 900L)(level.toInt))
    }
    // L0 exists for every cf present (the newest flushes always land there)
    val cfs = rows.map(_.getString(0)).distinct
    assert(cfs.forall(cf => rows.exists(r => r.getString(0) == cf && r.getLong(1) == 0L)))
  }

  test("txn feed: the streamed change feed matches the static log exactly") {
    val got = graft.streaming.StreamWatcher.streamTxnFeedQuery(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val root = TxnLog.txnFixture(spark, sf)
    val exp = spark.read
      .schema("version BIGINT, action STRING, file STRING, n_rows BIGINT")
      .json(s"$root/_txn_log")
      .groupBy(col("version"), col("action"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"))
      .orderBy(col("version"), col("action")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === exp)
    // the feed observed all three commits and the compaction's removes
    assert(got.map(_._1).distinct.sorted === Seq(0L, 1L, 2L))
    assert(got.exists(r => r._1 == 2L && r._2 == "remove" && r._3 == 2L))
  }

  test("vacuum: retained reads byte-identical, retained files untouched, below-horizon fails") {
    val schema = "o_orderkey BIGINT, o_custkey BIGINT, price_c BIGINT, d DATE"
    val root = java.nio.file.Files.createTempDirectory("graft_vac_spec_").toString
    TxnLog.buildTxnCommits(spark, sf, root)
    def mtimes(fs: Seq[String]) = fs.map(f => f -> new File(
      new java.net.URI(f).getPath).lastModified()).toMap
    val v2Files = TxnLog.liveFiles(spark, root, Some(2))
    val v1Files = TxnLog.liveFiles(spark, root, Some(1))
    val before = TxnLog.snapshot(spark, root, schema, Some(2))
      .collect().map(_.toString).sorted.toSeq
    val mtBefore = mtimes(v2Files)
    // horizon below the tombstone version deletes NOTHING (b0 was live at v1)
    val (del1, _) = TxnLog.vacuum(spark, root, 1)
    assert(del1 === 0L)
    assert(v1Files.forall(f => new File(new java.net.URI(f).getPath).exists()))
    // horizon = head: b0's two originals (tombstoned by the v2
    // compaction) are the exact deletable set
    val (del2, kept) = TxnLog.vacuum(spark, root, 2)
    assert(del2 === 2L && kept === 3L)
    val b0 = v1Files.filter(_.contains("/b0/"))
    assert(b0.length === 2 && b0.forall(f => !new File(new java.net.URI(f).getPath).exists()))
    // retained files: present, mtimes untouched (GC never rewrites live data)
    assert(mtimes(v2Files) === mtBefore)
    // retained version reads byte-identical rows
    val after = TxnLog.snapshot(spark, root, schema, Some(2))
      .collect().map(_.toString).sorted.toSeq
    assert(after === before)
    // time travel below the horizon fails cleanly at RESOLUTION time
    for (v <- Seq(0, 1)) {
      val e = intercept[IllegalStateException](TxnLog.liveFiles(spark, root, Some(v)))
      assert(e.getMessage.contains("vacuumed"))
    }
    // vacuum is idempotent and the horizon is monotone
    val (del3, _) = TxnLog.vacuum(spark, root, 2)
    assert(del3 === 0L)
    assert(TxnLog.vacuumHorizon(root) === Some(2))
  }
}
