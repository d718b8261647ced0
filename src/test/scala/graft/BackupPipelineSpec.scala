package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.syncer.{BackupPipeline, FileInventory, SyncOps, Target}

class BackupPipelineSpec extends GraftSpec {

  private lazy val targetUrl = {
    val root = Files.createTempDirectory("graft-backup").toString
    BackupPipeline.backup(spark, sf, s"directory://$root")
    s"directory://$root"
  }

  test("target URL parsing follows the reference CLI scheme") {
    assert(Target.parse("directory:///mnt/vol") ===
      Target.DirectoryTarget("/mnt/vol"))
    assert(Target.parse("objectstore://backups") ===
      Target.ObjectStoreTarget("backups"))
    intercept[IllegalArgumentException](Target.parse("ftp://nope"))
  }

  test("backup materializes every durable object") {
    val objects = spark.read.parquet(Target.parse(targetUrl).objectsPath)
    assert(objects.count() === FileInventory.durable(spark, sf).count())
  }

  test("restore from the stored manifests equals the analytical restore set") {
    val fromStorage = BackupPipeline.restoreSet(spark, targetUrl, "2024-01-15")
      .select(col("cf"), col("node_id"), col("shard_id"), col("generation"),
        col("path"), col("size_bytes"))
    val analytical = SyncOps.syncRestoreSet(spark, sf, asOf = "2024-01-15")
    assert(fromStorage.exceptAll(analytical).count() === 0)
    assert(analytical.exceptAll(fromStorage).count() === 0)
  }

  test("restore as of the far future equals the live set") {
    val fromStorage = BackupPipeline.restoreSet(spark, targetUrl, "2030-01-01")
    val live = SyncOps.syncLiveSet(spark, sf)
    assert(fromStorage.exceptAll(live).count() === 0)
    assert(live.exceptAll(fromStorage).count() === 0)
  }

  test("objectstore:// egress goes through a Hadoop FS connector scheme (mockos)") {
    graft.sources.MockObjectStoreFs.register(spark)
    val prev = sys.props.get("graft.objectstore.scheme")
    sys.props.put("graft.objectstore.scheme", "mockos")
    try {
      BackupPipeline.backup(spark, sf, "objectstore://bucket-r2")
      // bytes physically landed under the mock store's backing root
      assert(new java.io.File(
        graft.sources.MockObjectStoreFs.Root + "/bucket-r2/objects").exists())
      val fromStore = BackupPipeline.restoreSet(spark, "objectstore://bucket-r2", "2024-01-15")
        .select(col("cf"), col("node_id"), col("shard_id"), col("generation"),
          col("path"), col("size_bytes"))
      val analytical = SyncOps.syncRestoreSet(spark, sf, asOf = "2024-01-15")
      assert(fromStore.exceptAll(analytical).count() === 0)
      assert(analytical.exceptAll(fromStore).count() === 0)
    } finally {
      sys.props.remove("graft.objectstore.scheme")
      prev.foreach(v => sys.props.put("graft.objectstore.scheme", v))
    }
  }

  test("restore resume: interrupted pass records progress, re-run fetches only the remainder") {
    val root = Files.createTempDirectory("graft-restore-resume").toString
    val url = s"directory://$root"
    BackupPipeline.backup(spark, sf, url)
    val dest = Files.createTempDirectory("graft-restore-dest").toString
    val full = BackupPipeline.restoreSet(spark, url, "2024-01-15")
    val n = full.count().toInt
    assert(n > 3, "fixture too small to split")
    // pass 1: interrupted after floor(n/2) files
    val first = BackupPipeline.runRestorePass(spark, url, "2024-01-15", dest, Some(n / 2))
    assert(first.count() === (n / 2).toLong)
    // ledger recorded exactly the fetched files, bytes landed at dest
    val ledger = BackupPipeline.restoreLedger(spark, Target.parse(url))
    assert(ledger.count() === (n / 2).toLong)
    val sample = first.collect().head
    val f = new java.io.File(dest, sample.getAs[String]("path"))
    assert(f.exists() && f.length() === sample.getAs[Long]("size_bytes"))
    // remainder = full minus fetched (disjoint, together the full set)
    val remainder = BackupPipeline.restoreRemainder(spark, url, "2024-01-15")
    assert(remainder.count() === (n - n / 2).toLong)
    assert(remainder.join(first.select(col("path")), Seq("path"), "left_semi").count() === 0)
    // pass 2 (resume): fetches exactly the remainder, then nothing is left
    val second = BackupPipeline.runRestorePass(spark, url, "2024-01-15", dest)
    assert(second.count() === (n - n / 2).toLong)
    assert(BackupPipeline.restoreRemainder(spark, url, "2024-01-15").count() === 0)
    // pass 3: a completed restore re-run is a no-op
    val third = BackupPipeline.runRestorePass(spark, url, "2024-01-15", dest)
    assert(third.count() === 0)
  }

  test("prune plan from storage never touches the live set and matches cutoff") {
    val plan = BackupPipeline.prunePlan(spark, targetUrl, "2024-01-20").cache()
    val live = SyncOps.syncLiveSet(spark, sf).select(col("path"))
    assert(plan.join(live, Seq("path"), "left_semi").count() === 0)
    // sanity: it reclaims something at this cutoff
    assert(plan.count() > 0)
  }

  test("restore ledger is (cf, fetch_date)-partitioned; a scoped resume prunes ledger partitions") {
    val root = Files.createTempDirectory("graft-ledger-prune").toString
    val url = s"directory://$root"
    BackupPipeline.backup(spark, sf, url)
    val dest = Files.createTempDirectory("graft-ledger-dest").toString
    BackupPipeline.runRestorePass(spark, url, "2024-01-15", dest)
    // layout: one directory per cf, then per fetch date
    val ledgerDir = new java.io.File(Target.parse(url).restoreLedgerPath)
    val cfDirs = ledgerDir.listFiles().filter(_.getName.startsWith("cf="))
    assert(cfDirs.nonEmpty, "ledger not partitioned by cf")
    assert(cfDirs.forall(d =>
      d.listFiles().exists(_.getName.startsWith("fetch_date="))),
      "ledger cf partitions not sub-partitioned by fetch_date")
    // a cf-scoped resume pushes the cf predicate into the ledger
    // scan's PartitionFilters — the scan reads ONE cf's partitions
    val cf = cfDirs.head.getName.stripPrefix("cf=")
    val scoped = BackupPipeline.restoreRemainder(spark, url, "2024-01-15", Some(cf))
    // plan-string check (collect() does not descend into the AQE
    // wrapper): the ledger FileScan line must carry the cf equality in
    // its PartitionFilters, i.e. the scan reads ONE cf's partitions
    val ledgerScanLine = scoped.queryExecution.executedPlan.toString
      .linesIterator.find(l => l.contains("FileScan") && l.contains("restore_ledger"))
    assert(ledgerScanLine.isDefined, "no ledger scan in the scoped remainder plan")
    val pf = ledgerScanLine.get
      .split("PartitionFilters: ", 2).lift(1).getOrElse("")
    assert(pf.contains(s"cf#") && pf.contains(s"= $cf"),
      s"ledger scan lacks the cf partition filter: $ledgerScanLine")
    // scoped remainder is empty (the full pass fetched everything)
    assert(scoped.count() === 0)
  }

  test("legacy flat-JSON ledger migrates into the partitioned layout; resume keeps excluding") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ledger-migrate").toString
    val url = s"directory://$root"
    BackupPipeline.backup(spark, sf, url)
    val target = Target.parse(url)
    val full = BackupPipeline.restoreSet(spark, url, "2024-01-15")
    val n = full.count().toInt
    // simulate a pre-partitioning deployment: the first floor(n/2)
    // fetched files recorded as FLAT json appends (cf as a data
    // column, no fetch_date) directly under the ledger path
    val legacy = full.orderBy(col("path")).limit(n / 2)
      .select(col("path"), col("size_bytes"), lit("/old/dest").as("dest"), col("cf"))
    legacy.write.mode("append").json(target.restoreLedgerPath)
    // first partitioned-era read migrates: rows keep their cf (no
    // null-cf re-fetch hole) and carry the epoch fetch_date
    val led = BackupPipeline.restoreLedger(spark, target)
    assert(led.count() === (n / 2).toLong)
    assert(led.filter(col("cf").isNull).count() === 0, "migration lost cf")
    assert(led.select(col("fetch_date")).distinct().collect()
      .map(_.getDate(0).toString).toSeq === Seq("1970-01-01"))
    // the flat files are gone: only partition dirs remain
    val fs = new org.apache.hadoop.fs.Path(target.restoreLedgerPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(target.restoreLedgerPath))
      .filter(st => !st.getPath.getName.startsWith("_")).forall(_.isDirectory),
      "flat legacy files must be migrated away")
    // resume correctness: the remainder excludes the legacy-fetched
    // files, and a partitioned-era append next to the migrated rows
    // still reads back as ONE consistent ledger
    assert(BackupPipeline.restoreRemainder(spark, url, "2024-01-15").count() === (n - n / 2).toLong)
    val dest = Files.createTempDirectory("graft-ledger-migrate-dest").toString
    BackupPipeline.runRestorePass(spark, url, "2024-01-15", dest)
    assert(BackupPipeline.restoreLedger(spark, target).count() === n.toLong)
    assert(BackupPipeline.restoreRemainder(spark, url, "2024-01-15").count() === 0)
  }

  test("ledger migration is crash-safe: re-runs replace, never duplicate") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-ledger-crash").toString
    val url = s"directory://$root"
    BackupPipeline.backup(spark, sf, url)
    val target = Target.parse(url)
    val full = BackupPipeline.restoreSet(spark, url, "2024-01-15")
    val n = full.count().toInt
    val legacy = full.orderBy(col("path")).limit(n / 2)
      .select(col("path"), col("size_bytes"), lit("/old/dest").as("dest"), col("cf"))
    legacy.write.mode("append").json(target.restoreLedgerPath)
    val ledgerPath = new org.apache.hadoop.fs.Path(target.restoreLedgerPath)
    val fs = ledgerPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(BackupPipeline.restoreLedger(spark, target).count() === (n / 2).toLong)
    // crash mode 1: the epoch overwrite COMMITTED but the marker was
    // never written (and the flat files survived). The re-run must
    // REPLACE the epoch partitions, not append a second copy.
    val marker = new org.apache.hadoop.fs.Path(ledgerPath, "_MIGRATED")
    fs.delete(marker, false)
    legacy.write.mode("append").json(target.restoreLedgerPath)
    BackupPipeline.resetLedgerLayoutCache()
    assert(BackupPipeline.restoreLedger(spark, target).count() === (n / 2).toLong,
      "re-run after crash-before-marker duplicated ledger rows")
    assert(fs.exists(marker))
    // crash mode 2: marker written but the flat deletes didn't finish.
    // The re-run must delete leftovers WITHOUT re-reading them into
    // the ledger (their rows are already in the epoch partitions).
    legacy.limit(3).write.mode("append").json(target.restoreLedgerPath)
    BackupPipeline.resetLedgerLayoutCache()
    assert(BackupPipeline.restoreLedger(spark, target).count() === (n / 2).toLong,
      "leftover flat files after the marker must not re-migrate")
    assert(fs.listStatus(ledgerPath)
      .filter(st => !st.getPath.getName.startsWith("_")).forall(_.isDirectory))
    // steady state: the memoized layout check issues no migration work
    // and the ledger keeps reading consistently
    assert(BackupPipeline.restoreLedger(spark, target).count() === (n / 2).toLong)
  }
}
