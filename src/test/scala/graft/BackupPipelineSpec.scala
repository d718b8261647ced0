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

  test("prune plan from storage never touches the live set and matches cutoff") {
    val plan = BackupPipeline.prunePlan(spark, targetUrl, "2024-01-20").cache()
    val live = SyncOps.syncLiveSet(spark, sf).select(col("path"))
    assert(plan.join(live, Seq("path"), "left_semi").count() === 0)
    // sanity: it reclaims something at this cutoff
    assert(plan.count() > 0)
  }
}
