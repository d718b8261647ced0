package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.functions._

import graft.syncer.{FileInventory, FsInventory, SyncOps}

/** The real-filesystem inventory source must agree with the
  * events-derived model: materialize the model inventory as an actual
  * directory tree (real files, real sizes, real mtimes), walk it with
  * [[FsInventory]], and run the sync operators over both.
  */
class FsInventorySpec extends GraftSpec {

  private lazy val root: Path = {
    val dir = Files.createTempDirectory("graft_fsinv")
    val rows = FileInventory.inventory(spark, sf)
      .select(col("path"), col("size_bytes"), col("mtime")).collect()
    rows.foreach { r =>
      val p = dir.resolve(r.getString(0))
      Files.createDirectories(p.getParent)
      // content length = the model's size; mtime = the model's mtime
      Files.write(p, new Array[Byte](r.getLong(1).toInt))
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(r.getTimestamp(2).getTime))
    }
    dir
  }

  test("walking the real tree reproduces the model inventory") {
    val fsInv = FsInventory.inventory(spark, root.toString)
      .select(col("path"), col("cf"), col("node_id"), col("shard_id"),
        col("generation"), col("is_temp"), col("size_bytes"), col("snap_date"))
    val model = FileInventory.inventory(spark, sf)
      .select(col("path"), col("cf"), col("node_id"), col("shard_id"),
        col("generation"), col("is_temp"), col("size_bytes"), col("snap_date"))
    assert(fsInv.count() === model.count())
    assert(fsInv.exceptAll(model).count() === 0)
    assert(model.exceptAll(fsInv).count() === 0)
  }

  test("sync_live_set over the real tree equals the model answer") {
    val fromFs = SyncOps.liveSetOf(FsInventory.durable(spark, root.toString))
    val fromModel = SyncOps.syncLiveSet(spark, sf)
    assert(fromFs.exceptAll(fromModel).count() === 0)
    assert(fromModel.exceptAll(fromFs).count() === 0)
  }

  test("sync_diff_upload over the real tree equals the model answer") {
    val durable = FsInventory.durable(spark, root.toString)
    // same already-uploaded model as FileInventory.target
    val target = durable.filter(col("generation") % 3 =!= 0 && col("node_id") =!= 3)
    val fromFs = SyncOps.diffUploadOf(durable, target)
    val fromModel = SyncOps.syncDiffUpload(spark, sf)
    assert(fromFs.exceptAll(fromModel).count() === 0)
    assert(fromModel.exceptAll(fromFs).count() === 0)
  }
}
