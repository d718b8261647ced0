package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThanOrEqual, LessThanOrEqual}

import graft.sources.cass.{CassandraLikeStore, CassInputPartition, CassScanBuilder, CassTableDef}

/** Pins the graft-cass DataSource V2 contract: SSTable pruning by
  * filename key range under pushed predicates, exact residual
  * re-check in the reader, and write-tmp-then-rename atomicity —
  * the connector-level mirror of the reference uploader's
  * "no partially-visible upload" concern
  * (`/root/reference/bin/cassandra-syncer` `Uploader._performUpload`).
  */
class CassConnectorSpec extends GraftSpec {
  import spark.implicits._

  /** 80 keys, one cell each — deterministic ranges under
    * repartitionByRange.
    */
  private def cells80 = (0L until 80L)
    .map(k => (k, 1000000L + k, k, false, k.toDouble))
    .toDF("row_key", "write_us", "generation", "tombstone", "value")

  private def freshStore(flushTasks: Int): (CassandraLikeStore, String) = {
    val root = Files.createTempDirectory("graft_cass_spec_").toString
    val store = new CassandraLikeStore(root)
    store.append(cells80, "ks1", "cells", flushTasks)
    (store, s"$root/ks1/cells")
  }

  private def sstables(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.startsWith("sstable-"))

  private def tmpFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles().filter(_.getName.startsWith("_tmp-"))

  private def causes(t: Throwable): Seq[Throwable] =
    if (t == null) Nil else t +: causes(t.getCause)

  private def plan(dir: String, filters: Array[org.apache.spark.sql.sources.Filter]) = {
    val b = new CassScanBuilder(dir)
    val residual = b.pushFilters(filters)
    (b.build().asInstanceOf[graft.sources.cass.CassScan].planInputPartitions(),
      residual)
  }

  test("append range-clusters: flushTasks files with disjoint filename key ranges") {
    val (_, dir) = freshStore(8)
    val ranges = sstables(dir).flatMap(f => CassTableDef.keyRange(f.getName))
    // range sampling may merge a boundary, but the flush must fan out
    assert(ranges.length >= 4 && ranges.length <= 8)
    // disjoint and covering 0..79
    val sorted = ranges.sortBy(_._1)
    sorted.sliding(2).foreach { case Array((_, hi), (lo, _)) => assert(hi < lo) }
    assert(sorted.head._1 === 0L && sorted.last._2 === 79L)
  }

  test("planInputPartitions prunes SSTables by filename key range under pushed row_key bounds") {
    val (_, dir) = freshStore(8)
    val nFiles = sstables(dir).length
    val (all, _) = plan(dir, Array.empty)
    assert(all.length === nFiles)
    // a point lookup opens at most one file, and that file's range covers the key
    val (point, residual) = plan(dir, Array(EqualTo("row_key", 5L)))
    assert(residual.isEmpty, "key filters must be fully absorbed (no Spark-side residual)")
    assert(point.length === 1)
    val p = point.head.asInstanceOf[CassInputPartition]
    assert(p.minKey <= 5L && 5L <= p.maxKey)
    // a band keeps only overlapping files
    val (band, _) = plan(dir,
      Array(GreaterThanOrEqual("row_key", 10L), LessThanOrEqual("row_key", 19L)))
    assert(band.length < nFiles)
    assert(band.forall { ip =>
      val c = ip.asInstanceOf[CassInputPartition]; c.maxKey >= 10L && c.minKey <= 19L
    })
    // contradictory bounds prune everything at plan time
    val (none, _) = plan(dir, Array(EqualTo("row_key", 3L), EqualTo("row_key", 4L)))
    assert(none.isEmpty)
  }

  test("reader re-checks rows exactly when the file range overlaps but rows don't match") {
    // one flush task → one SSTable covering 0..79: pruning is
    // impossible, so correctness rests on the in-reader re-check
    val (store, dir) = freshStore(1)
    assert(sstables(dir).length === 1)
    val got = store.readRaw(spark, "ks1", "cells")
      .filter(col("row_key") === 5L).collect()
    assert(got.length === 1 && got.head.getAs[Long]("row_key") === 5L)
    // and the plan shows the predicate reached the scan
    val planStr = store.readRaw(spark, "ks1", "cells")
      .filter(col("row_key") === 5L)
      .queryExecution.executedPlan.toString
    assert(planStr.contains("PushedFilters: [EqualTo(row_key,5)"),
      s"row_key predicate must be pushed into CassScan:\n$planStr")
  }

  test("commit renames tmp SSTables atomically; no tmp files survive a successful append") {
    val (_, dir) = freshStore(8)
    assert(tmpFiles(dir).isEmpty)
    assert(sstables(dir).length === 8)
  }

  test("a failed write aborts cleanly: tmp deleted, no new SSTable becomes visible") {
    val (store, dir) = freshStore(4)
    val before = sstables(dir).map(_.getName).toSet
    // a null cell violates the format → the writer throws mid-task
    // (after opening its tmp file), the task aborts, the job fails
    val poisoned = cells80.withColumn("value",
      when(col("row_key") === 42L, lit(null)).otherwise(col("value")))
    val ex = intercept[Exception] {
      store.append(poisoned, "ks1", "cells", 1)
    }
    assert(ex.getMessage != null)
    assert(sstables(dir).map(_.getName).toSet === before,
      "aborted append must not make any SSTable visible")
    assert(tmpFiles(dir).isEmpty, "aborted append must delete its tmp files")
  }

  test("null cells fail loudly with the offending column named") {
    val (store, _) = freshStore(1)
    val poisoned = cells80.withColumn("write_us", lit(null).cast("bigint"))
    val ex = intercept[Exception] { store.append(poisoned, "ks1", "cells", 1) }
    assert(causes(ex).exists(c =>
      c.getMessage != null && c.getMessage.contains("write_us")),
      s"error must name the null column: ${ex.getMessage}")
  }

  test("null-value tombstones round-trip; a null value on a live cell is rejected") {
    val root = Files.createTempDirectory("graft_cass_null_").toString
    val store = new CassandraLikeStore(root)
    // key 1 live, key 2 deleted: the delete carries NO value (real
    // Cassandra tombstones have no cell payload)
    val cells = Seq(
      (1L, 1000L, 1L, false, Some(4.5)),
      (2L, 1000L, 2L, false, Some(9.0)),
      (2L, 2000L, 3L, true, None: Option[Double]))
      .toDF("row_key", "write_us", "generation", "tombstone", "value")
    store.append(cells, "ks1", "cells", 2)
    val raw = store.readRaw(spark, "ks1", "cells").collect()
    assert(raw.length === 3)
    val tomb = raw.find(_.getAs[Boolean]("tombstone")).get
    assert(tomb.isNullAt(tomb.fieldIndex("value")), "tombstone value must read back null")
    // merged view: the delete wins for key 2, key 1 unaffected
    val live = store.read(spark, "ks1", "cells").collect()
    assert(live.map(_.getAs[Long]("row_key")).toSeq === Seq(1L))
    // a live cell with a null value is a write-time error, not a 0.0
    val bad = Seq((3L, 1000L, 4L, false, None: Option[Double]))
      .toDF("row_key", "write_us", "generation", "tombstone", "value")
    val ex = intercept[Exception] {
      store.append(bad, "ks1", "cells", 1)
    }
    assert(causes(ex).exists(c => c.getMessage != null &&
      c.getMessage.contains("live (non-tombstone) cell")), ex.getMessage)
  }

  test("compaction collapses generations, GCs tombstones, and preserves the merged read") {
    val root = Files.createTempDirectory("graft_cass_compact_").toString
    val store = new CassandraLikeStore(root)
    // two generations; in gen2 every key ending in 4 is tombstoned
    val gen1 = cells80
    val gen2 = (0L until 80L by 2L)
      .map(k => (k, 2000000L + k, 100L + k, k % 10 == 4, k * 2.0))
      .toDF("row_key", "write_us", "generation", "tombstone", "value")
    store.append(gen1, "ks1", "cells", 8)
    store.append(gen2, "ks1", "cells", 8)
    val before = CassandraLikeStore.lwwMerge(store.readRaw(spark, "ks1", "cells"))
    CassandraLikeStore.compact(spark, store, "ks1", "cells", "compacted", 4)
    val after = store.read(spark, "ks1", "compacted")
    // semantic invariant: merged reads identical
    assert(after.exceptAll(before).count() === 0)
    assert(before.exceptAll(after).count() === 0)
    // physical: many generational SSTables → ≤4, shadowed cells gone
    assert(sstables(s"$root/ks1/cells").length >= 8)
    assert(sstables(s"$root/ks1/compacted").length <= 4)
    assert(store.readRaw(spark, "ks1", "compacted").count() === before.count())
    assert(store.readRaw(spark, "ks1", "compacted")
      .filter(col("tombstone")).count() === 0)
  }

  test("empty append commits no files") {
    val (_, dir) = freshStore(2)
    val before = sstables(dir).length
    val store2 = new CassandraLikeStore(new java.io.File(dir).getParentFile.getParent)
    store2.append(cells80.filter(col("row_key") < 0L), "ks1", "cells", 2)
    assert(sstables(dir).length === before)
    assert(tmpFiles(dir).isEmpty)
  }
}
