package graft.syncer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end backup/restore pipeline over real storage — the full
  * reference workflow (`bin/cassandra-syncer` +
  * `bin/cassandra-syncer-restore`) as Spark jobs:
  *
  *   - [[Target.parse]] accepts the reference's CLI target URLs
  *     (`directory:///mnt/vol`, `objectstore://bucket`);
  *   - [[BackupPipeline.backup]] materializes the durable inventory
  *     into `<target>/objects/` (parquet, partitioned by cf) and one
  *     manifest per snapshot day into `<target>/manifests/`
  *     (JSON, date-partitioned) — the analogue of
  *     `Uploader._writeManifest`'s timestamped `<now>.json`;
  *   - [[BackupPipeline.restoreSet]] picks the newest manifest at or
  *     before the requested time and returns exactly its file set —
  *     `Restore.restore`'s minimal-set semantics;
  *   - [[BackupPipeline.prunePlan]] lists objects older than a cutoff
  *     that the newest manifest no longer references (`fsck
  *     --older-than`).
  *
  * Scale note: manifests here are backfilled for every historical day
  * in one pass (bounded lineages × days as-of grid). A production
  * deployment appends one manifest per snapshot instead; the restore
  * and prune paths are identical either way.
  */
sealed trait Target {
  def objectsPath: String
  def manifestsPath: String
  /** Per-batch manifests appended by the watch daemon. */
  final def watchManifestsPath: String =
    objectsPath.stripSuffix("/objects") + "/watch_manifests"
  /** Streaming checkpoint for the watch daemon (restart = resume). */
  final def watchCheckpointPath: String =
    objectsPath.stripSuffix("/objects") + "/checkpoints/watch"
}

object Target {
  final case class DirectoryTarget(root: String) extends Target {
    val objectsPath = s"$root/objects"
    val manifestsPath = s"$root/manifests"
  }

  /** Object-store bucket target. Storage scheme resolution is left to
    * the Hadoop filesystem layer: the `graft.objectstore.scheme`
    * system property names the connector scheme (s3a/gs/abfs on a
    * real cluster, `mockos` under test — see
    * [[graft.sources.MockObjectStoreFs]]); with no scheme configured
    * the bucket maps under /tmp like the reference's cloudfiles
    * CACHE_PATH staging dir.
    */
  final case class ObjectStoreTarget(bucket: String) extends Target {
    private val base = sys.props.get("graft.objectstore.scheme") match {
      case Some(scheme) if scheme.nonEmpty => s"$scheme://$bucket"
      case _ => s"/tmp/graft-objectstore/$bucket"
    }
    val objectsPath = s"$base/objects"
    val manifestsPath = s"$base/manifests"
  }

  def parse(url: String): Target = url match {
    case s if s.startsWith("directory://") => DirectoryTarget(s.stripPrefix("directory://"))
    case s if s.startsWith("objectstore://") => ObjectStoreTarget(s.stripPrefix("objectstore://"))
    case other => throw new IllegalArgumentException(
      s"unsupported target '$other' (expected directory:// or objectstore://)")
  }
}

object BackupPipeline {

  /** Upload phase: durable files → cf-partitioned object table, plus
    * a manifest (the live set as of that day) for every snapshot day.
    */
  def backup(spark: SparkSession, dataDir: String, targetUrl: String): Target = {
    val target = Target.parse(targetUrl)
    val durable = FileInventory.durable(spark, dataDir)
    // cluster by the partition key before the partitioned write so
    // each directory gets one file per key, not one per upstream task
    durable.repartition(col("cf"))
      .write.mode("overwrite").partitionBy("cf").parquet(target.objectsPath)
    manifestRows(spark, dataDir)
      .repartition(col("manifest_date"))
      .write.mode("overwrite").partitionBy("manifest_date").json(target.manifestsPath)
    target
  }

  /** Live set as of every snapshot day: an as-of join of the
    * (lineage × day) grid against the file history — grid rows carry
    * the latest file at-or-before their day via an ordered window.
    */
  private[syncer] def manifestRows(spark: SparkSession, dataDir: String): DataFrame = {
    val durable = FileInventory.durable(spark, dataDir)
      .select(col("cf"), col("node_id"), col("shard_id"),
        col("generation"), col("path"), col("size_bytes"), col("snap_date"))
    val days = durable.select(col("snap_date")).distinct()
    val lineages = durable.select(col("cf"), col("node_id"), col("shard_id")).distinct()
    val grid = lineages.crossJoin(days)
      .select(col("cf"), col("node_id"), col("shard_id"), col("snap_date"),
        lit(null).cast("long").as("generation"),
        lit(null).cast("string").as("path"),
        lit(null).cast("long").as("size_bytes"),
        lit(1).as("tag"))
    val files = durable.withColumn("tag", lit(0))
    val w = Window.partitionBy(col("cf"), col("node_id"), col("shard_id"))
      .orderBy(col("snap_date"), col("tag"), col("generation"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    files.unionByName(grid)
      .withColumn("live", last(
        when(col("tag") === 0, struct(col("generation"), col("path"), col("size_bytes"))),
        ignoreNulls = true).over(w))
      .filter(col("tag") === 1 && col("live").isNotNull)
      .select(col("snap_date").as("manifest_date"),
        col("cf"), col("node_id"), col("shard_id"),
        col("live.generation").as("generation"),
        col("live.path").as("path"),
        col("live.size_bytes").as("size_bytes"))
  }

  private def manifests(spark: SparkSession, target: Target): DataFrame =
    spark.read
      .schema("cf STRING, node_id BIGINT, shard_id BIGINT, generation BIGINT, " +
        "path STRING, size_bytes BIGINT, manifest_date DATE")
      .json(target.manifestsPath)

  /** Restore phase: the newest manifest at or before `asOf`, i.e. the
    * minimum file set that reconstructs that point in time.
    */
  def restoreSet(spark: SparkSession, targetUrl: String, asOf: String): DataFrame = {
    val m = manifests(spark, Target.parse(targetUrl))
      .filter(col("manifest_date") <= lit(asOf).cast("date"))
    val latest = m.agg(max(col("manifest_date")).as("manifest_date"))
    m.join(broadcast(latest), Seq("manifest_date"))
      .select(col("cf"), col("node_id"), col("shard_id"),
        col("generation"), col("path"), col("size_bytes"))
  }

  /** §2.1#60 oracle surface: full backup to a directory target, then
    * the storage-side restore set as of 2024-01-15 — the reference's
    * complete backup→manifest→restore story through real parquet/JSON
    * sinks. Must equal the purely-analytical restore
    * (`sync_restore_set`), which is exactly what the shared oracle
    * SQL computes.
    */
  def backupPipelineQuery(spark: SparkSession, dir: String): DataFrame = {
    val url = "directory:///tmp/graft_backup_oracle"
    backup(spark, dir, url)
    restoreSet(spark, url, "2024-01-15")
      .orderBy(col("cf"), col("node_id"), col("shard_id"))
  }

  /** Prune phase: objects older than the cutoff that the newest
    * manifest no longer references.
    */
  def prunePlan(spark: SparkSession, targetUrl: String, cutoff: String): DataFrame = {
    val target = Target.parse(targetUrl)
    val objects = spark.read.parquet(target.objectsPath)
    val m = manifests(spark, target)
    val latest = m.join(broadcast(m.agg(max(col("manifest_date")).as("manifest_date"))),
      Seq("manifest_date")).select(col("path"))
    objects
      .filter(col("snap_date") < lit(cutoff).cast("date"))
      .join(latest, Seq("path"), "left_anti")
      .select(col("path"), col("cf"), col("generation"), col("size_bytes"))
  }
}
