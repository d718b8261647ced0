package graft.tools

import org.apache.spark.sql.SparkSession

import graft.syncer.BackupPipeline

/** Demo driver for the full backup → restore → prune workflow
  * (SURVEY.md §2.1) against a directory:// target, mirroring the
  * reference's CLI surface:
  *   cassandra-syncer --source <data> --target directory:///backup
  *   cassandra-syncer-restore --source directory:///backup
  *
  * Usage: runMain graft.tools.BackupDemo [sfDir] [targetRoot]
  */
object BackupDemo {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val root = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-backup-demo").toString)
    val url = s"directory://$root"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    BackupPipeline.backup(spark, dataDir, url)
    println(s"[backup-demo] backed up to $url")
    val restore = BackupPipeline.restoreSet(spark, url, "2024-01-15")
    println(s"[backup-demo] restore set @2024-01-15: ${restore.count()} files")
    restore.orderBy("cf", "node_id", "shard_id").show(5, truncate = false)
    val prune = BackupPipeline.prunePlan(spark, url, "2024-01-20")
    println(s"[backup-demo] prunable @2024-01-20: ${prune.count()} files")
    spark.stop()
  }
}
