package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch sources/sinks beyond the plain parquet scan (SURVEY.md §2.8).
  *
  * The scale-relevant piece is partitioned layout: `partitionBy` on
  * low-cardinality business keys (snapshot date, cf) so downstream
  * filters prune entire directories — the physical form of the
  * manifest/retention queries' `snap_date` predicates. CSV/JSON are
  * interchange formats: always schema-explicit on read (inference
  * costs a full extra pass at 100 TB and can mistype columns).
  */
object Io {

  /** Date/cf-partitioned parquet layout for the file inventory —
    * `snap_date=.../cf=.../part-*.parquet` on disk; a `snap_date`
    * filter then reads only matching directories (partition pruning,
    * visible as PartitionFilters in the scan).
    */
  def writeInventoryPartitioned(inv: DataFrame, path: String): Unit =
    inv.write.mode("overwrite").partitionBy("snap_date", "cf").parquet(path)

  def readInventoryPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Bucketed managed table: co-locates join keys at write time so
    * later equi-joins on the bucket column need no exchange at all —
    * the pre-shuffle pattern for repeatedly-joined 100 TB fact
    * tables. (Bucket metadata lives in the session catalog; on a
    * cluster this is the metastore.)
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}
