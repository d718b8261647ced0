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
    inv
      // cluster rows by the partition keys first: without this every
      // upstream task writes a file into every (date, cf) directory —
      // tasks × dirs small files, the classic partitioned-write
      // explosion at scale
      .repartition(org.apache.spark.sql.functions.col("snap_date"),
        org.apache.spark.sql.functions.col("cf"))
      .write.mode("overwrite").partitionBy("snap_date", "cf").parquet(path)

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

  /** Bucketed EXTERNAL table (explicit storage path + catalog entry)
    * — same co-location contract as [[writeBucketed]] without writing
    * into the session warehouse directory.
    */
  def writeBucketedAt(df: DataFrame, table: String, path: String,
      bucketCol: String, buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(buckets, bucketCol).sortBy(bucketCol)
      .saveAsTable(table)

  // ---- oracle-checked query surfaces (SURVEY.md §2.8) ----

  /** §2.8#50: write the durable inventory date/cf-partitioned, read
    * it back through the partition-pruned scan (the snap_date filter
    * prunes whole directories), and aggregate — proving the layout
    * round-trips values, types (DATE partition inference), and the
    * pruning path end to end.
    */
  def ioPartitionedInventory(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = "/tmp/graft_io_part_inv"
    writeInventoryPartitioned(graft.syncer.FileInventory.durable(spark, dir), path)
    readInventoryPartitioned(spark, path)
      .filter(col("snap_date") >= lit("2024-01-05").cast("date") &&
        col("snap_date") <= lit("2024-01-20").cast("date"))
      .groupBy(col("snap_date"), col("cf"))
      .agg(count(lit(1)).as("n_files"), sum(col("size_bytes")).as("bytes"))
      .orderBy(col("snap_date"), col("cf"))
  }

  /** §2.8#51: one daily aggregate written to CSV and JSON, both read
    * back schema-explicit and joined — every column must survive both
    * interchange formats bit-exactly.
    */
  def ioCsvJson(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val daily = graft.syncer.FileInventory.durable(spark, dir)
      .groupBy(col("snap_date"), col("cf"))
      .agg(count(lit(1)).as("n_files"), sum(col("size_bytes")).as("bytes"))
    writeCsv(daily, "/tmp/graft_io_csv")
    writeJson(daily, "/tmp/graft_io_json")
    val schema = StructType.fromDDL(
      "snap_date DATE, cf STRING, n_files BIGINT, bytes BIGINT")
    val c = readCsv(spark, "/tmp/graft_io_csv", schema)
      .select(col("snap_date"), col("cf"),
        col("n_files").as("n_csv"), col("bytes").as("bytes_csv"))
    val j = readJson(spark, "/tmp/graft_io_json", schema)
      .select(col("snap_date"), col("cf"),
        col("n_files").as("n_json"), col("bytes").as("bytes_json"))
    c.join(j, Seq("snap_date", "cf"))
      .orderBy(col("snap_date"), col("cf"))
  }

  /** §2.8#71: durable and target inventories written as bucketed
    * tables on the join key, then equi-joined — the bucket metadata
    * lets the join run with zero exchanges (asserted in SourcesSpec);
    * at 100 TB this is the pre-shuffled repeatedly-joined fact pair.
    */
  def ioBucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val dur = graft.syncer.FileInventory.durable(spark, dir)
      .select(col("path"), col("cf"), col("size_bytes"))
    val tgt = graft.syncer.FileInventory.target(spark, dir)
      .select(col("path").as("t_path"))
    writeBucketedAt(dur, "graft_dur_b", "/tmp/graft_bucketed/dur", "path", 8)
    writeBucketedAt(tgt, "graft_tgt_b", "/tmp/graft_bucketed/tgt", "t_path", 8)
    spark.table("graft_dur_b")
      .join(spark.table("graft_tgt_b"), col("path") === col("t_path"))
      .groupBy(col("cf"))
      .agg(count(lit(1)).as("n_synced"), sum(col("size_bytes")).as("synced_bytes"))
      .orderBy(col("cf"))
  }

  /** §2.8 — ORC interchange: the orders table written to ORC
    * partitioned by status, read back through the partition-pruned
    * columnar scan (the o_orderstatus filter prunes directories, the
    * two-column projection prunes stripes), and aggregated — values,
    * DATE types, and the pruning path must survive the third
    * interchange format alongside CSV/JSON ([[ioCsvJson]]).
    */
  def ioOrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val path = "/tmp/graft_io_orc"
    Tables.orders(spark, dir)
      .write.mode("overwrite").partitionBy("o_orderstatus").orc(path)
    spark.read.orc(path)
      .filter(col("o_orderstatus") =!= "P")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        graft.analytics.Money.dollars(
          sum(graft.analytics.Money.cents(col("o_totalprice"))), 100.0).as("total_price"),
        max(col("o_orderdate")).as("last_date"))
      .orderBy(col("o_orderstatus"))
  }

  /** §2.8#146 — schema evolution across parquet generations: an old
    * generation written without a column, a new generation with it,
    * read back as one logical table via `mergeSchema` (the footer
    * union Spark otherwise skips for speed — at 100 TB schema merge
    * is a metadata-only operation over file footers, not a data
    * pass). Old-generation rows surface the added column as NULL;
    * the aggregate proves both generations land in one scan with the
    * union schema.
    */
  def ioSchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = "/tmp/graft_io_evo"
    val orders = Tables.orders(spark, dir)
    orders.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .write.mode("overwrite").parquet(s"$root/gen1")
    orders.filter(col("o_orderkey") % 2 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
      .write.mode("overwrite").parquet(s"$root/gen2")
    spark.read.option("mergeSchema", "true")
      .parquet(s"$root/gen1", s"$root/gen2")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        graft.analytics.Money.dollars(
          sum(graft.analytics.Money.cents(col("o_totalprice"))), 100.0).as("total_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first)
  }

  /** §2.8#176 — small-file compaction: a store fragmented into 64
    * shards (the streaming-ingest failure mode — every micro-batch ×
    * partition leaves a file; at 100 TB the NameNode/listing cost
    * and per-file open overhead dominate scans) is rewritten into 4
    * right-sized files. The rewrite is a plain repartition→write —
    * on a cluster the target count comes from bytes/128 MB, here a
    * fixture constant. Output proves BOTH layouts hold identical
    * content and pins the real on-disk file counts before/after.
    */
  /** §2.8 `io_shard_balance` — balanced output-shard planning: items
    * (documents, sized by n_chars) are ordered by descending size and
    * dealt round-robin into 16 shards — the classic LPT-flavored
    * greedy that bounds shard skew by the largest item. This is the
    * writer-side plan every big sink needs (equal-sized output files
    * from skewed inputs). The rank comes from
    * [[graft.analytics.Ranks.globalRowNumber]] — per-size-band counts
    * plus band-partitioned row_numbers — so no task ever sorts the
    * whole document axis; the band axis (16-char size cells) is
    * bounded by the size RANGE, not the corpus. The spec asserts the
    * achieved balance.
    */
  def ioShardBalance(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.analytics.Ranks.globalRowNumber(
        Tables.documents(spark, dir).select(col("doc_id"), col("n_chars")),
        expr("-(n_chars div 16)"),
        Seq(col("n_chars").desc, col("doc_id")), "rn")
      .withColumn("shard", ((col("rn") - 1) % 16).cast("long"))
      .drop("rn")
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      .orderBy(col("shard"))
  }

  /** §2.8 `io_dynamic_overwrite` — dynamic partition overwrite: the
    * corrections batch rewrites ONLY the partitions it contains
    * (`partitionOverwriteMode=dynamic`), leaving every other
    * partition's files physically untouched — the idempotent
    * backfill primitive for a partitioned lake (static overwrite
    * would truncate the whole table; append would duplicate). Here
    * the per-(priority, month) rollup is written, then the urgent
    * partition is re-derived under a stricter filter and overwritten;
    * the read-back must show corrected urgent rows next to original
    * everything-else. The spec additionally pins that untouched
    * partitions keep their exact files.
    */
  def ioDynamicOverwrite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files
      .createTempDirectory("graft_dynover_").toString
    def rollup(src: DataFrame): DataFrame = src
      .groupBy(col("o_orderpriority").as("pri"),
        date_format(col("o_orderdate"), "yyyy-MM").as("mon"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
    rollup(Tables.orders(spark, dir))
      .write.partitionBy("pri").mode("overwrite").parquet(root)
    rollup(Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 1000))
      .write.partitionBy("pri").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(root)
    spark.read.parquet(root)
      .select(col("pri"), col("mon"), col("n_orders"), col("sum_price"))
      .orderBy(col("pri"), col("mon"))
  }

  def ioCompactSmallFiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = "/tmp/graft_io_compact"
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.analytics.Money.cents(col("l_quantity")).as("qty_c"))
    li.repartition(64).write.mode("overwrite").parquet(s"$root/fragmented")
    spark.read.parquet(s"$root/fragmented")
      .repartition(4).write.mode("overwrite").parquet(s"$root/compacted")
    def files(p: String): Long =
      new java.io.File(p).listFiles((_, n) => n.endsWith(".parquet")).length.toLong
    def profile(phase: String, p: String): DataFrame =
      spark.read.parquet(p)
        .agg(count(lit(1)).as("n_rows"), sum(col("qty_c")).as("total_qty_c"),
          countDistinct(col("l_orderkey")).as("n_orders"))
        .select(lit(phase).as("phase"), lit(files(p)).as("n_files"),
          col("n_rows"), col("total_qty_c"), col("n_orders"))
    profile("compacted", s"$root/compacted")
      .unionByName(profile("fragmented", s"$root/fragmented"))
      .orderBy(col("phase"))
  }
}
