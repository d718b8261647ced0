package graft.sources.cass

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The table-store seam: everything in the engine that reads or
  * writes "a Cassandra table" goes through this trait, so the storage
  * backend is swappable without touching any operator. Two bindings:
  *
  *   - [[CassandraLikeStore]] — the in-repo binding over the
  *     `graft-cass` DataSource V2 format (generational SSTables of
  *     cell writes, LWW merge-on-read);
  *   - on a real cluster, a binding over the Spark Cassandra
  *     connector (`format("org.apache.spark.sql.cassandra")` with the
  *     same keyspace/table options) drops in here — the reference's
  *     declared approach ("Spark DataFrame + Cassandra connector for
  *     read/write sync") with zero operator changes.
  */
trait TableStore {
  /** Raw cell writes, every generation — the compaction-input view. */
  def readRaw(spark: SparkSession, keyspace: String, table: String): DataFrame
  /** The live row view: last-write-wins, tombstones dropped. */
  def read(spark: SparkSession, keyspace: String, table: String): DataFrame
  /** Append one generation of cell writes. */
  def append(df: DataFrame, keyspace: String, table: String): Unit
}

final class CassandraLikeStore(root: String) extends TableStore {
  private def path(keyspace: String, table: String) = s"$root/$keyspace/$table"

  override def readRaw(spark: SparkSession, keyspace: String, table: String): DataFrame =
    spark.read.format("graft-cass")
      .option("path", path(keyspace, table)).load()

  override def read(spark: SparkSession, keyspace: String, table: String): DataFrame =
    CassandraLikeStore.lwwMerge(readRaw(spark, keyspace, table))

  /** Range-cluster on the partition key before the append so each
    * task's SSTable covers a disjoint key range — that is what makes
    * the filename key ranges selective for later pruned scans (the
    * same reason Cassandra nodes own token ranges).
    *
    * `flushTasks` controls how many SSTables one append (memtable
    * flush) produces; it defaults to the cluster's parallelism so a
    * 1000-core cluster flushes 1000-way, and small fixtures can pin
    * it low for stable key ranges.
    */
  override def append(df: DataFrame, keyspace: String, table: String): Unit =
    append(df, keyspace, table,
      df.sparkSession.sparkContext.defaultParallelism)

  def append(df: DataFrame, keyspace: String, table: String,
      flushTasks: Int): Unit =
    df.select(col("row_key"), col("write_us"), col("generation"),
        col("tombstone"), col("value"))
      .repartitionByRange(flushTasks, col("row_key"))
      .write.format("graft-cass").mode("append")
      .option("path", path(keyspace, table)).save()
}

object CassandraLikeStore {

  /** Cassandra's read-path semantic over raw cells: newest write per
    * key wins (ordered by write timestamp then generation), keys
    * whose newest write is a tombstone disappear. One shuffle on the
    * row key.
    */
  def lwwMerge(cells: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("row_key"))
      .orderBy(col("write_us").desc, col("generation").desc)
    cells.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && !col("tombstone"))
      .select(col("row_key"), col("value").as("latest_value"),
        col("write_us"), col("generation"))
  }

  /** The events table as cell writes — the shared fixture derivation
    * (same as the CDC change feed / batch LWW merge).
    */
  def cellsFromEvents(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.events(spark, dir).select(
      (col("user_id") % 50).cast("long").as("row_key"),
      unix_micros(col("ts")).as("write_us"),
      col("event_id").as("generation"),
      (col("event_type") === "error").as("tombstone"),
      // a tombstone DELETES the value cell: real Cassandra deletes
      // carry no value, so the fixture writes null there and the
      // connector round-trips it through its \N token — exercised on
      // every cass_* oracle read
      when(col("event_type") === "error", lit(null).cast("double"))
        .otherwise(col("value")).as("value"))

  // one store per corpus per JVM — the store build (two appends, so
  // the LWW read spans multiple SSTable generations) is the fixture;
  // the measured queries are the connector reads
  private val stores = new java.util.concurrent.ConcurrentHashMap[String, CassandraLikeStore]()

  def eventStore(spark: SparkSession, dir: String): CassandraLikeStore =
    stores.computeIfAbsent(dir, d => {
      // per-process root: two JVMs on the same corpus (bench + test)
      // must not delete each other's live store, and distinct corpora
      // must never collide (hashCode isn't injective)
      val root = java.nio.file.Files
        .createTempDirectory("graft_cass_store_").toString
      val store = new CassandraLikeStore(root)
      val cells = cellsFromEvents(spark, d)
      // two generational flushes — the merged read must see both;
      // 8 flush tasks keeps the fixture's filename key ranges stable
      store.append(cells.filter(col("generation") % 2 === 0), "ks1", "cells", 8)
      store.append(cells.filter(col("generation") % 2 === 1), "ks1", "cells", 8)
      store
    })

  /** §2 beyond-survey oracle surface: the LWW-merged live view read
    * back THROUGH the connector must equal the merge computed
    * directly from `events` (which is exactly what the oracle SQL
    * does) — proving the sink wrote every cell and the source read
    * them all back.
    */
  def cassLwwRead(spark: SparkSession, dir: String): DataFrame =
    eventStore(spark, dir).read(spark, "ks1", "cells")
      .orderBy(col("row_key"))

  /** Compaction executed THROUGH the connector (§2.8#137): read every
    * raw cell generation, apply the LWW merge (Cassandra's compaction
    * IS its read-path merge made durable), and write the survivors
    * back as one compacted generation in a fresh table. Semantic
    * invariant: the compacted table's merged read equals the
    * original's. Physical effect: N generational SSTables collapse to
    * `flushTasks` range-disjoint ones, and tombstone-shadowed rows
    * physically disappear (grace-expired tombstone GC).
    *
    * Scale shape: one shuffle on the row key (the merge window), then
    * a range-clustered rewrite — the same cost profile as a major
    * compaction streaming one node's token range.
    */
  def compact(spark: SparkSession, store: CassandraLikeStore,
      keyspace: String, from: String, to: String, flushTasks: Int): Unit =
    store.append(
      store.read(spark, keyspace, from).select(
        col("row_key"), col("write_us"), col("generation"),
        lit(false).as("tombstone"), col("latest_value").as("value")),
      keyspace, to, flushTasks)

  private val compacted = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** §2.8#137 oracle surface: the merged read of the COMPACTED table
    * must equal the merge of the original raw cells (which is what
    * the shared oracle SQL computes from `events`) — round-tripping
    * merge → sink → source → merge through the connector.
    */
  def cassCompact(spark: SparkSession, dir: String): DataFrame = {
    val store = eventStore(spark, dir)
    if (compacted.add(dir))
      compact(spark, store, "ks1", "cells", "cells_compacted", 8)
    store.read(spark, "ks1", "cells_compacted").orderBy(col("row_key"))
  }

  /** §2 beyond-survey oracle surface: a partition-key-restricted scan
    * (`row_key` band) through the connector — the pushed predicate
    * prunes SSTables by filename key range and re-checks rows in the
    * reader; the spec pins both behaviors in the plan.
    */
  def cassTokenScan(spark: SparkSession, dir: String): DataFrame =
    eventStore(spark, dir).readRaw(spark, "ks1", "cells")
      .filter(col("row_key").between(10, 19))
      .groupBy(col("row_key"))
      .agg(count(lit(1)).as("n_cells"),
        max(col("generation")).as("max_generation"),
        sum(when(col("tombstone"), 1L).otherwise(0L)).as("n_tombstones"))
      .orderBy(col("row_key"))
}
