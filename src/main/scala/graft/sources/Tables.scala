package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Columnar parquet scans are the engine's only batch source at the
  * moment; filters/projections issued downstream are pushed into the
  * scan by Catalyst (verified via `.explain` — see `PlanAuditSpec`).
  * On a real cluster these paths would be directory roots with
  * partition columns; locally each table is a single file.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Rebalance a scan ONLY when it arrives with fewer partitions than
    * the session's parallelism (the local single-file case — one
    * parquet file, one row group, one partition). An unconditional
    * `repartition()` would insert a round-robin Exchange shuffling
    * full rows (document text, embedding arrays) even on a cluster
    * whose many-file scan is already parallel — at 100 TB that doubles
    * I/O before any narrow work. The partition probe (`df.rdd` plans
    * the scan, runs no job) keeps the operator a true no-op there.
    */
  def rebalanced(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  def region(s: SparkSession, d: String): DataFrame = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = apply(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) parquet, which Spark's parquet
    * reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and this loader
    * converts ns→µs with integer division (`div`, not double math —
    * ns epoch values exceed double's 2^53 exact range), matching
    * DuckDB's ns→µs truncation exactly.
    *
    * `events.value` is money-shaped: EXACTLY two decimal places, so
    * `round(value * 100)` is a lossless cents quantization. Every
    * cents/n exact-quotient output (q_percentiles mean, q_ab_cuped,
    * …) leans on this; Round14OpsSpec pins it per corpus so a future
    * finer-precision corpus fails loudly instead of silently
    * quantizing those statistics.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
