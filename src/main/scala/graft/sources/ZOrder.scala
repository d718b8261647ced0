package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout.
  *
  * At 100 TB the cheapest query is the one that never reads a file:
  * range-partitioning on a single sort key gives file-level min/max
  * pruning on that key only, while interleaving the bits of two keys
  * gives pruning on BOTH — each z-range file covers a small tile of
  * the (x, y) grid, so a predicate on either dimension skips most
  * files. This is the layout trick behind Delta/Iceberg `OPTIMIZE
  * ZORDER BY`, built here from first principles: rank-scale each key
  * to 8 bits off a broadcast max, interleave to a 16-bit Morton code
  * with plain bitwise ops (all codegen'd, no UDF), then
  * `repartitionByRange` on the code and sort within partitions.
  *
  * [[zorderStats]] is the registry entry (SQL-checkable: the Morton
  * code is pure integer arithmetic, so DuckDB reproduces it exactly);
  * [[writeZOrdered]] is the layout writer the spec measures for
  * actual file-skipping effectiveness against a linear sort.
  */
object ZOrder {

  /** Morton interleave of two pre-scaled 8-bit integer columns:
    * bit i of x lands at position 2i, bit i of y at 2i+1.
    */
  def morton8(x: Column, y: Column): Column =
    (0 until 8).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)

  /** The same interleave as ANSI SQL text, for the DuckDB oracle. */
  def morton8Sql(x: String, y: String): String =
    (0 until 8).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " | ", ")")

  /** lineitem with 8-bit rank-scaled part/supplier keys and their
    * 16-bit Morton code. Bounds come from one tiny broadcast
    * aggregate; the scale uses integer `div` so both engines
    * truncate identically.
    */
  private def coded(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
    val bounds = li.agg(max(col("l_partkey")).as("max_p"),
      max(col("l_suppkey")).as("max_s"))
    li.crossJoin(broadcast(bounds))
      .withColumn("x8", expr("(l_partkey * 256) div (max_p + 1)"))
      .withColumn("y8", expr("(l_suppkey * 256) div (max_s + 1)"))
      .withColumn("z", morton8(col("x8"), col("y8")))
      .drop("max_p", "max_s")
  }

  /** §2 beyond-survey — Morton-code layout audit: bucket the 16-bit
    * z space into 64 ranges (the file boundaries a range-partitioned
    * write would draw) and report each bucket's row count and its
    * min/max along BOTH scaled dimensions. Narrow spans on both axes
    * in every bucket are exactly the property that makes z-order
    * files prunable on either key; a linear sort shows span ≈ full
    * range on the second axis. Single scan, one broadcast of the
    * 1-row bounds, partial-agg groupBy on a 64-value key.
    */
  def ioZorderLayout(spark: SparkSession, dir: String): DataFrame =
    coded(spark, dir)
      .groupBy(expr("z div 1024").as("zbucket"))
      .agg(count(lit(1)).as("n"),
        min(col("x8")).as("min_x"), max(col("x8")).as("max_x"),
        min(col("y8")).as("min_y"), max(col("y8")).as("max_y"))
      .orderBy(col("zbucket"))

  /** §2.8 `io_prune_effectiveness` — measures the property z-order
    * exists to buy: file-level min/max pruning on BOTH dimensions.
    * For a literal query box (x8, y8 ∈ [96, 127] — one sixteenth of
    * the grid), simulate the reader's stats-pruning decision under
    * two 64-file layouts of the SAME rows: `zorder` (files = Morton
    * ranges, the [[ioZorderLayout]] boundaries) vs `linear` (files =
    * x8 ranges — the single-key sort a naive writer produces). A file
    * is read iff its per-file [min, max] interval on each filtered
    * column intersects the box — exactly the parquet footer-stats
    * rule. All counts are exact integers off one scan per layout over
    * a lineage-cut coded frame; at 100 TB the same arithmetic runs on
    * the footer-stats relation (64 rows per layout here, |files|
    * rows there), never on data. The linear layout reads every file
    * whose x range hits the box regardless of y (~full x-slab);
    * z-order reads only the tiles in the box — the measured gap IS
    * the layout's value.
    */
  def ioPruneEffectiveness(spark: SparkSession, dir: String): DataFrame = {
    val (lo, hi) = (96L, 127L)
    perFileStats(spark, dir)
      .withColumn("read",
        !(col("max_x") < lo || col("min_x") > hi ||
          col("max_y") < lo || col("min_y") > hi))
      .groupBy(col("layout"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("read"), 1L).otherwise(0L)).as("files_read"),
        sum(when(col("read"), col("n")).otherwise(0L)).as("rows_read"),
        sum(col("hits")).as("rows_matched"))
      .orderBy(col("layout"))
  }

  /** Per-(layout, file) footer stats for BOTH 64-file layouts off ONE
    * fact scan: each row explodes into its two (layout, file_id)
    * assignments, and the partial-aggregated groupBy collapses to
    * ≤128 rows per map task before the only shuffle — the fact table
    * is read once and never materialized, so this is exactly the
    * footer-stats relation a lakehouse reader consults, at any scale.
    */
  private def perFileStats(spark: SparkSession, dir: String): DataFrame = {
    val (lo, hi) = (96L, 127L)
    coded(spark, dir)
      .withColumn("hit",
        col("x8") >= lo && col("x8") <= hi && col("y8") >= lo && col("y8") <= hi)
      .select(explode(array(
        struct(lit("linear").as("layout"), expr("x8 div 4").as("file_id")),
        struct(lit("zorder").as("layout"), expr("z div 1024").as("file_id")))).as("lf"),
        col("x8"), col("y8"), col("hit"))
      .groupBy(col("lf.layout").as("layout"), col("lf.file_id").as("file_id"))
      .agg(count(lit(1)).as("n"),
        min(col("x8")).as("min_x"), max(col("x8")).as("max_x"),
        min(col("y8")).as("min_y"), max(col("y8")).as("max_y"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("hits"))
  }

  /** §2.8 `io_clustering_depth` — clustering-depth audit, the metric
    * Delta/Iceberg OPTIMIZE reports to decide when re-clustering pays:
    * for each 64-file layout of the same rows (`zorder` Morton ranges
    * vs `linear` x-ranges), how many files' [min_x, max_x] key ranges
    * stab any given point of the x axis. max_depth is the worst-case
    * point-lookup fan-in; avg_depth = Σ per-file span / 256 averages
    * it over the key grid. A perfectly clustered layout has depth 1
    * on its sort key; z-order trades bounded x-depth (each 32×32 tile
    * column = 8 overlapping tiles) for pruning on BOTH dimensions —
    * this op and [[ioPruneEffectiveness]] are the two sides of that
    * trade, measured. Exact integers off per-file stats (64 rows per
    * layout at any data scale — the sweep is a window over ≤130
    * boundary rows per layout, never over data).
    */
  def ioClusteringDepth(spark: SparkSession, dir: String): DataFrame = {
    import graft.Ckpt.CutOps
    import org.apache.spark.sql.expressions.Window
    // ONE fact scan (shared explode shape) down to ≤128 stats rows;
    // the lineage cut only pins that compact frame for its two
    // consumers below, never fact-cardinality data
    val f = perFileStats(spark, dir)
      .select(col("layout"), col("min_x"), col("max_x"))
      .cutLineage(eager = false)
    val deltas = f.select(col("layout"), col("min_x").as("pos"), lit(1L).as("delta"))
      .unionAll(f.select(col("layout"), (col("max_x") + 1).as("pos"),
        lit(-1L).as("delta")))
      .groupBy(col("layout"), col("pos")).agg(sum(col("delta")).as("d"))
    val wRun = Window.partitionBy(col("layout")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val depth = deltas.withColumn("run", sum(col("d")).over(wRun))
      .groupBy(col("layout")).agg(max(col("run")).as("max_depth"))
    f.groupBy(col("layout"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("max_x") - col("min_x") + 1).as("span_sum"))
      .join(depth, Seq("layout"))
      .select(col("layout"), col("n_files"), col("max_depth"),
        round(col("span_sum").cast("double") / 256.0, 4).as("avg_depth"))
      .orderBy(col("layout"))
  }

  /** Write `nFiles` z-ordered parquet files (range-partitioned and
    * sorted by the Morton code); returns the coded frame for reuse.
    * The shuffle is the same single range-exchange a plain sort-write
    * costs — z-order buys two-dimensional pruning for free.
    */
  def writeZOrdered(spark: SparkSession, dir: String, out: String, nFiles: Int): DataFrame = {
    val c = coded(spark, dir)
    c.repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions(col("z"))
      .write.mode("overwrite").parquet(out)
    c
  }
}
