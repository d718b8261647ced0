package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.dedup.Dedup
import graft.text.TextAnalysis

/** End-to-end training-data pipeline demo: the dedup/quality stack
  * composed the way a 100 TB corpus build runs it —
  *
  *   exact dedup → LSH candidates → Jaccard verify → cluster
  *   collapse → survivor selection → quality filter → corpus stats.
  *
  * Usage: runMain graft.tools.CorpusPipelineDemo [sfDir]
  */
object CorpusPipelineDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val total = graft.sources.Tables.documents(spark, dir).count()
    println(s"[pipeline] corpus: $total docs")

    val exactSurvivors = Dedup.dedupExactSurvivors(spark, dir).select(col("doc_id")).cache()
    println(s"[pipeline] after exact dedup: ${exactSurvivors.count()}")

    val verified = Dedup.dedupPipelineVerified(spark, dir, threshold = 0.8).cache()
    println(s"[pipeline] verified near-dup pairs (LSH → jaccard ≥ 0.8): ${verified.count()}")

    val clusters = Dedup.connectedComponents(verified).cache()
    val losers = clusters.filter(col("doc_id") =!= col("cluster_id")).select(col("doc_id"))
    println(s"[pipeline] near-dup clusters: " +
      s"${clusters.select(col("cluster_id")).distinct().count()} keep-roots, " +
      s"${losers.count()} docs collapsed away")

    val survivors = exactSurvivors.join(losers, Seq("doc_id"), "left_anti").cache()
    println(s"[pipeline] survivors after near-dup collapse: ${survivors.count()}")

    val quality = TextAnalysis.textQuality(spark, dir)
      .join(survivors, Seq("doc_id"), "left_semi")
      .filter(col("quality_score") >= 0.5)
    println(s"[pipeline] clean corpus (quality ≥ 0.5): ${quality.count()}")
    quality.groupBy(col("lang"))
      .agg(count(lit(1)).as("docs"),
        round(avg(col("quality_score")), 3).as("avg_quality"),
        sum(col("n_tokens")).as("tokens"))
      .orderBy(col("lang")).show(truncate = false)

    spark.stop()
  }
}
