package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan auditor: prints, per registered query, the physical-plan
  * shape counts that matter at scale — exchanges, sorts, broadcast vs
  * shuffle joins, cartesian products, scans without pushed filters —
  * so plan regressions are visible without reading 47 explain dumps.
  *
  * Usage: runMain graft.tools.PlanAudit [sfDir]
  */
object PlanAudit {
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
    spark.sparkContext.setLogLevel("ERROR")

    def count(plan: String, token: String): Int =
      token.r.findAllIn(plan).length

    println(f"${"query"}%-22s ex  srt bhj smj cart scans")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val flags = Seq(
          if (count(plan, "CartesianProduct") > 0 && !name.contains("ivf")) "CARTESIAN!" else "",
          if (count(plan, "SortMergeJoin") > 2) "JOIN-HEAVY" else "",
        ).filter(_.nonEmpty).mkString(" ")
        println(f"$name%-22s ${count(plan, "Exchange ")}%-3d ${count(plan, "Sort ")}%-3d " +
          f"${count(plan, "BroadcastHashJoin")}%-3d ${count(plan, "SortMergeJoin")}%-3d " +
          f"${count(plan, "CartesianProduct")}%-4d ${count(plan, "FileScan")}%-5d $flags")
      } catch {
        case e: Throwable => println(f"$name%-22s FAILED: ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
