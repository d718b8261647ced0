package graft.tools

import org.apache.spark.sql.SparkSession

import graft.streaming.StreamWatcher

/** Demo driver for the streaming watcher (SURVEY.md §2.7): runs the
  * windowed accounting and upload-plan streams over the event stream
  * and prints what each emitted — the continuous analogue of the
  * reference's inotify→upload loop.
  *
  * Usage: runMain graft.tools.StreamDemo [sfDir]
  */
object StreamDemo {
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

    val counts = StreamWatcher.windowedCounts(StreamWatcher.eventStream(spark, dir))
      .writeStream.outputMode("complete").format("memory").queryName("win").start()
    val plan = StreamWatcher.uploadPlanStream(StreamWatcher.eventStream(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("plan").start()
    counts.processAllAvailable()
    plan.processAllAvailable()

    println(s"[stream-demo] windowed rows: ${spark.table("win").count()}")
    spark.table("win").orderBy("hour_start", "event_type").show(5, truncate = false)
    println(s"[stream-demo] upload-plan rows: ${spark.table("plan").count()}")
    spark.table("plan").orderBy("generation").show(5, truncate = false)

    val retry = StreamWatcher.retryQueueStream(StreamWatcher.eventStream(spark, dir))
      .writeStream.outputMode("update").format("memory").queryName("retry").start()
    retry.processAllAvailable()
    println(s"[stream-demo] retry-queue rows: ${spark.table("retry").count()}")
    spark.table("retry").groupBy("status").count().show(truncate = false)

    counts.stop(); plan.stop(); retry.stop(); spark.stop()
  }
}
