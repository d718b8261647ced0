package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamWatcher
import graft.syncer.FileInventory

class StreamingSpec extends GraftSpec {

  test("streaming windowed counts equal the batch twin") {
    val q = StreamWatcher.windowedCounts(StreamWatcher.eventStream(spark, sf))
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_counts")
        .select(col("hour_start"), col("event_type"), col("n_events"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = graft.analytics.Relational.qStreamBatchTwin(spark, sf)
        .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming upload plan emits exactly the durable inventory") {
    val q = StreamWatcher.uploadPlanStream(StreamWatcher.eventStream(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("upload_plan").start()
    try {
      q.processAllAvailable()
      val n = spark.table("upload_plan").count()
      assert(n === FileInventory.durable(spark, sf).count())
      // paths match the batch derivation
      val streamPaths = spark.table("upload_plan").select(col("path"))
      val batchPaths = FileInventory.durable(spark, sf).select(col("path"))
      assert(streamPaths.exceptAll(batchPaths).count() === 0)
    } finally q.stop()
  }
}
