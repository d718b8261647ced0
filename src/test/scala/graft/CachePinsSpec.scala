package graft

import org.apache.spark.sql.functions._

class CachePinsSpec extends GraftSpec {

  test("pin registers a columnar cache entry and release drops it") {
    CachePins.release() // clean slate
    val df = spark.range(1000).select(col("id"), (col("id") * 2).as("x"))
    val pinned = CachePins.pin(df)
    assert(pinned.count() === 1000L)
    assert(pinned.storageLevel.useMemory,
      "pin must persist at a memory-backed level")
    CachePins.release()
    assert(pinned.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "release must unpersist every pinned frame")
    // idempotent: releasing with nothing pinned is a no-op
    CachePins.release()
  }

  test("dedup verify ops leave no pins behind once released") {
    graft.dedup.Dedup.dedupNgramJaccard(spark, sf).count()
    assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
      "the operator is expected to pin its rep frame while consumed")
    CachePins.release()
    spark.catalog.clearCache()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty ||
      spark.sparkContext.getPersistentRDDs.values.forall(
        _.getStorageLevel == org.apache.spark.storage.StorageLevel.NONE),
      "release + clearCache must leave no live cache entries")
  }
}
