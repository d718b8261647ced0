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

  test("scoped release drops only the scope's pins; outside pins survive") {
    CachePins.release()
    val outside = CachePins.pin(spark.range(100).toDF("id"))
    outside.count()
    var insideRef: org.apache.spark.sql.DataFrame = null
    CachePins.scoped {
      insideRef = CachePins.pin(spark.range(200).toDF("id"))
      assert(insideRef.count() === 200L)
      assert(insideRef.storageLevel.useMemory)
      // the concurrent embedder's pin is untouched while we work
      assert(outside.storageLevel.useMemory)
    }
    // scope exit released ONLY its own pin
    assert(insideRef.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "scope exit must unpersist the scope's pins")
    assert(outside.storageLevel.useMemory,
      "scope exit must not drop another caller's pins")
    // nested scopes release innermost-only on inner exit
    CachePins.scoped {
      val mid = CachePins.pin(spark.range(50).toDF("id"))
      CachePins.scoped { CachePins.pin(spark.range(10).toDF("id")).count() }
      assert(mid.storageLevel.useMemory, "inner scope exit dropped the outer scope's pin")
    }
    // the global drain still clears everything (bench/verify hook)
    CachePins.release()
    assert(outside.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
  }
}
