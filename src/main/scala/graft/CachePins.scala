package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Columnar-cache pins for frames consumed several times inside one
  * operator plan (rep self-joins, LSH candidate verify joins).
  *
  * These sites want `persist()`, not `localCheckpoint(eager = false)`:
  * the InMemoryRelation keeps text / token-array columns compressed and
  * column-pruned per consumer, where a checkpoint re-scans full
  * UnsafeRows on every read. Measured on the dedup verification family
  * (sf0.1, median of 3 isolated runs, r9): persist 9.0 s vs lazy
  * localCheckpoint 20.5 s across the five ops — 2.3× — with
  * `dedup_ngram_jaccard` alone 1.8 s vs 6.5 s.
  *
  * The cost of persist is lifetime: the cache entry outlives the
  * operator's action. This registry makes that lifetime explicit —
  * every pinned frame is recorded, and [[release]] drops them all.
  * Bench's settle() and Verify's per-query loop call it, so suite runs
  * never accumulate entries; library users embedding an operator call
  * it once their action has consumed the result. Until then the pin is
  * LRU-evictable (MEMORY_AND_DISK spills under pressure, never OOMs).
  */
object CachePins {
  private val pins = scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Persist `df` (columnar, MEMORY_AND_DISK) and register it for
    * [[release]]. */
  def pin(df: DataFrame): DataFrame = synchronized {
    pins += df
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Unpersist every frame pinned since the last release. */
  def release(): Unit = synchronized {
    pins.foreach(_.unpersist(blocking = false))
    pins.clear()
  }
}
