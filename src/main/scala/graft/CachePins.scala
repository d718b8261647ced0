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
  *
  * Concurrent embedders (a multi-threaded driver running two operators
  * at once) must NOT have their in-flight pins dropped by another
  * caller's global release: [[scoped]] runs a block under a per-thread
  * owner, so releasing that scope drops only the frames pinned inside
  * it. The global [[release]] stays the bench/verify harness's
  * drain-everything hook.
  */
object CachePins {
  private final case class Entry(df: DataFrame, owner: AnyRef)
  private val entries = scala.collection.mutable.ListBuffer.empty[Entry]
  private val currentOwner = new ThreadLocal[List[AnyRef]] {
    override def initialValue(): List[AnyRef] = Nil
  }

  /** Persist `df` (columnar, MEMORY_AND_DISK) and register it for
    * [[release]] — owned by the innermost enclosing [[scoped]] block
    * on this thread, if any.
    */
  def pin(df: DataFrame): DataFrame = synchronized {
    entries += Entry(df, currentOwner.get().headOption.orNull)
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }

  /** Run `body` in a pin scope: every frame pinned (on this thread)
    * inside it is unpersisted when the block exits — and ONLY those,
    * so concurrent operators keep their caches. Scopes nest; pins made
    * outside any scope belong to the global pool.
    */
  def scoped[T](body: => T): T = {
    val owner = new Object
    currentOwner.set(owner :: currentOwner.get())
    try body
    finally {
      currentOwner.set(currentOwner.get().tail)
      releaseOwner(owner)
    }
  }

  private def releaseOwner(owner: AnyRef): Unit = synchronized {
    val (mine, rest) = entries.partition(_.owner eq owner)
    mine.foreach(_.df.unpersist(blocking = false))
    entries.clear()
    entries ++= rest
  }

  /** Unpersist every frame pinned since the last release — scoped or
    * not (the bench/verify harness drain).
    */
  def release(): Unit = synchronized {
    entries.foreach(_.df.unpersist(blocking = false))
    entries.clear()
  }
}
