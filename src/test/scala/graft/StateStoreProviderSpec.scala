package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.streaming.StreamWatcher

/** §2.7 under the production state-store provider: the HDFS-backed
  * in-memory provider keeps every key's state on the executor heap,
  * which caps total streaming state at JVM memory; at 100 TB/day the
  * retry/CDC/session/join state outgrows that, and the production
  * provider is RocksDB (off-heap, spillable, incremental-checkpoint).
  * Each stateful family below replays — unchanged — under BOTH
  * providers and must produce row-identical results; the provider
  * choice rides the caller's session conf through
  * [[StreamWatcher.replayToBatch]]'s isolated clone.
  */
class StateStoreProviderSpec extends GraftSpec {

  private val Key = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withProvider[T](provider: Option[String])(body: => T): T = {
    val prev = spark.conf.getOption(Key)
    provider match {
      case Some(p) => spark.conf.set(Key, p)
      case None    => spark.conf.unset(Key)
    }
    try body
    finally prev match {
      case Some(p) => spark.conf.set(Key, p)
      case None    => spark.conf.unset(Key)
    }
  }

  // one representative per stateful-operator family: arbitrary
  // user state (map/flatMapGroupsWithState), watermarked dedup state,
  // session-window state, and stream-stream outer-join state
  private val statefulQueries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "mapGroupsWithState retry queue" -> (StreamWatcher.streamRetryQueueQuery(_, _)),
    "flatMapGroupsWithState change feed" -> (StreamWatcher.streamChangeFeedQuery(_, _)),
    "watermarked stream dedup" -> (StreamWatcher.streamDedupQuery(_, _)),
    "session window" -> (StreamWatcher.streamSessionWindowQuery(_, _)),
    "stream-stream outer interval join" -> (StreamWatcher.streamIntervalJoinOuterQuery(_, _)))

  statefulQueries.foreach { case (name, fn) =>
    test(s"$name: identical results under HDFS-backed and RocksDB state stores") {
      val default = withProvider(None)(fn(spark, sf).collect().map(_.toSeq).toSeq)
      val rocks = withProvider(Some(RocksDb))(fn(spark, sf).collect().map(_.toSeq).toSeq)
      assert(rocks === default)
    }
  }

  test("state metrics: identical row accounting under both providers, telemetry sane") {
    // the oracle checks the deterministic row totals cross-engine;
    // here the SAME metrics must agree across providers, and the
    // provider-specific telemetry must be present and coherent
    val default = withProvider(None)(
      StreamWatcher.streamStateMetrics(spark, sf).collect().map(_.toSeq).toSeq)
    val rocks = withProvider(Some(RocksDb))(
      StreamWatcher.streamStateMetrics(spark, sf).collect().map(_.toSeq).toSeq)
    assert(rocks === default)
    // richer progress telemetry (not oracle-portable): bytes > 0,
    // updated rows cover the final state, nothing dropped by the
    // watermark on the complete-mode aggregate
    for (provider <- Seq(None, Some(RocksDb))) withProvider(provider) {
      val (_, progs) = StreamWatcher.replayCollectingProgress(
        StreamWatcher.windowedCounts(StreamWatcher.eventStream(spark, sf)), "complete")
      val stateful = progs.filter(p => p.stateOperators != null && p.stateOperators.nonEmpty)
      assert(stateful.nonEmpty, s"no state telemetry under $provider")
      val last = stateful.last.stateOperators
      assert(last.map(_.memoryUsedBytes).sum > 0L, s"zero state memory under $provider")
      assert(progs.flatMap(_.stateOperators).map(_.numRowsUpdated).sum >=
        last.map(_.numRowsTotal).sum, "updated rows must cover the final state")
      assert(last.map(_.numRowsRemoved).sum === 0L,
        "complete-mode aggregate must never evict")
    }
  }

  test("chronological replay: state stays bounded by the watermark horizon under both providers") {
    // the StateScale contract at test scale (the 10x-corpus run is
    // the per-round artifact): events replayed as time-ordered
    // slices, one micro-batch each — rows-in-state must track the
    // slice+horizon bound, never the cumulative ingested volume, and
    // eviction must actually fire across the replay
    for (provider <- Seq(None, Some(RocksDb))) withProvider(provider) {
      val reps = graft.tools.StateScale.run(spark, sf) // asserts each bound
      assert(reps.size === 4)
      reps.foreach { r =>
        assert(r.batches.size >= graft.tools.StateScale.Slices - 1,
          s"${r.name}: expected ~one batch per slice, got ${r.batches.size}")
        assert(r.maxStateRows > 0, s"${r.name}: no state observed")
        assert(r.maxStateRows < r.leakPopulation,
          s"${r.name}: state reached the leak population — eviction never fired")
      }
      // the per-event-key shape is the sharp one: total keys = every
      // event id, state must stay at slice scale (< 40% of total even
      // with the previous slice's tail retained)
      val dd = reps.find(_.name == "dedup_within_watermark").get
      assert(dd.batches.map(_.removed).sum > 0, "watermark eviction never removed a key")
      assert(dd.maxStateRows * 5 < dd.leakPopulation * 2,
        s"dedup state ${dd.maxStateRows} not slice-bounded vs ${dd.leakPopulation} total keys")
    }
  }
}
