package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query wall
  * seconds. Queries are materialized through the `noop` sink (not
  * `count()`, which lets Catalyst prune away projection work) and a
  * warmup action runs first so JVM/session startup isn't billed to
  * the first query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warmup: codegen + parquet footer reads off the clock
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // isolate queries from each other: a long stateful neighbor must
    // not bill its cache blocks / pending-GC broadcast state to the
    // queries after it (BENCH_r03's per-query numbers were inflated
    // 5-10x by exactly this). Runs OUTSIDE the per-query timer.
    def settle(): Unit = {
      CachePins.release()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    // SPARK_GRAFT_ONLY=a,b,c reruns a subset in the identical harness
    // (noise diagnosis: a single's time should match its suite time)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // de-noise ordering (r13 adjudication cost, verdict #5): streaming
    // replays, watch/backup fixtures and sink-writing queries leave
    // debt settle() cannot fully reclaim (state-store dirs, committed
    // output trees, shuffle files, pending GC), and two rounds of
    // isolated-singles adjudication traced suite-row inflation to
    // exactly that neighbor class. Run pure-batch analytics first,
    // disk-writing source/sink ops second, stateful/streaming last —
    // alphabetical within a class so artifacts stay diffable.
    def benchClass(name: String): Int =
      if (name.startsWith("stream_") || name.startsWith("sync_watch_") ||
        name == "sync_fsck_verify" || name == "backup_pipeline" ||
        name == "sync_restore_resume" || name == "q_stream_batch_twin") 2
      else if (name.startsWith("io_") || name.startsWith("cass_")) 1
      else 0
    val selected = SparkEntry.queries.toSeq
      .sortBy { case (name, _) => (benchClass(name), name) }
      .filter { case (name, _) => only.forall(_.contains(name)) }
    // median-of-N per query (default 3, SPARK_GRAFT_BENCH_RUNS
    // overrides): the committed artifacts at identical HEAD/SF were
    // drifting ~10% on best-of-2 under machine noise; the median is
    // the stable order statistic, and the per-query spread (max−min)
    // is emitted alongside so the residual variance is visible in the
    // artifact instead of asserted in prose.
    // tolerant parse: a typo'd env var must not crash a 50-minute
    // bench, and runs ≤ 0 would silently mark every query failed
    val runs = sys.env.get("SPARK_GRAFT_BENCH_RUNS")
      .flatMap(v => scala.util.Try(v.toInt).toOption.orElse {
        System.err.println(s"[bench] SPARK_GRAFT_BENCH_RUNS='$v' is not an int; using 3")
        None
      })
      .map { n =>
        require(n >= 1, s"SPARK_GRAFT_BENCH_RUNS must be >= 1, got $n")
        n
      }
      .getOrElse(3)
    val results = selected.map { case (name, fn) =>
      val times = (1 to runs).flatMap { _ =>
        settle()
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable => System.err.println(s"[bench] $name failed: $e"); None
        }
      }
      // -1 marks a query whose every run threw — its wall time must
      // not masquerade as a (fast) success in the totals
      if (times.isEmpty) (name, -1.0, 0.0, -1.0)
      else {
        val sorted = times.sorted
        // lower median: true median for odd N, MIN for N=2 (upper
        // median would bill the noisier of two runs — at N=2 the
        // faster run is the steady-state signal, same as the old
        // best-of-2). min is emitted too: on a contended disk the min
        // is the cleanest "the plan can run this fast" signal, and the
        // r8 verdict's four nominal 10×-cap breakers were unresolvable
        // without it.
        (name, sorted((sorted.size - 1) / 2), sorted.last - sorted.head, sorted.head)
      }
    }
    val qs = results.map { case (k, v, _, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val spreads = results.map { case (k, _, s, _) =>
      s"\"" + k + "\":" + BigDecimal(s).setScale(3, BigDecimal.RoundingMode.HALF_UP) }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, _, _, m) =>
      s"\"" + k + "\":" + BigDecimal(m).setScale(3, BigDecimal.RoundingMode.HALF_UP) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, v, _, _) if v < 0 => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    // r5-verdict item 4 (streaming replay r3→r4 doubling), measured with
    // SPARK_GRAFT_ONLY singles at sf0.1: (a) singles in this identical
    // harness run ~35% faster than their r4 suite times (interval_join
    // 4.95→3.2s, stream_dedup 3.48→2.1s) — suite-position cost that
    // settle() does not fully remove; (b) the remaining gap vs r3 is
    // accounting, not a plan change: r3's best-of-2 without settle()
    // billed the warm second run, r4+ bills a cold isolated run. Fixed
    // replay overhead itself was cut this round by putting the throwaway
    // replay checkpoint (offset/commit/state-delta fsyncs) on tmpfs.
    val notes = "streaming replay times are cold-isolated (settle() before " +
      "each run); r3-vs-r4 delta is warm-vs-cold accounting, verified by " +
      "SPARK_GRAFT_ONLY singles; replay checkpoints on tmpfs since r6; " +
      s"since r8 each value is the median of $runs isolated runs and " +
      "'spread' records that query's max-min across them; since r9 'min' " +
      "records the fastest run (plan-capability signal under disk noise)"
    val line = s"""{"metric":"total","value":$total,"unit":"sec","runs_per_query":$runs,"queries":$qs,"spread":$spreads,"min":$mins,"errors":$failed,"notes":"$notes","sf":"$sfDir"}"""
    println(line)
    // the driver keeps only the tail of stdout (BENCH_r06 lost 206 of
    // 261 per-query timings), so the full line also lands in a file —
    // committed per round as the complete timing artifact
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outFile), line + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] artifact write failed: $e") }
    spark.stop()
  }
}
