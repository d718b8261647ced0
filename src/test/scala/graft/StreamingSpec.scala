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

  test("stream_dedup_incremental dedups later drops against earlier accepted docs") {
    import spark.implicits._
    // crafted corpus: delta ids are = 3 (mod 7); with ntile(3) over
    // the 10 delta ids, drops are {3,10,17,24} {31,38,45} {52,59,66}.
    // N1/N2/N3 are distinct texts absent from the base; no two
    // distinct texts are near-dups, so every verdict is digest-driven
    // and exactly predictable.
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine ten"
    val n1 = "quartz lantern orbit meadow cipher velvet anchor prism"
    val n2 = "ember glacier saffron tundra mosaic harbor zenith quill"
    val n3 = "nimbus copper willow fjord garnet sable onyx tarragon"
    val n4 = "juniper basalt meridian echo lattice crimson vapor sage"
    val docs = Seq(
      1L -> a, 2L -> b, // base (ids not ≡ 3 mod 7)
      3L -> n1, 10L -> a, 17L -> b, 24L -> n1, // drop 0
      31L -> n1, 38L -> n2, 45L -> n4, // drop 1
      52L -> n2.toUpperCase, 59L -> n3, 66L -> n3 // drop 2
    ).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-sdedup-spec-").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val out = graft.dedup.Dedup.dedupIncrementalStreamQuery(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
    assert(out === Map(
      3L -> ("new", -1L), // first sight of N1
      10L -> ("exact", 1L), // base digest hit
      17L -> ("exact", 2L),
      24L -> ("exact", 3L), // intra-batch digest group → drop-0 keeper
      31L -> ("exact", 3L), // CROSS-DROP: matches the accepted drop-0 doc
      38L -> ("new", -1L),
      45L -> ("new", -1L),
      52L -> ("exact", 38L), // cross-drop, case-insensitive digest
      59L -> ("new", -1L),
      66L -> ("exact", 59L))) // intra-batch within drop 2
    // and the drop labels are the ntile slices
    val drops = graft.dedup.Dedup.dedupIncrementalStreamQuery(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(drops === Map(3L -> 0L, 10L -> 0L, 17L -> 0L, 24L -> 0L,
      31L -> 1L, 38L -> 1L, 45L -> 1L, 52L -> 2L, 59L -> 2L, 66L -> 2L))
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

  test("stateful retry queue: clean uploads succeed first attempt, flaky ones keep retrying") {
    import org.apache.spark.sql.streaming.OutputMode
    val q = StreamWatcher.retryQueueStream(StreamWatcher.eventStream(spark, sf))
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("retry_q").start()
    try {
      q.processAllAvailable()
      val out = spark.table("retry_q").collect()
      assert(out.length === FileInventory.durable(spark, sf).count())
      val byStatus = out.groupBy(_.getAs[String]("status")).view.mapValues(_.length).toMap
      // every non-error file (and error files with generation%3==0 → required 1)
      // uploads on the first attempt; the rest await retries
      val required1 = FileInventory.durable(spark, sf)
        .filter(org.apache.spark.sql.functions.expr(
          "cf <> 'error' or generation % 3 = 0")).count()
      assert(byStatus("uploaded").toLong === required1)
      assert(byStatus.getOrElse("retrying", 0).toLong === out.length - required1)
    } finally q.stop()
  }

  test("streaming dedup within watermark drops replayed events") {
    // replay the stream twice by unioning it with itself: exact
    // duplicates must collapse to the batch-distinct count
    val es = StreamWatcher.eventStream(spark, sf)
    val q = es.union(es)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy().count()
      .writeStream.outputMode("complete").format("memory").queryName("dedup_s").start()
    try {
      q.processAllAvailable()
      val n = spark.table("dedup_s").collect()(0).getLong(0)
      assert(n === graft.sources.Tables.events(spark, sf).count())
    } finally q.stop()
  }

  test("CDC change feed: one record per write; final state matches batch LWW merge") {
    val q = StreamWatcher.changeFeed(StreamWatcher.eventStream(spark, sf))
      .writeStream.outputMode("append").format("memory").queryName("cdc").start()
    try {
      q.processAllAvailable()
      val changes = spark.table("cdc")
      assert(changes.count() === graft.sources.Tables.events(spark, sf).count())
      // replaying the change log yields the batch LWW view
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("row_key")).orderBy(col("generation").desc)
      val finalState = changes
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") === 1 && col("new_value").isNotNull)
        .select(col("row_key"), col("new_value"))
      val lww = graft.syncer.SyncOps.syncLwwMerge(spark, sf)
        .select(col("row_key"), col("latest_value").as("new_value"))
      assert(finalState.exceptAll(lww).count() === 0)
      assert(lww.exceptAll(finalState).count() === 0)
    } finally q.stop()
  }

  test("stream-stream interval join matches the batch range join semantics") {
    import org.apache.spark.sql.functions.expr
    val purchases = StreamWatcher.eventStream(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        col("ts").as("p_ts")).withWatermark("p_ts", "1 hour")
    val clicks = StreamWatcher.eventStream(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("c_id"),
        col("ts").as("c_ts")).withWatermark("c_ts", "1 hour")
    val joined = purchases.join(clicks,
      expr("p_user = c_user AND c_ts >= p_ts - interval 30 minutes AND c_ts <= p_ts"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ss_join").count()
      // batch twin
      val ev = graft.sources.Tables.events(spark, sf)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      val batch = p.join(c, expr("p_user = c_user AND c_ts >= p_ts - interval 30 minutes AND c_ts <= p_ts")).count()
      assert(streamed === batch)
      assert(streamed > 0)
    } finally q.stop()
  }

  test("outer interval join: matches emit as inner, nulls only past the watermark cutoff") {
    import org.apache.spark.sql.functions.{expr, unix_micros, max => fmax}
    val rows = StreamWatcher.streamIntervalJoinOuterQuery(spark, sf).collect()
    val (matched, nulls) = rows.partition(r => !r.isNullAt(2))
    // batch model of the same pipeline
    val ev = graft.sources.Tables.events(spark, sf)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("p_id"),
        unix_micros(col("ts")).as("p_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("c_us"))
    val inner = p.join(c,
      expr("p_user = c_user AND c_us >= p_us - 1800000000 AND c_us <= p_us"))
    assert(matched.length.toLong === inner.count())
    // the null rows: unmatched purchases whose p_ts the final global
    // watermark (min of both sides' max event time, − 1 hour) passed
    val cutoff = math.min(
      p.agg(fmax(col("p_us"))).first().getLong(0),
      c.agg(fmax(col("c_us"))).first().getLong(0)) - 3600000000L
    val expectedNulls = p
      .join(c, expr("p_user = c_user AND c_us >= p_us - 1800000000 AND c_us <= p_us"),
        "left_anti")
      .filter(col("p_us") < cutoff)
      .count()
    assert(nulls.length.toLong === expectedNulls)
    assert(nulls.nonEmpty, "the outer (null) path must actually be exercised")
  }

  test("append-mode windows: only watermark-finalized windows emit, counts match batch") {
    import org.apache.spark.sql.functions.{date_trunc, max => fmax}
    val out = StreamWatcher.streamAppendWindowsQuery(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val ev = graft.sources.Tables.events(spark, sf)
    val maxTs = ev.agg(fmax(col("ts"))).head.getTimestamp(0).getTime
    // every emitted window end (start + 1h) is at least 1h behind max ts
    rows.foreach { r =>
      assert(r.getTimestamp(0).getTime + 2 * 3600 * 1000 <= maxTs)
    }
    // emitted counts equal batch counts for those windows
    val batch = ev.groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .count().collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(r.getLong(2) === batch((r.getTimestamp(0), r.getString(1))))
    }
  }

  test("incremental batch: each AvailableNow run drains exactly the new files, no dups") {
    import org.apache.spark.sql.streaming.Trigger
    // same sequence as the operator, instrumented between runs
    val ev = graft.sources.Tables.events(spark, sf)
    val total = ev.count()
    val work = java.nio.file.Files.createTempDirectory("graft-inc-spec-src-")
    val ck = java.nio.file.Files.createTempDirectory("graft-inc-spec-ck-")
    val sink = java.nio.file.Files.createTempDirectory("graft-inc-spec-out-").toString
    val thirds = ev.orderBy(col("ts"), col("event_id")).collect().grouped(
      math.ceil(total / 3.0).toInt).toSeq
    import spark.implicits._
    def land(i: Int): Unit =
      spark.createDataFrame(spark.sparkContext.parallelize(thirds(i).toSeq), ev.schema)
        .coalesce(1).write.parquet(work.resolve(s"g$i").toString + ".d")
    val schema = ev.schema
    def drain(): Long = {
      val q = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(work.toString + "/*.d")
        .select(col("event_id"))
        .writeStream.trigger(Trigger.AvailableNow())
        .format("parquet").option("path", sink)
        .option("checkpointLocation", ck.toString).start()
      q.awaitTermination()
      spark.read.parquet(sink).count()
    }
    land(0)
    val after1 = drain()
    assert(after1 === thirds(0).length.toLong)
    land(1); land(2)
    val after2 = drain()
    assert(after2 === total)
    // exactly-once: every event id appears exactly once in the sink
    assert(spark.read.parquet(sink).select(col("event_id")).distinct().count() === total)
  }

  test("foreachBatch upsert converges to the batch LWW state despite out-of-order batches") {
    import org.apache.spark.sql.expressions.Window
    val got = StreamWatcher.streamForeachBatchUpsert(spark, sf).collect()
    val w = Window.partitionBy(col("row_key"))
      .orderBy(col("write_us").desc, col("generation").desc)
    val expected = graft.sources.Tables.events(spark, sf)
      .select((col("user_id") % 50).cast("long").as("row_key"),
        unix_micros(col("ts")).as("write_us"),
        col("event_id").as("generation"), col("value"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("row_key"), col("write_us"), col("generation"),
        round(col("value"), 4).as("value"))
      .orderBy(col("row_key")).collect()
    assert(got.toSeq === expected.toSeq)
  }

  test("late drop: the out-of-order oldest tercile is dropped, newer terciles kept intact") {
    val late = StreamWatcher.streamLateDropQuery(spark, sf).collect()
    val inOrder = StreamWatcher.streamAppendWindowsQuery(spark, sf).collect()
    val lateTotal = late.map(_.getLong(2)).sum
    val inOrderTotal = inOrder.map(_.getLong(2)).sum
    // the dropped tercile is roughly a third of the finalized rows
    assert(lateTotal < inOrderTotal)
    assert(lateTotal.toDouble / inOrderTotal > 0.5 &&
      lateTotal.toDouble / inOrderTotal < 0.8,
      s"kept $lateTotal of $inOrderTotal")
    // windows that survive have identical counts to the in-order run
    val inMap = inOrder.map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val lateHours = late.map(_.getTimestamp(0)).distinct.sorted((a: java.sql.Timestamp, b: java.sql.Timestamp) => a.compareTo(b))
    // every kept window that is fully inside the newer terciles matches
    val keptExact = late.count(r => inMap.get((r.getTimestamp(0), r.getString(1))).contains(r.getLong(2)))
    assert(keptExact.toDouble / late.length > 0.95, s"$keptExact of ${late.length} windows intact")
    assert(lateHours.nonEmpty)
  }

  test("stream-static join is stateless and matches the batch enrichment") {
    val streamed = StreamWatcher.streamStaticJoinQuery(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
    val batch = graft.sources.Tables.events(spark, sf)
      .withColumn("n_key", (col("user_id") % 25).cast("int"))
      .join(graft.sources.Tables.nation(spark, sf),
        col("n_key") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .orderBy(col("n_name"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
    assert(streamed.toSeq === batch.toSeq)
    // the plan must not allocate a state store for the dim join: no
    // stream-stream join node, the static side arrives broadcast
    val plan = StreamWatcher.staticJoinStream(spark, sf).queryExecution.analyzed
    val hasStreamingJoin = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
          if j.left.isStreaming && j.right.isStreaming => j
    }.nonEmpty
    assert(!hasStreamingJoin, "dim join must be stream-static, not stream-stream")
  }

  test("interval-join equality keys stay time-bucketed (48x hot-key regression pin)") {
    // r11's skew axis measured user_id-only join keys at 48x the
    // uniform corpus: one hot user = one state partition + a full
    // per-key row-list scan per probe. The fix keys the symmetric-hash
    // join on (user, ⌊ts/interval⌋) with clicks replicated into their
    // own and the next bucket; this pin keeps that shape in the plan.
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo}
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join}
    for (df <- Seq(StreamWatcher.intervalJoinStream(spark, sf),
        StreamWatcher.intervalJoinOuterStream(spark, sf))) {
      val plan = df.queryExecution.analyzed
      val joins = plan.collect { case j: Join => j }
      assert(joins.nonEmpty, "interval join lost its join node")
      val eqPairs: Seq[Set[String]] = joins.flatMap(_.condition.toSeq.flatMap(_.collect {
        case EqualTo(a: AttributeReference, b: AttributeReference) => Set(a.name, b.name)
      }))
      assert(eqPairs.contains(Set("p_bkt", "c_bkt")),
        "interval join must keep the time-bucket equality key — user_id " +
          "alone re-opens the 48x hot-key state scan (BENCH_SKEW_IJ_r11)")
      assert(eqPairs.contains(Set("user_id", "c_user")),
        "interval join must still co-key on the user axis")
      // the click side must be bucket-replicated (the explode that puts
      // every candidate in the purchase's own bucket, exactly once)
      assert(plan.collect { case g: Generate => g }.nonEmpty,
        "click side lost its 2-bucket replication explode")
    }
  }
}
