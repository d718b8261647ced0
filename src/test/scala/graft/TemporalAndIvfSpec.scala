package graft

import org.apache.spark.sql.functions._

import graft.analytics.Temporal
import graft.similarity.Ann
import graft.syncer.SyncOps
import graft.sources.Tables

class TemporalAndIvfSpec extends GraftSpec {

  test("SCD2 history: contiguous intervals, one open row per customer, no no-op versions") {
    val h = Temporal.qScd2History(spark, sf).cache()
    val perCust = h.collect().groupBy(_.getAs[Long]("o_custkey"))
    assert(perCust.nonEmpty)
    perCust.foreach { case (ck, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("version"))
      // versions are 1..n dense
      assert(sorted.map(_.getAs[Long]("version")).toSeq === (1L to sorted.length).toSeq)
      // exactly one open (current) interval, and it is the last version
      assert(sorted.count(_.getAs[Boolean]("is_current")) === 1)
      assert(sorted.last.getAs[Boolean]("is_current"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // interval chain: this row closes exactly where the next opens
          assert(a.getAs[Any]("valid_to") === b.getAs[Any]("valid_from"),
            s"customer $ck gap")
          // a version only exists when the attribute actually changed
          assert(a.getAs[String]("priority") !== b.getAs[String]("priority"),
            s"customer $ck no-op version")
        case _ =>
      }
    }
    h.unpersist()
  }

  test("as-of join: every purchase appears once; matched click precedes it") {
    val r = Temporal.qAsofJoin(spark, sf).cache()
    val purchases = Tables.events(spark, sf).filter(col("event_type") === "purchase").count()
    assert(r.count() === purchases)
    assert(r.filter(col("gap_us") < 0).count() === 0)
    // gap is consistent with the two timestamps
    val bad = r.filter(col("last_click_ts").isNotNull &&
      col("gap_us") =!= (unix_micros(col("purchase_ts")) - unix_micros(col("last_click_ts"))))
    assert(bad.count() === 0)
  }

  test("bucketed range join equals the naive inequality join") {
    val bucketed = Temporal.qRangeJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val err = Tables.events(spark, sf).filter(col("event_type") === "error")
      .select(col("user_id").as("eu"), col("event_id").as("ei"), unix_micros(col("ts")).as("eus"))
    val naive = err.join(ev, col("eu") === col("user_id") &&
        col("us") > col("eus") - 300000000L && col("us") <= col("eus") &&
        col("event_id") =!= col("ei"))
      .groupBy(col("eu"), col("ei")).agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(bucketed === naive)
  }

  test("IVF assignment: one centroid per vector, and probing the assigned partition finds neighbors") {
    val assign = Ann.annIvfAssign(spark, sf).cache()
    assert(assign.count() === Tables.embeddings(spark, sf).count())
    assert(assign.groupBy(col("vec_id")).count().filter(col("count") > 1).count() === 0)
    // the assigned partition is non-trivial: every centroid gets some vectors
    val partitions = assign.groupBy(col("assigned_centroid")).count().count()
    assert(partitions > 1)
  }

  test("manifest diff statuses partition the newer live set") {
    val d = SyncOps.syncManifestDiff(spark, sf).cache()
    val newerCount = SyncOps.syncRestoreSet(spark, sf, asOf = "2024-01-20").count()
    assert(d.count() === newerCount)
    val statuses = d.select(col("status")).distinct().collect().map(_.getString(0)).toSet
    assert(statuses.subsetOf(Set("added", "updated", "unchanged")))
    assert(d.filter(col("status") === "updated" && !(col("gen_new") > col("gen_old"))).count() === 0)
  }

  test("SQL surface: registered graft_* functions evaluate in spark.sql") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |       graft_simhash32(array('spark', 'spark', 'join')) AS s,
        |       graft_jaccard_sorted(array('a', 'b'), array('b', 'c')) AS j,
        |       graft_minhash(array('a b c', 'b c d'), 4) AS m
        |""".stripMargin).collect()(0)
    assert(row.getAs[Double]("c") === 1.0)
    assert(row.getAs[String]("s").matches("[01]{32}"))
    assert(math.abs(row.getAs[Double]("j") - 1.0 / 3.0) < 1e-12)
    assert(row.getSeq[String](3).length === 4)
  }

  test("GraftExtensions registers the same builders (cluster bootstrap path)") {
    // exercised structurally: applying the extensions object must not
    // throw and must enumerate every builder name
    val names = GraftFunctions.builders.map(_._1)
    // the four core text/vector builders must always be present; newer
    // builders (bloom prefilter, span hashes, ...) extend the list —
    // assert subset, not exact equality, so registration growth does
    // not silently invalidate this bootstrap check
    val core = Set("graft_cosine", "graft_simhash32", "graft_minhash", "graft_jaccard_sorted")
    assert(core.subsetOf(names.toSet))
    assert(names.distinct === names)
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
