package graft

import org.apache.spark.sql.functions._

/** Skew stress: one key owning most of the fact side. The salted
  * join must produce exactly the plain join's result while spreading
  * the hot key across salt partitions.
  */
class SkewSpec extends GraftSpec {

  test("salted join equals plain join under heavy key skew") {
    import spark.implicits._
    val salts = 8
    // 50k rows for key 1, a few for everyone else
    val fact = spark.range(50000).select(lit(1L).as("k"), col("id").as("payload"))
      .union(spark.range(200).select((col("id") % 50 + 2).as("k"), col("id").as("payload")))
    val dim = (1L to 60L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = fact.join(dim, "k").groupBy(col("name")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    val saltedFact = fact.withColumn("salt", (col("payload") % salts).cast("int"))
    val saltedDim = dim.withColumn("salt", explode(lit((0 until salts).toArray)))
    val salted = saltedFact.join(saltedDim, Seq("k", "salt"))
      .groupBy(col("name")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(salted === plain)
    assert(plain("dim_1") === 50000L)
  }

  test("hot-key detection salts the hot keys and ONLY the hot keys") {
    import spark.implicits._
    import graft.analytics.Relational
    // two genuinely hot keys against a 500-key long tail: the sampled
    // estimator must surface exactly the hot pair (no tail key can
    // clear HotKeyRowThreshold even at full sampling variance), and
    // the cap keeps the frame bounded by the 64-row literal
    val fact = spark.range(40000).select(lit(7L).as("k"), col("id").as("rid"))
      .union(spark.range(25000).select(lit(11L).as("k"), (col("id") + 50000).as("rid")))
      .union(spark.range(1500).select((col("id") % 500 + 100).as("k"), (col("id") + 90000).as("rid")))
    val hot = Relational.hotKeys(fact, col("k"), col("rid"), salts = 8)
      .collect().map(_.getLong(0)).toSet
    assert(hot === Set(7L, 11L), s"hot set was $hot")
    // and the full operator's result stays EQUAL to the plain join on
    // the real tables (the oracle asserts the same cross-engine)
    val salted = Relational.qJoinSkewSalt(spark, sf).collect().map(_.toString).toSeq
    val li = graft.sources.Tables.lineitem(spark, sf)
    val ord = graft.sources.Tables.orders(spark, sf)
    val plain = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(graft.analytics.Money.dollars(
          sum(graft.analytics.Money.netE4), 10000.0).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("o_orderstatus")).collect().map(_.toString).toSeq
    assert(salted === plain)
  }

  test("AQE skew-join safety net is configured") {
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
  }

  test("AQE actually splits a skewed shuffle join at runtime") {
    val keep = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      .map(k => k -> spark.conf.getOption(k)).toMap
    // force a shuffle join and make the hot partition trip the skew
    // detector at test scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "50KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try {
      val hot = spark.range(150000)
        .select(lit(1L).as("k"), concat(lit("payload-"), col("id")).as("pad"))
      val rest = spark.range(2000)
        .select((col("id") + 2).as("k"), lit("y").as("pad"))
      val right = spark.range(3000).select(col("id").as("k"), lit("r").as("rv"))
      // keep the varied payload through the shuffle: a pruned
      // constant-key column compresses below the skew threshold
      val joined = hot.union(rest).join(right, "k").select(col("k"), col("pad"))
      // collect() drives THIS dataset's QueryExecution, so the
      // adaptive plan below is the finalized one
      val n = joined.collect().length
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join:\n${plan.take(3000)}")
      assert(n === 152000)
    } finally keep.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
