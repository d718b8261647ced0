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

  test("AQE skew-join safety net is configured") {
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
  }
}
