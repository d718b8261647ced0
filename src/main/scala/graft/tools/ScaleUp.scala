package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress data builder: replicates an sf directory `factor`
  * times with per-replica key offsets, so a 10x corpus with intact
  * referential integrity can be benchmarked without touching the
  * read-only driver testdata.
  *
  * Key domains get disjoint strides (orderkey, custkey, partkey,
  * suppkey, doc_id, vec_id, event_id, user_id), chosen far above any
  * source key, so replica i's foreign keys resolve only to replica
  * i's dimension rows — exactly how a 10x-larger TPC-H would look.
  * `region`/`nation` stay fixed (bounded dimensions, as in TPC-H).
  * Payload columns (text, embeddings, props) replicate verbatim:
  * identical cross-replica payloads are the worst case for the dedup
  * and ANN families (10x-deeper duplicate clusters and IVF cells),
  * which is what a stress pass should exercise.
  *
  * With the optional `skew` flag the replicated corpus additionally
  * gets the three hot spots a uniform clone never exercises — the
  * worst cases the 100 TB design must absorb:
  *   - one MEGA verbatim duplicate cluster: every doc_id ≡ 0 (mod 40)
  *     becomes the identical boilerplate text (lang/n_chars fixed up
  *     so they are true verbatim copies) — factor×|docs|/40 copies of
  *     ONE text, the clique case the rep-collapsed candidate graph
  *     must turn into a single node;
  *   - one DOMINANT LSH band bucket of distinct near-dups: every
  *     doc_id ≡ 1 (mod 40) becomes boilerplate + a unique suffix
  *     token — thousands of DISTINCT texts whose signatures land in
  *     the same band buckets, the genuine (irreducible) quadratic of
  *     LSH that rep-collapse cannot and should not remove;
  *   - one HOT user holding ~10% of events (event_id ≡ 0 mod 10 →
  *     user 4242): the skewed-key case for per-user windows,
  *     funnel/retention joins and AQE skew handling.
  *
  * Usage: runMain graft.tools.ScaleUp <srcSfDir> <dstDir> [factor] [skew]
  */
object ScaleUp {

  /** ~60-token boilerplate: long enough that one extra suffix token
    * rarely moves any of the 12 min-hashes, so the variant family
    * shares band buckets (that is the point of the stress).
    */
  private val Boilerplate: String =
    ("all rights reserved this page is provided as is without warranty " +
      "of any kind either expressed or implied including but not limited " +
      "to the implied warranties of merchantability and fitness for a " +
      "particular purpose the entire risk as to the quality and " +
      "performance of the page is with you should the page prove " +
      "defective you assume the cost of all necessary servicing repair " +
      "or correction").trim
  // strides per key domain — all >> the largest key at sf0.1
  private val Stride = Map(
    "orderkey" -> 100000000L, "custkey" -> 10000000L,
    "partkey" -> 10000000L, "suppkey" -> 1000000L,
    "doc" -> 1000000L, "vec" -> 1000000L,
    "event" -> 100000000L, "user" -> 10000000L)

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val skew = args.lift(3).contains("skew")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[16]"))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    /** Cross-join with replica ids 0..factor-1 and shift the named
      * long-typed key columns by replica * stride(domain). */
    def replicate(df: DataFrame, keys: Map[String, String]): DataFrame = {
      val reps = spark.range(factor).withColumnRenamed("id", "__rep")
      val crossed = df.crossJoin(broadcast(reps))
      keys.foldLeft(crossed) { case (d, (colName, domain)) =>
        d.withColumn(colName, col(colName) + col("__rep") * lit(Stride(domain)))
      }.drop("__rep")
    }

    val plans: Seq[(String, DataFrame => DataFrame)] = Seq(
      "region" -> identity[DataFrame] _,
      "nation" -> identity[DataFrame] _,
      "customer" -> ((d: DataFrame) => replicate(d, Map("c_custkey" -> "custkey"))),
      "supplier" -> ((d: DataFrame) => replicate(d, Map("s_suppkey" -> "suppkey"))),
      "part" -> ((d: DataFrame) => replicate(d, Map("p_partkey" -> "partkey"))),
      "orders" -> ((d: DataFrame) => replicate(d,
        Map("o_orderkey" -> "orderkey", "o_custkey" -> "custkey"))),
      "lineitem" -> ((d: DataFrame) => replicate(d,
        Map("l_orderkey" -> "orderkey", "l_partkey" -> "partkey", "l_suppkey" -> "suppkey"))),
      "events" -> ((d: DataFrame) => {
        val r = replicate(d, Map("event_id" -> "event", "user_id" -> "user"))
        // the replication stride is a multiple of 10, so the hot rows
        // are the same source rows in every replica
        if (!skew) r
        else r.withColumn("user_id",
          when(col("event_id") % 10 === 0, lit(4242L)).otherwise(col("user_id")))
      }),
      "documents" -> ((d: DataFrame) => {
        val r = replicate(d, Map("doc_id" -> "doc"))
        if (!skew) r
        else {
          val langT = d.schema("lang").dataType
          val ncT = d.schema("n_chars").dataType
          r.withColumn("text",
              when(col("doc_id") % 40 === 0, lit(Boilerplate))
                .when(col("doc_id") % 40 === 1,
                  concat(lit(Boilerplate), lit(" uniq"), col("doc_id").cast("string")))
                .otherwise(col("text")))
            .withColumn("lang",
              when(col("doc_id") % 40 <= 1, lit("en").cast(langT)).otherwise(col("lang")))
            .withColumn("n_chars",
              when(col("doc_id") % 40 <= 1, length(col("text")).cast(ncT))
                .otherwise(col("n_chars")))
        }
      }),
      "embeddings" -> ((d: DataFrame) => replicate(d, Map("vec_id" -> "vec"))))

    plans.foreach { case (table, xform) =>
      val in = spark.read.parquet(s"$src/$table.parquet")
      val out = xform(in)
      out.write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"[scaleup] $table: ${in.count()} -> ${spark.read.parquet(s"$dst/$table.parquet").count()}")
    }
    spark.stop()
  }
}
