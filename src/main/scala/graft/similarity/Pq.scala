package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import VectorOps._

/** Product quantization (SURVEY.md §2.4 additions): compress each
  * 64-dim embedding to M=8 sub-space codes from a K=16-entry
  * codebook, then search with asymmetric distance (ADC) — the
  * standard billion-scale ANN memory layout (8 bytes/vector instead
  * of 256).
  *
  * Codebook here is the deterministic sample codebook (the K
  * smallest-vec_id vectors), which keeps every output
  * oracle-reproducible; at scale the codebook would come from the
  * per-subspace k-means this library already ships (`Ann.kmeansQuery`
  * unrolled per sub-space) — the search-side layout is identical
  * either way.
  *
  * Scale shape: the codebook is one broadcast row; code assignment is
  * a narrow per-row pass (nested higher-order functions, no shuffle);
  * ADC probes broadcast a per-probe 16×8 lookup table and scan codes
  * linearly — the fact side never shuffles until the bounded top-k.
  * Float math is kept in identical operation order on both engines so
  * distances (and therefore argmins and rank cuts) are bit-equal.
  */
object Pq {

  val M = 8 // sub-spaces
  val Sub = 8 // dims per sub-space
  val K = 16 // codebook entries per sub-space
  val Probes = 83 // probe slice: vec_id % Probes == 0
  val AdcTopK = 3

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.rebalanced(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))

  /** One-row codebook: array of the K smallest-vec_id vectors. */
  private def codebookRow(e: DataFrame): DataFrame =
    e.orderBy(col("vec_id")).limit(K)
      .agg(transform(array_sort(collect_list(struct(col("vec_id"), col("v")))),
        s => s.getField("v")).as("cb"))

  /** Squared L2 between `vec`'s and codebook entry `kk`'s sub-space
    * `mi`, as a left-fold sum over the Sub components (the fold order
    * is what the DuckDB oracle mirrors with list_sum).
    */
  private def subDist(vec: Column, kk: Column, mi: Int): Column =
    aggregate(sequence(lit(1), lit(Sub)), lit(0.0), (acc, j) => {
      val a = element_at(vec, lit(mi * Sub) + j)
      val b = element_at(element_at(col("cb"), kk + 1), lit(mi * Sub) + j)
      acc + (a - b) * (a - b)
    })

  /** Per-subspace distance vectors d0..d7 (each K entries) for `rows`,
    * against the codebook built from `cbSource` (always the FULL
    * corpus — a filtered row set must not shrink the codebook).
    */
  private def withDistVectors(rows: DataFrame, cbSource: DataFrame): DataFrame = {
    val cols = (0 until M).map { mi =>
      transform(sequence(lit(0), lit(K - 1)), kk => subDist(col("v"), kk, mi)).as(s"d$mi")
    }
    rows.crossJoin(broadcast(codebookRow(cbSource)))
      .select(col("vec_id") +: col("v").as("v") +: cols: _*)
  }

  /** Codes + quantization error per vector (no shuffle). */
  def pqCodesDf(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    val d = withDistVectors(e, e)
    val codeCols = (0 until M).map { mi =>
      (array_position(col(s"d$mi"), array_min(col(s"d$mi"))) - 1).as(s"code_$mi")
    }
    val err = (0 until M).map(mi => array_min(col(s"d$mi"))).reduce(_ + _)
    d.select(col("vec_id") +: codeCols :+
      floor(err * 1e6).cast("long").as("err_u"): _*)
  }

  /** §2.4#130 — PQ code assignment + reconstruction error (µ-units,
    * floor-scaled so the compare is integer-exact).
    */
  def annPqCodes(spark: SparkSession, dir: String): DataFrame =
    pqCodesDf(spark, dir).orderBy(col("vec_id"))

  /** §2.4#131 — ADC search recall: probes (vec_id % 83 == 0) search
    * the PQ codes with per-probe lookup tables; top-3 by ADC distance
    * is compared against the exact squared-L2 top-3. Output is the
    * per-probe overlap count — an integer recall readout of what the
    * 8-byte compression costs.
    */
  def annPqAdc(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    // per-probe LUT: lut_m[k] = dist(q sub m, codebook[k] sub m)
    val probes = withDistVectors(e.filter(col("vec_id") % Probes === 0), e)
      .select(col("vec_id").as("probe_id") +: col("v").as("q") +:
        (0 until M).map(mi => col(s"d$mi").as(s"lut_$mi")): _*)
    val codes = pqCodesDf(spark, dir)
    val adc = (0 until M)
      .map(mi => element_at(col(s"lut_$mi"), col(s"code_$mi").cast("int") + 1))
      .reduce(_ + _)
    val wAdc = Window.partitionBy(col("probe_id")).orderBy(col("adc"), col("vec_id"))
    val adcTop = codes.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("adc", adc)
      .withColumn("rnk", row_number().over(wAdc))
      .filter(col("rnk") <= AdcTopK)
      .select(col("probe_id"), col("vec_id"))
    // exact squared-L2 top-3 for the same probes, same fold order
    val l2 = aggregate(sequence(lit(1), lit(M * Sub)), lit(0.0), (acc, j) => {
      val a = element_at(col("v"), j)
      val b = element_at(col("q"), j)
      acc + (a - b) * (a - b)
    })
    val qOnly = probes.select(col("probe_id"), col("q"))
    val wL2 = Window.partitionBy(col("probe_id")).orderBy(col("l2"), col("vec_id"))
    val exactTop = e.crossJoin(broadcast(qOnly))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("l2", l2)
      .withColumn("rnk", row_number().over(wL2))
      .filter(col("rnk") <= AdcTopK)
      .select(col("probe_id"), col("vec_id"))
    val matched = adcTop.join(exactTop, Seq("probe_id", "vec_id"))
      .groupBy(col("probe_id")).agg(count(lit(1)).as("n_matched"))
    qOnly.select(col("probe_id"))
      .join(matched, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        lit(AdcTopK.toLong).as("top_k"))
      .orderBy(col("probe_id"))
  }

  // ---- DuckDB oracles (identical float op order) ----

  private def subDistSql(vecExpr: String, mi: Int): String =
    s"list_transform(range(0, $K), kk -> list_sum(list_transform(range(1, ${Sub + 1}), " +
      s"j -> ($vecExpr[${mi * Sub} + j] - cb[kk + 1][${mi * Sub} + j]) * " +
      s"($vecExpr[${mi * Sub} + j] - cb[kk + 1][${mi * Sub} + j]))))"

  private val cbCtes =
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
       |cbl AS (SELECT list(v ORDER BY vec_id) AS cb
       |        FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT $K))""".stripMargin

  private def codesCte: String = {
    val dists = (0 until M).map(mi => s"${subDistSql("v", mi)} AS d$mi").mkString(",\n  ")
    val codeCols = (0 until M)
      .map(mi => s"CAST(list_position(d$mi, list_min(d$mi)) - 1 AS BIGINT) AS code_$mi")
      .mkString(",\n  ")
    val errSum = (0 until M).map(mi => s"list_min(d$mi)").mkString(" + ")
    s"""d AS (SELECT vec_id, $dists
       |  FROM e, cbl),
       |codes AS (SELECT vec_id,
       |  $codeCols,
       |  CAST(floor(($errSum) * 1000000) AS BIGINT) AS err_u
       |  FROM d)""".stripMargin
  }

  def pqCodesOracleSql: String =
    s"WITH $cbCtes,\n$codesCte\n" +
      "SELECT * FROM codes ORDER BY vec_id"

  def pqAdcOracleSql: String = {
    val luts = (0 until M).map(mi => s"${subDistSql("q", mi)} AS lut_$mi").mkString(",\n  ")
    val adcSum = (0 until M).map(mi => s"lut_$mi[code_$mi + 1]").mkString(" + ")
    val l2 = s"list_sum(list_transform(range(1, ${M * Sub + 1}), " +
      "j -> (v[j] - q[j]) * (v[j] - q[j])))"
    s"""WITH $cbCtes,
       |$codesCte,
       |probes AS (SELECT vec_id AS probe_id, v AS q,
       |  $luts
       |  FROM e, cbl WHERE vec_id % $Probes = 0),
       |adc AS (SELECT probe_id, vec_id,
       |  row_number() OVER (PARTITION BY probe_id ORDER BY ($adcSum), vec_id) AS rnk
       |  FROM codes, probes WHERE vec_id <> probe_id),
       |adc_top AS (SELECT probe_id, vec_id FROM adc WHERE rnk <= $AdcTopK),
       |ex AS (SELECT probe_id, vec_id,
       |  row_number() OVER (PARTITION BY probe_id ORDER BY $l2, vec_id) AS rnk
       |  FROM e, probes WHERE vec_id <> probe_id),
       |ex_top AS (SELECT probe_id, vec_id FROM ex WHERE rnk <= $AdcTopK),
       |m AS (SELECT a.probe_id, count(*) AS n_matched
       |      FROM adc_top a JOIN ex_top x
       |        ON a.probe_id = x.probe_id AND a.vec_id = x.vec_id
       |      GROUP BY a.probe_id)
       |SELECT p.probe_id, CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
       |  CAST($AdcTopK AS BIGINT) AS top_k
       |FROM (SELECT DISTINCT probe_id FROM probes) p
       |LEFT JOIN m ON p.probe_id = m.probe_id ORDER BY p.probe_id""".stripMargin
  }
}
