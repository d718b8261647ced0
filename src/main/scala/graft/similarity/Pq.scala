package graft.similarity

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Ckpt.CutOps
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
  * a narrow per-row pass (fused native kernel
  * [[graft.functions.PqSubDistances]], no shuffle, no per-element
  * allocation);
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
  // the ADC recall readout is a QA SAMPLE — its probe count must be
  // bounded, not a fixed fraction of the corpus: with `% 83` alone the
  // probe set grows with the data and the probe×corpus scoring grid
  // grows quadratically (measured: 11.8 s median / 59.7 s spread at
  // sf1 from exactly that). ≤60 probes at any SF keeps the readout
  // statistically identical and the scan strictly linear.
  val AdcProbeCap: Int = Probes * 60
  val AdcTopK = 3

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    Tables.rebalanced(Tables.embeddings(spark, dir))
      .select(col("vec_id"), col("label"), toDouble(col("embedding")).as("v"))

  /** One-row codebook: array of the K smallest-vec_id vectors. */
  private def codebookRow(e: DataFrame): DataFrame =
    e.orderBy(col("vec_id")).limit(K)
      .agg(transform(array_sort(collect_list(struct(col("vec_id"), col("v")))),
        s => s.getField("v")).as("cb"))

  /** Per-subspace distance vectors d0..d7 (each K entries) for `rows`,
    * against the codebook built from `cbSource` (always the FULL
    * corpus — a filtered row set must not shrink the codebook).
    *
    * The M×K×Sub distance grid is ONE call into the fused native
    * kernel [[graft.functions.PqSubDistances]] (bit-identical left
    * folds; see its scaladoc for why the interpreted HOF nest it
    * replaces was a 30×-scale GC hazard). The kernel lands in its own
    * projection so the d0..d7 extracts reference its output exactly
    * once — CollapseProject keeps the boundary because the producer
    * is non-cheap and multiply referenced.
    */
  private def withDistVectors(rows: DataFrame, cbSource: DataFrame): DataFrame = {
    val dall = rows.crossJoin(broadcast(codebookRow(cbSource)))
      .select(col("vec_id"), col("v"),
        graft.functions.VectorFunctions
          .pq_sub_dists(col("v"), col("cb"), M, Sub, K).as("dall"))
    dall.select(col("vec_id") +: col("v").as("v") +:
      (0 until M).map(mi => element_at(col("dall"), mi + 1).as(s"d$mi")): _*)
  }

  /** Build-once materialized PQ codes store — r15 optimization: five
    * registry entries (`ann_pq_codes`, `ann_pq_adc`, `ann_pq_rerank`,
    * `ann_rerank_sweep`, `vec_pq_distortion`) each re-ran the full
    * M×K×Sub distance kernel over the corpus to derive the identical
    * code assignment. The first consumer writes (vec_id, code_0..7,
    * errd_0..7) once per (JVM, corpus) and later consumers scan it
    * (guide §2.4; the IVF-index / candidate-graph store pattern — a
    * production IVFPQ system stores its codes, it does not re-encode
    * the corpus per query). The per-subspace min distances are kept
    * as RAW doubles so both downstream float surfaces stay bit-equal:
    * `err_u` re-forms the original left-fold sum before its single
    * floor, and `vec_pq_distortion` floors each subspace term
    * directly (doubles round-trip parquet exactly). mode(overwrite) +
    * per-JVM memo: a fresh JVM always rebuilds from the parquet
    * inputs.
    */
  private val pqStoreBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def pqCodesStore(spark: SparkSession, dir: String): String =
    pqStoreBuilt.computeIfAbsent(dir, d0 => {
      val p = "/tmp/graft_pqcodes_" +
        d0.replaceAll("[^a-zA-Z0-9._-]", "_") + "_" +
        Integer.toHexString(d0.hashCode)
      graft.TmpDirs.cleanupOnExit(java.nio.file.Paths.get(p))
      val e = embeddings(spark, d0)
      val d = withDistVectors(e, e)
      val codeCols = (0 until M).map { mi =>
        (array_position(col(s"d$mi"), array_min(col(s"d$mi"))) - 1).as(s"code_$mi")
      }
      val errCols = (0 until M).map(mi => array_min(col(s"d$mi")).as(s"errd_$mi"))
      d.select(col("vec_id") +: (codeCols ++ errCols): _*)
        .write.mode("overwrite").parquet(s"$p/codes")
      p
    })

  /** Codes + quantization error per vector, from the materialized
    * store. `err_u` reproduces the original fold exactly: the same
    * left-to-right double sum of the per-subspace minima, floored
    * once at the end.
    */
  def pqCodesDf(spark: SparkSession, dir: String): DataFrame = {
    val stored = spark.read.parquet(s"${pqCodesStore(spark, dir)}/codes")
    val err = (0 until M).map(mi => col(s"errd_$mi")).reduce(_ + _)
    stored.select(col("vec_id") +:
      (0 until M).map(mi => col(s"code_$mi")) :+
      floor(err * 1e6).cast("long").as("err_u"): _*)
  }

  /** §2.4#130 — PQ code assignment + reconstruction error (µ-units,
    * floor-scaled so the compare is integer-exact).
    */
  def annPqCodes(spark: SparkSession, dir: String): DataFrame =
    pqCodesDf(spark, dir).orderBy(col("vec_id"))

  /** §2.4#131 — ADC search recall: a BOUNDED probe sample
    * (vec_id % 83 == 0, capped at [[AdcProbeCap]] → ≤60 probes at any
    * SF) searches the PQ codes with per-probe lookup tables; top-3 by
    * ADC distance is compared against the exact squared-L2 top-3.
    * Output is the per-probe overlap count — an integer recall
    * readout of what the 8-byte compression costs. The cap is what
    * keeps the probe×corpus scoring grid linear in the corpus.
    */
  def annPqAdc(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    // per-probe LUT: lut_m[k] = dist(q sub m, codebook[k] sub m)
    val probes = withDistVectors(
      e.filter(col("vec_id") % Probes === 0 && col("vec_id") < AdcProbeCap), e)
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
    // (native fused loop — bit-equal to the portable HOF fold)
    val l2 = graft.functions.VectorFunctions.squared_l2(col("v"), col("q"))
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

  val RerankDepth = 10 // ADC candidates fetched for exact re-ranking

  /** §2.4 `ann_pq_rerank` — the standard production LAST stage after
    * ADC (FAISS refine step): the PQ scan retrieves [[RerankDepth]]
    * candidates by approximate distance, ONLY those ids fetch their
    * full-precision vectors, and the final top-k is chosen by exact
    * L2 among the candidates. Per probe the readout is recall@k of
    * the raw ADC cut vs the re-ranked cut against the global exact
    * top-k — the recall the 8-byte compression costs and the fraction
    * the re-rank buys back. Quantization can only misORDER candidates
    * it retrieved, so rerank recall ≥ raw recall row by row.
    *
    * Scale: probes are the AdcProbeCap-bounded QA slice; the
    * candidate set is ≤ probes × RerankDepth rows (the literal-bound
    * `.limit` makes that visible to the plan gate), broadcast into
    * one full-precision fetch of just those ids — the corpus is
    * never rescanned at full precision.
    */
  def annPqRerank(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    val probes = withDistVectors(
      e.filter(col("vec_id") % Probes === 0 && col("vec_id") < AdcProbeCap), e)
      .select(col("vec_id").as("probe_id") +: col("v").as("q") +:
        (0 until M).map(mi => col(s"d$mi").as(s"lut_$mi")): _*)
    val codes = pqCodesDf(spark, dir)
    val adc = (0 until M)
      .map(mi => element_at(col(s"lut_$mi"), col(s"code_$mi").cast("int") + 1))
      .reduce(_ + _)
    val wAdc = Window.partitionBy(col("probe_id")).orderBy(col("adc"), col("vec_id"))
    val candidates = codes.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("adc", adc)
      .withColumn("rnk", row_number().over(wAdc))
      .filter(col("rnk") <= RerankDepth)
      .select(col("probe_id"), col("vec_id"), col("rnk"))
      // semantic no-op (the rank cut already bounds the set); the
      // literal makes the bound visible to the boundedness walk.
      // Ceil division keeps it a provable UPPER bound on
      // probes×RerankDepth for any retuning of the constants — with
      // integer floor division a non-divisible AdcProbeCap/Probes
      // pair would silently drop rerank candidates after the rank cut
      .limit(((AdcProbeCap + Probes - 1) / Probes) * RerankDepth)
    val l2 = graft.functions.VectorFunctions.squared_l2(col("v"), col("q"))
    val qOnly = probes.select(col("probe_id"), col("q"))
    // full-precision fetch of ONLY the candidate ids, then exact
    // re-rank within each probe's candidate list
    val wRr = Window.partitionBy(col("probe_id")).orderBy(col("l2"), col("vec_id"))
    val reranked = e.join(broadcast(candidates), Seq("vec_id"))
      .join(broadcast(qOnly), Seq("probe_id"))
      .withColumn("l2", l2)
      .withColumn("rr", row_number().over(wRr))
    val rerankTop = reranked.filter(col("rr") <= AdcTopK)
      .select(col("probe_id"), col("vec_id"))
    val adcTop = candidates.filter(col("rnk") <= AdcTopK)
      .select(col("probe_id"), col("vec_id"))
    val wL2 = Window.partitionBy(col("probe_id")).orderBy(col("l2"), col("vec_id"))
    val exactTop = e.crossJoin(broadcast(qOnly))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("l2", l2)
      .withColumn("rnk", row_number().over(wL2))
      .filter(col("rnk") <= AdcTopK)
      .select(col("probe_id"), col("vec_id"))
    def matches(top: DataFrame, name: String): DataFrame =
      top.join(exactTop, Seq("probe_id", "vec_id"))
        .groupBy(col("probe_id")).agg(count(lit(1)).as(name))
    qOnly.select(col("probe_id"))
      .join(matches(adcTop, "n_matched_adc"), Seq("probe_id"), "left")
      .join(matches(rerankTop, "n_matched_rerank"), Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("n_matched_adc"), lit(0L)).as("n_matched_adc"),
        coalesce(col("n_matched_rerank"), lit(0L)).as("n_matched_rerank"),
        (coalesce(col("n_matched_rerank"), lit(0L)) -
          coalesce(col("n_matched_adc"), lit(0L))).as("recall_gain"),
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
       |  FROM e, cbl WHERE vec_id % $Probes = 0 AND vec_id < $AdcProbeCap),
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

  def pqRerankOracleSql: String = {
    val luts = (0 until M).map(mi => s"${subDistSql("q", mi)} AS lut_$mi").mkString(",\n  ")
    val adcSum = (0 until M).map(mi => s"lut_$mi[code_$mi + 1]").mkString(" + ")
    val l2 = s"list_sum(list_transform(range(1, ${M * Sub + 1}), " +
      "j -> (v[j] - q[j]) * (v[j] - q[j])))"
    s"""WITH $cbCtes,
       |$codesCte,
       |probes AS (SELECT vec_id AS probe_id, v AS q,
       |  $luts
       |  FROM e, cbl WHERE vec_id % $Probes = 0 AND vec_id < $AdcProbeCap),
       |adc AS (SELECT probe_id, vec_id,
       |  row_number() OVER (PARTITION BY probe_id ORDER BY ($adcSum), vec_id) AS rnk
       |  FROM codes, probes WHERE vec_id <> probe_id),
       |cand AS (SELECT probe_id, vec_id, rnk FROM adc WHERE rnk <= $RerankDepth),
       |adc_top AS (SELECT probe_id, vec_id FROM cand WHERE rnk <= $AdcTopK),
       |rr AS (SELECT c.probe_id, c.vec_id,
       |  row_number() OVER (PARTITION BY c.probe_id ORDER BY $l2, c.vec_id) AS rr
       |  FROM cand c JOIN e ON e.vec_id = c.vec_id
       |  JOIN probes p ON p.probe_id = c.probe_id),
       |rr_top AS (SELECT probe_id, vec_id FROM rr WHERE rr <= $AdcTopK),
       |ex AS (SELECT probe_id, vec_id,
       |  row_number() OVER (PARTITION BY probe_id ORDER BY $l2, vec_id) AS rnk
       |  FROM e, probes WHERE vec_id <> probe_id),
       |ex_top AS (SELECT probe_id, vec_id FROM ex WHERE rnk <= $AdcTopK),
       |ma AS (SELECT a.probe_id, count(*) AS n_matched_adc
       |      FROM adc_top a JOIN ex_top x
       |        ON a.probe_id = x.probe_id AND a.vec_id = x.vec_id
       |      GROUP BY a.probe_id),
       |mr AS (SELECT r.probe_id, count(*) AS n_matched_rerank
       |      FROM rr_top r JOIN ex_top x
       |        ON r.probe_id = x.probe_id AND r.vec_id = x.vec_id
       |      GROUP BY r.probe_id)
       |SELECT p.probe_id,
       |  CAST(coalesce(ma.n_matched_adc, 0) AS BIGINT) AS n_matched_adc,
       |  CAST(coalesce(mr.n_matched_rerank, 0) AS BIGINT) AS n_matched_rerank,
       |  CAST(coalesce(mr.n_matched_rerank, 0) - coalesce(ma.n_matched_adc, 0) AS BIGINT) AS recall_gain,
       |  CAST($AdcTopK AS BIGINT) AS top_k
       |FROM (SELECT DISTINCT probe_id FROM probes) p
       |LEFT JOIN ma ON p.probe_id = ma.probe_id
       |LEFT JOIN mr ON p.probe_id = mr.probe_id ORDER BY p.probe_id""".stripMargin
  }

  val IvfPqK = 5 // result depth of the composite search
  val IvfPqNprobe = 2

  /** §2.4 `ann_ivf_pq_search` — the production ANN composite: IVF
    * cell probing THEN PQ asymmetric-distance scoring inside the
    * probed cells, recall measured against the global exact top-k.
    * This is how a billion-vector index actually serves queries
    * (FAISS IVF-PQ shape): the IVF stage reads only nprobe cells of
    * the materialized cell-partitioned store ([[Ann.ivfIndex]] —
    * partition filters, nothing else scanned), the PQ stage scores
    * candidates from 8-byte codes via per-query lookup tables
    * (broadcast; no float vectors touched in the hot loop), and only
    * the ≤k survivors ever see full-precision math again. Both
    * approximation losses (cell-boundary misses + quantization error)
    * land in one integer recall readout per query.
    *
    * Scale: centroids and LUTs broadcast; the code scan is linear in
    * the probed cells only; the rank cut is the bounded window. The
    * exact side exists solely as the evaluation yardstick.
    */
  def annIvfPqSearch(spark: SparkSession, dir: String): DataFrame = {
    val idx = graft.similarity.Ann.ivfIndex(spark, dir)
    val e = embeddings(spark, dir)
    val queries = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("v").as("q"))
    // IVF stage: rank stored centroids per query (broadcast, rounded
    // cos + c_id tiebreak — the index's own assignment discipline)
    val centroids = spark.read.parquet(s"$idx/centroids")
    val wq = Window.partitionBy(col("q_id")).orderBy(col("ccos").desc, col("c_id"))
    val probes = queries.join(broadcast(centroids))
      .select(col("q_id"), col("c_id"),
        round(graft.functions.VectorFunctions.cosine_sim(col("q"), col("cv")), 4)
          .as("ccos"))
      .withColumn("rnk", row_number().over(wq))
      .filter(col("rnk") <= IvfPqNprobe)
      .select(col("q_id"), col("c_id").as("probe"))
    val cellIds = probes.select(col("probe")).distinct()
      .collect().map(_.get(0)).toSeq // bounded pushdown parameter
    // candidates: probed cell partitions only, corpus side
    val cands = spark.read.parquet(s"$idx/cells")
      .filter(col("assigned_centroid").isin(cellIds: _*))
      .filter(col("vec_id") >= 5)
      .select(col("vec_id"), col("v"), col("assigned_centroid"))
    // PQ codes for the candidates (corpus-global codebook)
    val dc = withDistVectors(cands.select(col("vec_id"), col("v")), e)
      .join(cands.select(col("vec_id"), col("assigned_centroid")), Seq("vec_id"))
    val codeCols = (0 until M).map { mi =>
      (array_position(col(s"d$mi"), array_min(col(s"d$mi"))) - 1).as(s"code_$mi")
    }
    val coded = dc.select(col("vec_id") +: col("assigned_centroid").as("cell") +:
      codeCols: _*)
    // per-query LUTs (one row per query, broadcast)
    val luts = withDistVectors(
      queries.select(col("q_id").as("vec_id"), col("q").as("v")), e)
      .select(col("vec_id").as("q_id") +: col("v").as("q") +:
        (0 until M).map(mi => col(s"d$mi").as(s"lut_$mi")): _*)
    val probeLuts = probes.join(luts, Seq("q_id"))
    val adcCol = (0 until M)
      .map(mi => element_at(col(s"lut_$mi"), col(s"code_$mi").cast("int") + 1))
      .reduce(_ + _)
    val wAdc = Window.partitionBy(col("q_id")).orderBy(col("adc"), col("vec_id"))
    val adcTop = coded.join(broadcast(probeLuts), col("cell") === col("probe"))
      .withColumn("adc", adcCol)
      .withColumn("rnk", row_number().over(wAdc))
      .filter(col("rnk") <= IvfPqK)
      .select(col("q_id"), col("vec_id"))
    // yardstick: global exact L2 top-k (same fold order as pq_adc)
    val l2 = graft.functions.VectorFunctions.squared_l2(col("v"), col("q"))
    val qOnly = queries
    val wL2 = Window.partitionBy(col("q_id")).orderBy(col("l2"), col("vec_id"))
    val exactTop = e.filter(col("vec_id") >= 5).crossJoin(broadcast(qOnly))
      .withColumn("l2", l2)
      .withColumn("rnk", row_number().over(wL2))
      .filter(col("rnk") <= IvfPqK)
      .select(col("q_id"), col("vec_id"))
    val matched = adcTop.join(exactTop, Seq("q_id", "vec_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_matched"))
    qOnly.select(col("q_id"))
      .join(matched, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        lit(IvfPqK.toLong).as("top_k"))
      .orderBy(col("q_id"))
  }

  /** DuckDB oracle for [[annIvfPqSearch]] — centroid/assignment CTEs
    * (the IVF index's own math), codebook/code CTEs (PQ's), per-query
    * LUTs, probed-cell ADC rank cut, and the exact-L2 yardstick, all
    * in the engines' shared rounding / tie-break / fold-order
    * discipline.
    */
  def ivfPqOracleSql: String = {
    val luts = (0 until M).map(mi => s"${subDistSql("q", mi)} AS lut_$mi").mkString(",\n  ")
    val adcSum = (0 until M).map(mi => s"lut_$mi[code_$mi + 1]").mkString(" + ")
    val l2 = s"list_sum(list_transform(range(1, ${M * Sub + 1}), " +
      "j -> (v[j] - q[j]) * (v[j] - q[j])))"
    s"""WITH $cbCtes,
       |$codesCte,
       |el AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
       |comp AS (SELECT label AS c_id, pos - 1 AS pos, x
       |         FROM (SELECT label, unnest(v) AS x,
       |               generate_subscripts(v, 1) AS pos FROM el)),
       |cent AS (SELECT c_id, list(cx ORDER BY pos) AS cv FROM (
       |  SELECT c_id, pos, avg(x) AS cx FROM comp GROUP BY c_id, pos) GROUP BY c_id),
       |scored AS (SELECT vec_id, c_id,
       |  round(list_cosine_similarity(v, cv), 4) + 0.0 AS ccos FROM el CROSS JOIN cent),
       |assign AS (SELECT vec_id, c_id AS cell FROM (
       |  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, c_id) AS rn
       |  FROM scored) WHERE rn = 1),
       |qs AS (SELECT vec_id AS q_id, v AS q FROM e WHERE vec_id < 5),
       |probes AS (SELECT q_id, c_id AS probe FROM (
       |  SELECT q_id, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY ccos DESC, c_id) AS rnk
       |  FROM (SELECT q_id, c_id, round(list_cosine_similarity(q, cv), 4) + 0.0 AS ccos
       |        FROM qs CROSS JOIN cent)) WHERE rnk <= $IvfPqNprobe),
       |lut AS (SELECT vec_id AS q_id, v AS q,
       |  $luts
       |  FROM e, cbl WHERE vec_id < 5),
       |cand AS (SELECT c.vec_id, ${(0 until M).map(mi => s"c.code_$mi").mkString(", ")}, a.cell
       |  FROM codes c JOIN assign a ON c.vec_id = a.vec_id WHERE c.vec_id >= 5),
       |adc AS (SELECT p.q_id, cand.vec_id,
       |  row_number() OVER (PARTITION BY p.q_id ORDER BY ($adcSum), cand.vec_id) AS rnk
       |  FROM cand JOIN probes p ON cand.cell = p.probe
       |  JOIN lut ON lut.q_id = p.q_id),
       |adc_top AS (SELECT q_id, vec_id FROM adc WHERE rnk <= $IvfPqK),
       |ex AS (SELECT q_id, e.vec_id,
       |  row_number() OVER (PARTITION BY q_id ORDER BY $l2, e.vec_id) AS rnk
       |  FROM e, qs WHERE e.vec_id >= 5),
       |ex_top AS (SELECT q_id, vec_id FROM ex WHERE rnk <= $IvfPqK),
       |m AS (SELECT a.q_id, count(*) AS n_matched
       |      FROM adc_top a JOIN ex_top x ON a.q_id = x.q_id AND a.vec_id = x.vec_id
       |      GROUP BY a.q_id)
       |SELECT qs.q_id, CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
       |  CAST($IvfPqK AS BIGINT) AS top_k
       |FROM qs LEFT JOIN m ON qs.q_id = m.q_id ORDER BY qs.q_id""".stripMargin
  }

  val SweepDepths: Seq[Int] = Seq(3, 5, 10)

  /** §2.4 `ann_rerank_sweep` — the retrieval-quality curve of the
    * two-stage (ADC shortlist → exact re-rank) pipeline as a function
    * of shortlist depth: the last readout of the FAISS-style stack
    * that [[annPqRerank]] leaves implicit. For each depth d ∈
    * {3, 5, 10}, the PQ scan retrieves d candidates, the exact
    * re-rank reorders them, and three exact-integer metrics land per
    * depth: Σ per-probe |rerank-top-3 ∩ exact-top-3| (recall mass),
    * the number of probes whose RETRIEVER-order #1 (raw ADC, rnk = 1
    * — a different scorer than the exact yardstick, so the column is
    * not a restatement of the ceiling) is the true global nearest
    * (the "was the cheap stage alone already right?" baseline,
    * depth-invariant by construction), and the number of probes whose
    * true nearest was retrieved at all (retrieval ceiling: re-ranking
    * can never exceed it; its per-depth gap over the ADC baseline IS
    * the re-ranker's value). Ceiling and recall mass are monotone in
    * d by construction — spec-pinned.
    *
    * Scale: one candidate set at the max depth (bounded
    * probes×[[RerankDepth]] rows, broadcast), ONE full-precision
    * fetch of just those ids, and the depth dimension is a 3-way
    * explode over that bounded frame — the corpus is scanned once
    * for codes and once for the exact yardstick, independent of how
    * many depths the sweep reads off.
    */
  def annRerankSweep(spark: SparkSession, dir: String): DataFrame = {
    val e = embeddings(spark, dir)
    val probes = withDistVectors(
      e.filter(col("vec_id") % Probes === 0 && col("vec_id") < AdcProbeCap), e)
      .select(col("vec_id").as("probe_id") +: col("v").as("q") +:
        (0 until M).map(mi => col(s"d$mi").as(s"lut_$mi")): _*)
    val codes = pqCodesDf(spark, dir)
    val adc = (0 until M)
      .map(mi => element_at(col(s"lut_$mi"), col(s"code_$mi").cast("int") + 1))
      .reduce(_ + _)
    val wAdc = Window.partitionBy(col("probe_id")).orderBy(col("adc"), col("vec_id"))
    val candidates = codes.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("adc", adc)
      .withColumn("rnk", row_number().over(wAdc))
      .filter(col("rnk") <= RerankDepth)
      .select(col("probe_id"), col("vec_id"), col("rnk"))
      // no cap needed: rnk <= RerankDepth already bounds this frame to
      // a deterministic probes x RerankDepth rows (a limit() here on an
      // unordered frame would select nondeterministic rows if it ever
      // bound — r13 advice)
    val l2 = graft.functions.VectorFunctions.squared_l2(col("v"), col("q"))
    val qOnly = probes.select(col("probe_id"), col("q"))
    val candL2 = e.join(broadcast(candidates), Seq("vec_id"))
      .join(broadcast(qOnly), Seq("probe_id"))
      .withColumn("l2", l2)
      .select(col("probe_id"), col("vec_id"), col("rnk"), col("l2"))
    val candD = candL2
      .withColumn("depth", explode(array(SweepDepths.map(lit(_)): _*)))
      .filter(col("rnk") <= col("depth"))
    val wRr = Window.partitionBy(col("depth"), col("probe_id"))
      .orderBy(col("l2"), col("vec_id"))
    val rr = candD.withColumn("rr", row_number().over(wRr))
    val wEx = Window.partitionBy(col("probe_id")).orderBy(col("l2"), col("vec_id"))
    val exact = e.crossJoin(broadcast(qOnly))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("l2", l2)
      .withColumn("xr", row_number().over(wEx))
      .filter(col("xr") <= AdcTopK)
      .select(col("probe_id"), col("vec_id"), col("xr"))
      .cutLineage() // yardstick read by three metric joins
    val recall = rr.filter(col("rr") <= AdcTopK)
      .join(exact, Seq("probe_id", "vec_id"))
      .groupBy(col("depth")).agg(count(lit(1)).as("recall3_sum"))
    // the RETRIEVER's own #1 (ADC order, rnk==1) vs the true nearest:
    // the cross-encoder baseline column. Ranked on a DIFFERENT scorer
    // than the exact yardstick, so it is not derivable from
    // best_retrieved (whose gap to it per depth IS the re-ranker's
    // value) — the r13 advice on the degenerate exact-order top-1.
    // Depth-invariant by construction (rnk==1 survives every depth cut).
    val top1 = candD.filter(col("rnk") === 1)
      .join(exact.filter(col("xr") === 1), Seq("probe_id", "vec_id"))
      .groupBy(col("depth")).agg(count(lit(1)).as("adc_top1_hits"))
    val bestRetrieved = candD
      .join(exact.filter(col("xr") === 1), Seq("probe_id", "vec_id"))
      .groupBy(col("depth")).agg(count(lit(1)).as("best_retrieved"))
    import spark.implicits._
    val depths = SweepDepths.toDF("depth")
    depths.crossJoin(qOnly.agg(count(lit(1)).as("n_probes")))
      .join(bestRetrieved, Seq("depth"), "left")
      .join(top1, Seq("depth"), "left")
      .join(recall, Seq("depth"), "left")
      .select(col("depth"), col("n_probes"),
        coalesce(col("best_retrieved"), lit(0L)).as("best_retrieved"),
        coalesce(col("adc_top1_hits"), lit(0L)).as("adc_top1_hits"),
        coalesce(col("recall3_sum"), lit(0L)).as("recall3_sum"))
      .orderBy(col("depth"))
  }

  /** DuckDB oracle for [[annRerankSweep]] — same candidate CTE, the
    * depth dimension as a VALUES join, identical float op order.
    */
  def rerankSweepOracleSql: String = {
    val luts = (0 until M).map(mi => s"${subDistSql("q", mi)} AS lut_$mi").mkString(",\n  ")
    val adcSum = (0 until M).map(mi => s"lut_$mi[code_$mi + 1]").mkString(" + ")
    val l2 = s"list_sum(list_transform(range(1, ${M * Sub + 1}), " +
      "j -> (v[j] - q[j]) * (v[j] - q[j])))"
    val depthRows = SweepDepths.map(d => s"($d)").mkString(", ")
    s"""WITH $cbCtes,
       |$codesCte,
       |probes AS (SELECT vec_id AS probe_id, v AS q,
       |  $luts
       |  FROM e, cbl WHERE vec_id % $Probes = 0 AND vec_id < $AdcProbeCap),
       |adc AS (SELECT probe_id, vec_id,
       |  row_number() OVER (PARTITION BY probe_id ORDER BY ($adcSum), vec_id) AS rnk
       |  FROM codes, probes WHERE vec_id <> probe_id),
       |cand AS (SELECT probe_id, vec_id, rnk FROM adc WHERE rnk <= $RerankDepth),
       |cl AS (SELECT c.probe_id, c.vec_id, c.rnk, $l2 AS l2
       |  FROM cand c JOIN e ON e.vec_id = c.vec_id
       |  JOIN probes p ON p.probe_id = c.probe_id),
       |dep AS (SELECT depth FROM (VALUES $depthRows) t(depth)),
       |cd AS (SELECT dep.depth, cl.probe_id, cl.vec_id, cl.rnk, cl.l2
       |  FROM cl JOIN dep ON cl.rnk <= dep.depth),
       |rr AS (SELECT depth, probe_id, vec_id,
       |  row_number() OVER (PARTITION BY depth, probe_id ORDER BY l2, vec_id) AS rr
       |  FROM cd),
       |ex AS (SELECT probe_id, vec_id,
       |  row_number() OVER (PARTITION BY probe_id ORDER BY $l2, vec_id) AS xr
       |  FROM e, probes WHERE vec_id <> probe_id),
       |ex_top AS (SELECT probe_id, vec_id, xr FROM ex WHERE xr <= $AdcTopK),
       |np AS (SELECT count(*) AS n_probes FROM probes),
       |rec AS (SELECT depth, count(*) AS recall3_sum FROM rr
       |  JOIN ex_top x ON rr.probe_id = x.probe_id AND rr.vec_id = x.vec_id
       |  WHERE rr.rr <= $AdcTopK GROUP BY 1),
       |t1 AS (SELECT depth, count(*) AS adc_top1_hits FROM cd
       |  JOIN ex_top x ON cd.probe_id = x.probe_id AND cd.vec_id = x.vec_id
       |  WHERE cd.rnk = 1 AND x.xr = 1 GROUP BY 1),
       |br AS (SELECT depth, count(*) AS best_retrieved FROM cd
       |  JOIN ex_top x ON cd.probe_id = x.probe_id AND cd.vec_id = x.vec_id
       |  WHERE x.xr = 1 GROUP BY 1)
       |SELECT dep.depth AS depth, CAST(np.n_probes AS BIGINT) AS n_probes,
       |  CAST(coalesce(br.best_retrieved, 0) AS BIGINT) AS best_retrieved,
       |  CAST(coalesce(t1.adc_top1_hits, 0) AS BIGINT) AS adc_top1_hits,
       |  CAST(coalesce(rec.recall3_sum, 0) AS BIGINT) AS recall3_sum
       |FROM dep CROSS JOIN np
       |LEFT JOIN br ON dep.depth = br.depth
       |LEFT JOIN t1 ON dep.depth = t1.depth
       |LEFT JOIN rec ON dep.depth = rec.depth
       |ORDER BY depth""".stripMargin
  }

  /** §2.4#331 `vec_pq_distortion` — per-subspace quantization error
    * profile: for each of the M sub-spaces, the mean squared L2
    * between a vector's sub-vector and its assigned codebook entry
    * (= the sub-space's reconstruction MSE; the column a PQ operator
    * watches to decide which sub-space needs more codebook bits).
    * Per-row errors are floor-quantized to exact µ-units (the
    * `err_u` convention of [[pqCodesDf]]) so the per-subspace sum is
    * an order-free exact-long reduction; the MSE is then a chain of
    * two correctly-rounded divisions over exact integers — emitted
    * unrounded (tie rule).
    *
    * Scale: one narrow pass over the codes frame (codebook
    * broadcast, fused kernel distances), an 8×-rows posexplode of
    * µ-unit longs, and an M-row groupBy. No shuffle wider than the
    * bounded sub-space axis.
    */
  def vecPqDistortion(spark: SparkSession, dir: String): DataFrame = {
    // reads the materialized codes store (r15): the per-subspace
    // reconstruction errors were already computed (and floored
    // per-subspace here, exactly as before — errd_m round-trips the
    // double bit-for-bit through parquet)
    val d = spark.read.parquet(s"${pqCodesStore(spark, dir)}/codes")
    val errs = array((0 until M).map(mi =>
      floor(col(s"errd_$mi") * 1e6).cast("long")): _*)
    d.select(errs.as("errs"))
      .select(posexplode(col("errs")).as(Seq("m", "err_u")))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("err_u")).as("sum_err_u"))
      .select(col("m").cast("long").as("m"), col("n_vecs"), col("sum_err_u"),
        (col("sum_err_u").cast("double") / col("n_vecs") / 1e6).as("mse"))
      .orderBy(col("m"))
  }

  def pqDistortionOracleSql: String = {
    val dists = (0 until M)
      .map(mi => s"${subDistSql("v", mi)} AS d$mi").mkString(",\n  ")
    val arms = (0 until M).map(mi =>
      s"SELECT $mi AS m, CAST(floor(list_min(d$mi) * 1000000) AS BIGINT) AS err_u FROM d")
      .mkString("\n  UNION ALL ")
    s"""WITH $cbCtes,
       |d AS (SELECT vec_id, $dists
       |  FROM e, cbl),
       |u AS ($arms)
       |SELECT CAST(m AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS n_vecs,
       |  CAST(sum(err_u) AS BIGINT) AS sum_err_u,
       |  CAST(sum(err_u) AS DOUBLE) / count(*) / 1000000.0 AS mse
       |FROM u GROUP BY m ORDER BY m""".stripMargin
  }
}
