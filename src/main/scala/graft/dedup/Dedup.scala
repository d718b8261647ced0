package graft.dedup

import graft.Ckpt.CutOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.CachePins
import graft.functions.MinHashAggFunctions.minhash_agg
import graft.functions.TextFunctions.{jaccard_sorted, minhash_sigs, simhash32}
import graft.sources.Tables
import graft.text.TextAnalysis.tokensCol

/** Deduplication operators over `documents` (SURVEY.md §2.3).
  *
  * Design for 100 TB: nothing here is O(n²) over the corpus. Exact
  * dedup is one digest-shuffle with map-side combine; MinHash/LSH
  * explodes k band hashes per doc and bucket-joins (linear in corpus
  * size × bands); Jaccard/embedding verification runs only inside
  * blocking buckets. All hashing is md5-based so the DuckDB oracle
  * reproduces signatures bit-for-bit (md5 is engine-portable where
  * murmur3/xxhash implementations are not).
  */
object Dedup {

  /** Normalized-content digest used for exact dedup. */
  private def digest: Column = md5(lower(col("text")))

  /** §2.3#27 — exact dedup clusters: one row per distinct content
    * digest with cluster size and the surviving (min) doc_id.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(digest.as("digest"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("keeper_doc_id"))
      .orderBy(col("digest"))

  /** §2.3 `corpus_dedup_by_source` — duplication QA per corpus
    * segment: exact-dup rate per (source, lang) — how much of each
    * vendor/crawl slice is copies (cross-segment copies count in
    * every segment holding one). The digest shuffle is shared with
    * [[dedupExact]]; the readout joins each doc's segment onto its
    * digest-cluster size and rolls up to the bounded segment grid —
    * the acceptance dashboard run before paying for a data drop.
    */
  def corpusDedupBySource(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("lang"), digest.as("digest"))
    val clusters = docs.groupBy(col("digest"))
      .agg(count(lit(1)).as("copies"), min(col("doc_id")).as("keeper"))
    docs.join(clusters, Seq("digest"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("copies") > 1, 1L).otherwise(0L)).as("n_in_dup_clusters"),
        sum(when(col("doc_id") =!= col("keeper"), 1L).otherwise(0L)).as("n_redundant"))
      .orderBy(col("source"), col("lang"))
  }

  /** §2.3#284 — NEAR-dup involvement per source: how much of each
    * source's corpus sits in an LSH candidate pair — the
    * provenance-level twin of [[corpusDedupBySource]] (which counts
    * exact copies). A source with a high near-dup rate is the
    * boilerplate/mirror feed the mixture weights should discount.
    * Involved docs come off the banded candidate pairs (linear
    * explode + distinct), then one bounded per-source rollup.
    */
  def corpusNearDupBySource(spark: SparkSession, dir: String): DataFrame = {
    // a document sits in a candidate pair ⟺ its signature group is a
    // node of the collapsed graph (a cross-rep neighbor, or ≥2 docs
    // sharing the signature, which pair with each other) — so
    // involvement is two doc_id-keyed joins, never an exploded full
    // pair list that cliques over copies
    val g = candGraph(spark, dir)
    val involved = g.nodes
      .select(col("doc_id").as("rep_id"), lit(1L).as("near_dup"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .join(g.docMap, Seq("doc_id"))
      .join(involved, Seq("rep_id"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        coalesce(sum(col("near_dup")), lit(0L)).as("n_near_dup"))
      .select(col("source"), col("n_docs"), col("n_near_dup"),
        // exact-count quotient: one correctly-rounded division on both
        // engines → emitted unrounded (round() is tie-attracted here)
        (col("n_near_dup").cast("double") / col("n_docs"))
          .as("near_dup_rate"))
      .orderBy(col("source"))
  }

  /** §2.3#28 — survivor set after exact dedup: the docs that keep
    * their cluster (doc_id == min per digest). Window-min over the
    * digest shuffle; identical exchange to #27, reused by Spark.
    */
  def dedupExactSurvivors(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), digest.as("digest"))
      .withColumn("keeper", min(col("doc_id")).over(Window.partitionBy(col("digest"))))
      .filter(col("doc_id") === col("keeper"))
      .select(col("doc_id"), col("digest"))
      .orderBy(col("doc_id"))

  // ---- MinHash / LSH ----

  /** Word 3-gram shingles from an already-materialized token column
    * (1-based element_at matches the oracle's 1-based list indexing).
    * The argument must be an attribute, not the tokenizer expression
    * itself — inlining split() into the lambda re-tokenizes per
    * shingle element, quadratic in document length.
    */
  def shinglesOf(toks: Column): Column =
    transform(graft.text.TextAnalysis.idxSeq(size(toks) - 2),
      i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1),
        lit(" "), element_at(toks, i + 2)))

  val MinhashK = 12
  val LshBands = 4 // 4 bands × 3 rows

  /** Per-doc signature + LSH band hashes (md5 of 3 consecutive
    * signature rows per band).
    *
    * Shape: one fused native pass per doc ([[graft.functions.MinHashSigs]])
    * computing all k mins — no explode, no shuffle, one md5 per
    * (seed, shingle). The naive k-column HOF form re-derived the
    * shingle array per signature and ran ~50× slower.
    */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    minhashSignaturesOf(Tables.rebalanced(Tables.documents(spark, dir)))

  /** One representative per distinct (text, lang, n_chars) group — the
    * exact-dedup collapse that a pipeline runs BEFORE near-dup
    * verification. Verbatim copies are the degenerate near-dups
    * (similarity exactly 1); re-verifying every copy-pair is quadratic
    * in duplicate-cluster depth, which is precisely what explodes
    * under a cloned-corpus stress load. Collapsing to representatives
    * first keeps the verification joins quadratic only in DISTINCT
    * near-dup texts, with `n_copies` carried so pair multiplicities
    * stay exact. Grouping includes the carried metadata so copies with
    * inconsistent lang/n_chars stay separate instead of silently
    * adopting the min (they still pair with each other through the
    * band join — identical text means identical signatures). One
    * text-keyed shuffle with map-side combine.
    */
  private[graft] def textReps(spark: SparkSession, dir: String): DataFrame =
    Tables.rebalanced(Tables.documents(spark, dir))
      .groupBy(col("text"), col("lang"), col("n_chars"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))

  /** [[minhashSignatures]] over an arbitrary (doc_id, text) input —
    * lets the verification path run LSH on exact-dedup
    * representatives instead of the full corpus.
    */
  def minhashSignaturesOf(docs: DataFrame): DataFrame = {
    val withSigs = docs
      .select(col("doc_id"), tokensCol(col("text")).as("toks"))
      .select(col("doc_id"), minhash_sigs(shinglesOf(col("toks")), MinhashK).as("sigs"))
      .select(col("doc_id") +:
        (0 until MinhashK).map(k => element_at(col("sigs"), k + 1).as(s"sig$k")): _*)
    val bandCols = (0 until LshBands).map { b =>
      md5(concat(col(s"sig${3 * b}"), col(s"sig${3 * b + 1}"), col(s"sig${3 * b + 2}")))
        .as(s"band$b")
    }
    withSigs.select(
      col("doc_id") +:
        md5(concat((0 until MinhashK).map(k => col(s"sig$k")): _*)).as("sig_digest") +:
        bandCols: _*)
  }

  /** §2.3#29 — LSH bucket statistics: explode the band hashes and
    * aggregate bucket occupancy per band. Buckets with n_docs > 1 are
    * the candidate-pair source ([[minhashCandidatePairs]]); this
    * aggregated view is the oracle-checked surface because the pair
    * set may legitimately be empty on a dup-free corpus.
    */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val sigs = minhashSignatures(spark, dir)
    val exploded = sigs.select(col("doc_id"),
      explode(map((0 until LshBands).flatMap(b => Seq(lit(b).cast("long"), col(s"band$b"))): _*))
        .as(Seq("band_idx", "band_hash")))
    exploded.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("bucket_size"))
      .groupBy(col("band_idx"))
      .agg(count(lit(1)).as("n_buckets"),
        max(col("bucket_size")).as("max_bucket"),
        sum(when(col("bucket_size") > 1, 1L).otherwise(0L)).as("n_collision_buckets"))
      .orderBy(col("band_idx"))
  }

  /** Candidate near-dup pairs over the FULL corpus: docs sharing any
    * LSH band bucket. Linear explode + bucket self-join — never a
    * full cross join — but verbatim-duplicate clusters clique
    * (n copies → C(n,2) pairs), so every scale consumer reads
    * [[candGraph]] instead and this full form remains as the reference
    * semantics the rep-collapse equivalence specs compare against.
    */
  def minhashCandidatePairs(spark: SparkSession, dir: String): DataFrame =
    minhashCandidatePairsOf(minhashSignatures(spark, dir))

  /** Candidate pairs from an already-computed signature frame. */
  def minhashCandidatePairsOf(sigs: DataFrame): DataFrame = {
    val exploded = sigs.select(col("doc_id"),
      explode(map((0 until LshBands).flatMap(b => Seq(lit(b).cast("long"), col(s"band$b"))): _*))
        .as(Seq("band_idx", "band_hash")))
    val a = exploded.as("a")
    val b = exploded.as("b")
    a.join(b, col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  // ---- Rep-collapsed candidate graph ----

  /** The candidate graph collapsed to its distinct nodes, with copy
    * multiplicities — the scale form every graph/cluster consumer
    * reads.
    *
    * nodes: (doc_id, n_copies, sig_digest) — signature groups that
    * appear in the full graph; edges: (doc_a, doc_b, na, nb) —
    * cross-rep candidate pairs, doc_a < doc_b; docMap: (doc_id,
    * rep_id) for every document.
    */
  private[graft] case class CandGraph(nodes: DataFrame, edges: DataFrame,
      docMap: DataFrame)

  /** Builds [[CandGraph]]: the candidate graph COLLAPSED to one node
    * per distinct 12-signature vector (keyed by its md5 digest).
    *
    * The candidate relation — sharing an LSH band bucket — is a pure
    * function of the signature vector, so docs with identical
    * signatures (every verbatim copy included, plus texts with equal
    * shingle SETS) are mutual candidates with identical external
    * adjacency, and the full-corpus graph is exactly the clique
    * blow-up of this one: a group of n copies expands to an n-clique,
    * a rep adjacency (a, b) to a complete na×nb bipartite edge set.
    * Degree, triangle, PageRank, k-core, component and
    * label-propagation readouts over the full graph all have closed
    * forms over (nodes, edges) + multiplicities, so boilerplate
    * duplicated n times costs O(n) here instead of the O(n²) clique
    * edges the full band self-join would materialize — the 100 TB
    * shape, where million-copy boilerplate clusters are the norm.
    *
    * Collapsing on the SIGNATURE digest (not raw text) keeps the cost
    * profile of the uncollapsed r7 path: one narrow scan computes
    * per-doc signatures (the same hashing the full band join already
    * paid), and every downstream shuffle — the group-by, the band
    * join, the per-doc fan-outs — carries ~200-byte digest rows,
    * never document text.
    */
  /** Build-once materialized store for the candidate graph — the
    * r15 optimization-round extension of the label-prop family store
    * (VERDICT r14 #4) one level down the chain: THIRTEEN registry
    * entries (`corpus_near_dup_by_source`, `dedup_cc_clusters`,
    * `dedup_cluster_stats`, `dedup_quality_survivors`,
    * `corpus_dup_provenance`, `graph_degree_hist`, `graph_triangles`,
    * `graph_transitivity`, `graph_assortativity`, `graph_kcore`,
    * `graph_pagerank`, `graph_bfs_layers`, plus the label-prop family
    * store build) each re-ran the full signature scan (12 md5s per
    * shingle), the digest group-by, the band self-join and the edge
    * joins to derive the IDENTICAL (nodes, edges, docMap) frames —
    * measured at 1.0-1.6 s apiece at sf0.1 (guide §1), ~14 s of
    * redundant suite work. The first consumer now writes the three
    * frames to a per-corpus parquet store (build-once per JVM via
    * computeIfAbsent, `mode(overwrite)` so a fresh JVM always
    * rebuilds from the parquet inputs — nothing is reused across
    * bench/verify invocations) and every later consumer scans the
    * store: the build's four shuffles happen once per corpus instead
    * of once per query (guide §2.4, remove shuffles outright). This
    * is exactly the 100 TB deployment shape: the candidate graph is
    * an INDEX, rebuilt per corpus snapshot and probed from storage,
    * not re-derived from raw text by every downstream readout.
    * Assumes `dir` is immutable for the JVM — true for the testdata
    * corpora and every build-once test fixture (verified: no spec
    * rewrites a documents.parquet in place).
    */
  private val candStoreBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def candGraphStore(spark: SparkSession, dir: String): String =
    candStoreBuilt.computeIfAbsent(dir, d => {
      // path carries the sanitized dir (not just its hash) so two
      // corpora can never collide onto one store
      val p = "/tmp/graft_candgraph_" +
        d.replaceAll("[^a-zA-Z0-9._-]", "_") + "_" +
        Integer.toHexString(d.hashCode)
      graft.TmpDirs.cleanupOnExit(java.nio.file.Paths.get(p))
      val g = candGraphBuild(spark, d)
      g.nodes.write.mode("overwrite").parquet(s"$p/nodes")
      g.edges.write.mode("overwrite").parquet(s"$p/edges")
      g.docMap.write.mode("overwrite").parquet(s"$p/docMap")
      p
    })

  /** The candidate graph every scale consumer reads — served from the
    * materialized per-corpus store.
    */
  private[graft] def candGraph(spark: SparkSession, dir: String): CandGraph = {
    val p = candGraphStore(spark, dir)
    CandGraph(spark.read.parquet(s"$p/nodes"),
      spark.read.parquet(s"$p/edges"),
      spark.read.parquet(s"$p/docMap"))
  }

  /** Builds [[CandGraph]]. The shared prefixes (per-doc signatures,
    * rep aggregation, edge list) carry LAZY local checkpoints
    * (`eager = false`): nothing schedules a dedicated materialization
    * job, but the first consuming job persists the partitions and
    * truncates the lineage, so a single-pass consumer pays exactly
    * one signature scan and the iterative consumers (CC, PageRank,
    * BFS, k-core, label propagation) loop over materialized edges —
    * the same one-materialization shape the uncollapsed path had.
    */
  private def candGraphBuild(spark: SparkSession, dir: String): CandGraph = {
    val perDoc = minhashSignaturesOf(
        Tables.rebalanced(Tables.documents(spark, dir)).select(col("doc_id"), col("text")))
      .cutLineage(eager = false)
    // band hashes are functions of the signature vector: grouping by
    // digest + bands collapses exactly the signature groups while
    // keeping the band columns for the candidate join
    val bandCols = (0 until LshBands).map(b => col(s"band$b"))
    val reps = perDoc
      .groupBy(col("sig_digest") +: bandCols: _*)
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
      .cutLineage(eager = false)
    val edges = minhashCandidatePairsOf(reps)
      .join(reps.select(col("doc_id").as("doc_a"), col("n_copies").as("na")), Seq("doc_a"))
      .join(reps.select(col("doc_id").as("doc_b"), col("n_copies").as("nb")), Seq("doc_b"))
      .cutLineage(eager = false)
    val endpoints = edges
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .distinct()
      .withColumn("in_pair", lit(true))
    val nodes = reps
      .join(endpoints, Seq("doc_id"), "left_outer")
      .filter(col("n_copies") >= 2 || col("in_pair"))
      .select(col("doc_id"), col("n_copies"), col("sig_digest"))
    val docMap = perDoc.select(col("doc_id"), col("sig_digest"))
      .join(reps.select(col("sig_digest"), col("doc_id").as("rep_id")),
        Seq("sig_digest"))
      .select(col("doc_id"), col("rep_id"))
    CandGraph(nodes, edges, docMap)
  }

  /** Cluster labels over the rep graph: CC labels for reps with cross
    * edges, self labels for isolated multi-copy groups (whose copies
    * form a clique on their own). Because a group's rep id is the min
    * doc_id of its copies, the min-reachable-rep label IS the
    * min-reachable-doc label of the blown-up graph.
    */
  private def repClusterLabels(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val cc = connectedComponents(edges.select(col("doc_a"), col("doc_b")), maxIter = 50)
    cc.union(
      nodes.join(cc.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("doc_id").as("cluster_id")))
  }

  /** §2.3#73 — duplicate-cluster collapse: connected components over
    * a candidate-pair edge list by iterative min-label propagation
    * (each node adopts the smallest label in its neighborhood until
    * fixpoint). Input: (doc_a, doc_b) pairs; output: (doc_id,
    * cluster_id) where cluster_id is the smallest doc_id reachable.
    * Each iteration is one shuffle on node id — the standard
    * large-graph CC layout (label propagation, no driver-side graph).
    * maxIter bounds the diameter walked; near-dup clusters are
    * shallow so a handful of rounds converges.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 10): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .distinct()
      .cache()
    val nodes = edges.select(col("src").as("doc_id")).distinct()
    var labels = nodes.withColumn("cluster_id", col("doc_id")).cache()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // smallest label among self and neighbors
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc_id", "dst_id"), col("dst") === col("dst_id"))
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("cluster_id")).as("neighbor_min"))
      // localCheckpoint (not cache): truncates the lineage each round
      // so the plan doesn't grow by one join per iteration — cached
      // generations still chain logically and deep graphs would
      // otherwise blow the planner before they blow the executors.
      // The old label rides along so the convergence check is a
      // filter over the checkpointed rows, not a second join.
      val next = labels.join(neighborMin, Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("cluster_id").as("old_id"),
          least(col("cluster_id"), coalesce(col("neighbor_min"), col("cluster_id")))
            .as("cluster_id"))
        .cutLineage()
      val changed = next.filter(col("cluster_id") =!= col("old_id")).limit(1).count()
      labels = next.select(col("doc_id"), col("cluster_id"))
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** §2.3#73 oracle surface: cluster collapse over the LSH candidate
    * pairs — (doc_id, cluster_id = min reachable doc_id) for every
    * document of the full graph. The iteration runs on the
    * rep-collapsed graph ([[candGraph]] — maxIter 50, early exit at
    * fixpoint), then labels fan back out per document through
    * the doc→rep map: copies inherit their rep's label, which is exactly
    * the full-graph answer because verbatim copies are always in their
    * rep's component. The oracle stays the FULL-graph transitive
    * closure, so the blow-up equivalence is checked, not assumed.
    */
  def dedupCcClusters(spark: SparkSession, dir: String): DataFrame = {
    val g = candGraph(spark, dir)
    g.docMap
      .join(repClusterLabels(g.nodes, g.edges).withColumnRenamed("doc_id", "rep_id"),
        Seq("rep_id"))
      .select(col("doc_id"), col("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** §2.3#116 — cluster-size profile of the near-dup components: how
    * many clusters of each size exist (the dedup-savings readout a
    * pipeline reports after clustering). Rep-collapsed: cluster sizes
    * in DOCUMENTS are the sum of copy multiplicities over member reps
    * — no per-document fan-out at all, just two bounded aggregates
    * over the rep labels.
    */
  def dedupClusterStats(spark: SparkSession, dir: String): DataFrame = {
    val g = candGraph(spark, dir)
    repClusterLabels(g.nodes, g.edges)
      .join(g.nodes.select(col("doc_id"), col("n_copies")), Seq("doc_id"))
      .groupBy(col("cluster_id")).agg(sum(col("n_copies")).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))
  }

  /** Shared CTE body: md5 band construction → candidate pairs (the
    * SQL twin of [[minhashCandidatePairs]]). Used by the CC oracles
    * here and the candidate-graph oracles in `graft.graph.GraphOps`.
    */
  def candOracleBody: String = candOracleBodyFrom("documents")

  /** [[candOracleBody]] with a parameterized (doc_id, text) source
    * CTE/table — the SQL twin of [[minhashCandidatePairsOf]].
    */
  def candOracleBodyFrom(src: String): String = {
    val sigExprs = (0 until MinhashK).map { k =>
      s"list_aggregate(list_transform(sh, x -> md5('$k|' || x)), 'min') AS sig$k"
    }.mkString(",\n  ")
    val bandSelects = (0 until LshBands).map { b =>
      val cat = (0 until 3).map(r => s"sig${3 * b + r}").mkString(" || ")
      s"SELECT doc_id, CAST($b AS BIGINT) AS band_idx, md5($cat) AS band_hash FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM $src),
       |s AS (SELECT doc_id, list_transform(range(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS sh FROM t),
       |sig AS (SELECT doc_id,
       |  $sigExprs
       |  FROM s),
       |bands AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx
       |    AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id)""".stripMargin
  }

  /** Shared CTE chain for the CC oracles: candidate pairs →
    * undirected edges → transitive closure.
    */
  private def ccOracleCtes: String =
    "WITH RECURSIVE " + candOracleBody +
      """,
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
        |          UNION SELECT doc_b AS src, doc_a AS dst FROM cand),
        |reach AS (SELECT src AS doc_id, src AS r FROM edges
        |          UNION
        |          SELECT e.src AS doc_id, reach.r AS r
        |          FROM edges e JOIN reach ON e.dst = reach.doc_id)""".stripMargin

  /** DuckDB oracle for [[dedupCcClusters]]: same md5 band
    * construction, then min-reachable-id via a recursive
    * transitive-closure CTE (fine at oracle scale; the Spark side is
    * the one that has to be iterative label propagation).
    */
  def ccClustersOracleSql: String =
    ccOracleCtes + "\nSELECT doc_id, min(r) AS cluster_id FROM reach" +
      "\nGROUP BY doc_id ORDER BY doc_id"

  /** DuckDB oracle for [[dedupClusterStats]]. */
  def clusterStatsOracleSql: String =
    ccOracleCtes + """,
      |lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
      |cs AS (SELECT cluster_id, count(*) AS cluster_size FROM lab GROUP BY cluster_id)
      |SELECT cluster_size, count(*) AS n_clusters FROM cs
      |GROUP BY cluster_size ORDER BY cluster_size""".stripMargin

  // ---- n-gram Jaccard ----

  /** §2.3#30 — n-gram Jaccard similarity inside blocking buckets
    * (lang × length band): distinct-token-set intersection over
    * union, emitted for pairs above threshold. The bucket key bounds
    * the pair blow-up; at scale the bucket would come from LSH
    * (#29) instead of length banding.
    *
    * Runs on exact-dedup representatives ([[textReps]]): verbatim
    * copies never re-verify (their similarity is 1 by construction —
    * that's #27's job), so the pair join is quadratic only in
    * distinct texts per bucket, and a corpus whose duplicate
    * clusters deepen 10× costs the same as its distinct core.
    * `n_doc_pairs` reports how many underlying document pairs each
    * representative pair stands for.
    */
  def dedupNgramJaccard(spark: SparkSession, dir: String, threshold: Double = 0.8): DataFrame = {
    // checkpointed: the self-join would otherwise re-execute the rep
    // collapse (text shuffle + tokenization) once per side
    val docs = textReps(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_copies"),
        floor(col("n_chars") / 100).cast("long").as("len_band"),
        array_sort(array_distinct(tokensCol(col("text")))).as("tokset"))
      // columnar pin, released via CachePins.release(): the self-join /
      // verify join consumes this frame per side, and the InMemoryRelation
      // (compressed text + token arrays, pruned scans) measured 2.3x faster
      // than a lazy localCheckpoint across this family - see CachePins doc
      .transform(CachePins.pin)
    val a = docs.as("a")
    val b = docs.as("b")
    a.join(b, col("a.lang") === col("b.lang") &&
        col("a.len_band") === col("b.len_band") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        round(jaccard_sorted(col("a.tokset"), col("b.tokset")), 4).as("jaccard"),
        (col("a.n_copies") * col("b.n_copies")).as("n_doc_pairs"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** §2.3 `dedup_threshold_sweep` — the dedup tuning curve: surviving
    * pair count and affected-document count at Jaccard thresholds
    * {0.5, 0.7, 0.8, 0.9}, from ONE pass of exact similarities over
    * the (lang, length-band)-blocked candidate pairs. Thresholds are
    * swept over the already-scored pair set (a broadcast 4-row grid),
    * so choosing the production threshold costs one blocked join, not
    * four. This is how a pipeline picks its dedup aggressiveness:
    * pairs removed vs corpus retained at each setting.
    */
  def dedupThresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // exact-dedup representatives: the pair join is quadratic only in
    // distinct texts per bucket; verbatim-copy pairs (similarity 1,
    // surviving every threshold) are counted in closed form from the
    // copy multiplicities, never re-verified pairwise.
    val docs = textReps(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_copies"),
        floor(col("n_chars") / 100).cast("long").as("len_band"),
        array_sort(array_distinct(tokensCol(col("text")))).as("tokset"))
      // columnar pin: see CachePins / dedupNgramJaccard note
      .transform(CachePins.pin)
    val pairs = docs.as("a")
      .join(docs.as("b"), col("a.lang") === col("b.lang") &&
        col("a.len_band") === col("b.len_band") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_copies").as("na"), col("b.n_copies").as("nb"),
        round(jaccard_sorted(col("a.tokset"), col("b.tokset")), 4).as("jaccard"))
      // columnar pin: see CachePins / dedupNgramJaccard note
      .transform(CachePins.pin)
    val th = Seq(0.5, 0.7, 0.8, 0.9).toDF("threshold")
    val surviving = pairs.crossJoin(broadcast(th))
      .filter(col("jaccard") >= col("threshold"))
      // columnar pin: see CachePins / dedupNgramJaccard note
      .transform(CachePins.pin)
    val nPairs = surviving.groupBy(col("threshold"))
      .agg(sum(col("na") * col("nb")).as("cross_pairs"))
    // internal verbatim pairs: C(n,2) per multi-copy group, at every
    // threshold; their doc involvement unions with the cross side so
    // no document is double-counted
    val intStats = docs.filter(col("n_copies") > 1)
      .agg(coalesce(sum(expr("n_copies * (n_copies - 1) div 2")), lit(0L))
        .as("int_pairs"))
    val crossInv = surviving.select(col("threshold"),
      explode(array(
        struct(col("doc_a").as("doc_id"), col("na").as("n")),
        struct(col("doc_b").as("doc_id"), col("nb").as("n")))).as("r"))
      .select(col("threshold"), col("r.doc_id"), col("r.n"))
    val multiInv = docs.filter(col("n_copies") > 1)
      .select(col("doc_id"), col("n_copies").as("n"))
      .crossJoin(broadcast(th))
      .select(col("threshold"), col("doc_id"), col("n"))
    val nDocs = crossInv.union(multiInv)
      .groupBy(col("threshold"), col("doc_id")).agg(max(col("n")).as("n"))
      .groupBy(col("threshold")).agg(sum(col("n")).as("n_dup_docs"))
    th.join(nPairs, Seq("threshold"), "left_outer")
      .join(nDocs, Seq("threshold"), "left_outer")
      .crossJoin(broadcast(intStats))
      .select(col("threshold"),
        (coalesce(col("cross_pairs"), lit(0L)) + col("int_pairs")).as("n_pairs"),
        coalesce(col("n_dup_docs"), lit(0L)).as("n_dup_docs"))
      .orderBy(col("threshold"))
  }

  // ---- SimHash ----

  /** §2.3#31 — 32-bit SimHash fingerprint. Bit k of the fingerprint
    * is the sign of the token-frequency-weighted vote on bit k of
    * each token's md5 (bits read straight off hex nibbles, so the
    * oracle reproduces them without any hex→int conversion). Near-dup
    * candidates are then docs whose fingerprints share a 16-bit half
    * (hamming-band blocking) — see [[simhashCandidatePairs]].
    *
    * Computed by the native [[graft.functions.SimHash32]] expression:
    * one md5 per token and all 32 votes in a single pass (the
    * equivalent 32-filter HOF formulation measured ~40× slower).
    */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("doc_id"), simhash32(tokensCol(col("text"))).as("simhash32"))
      .orderBy(col("doc_id"))

  /** §2.3#59 — group-level MinHash sketches: one k-signature sketch
    * per language over every member document's shingles, computed by
    * the mergeable [[graft.functions.MinHashAgg]] imperative
    * aggregate (map-side partial sketches, tiny merge buffers).
    */
  def dedupMinhashByLang(spark: SparkSession, dir: String): DataFrame =
    Tables.rebalanced(Tables.documents(spark, dir))
      .select(col("lang"), tokensCol(col("text")).as("toks"))
      .select(col("lang"), shinglesOf(col("toks")).as("sh"))
      .groupBy(col("lang"))
      .agg(minhash_agg(col("sh"), MinhashK).as("sigs"))
      .select(col("lang") +:
        (0 until MinhashK).map(k => element_at(col("sigs"), k + 1).as(s"sig$k")): _*)
      .orderBy(col("lang"))

  /** §2.3#89 — the full near-dup pipeline in one plan: exact-dedup
    * rep collapse → LSH candidate generation (linear band join) →
    * exact Jaccard verification only on cross-rep candidates. This is
    * the production composition — verbatim-copy pairs (similarity 1 by
    * construction, #27's job) never re-verify, and `n_doc_pairs`
    * carries how many underlying document pairs each verified rep pair
    * stands for, so the verify join is quadratic only in the DISTINCT
    * near-dup core.
    */
  def dedupPipelineVerified(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val reps = textReps(spark, dir)
      .select(col("doc_id"), col("text"), col("n_copies"))
      // columnar pin: see CachePins / dedupNgramJaccard note
      .transform(CachePins.pin)
    val cand = minhashCandidatePairsOf(minhashSignaturesOf(reps))
    val toks = reps.select(col("doc_id"), col("n_copies"),
      array_sort(array_distinct(tokensCol(col("text")))).as("tokset"))
    cand
      .join(toks.select(col("doc_id").as("doc_a"), col("tokset").as("ta"),
        col("n_copies").as("na")), Seq("doc_a"))
      .join(toks.select(col("doc_id").as("doc_b"), col("tokset").as("tb"),
        col("n_copies").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(jaccard_sorted(col("ta"), col("tb")), 4).as("jaccard"),
        (col("na") * col("nb")).as("n_doc_pairs"))
      .filter(col("jaccard") >= threshold)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Shared reps CTE for the rep-collapsed oracles — the SQL twin of
    * [[textReps]] (grouped by text AND the carried metadata).
    */
  def repsOracleCte: String =
    """reps AS (SELECT min(doc_id) AS doc_id,
      |  CAST(count(*) AS BIGINT) AS n_copies, text, lang, n_chars
      |  FROM documents GROUP BY text, lang, n_chars)""".stripMargin

  /** DuckDB oracle for [[dedupPipelineVerified]] (rep-collapsed). */
  def pipelineVerifiedOracleSql: String =
    "WITH " + repsOracleCte + ",\n" + candOracleBodyFrom("reps") + """,
      |tok AS (SELECT doc_id, list_distinct(toks) AS tokset FROM t)
      |SELECT doc_a, doc_b, jaccard, n_doc_pairs FROM (
      |  SELECT doc_a, doc_b,
      |    round(CAST(len(list_filter(ta.tokset, x -> list_contains(tb.tokset, x))) AS DOUBLE)
      |      / CAST(len(list_distinct(list_concat(ta.tokset, tb.tokset))) AS DOUBLE), 4) AS jaccard,
      |    ca.n_copies * cb.n_copies AS n_doc_pairs
      |  FROM cand JOIN tok ta ON cand.doc_a = ta.doc_id
      |    JOIN tok tb ON cand.doc_b = tb.doc_id
      |    JOIN reps ca ON cand.doc_a = ca.doc_id
      |    JOIN reps cb ON cand.doc_b = cb.doc_id)
      |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin

  /** DuckDB oracle for [[dedupMinhashByLang]]. */
  def minhashByLangOracleSql: String = {
    val sigExprs = (0 until MinhashK).map { k =>
      s"min(md5('$k|' || sh)) AS sig$k"
    }.mkString(",\n  ")
    s"""WITH t AS (SELECT lang, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
       |s AS (SELECT lang, unnest(list_transform(range(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS sh FROM t)
       |SELECT lang,
       |  $sigExprs
       |FROM s GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** DuckDB oracle for [[dedupMinhashLsh]] — the identical md5-based
    * signature/band construction in list-function SQL. Generated here
    * so the seed count and band layout stay in lockstep with the
    * Spark implementation.
    */
  def minhashLshOracleSql: String = {
    val sigExprs = (0 until MinhashK).map { k =>
      s"list_aggregate(list_transform(sh, x -> md5('$k|' || x)), 'min') AS sig$k"
    }.mkString(",\n  ")
    val bandSelects = (0 until LshBands).map { b =>
      val cat = (0 until 3).map(r => s"sig${3 * b + r}").mkString(" || ")
      s"SELECT doc_id, CAST($b AS BIGINT) AS band_idx, md5($cat) AS band_hash FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
       |s AS (SELECT doc_id, list_transform(range(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS sh FROM t),
       |sig AS (SELECT doc_id,
       |  $sigExprs
       |  FROM s),
       |bands AS ($bandSelects),
       |buckets AS (SELECT band_idx, band_hash, count(*) AS bucket_size FROM bands GROUP BY band_idx, band_hash)
       |SELECT band_idx, count(*) AS n_buckets,
       |  CAST(max(bucket_size) AS BIGINT) AS max_bucket,
       |  CAST(sum(CASE WHEN bucket_size > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_collision_buckets
       |FROM buckets GROUP BY band_idx ORDER BY band_idx""".stripMargin
  }

  /** DuckDB oracle for [[dedupSimhash]] — same hex-nibble bit votes,
    * generated so the 32 membership sets match the Scala side.
    */
  def simhashOracleSql: String = {
    val nibbleSets = Seq("89abcdef", "4567cdef", "2367abef", "13579bdf")
    val bitExprs = (0 until 32).map { k =>
      val pos = k / 4 + 1
      val tests = nibbleSets(k % 4).map(c => s"substr(x, $pos, 1) = '$c'").mkString(" OR ")
      s"(CASE WHEN 2 * len(list_filter(hs, x -> $tests)) > n THEN '1' ELSE '0' END)"
    }.mkString(" ||\n  ")
    s"""WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
       |h AS (SELECT doc_id, len(toks) AS n, list_transform(toks, x -> md5(x)) AS hs FROM t)
       |SELECT doc_id,
       |  $bitExprs AS simhash32
       |FROM h ORDER BY doc_id""".stripMargin
  }

  /** Hamming-band candidates: docs sharing either 16-bit half of the
    * fingerprint (pigeonhole: hamming distance ≤ 1 guarantees a
    * shared half). Bucket join, linear. Like [[minhashCandidatePairs]]
    * this is the full-corpus reference form; a scale consumer
    * collapses identical fingerprints first (the candidate relation
    * is a pure function of the fingerprint — the
    * [[graft.multimodal.Media.mmPhashDedup]] pattern).
    */
  def simhashCandidatePairs(spark: SparkSession, dir: String): DataFrame = {
    val fp = dedupSimhash(spark, dir)
      .select(col("doc_id"),
        explode(array(
          concat(lit("L"), substring(col("simhash32"), 1, 16)),
          concat(lit("H"), substring(col("simhash32"), 17, 16)))).as("half"))
    val a = fp.as("a")
    val b = fp.as("b")
    a.join(b, col("a.half") === col("b.half") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** §2.3#169 — quality-aware survivor selection: within each
    * near-dup cluster keep the HIGHEST-quality document, not the
    * smallest id — the policy real corpus dedup uses (drop the
    * boilerplate-ridden copy, keep the clean one). Composition of
    * the CC clusters and the quality score: one join plus a single
    * partial-agg groupBy — the survivor falls out of a lexicographic
    * max-of-struct, so there is no per-cluster sort/window pass.
    */
  def dedupQualitySurvivors(spark: SparkSession, dir: String): DataFrame = {
    // clustering runs on the collapsed graph (no clique edges); the
    // quality pass stays per-document — one narrow scoring scan and a
    // doc_id-keyed join, linear at any duplicate depth
    val g = candGraph(spark, dir)
    val perDocCluster = g.docMap
      .join(repClusterLabels(g.nodes, g.edges).withColumnRenamed("doc_id", "rep_id"),
        Seq("rep_id"))
      .select(col("doc_id"), col("cluster_id"))
    val quality = graft.text.TextAnalysis.textQuality(spark, dir)
      .select(col("doc_id"), col("quality_score"))
    // survivor = max of ONE packed long inside the groupBy the
    // readout needs anyway — no per-cluster sort/window pass. The
    // quality score is already quantized to 4 decimals, so
    // (q·10⁴) ≤ 10⁴ in the high bits and an inverted doc id in the
    // low 40 bits give "max quality, then min id" as a plain long
    // max. (A max-of-struct does the same but falls off the hash-agg
    // fast path into SortAggregate — measured 30% slower; the packed
    // key keeps both aggregate passes in whole-stage codegen.)
    val M = (1L << 40) - 1 // doc ids fit 40 bits; key ≤ 10⁴·2⁴⁰ < 2⁵⁴
    perDocCluster.join(quality, Seq("doc_id"))
      .withColumn("skey",
        round(col("quality_score") * 10000).cast("long") * (M + 1) +
          (lit(M) - col("doc_id")))
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"),
        max(col("skey")).as("k"),
        max(col("quality_score")).as("survivor_quality"))
      .select(col("cluster_id"), col("cluster_size"),
        (lit(M) - (col("k") % (M + 1))).as("survivor_doc"),
        col("survivor_quality"))
      .orderBy(col("cluster_id"))
  }

  /** DuckDB oracle for [[dedupQualitySurvivors]]. */
  def qualitySurvivorsOracleSql: String =
    ccOracleCtes + """,
      |lab AS (SELECT doc_id, min(r) AS cluster_id FROM reach GROUP BY doc_id),
      |tq AS (SELECT doc_id,
      |  CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) AS ntoks,
      |  CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
      |    x -> x = 'the' OR x = 'a')) AS DOUBLE) AS stophits
      |  FROM documents),
      |q AS (SELECT doc_id,
      |  round((1.0 - stophits / ntoks) * least(1.0, ntoks / 50.0), 4) AS quality_score
      |  FROM tq),
      |rk AS (SELECT lab.doc_id AS doc_id, cluster_id, quality_score,
      |  row_number() OVER (PARTITION BY cluster_id
      |    ORDER BY quality_score DESC, lab.doc_id) AS rnk
      |  FROM lab JOIN q ON lab.doc_id = q.doc_id)
      |SELECT cluster_id, count(*) AS cluster_size,
      |  CAST(min(CASE WHEN rnk = 1 THEN doc_id END) AS BIGINT) AS survivor_doc,
      |  max(quality_score) AS survivor_quality
      |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin

  /** §2.3#170 — asymmetric containment on the LSH candidates:
    * |A∩B| / min(|A|,|B|) over exact distinct shingle sets — the
    * sub-document-duplication signal Jaccard misses (a doc fully
    * embedded in a larger one has low Jaccard but containment 1).
    * The set intersection runs ONLY on candidate pairs, never
    * all-pairs.
    */
  def dedupContainment(spark: SparkSession, dir: String): DataFrame = {
    // exact-dedup representatives first: LSH + the per-pair set
    // intersection run over distinct texts only, so cloned duplicate
    // clusters cost their distinct core, not its square; n_doc_pairs
    // carries the underlying pair multiplicity
    val reps = textReps(spark, dir)
      .select(col("doc_id"), col("text"), col("n_copies"))
      // columnar pin: see CachePins / dedupNgramJaccard note
      .transform(CachePins.pin)
    val docs = reps
      .select(col("doc_id"), col("n_copies"), tokensCol(col("text")).as("toks"))
      .select(col("doc_id"), col("n_copies"),
        array_sort(array_distinct(shinglesOf(col("toks")))).as("sh"))
    minhashCandidatePairsOf(minhashSignaturesOf(reps))
      .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sha"),
        col("n_copies").as("na")), Seq("doc_a"))
      .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("shb"),
        col("n_copies").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        size(col("sha")).cast("long").as("n_a"),
        size(col("shb")).cast("long").as("n_b"),
        size(array_intersect(col("sha"), col("shb"))).cast("long").as("n_common"),
        (col("na") * col("nb")).as("n_doc_pairs"))
      .withColumn("containment",
        // exact-count quotient, emitted unrounded (tie-attractor rule)
        when(least(col("n_a"), col("n_b")) > 0,
          col("n_common").cast("double") / least(col("n_a"), col("n_b")))
          .otherwise(lit(1.0)))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"),
        col("n_common"), col("containment"), col("n_doc_pairs"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** §2.3#285 — MinHash calibration curve: signature-agreement
    * estimate vs EXACT n-gram Jaccard on the LSH candidate pairs,
    * bucketed by agreeing-signature count (0..12 — an integer axis,
    * no float banding). This is the readout that says whether k=12
    * signatures estimate similarity well enough for the chosen
    * threshold, before trusting the estimate at 100 TB. Runs on
    * exact-dedup representatives like the other verification ops;
    * the per-bucket mean of exact Jaccard is computed from
    * round(j·10⁴) exact longs, so no float fold-order drift.
    */
  def dedupMinhashCalibration(spark: SparkSession, dir: String): DataFrame = {
    val reps = textReps(spark, dir).select(col("doc_id"), col("text"))
      // columnar pin: see CachePins / dedupNgramJaccard note
      .transform(CachePins.pin)
    val toks = reps.select(col("doc_id"), tokensCol(col("text")).as("toks"))
    val sigSets = toks.select(col("doc_id"),
      minhash_sigs(shinglesOf(col("toks")), MinhashK).as("sigs"),
      array_sort(array_distinct(shinglesOf(col("toks")))).as("sh"))
    minhashCandidatePairsOf(minhashSignaturesOf(reps))
      .join(sigSets.select(col("doc_id").as("doc_a"), col("sigs").as("siga"),
        col("sh").as("sha")), Seq("doc_a"))
      .join(sigSets.select(col("doc_id").as("doc_b"), col("sigs").as("sigb"),
        col("sh").as("shb")), Seq("doc_b"))
      .select(
        aggregate(zip_with(col("siga"), col("sigb"),
          (a, b) => when(a === b, 1L).otherwise(0L)), lit(0L), _ + _)
          .as("n_agree"),
        // empty-shingle guard (both texts < 3 tokens): the Jaccard of
        // two empty sets is taken as 1 — identical-by-vacuity, the
        // same convention dedupContainment uses — instead of a NULL
        // (Spark 0/0) that would silently drop the pair from the mean
        // while still counting it, or an engine-divergent NaN cast.
        when(size(array_distinct(concat(col("sha"), col("shb")))) > 0,
          round(
            size(array_intersect(col("sha"), col("shb"))).cast("double") /
              size(array_distinct(concat(col("sha"), col("shb")))).cast("double")
              * 10000).cast("long"))
          .otherwise(lit(10000L)).as("jac_scaled"))
      .groupBy(col("n_agree"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("jac_scaled")).as("jsum"))
      .select(col("n_agree"),
        // both outputs are exact-integer quotients (n_agree/12 and
        // (jsum/n_pairs)/10⁴ — two correctly-rounded divisions in the
        // same order on both engines): emitted unrounded
        (col("n_agree").cast("double") / MinhashK).as("est_jaccard"),
        col("n_pairs"),
        (col("jsum").cast("double") / col("n_pairs") / 10000.0)
          .as("mean_exact_jaccard"))
      .orderBy(col("n_agree"))
  }

  /** DuckDB oracle for [[dedupContainment]] (representative-collapsed). */
  def containmentOracleSql: String =
    "WITH " + repsOracleCte + ",\n" + candOracleBodyFrom("reps") + """,
      |sets AS (SELECT doc_id, list_sort(list_distinct(sh)) AS shs FROM s)
      |SELECT doc_a, doc_b,
      |  CAST(len(a.shs) AS BIGINT) AS n_a,
      |  CAST(len(b.shs) AS BIGINT) AS n_b,
      |  CAST(len(list_intersect(a.shs, b.shs)) AS BIGINT) AS n_common,
      |  CASE WHEN least(len(a.shs), len(b.shs)) > 0
      |       THEN CAST(len(list_intersect(a.shs, b.shs)) AS DOUBLE)
      |                  / least(len(a.shs), len(b.shs))
      |       ELSE 1.0 END AS containment,
      |  ca.n_copies * cb.n_copies AS n_doc_pairs
      |FROM cand JOIN sets a ON cand.doc_a = a.doc_id
      |JOIN sets b ON cand.doc_b = b.doc_id
      |JOIN reps ca ON cand.doc_a = ca.doc_id
      |JOIN reps cb ON cand.doc_b = cb.doc_id
      |ORDER BY doc_a, doc_b""".stripMargin

  // ---- Incremental (daily-drop) dedup ----

  /** Band explode of a [[minhashSignaturesOf]] frame:
    * (doc_id, band_idx, band_hash).
    */
  private def bandsOf(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      explode(map((0 until LshBands).flatMap(b =>
        Seq(lit(b).cast("long"), col(s"band$b"))): _*))
        .as(Seq("band_idx", "band_hash")))

  /** §2.3 `dedup_incremental` — dedup of a NEW shard against an
    * EXISTING deduped corpus, the daily-drop shape of a production
    * 100 TB pipeline (and the dedup twin of `sync_diff_upload`'s
    * full-vs-incremental split, cf. the reference's
    * `isAFullBackupNeeded`, `bin/cassandra-syncer:154`): the standing
    * corpus is indexed ONCE — an exact-digest table plus LSH
    * band-bucket table over its text representatives — and each
    * arriving shard probes that index instead of re-running dedup
    * corpus-wide.
    *
    * The delta here is the deterministic `doc_id % 7 == 3` slice (the
    * driver-checkable stand-in for "today's drop"); everything else is
    * the base corpus. Per delta doc the verdict is:
    *   - `exact` — its normalized-content digest already exists in the
    *     base (matched_doc = the base cluster's keeper);
    *   - `near`  — no exact hit, but an LSH band probe into the base
    *     bucket table finds a base rep whose token-set Jaccard clears
    *     the threshold (matched_doc = smallest such base doc);
    *   - `new`   — neither; the doc enters the corpus (and, in
    *     production, its digest + bands append to the index).
    *
    * Scale shape: index build is one text-keyed shuffle over the base
    * (in production it is PERSISTED and amortized across drops — the
    * lazy checkpoints below stand in for that materialization);
    * the per-drop cost is |delta| digest lookups + |delta|·bands
    * bucket probes + Jaccard verification on matched buckets only.
    * Nothing rescans the base corpus per drop, and nothing is
    * quadratic in either side.
    */
  /** The standing dedup index a production drop pipeline persists:
    * exact digests (with each cluster's keeper), LSH band buckets
    * over the base's text representatives, and the reps' token sets
    * for Jaccard verification.
    */
  private[graft] case class DedupIndex(digests: DataFrame, bands: DataFrame,
      toks: DataFrame)

  /** Build the standing index from a base corpus (one text-keyed
    * shuffle; in production it is PERSISTED and amortized across
    * drops — the lazy checkpoints stand in for that materialization,
    * and [[dedupIncrementalStreamQuery]] does materialize it).
    */
  private[graft] def buildDedupIndex(base: DataFrame): DedupIndex = {
    val baseDigests = base
      .groupBy(md5(lower(col("text"))).as("digest"))
      .agg(min(col("doc_id")).as("exact_keeper"))
      .cutLineage(eager = false)
    // near-dup side collapses to one rep per distinct text: band
    // buckets and token-set Jaccard are functions of the text, so
    // probing reps is equivalent to probing every base doc — with the
    // rep keyed by its cluster-min doc_id the min-matching-doc
    // readout is also preserved exactly
    val baseReps = base.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .cutLineage(eager = false)
    val baseBands = bandsOf(minhashSignaturesOf(baseReps))
      .cutLineage(eager = false)
    val baseToks = baseReps
      .select(col("doc_id").as("b_id"),
        array_sort(array_distinct(tokensCol(col("text")))).as("btok"))
      .cutLineage(eager = false)
    DedupIndex(baseDigests, baseBands, baseToks)
  }

  /** One drop's probe of the standing index — |delta| digest lookups
    * + |delta|·bands bucket probes + Jaccard verification on matched
    * buckets only; nothing rescans the base corpus and nothing is
    * quadratic in either side. Returns (doc_id, digest, verdict,
    * matched_doc); the digest column is what the streaming twin
    * appends back into the index for accepted docs.
    */
  private[graft] def probeDedupIndex(delta: DataFrame, idx: DedupIndex,
      threshold: Double): DataFrame = {
    val withDigest = delta
      .select(col("doc_id"), col("text"), md5(lower(col("text"))).as("digest"))
      .join(idx.digests, Seq("digest"), "left_outer")
      .cutLineage(eager = false)
    val unmatched = withDigest.filter(col("exact_keeper").isNull)
      .select(col("doc_id"), col("text"))
    val cands = bandsOf(minhashSignaturesOf(unmatched))
      .withColumnRenamed("doc_id", "d_id")
      .join(idx.bands.select(col("doc_id").as("b_id"),
        col("band_idx"), col("band_hash")), Seq("band_idx", "band_hash"))
      .select(col("d_id"), col("b_id")).distinct()
    val dtoks = unmatched.select(col("doc_id").as("d_id"),
      array_sort(array_distinct(tokensCol(col("text")))).as("dtok"))
    val near = cands
      .join(dtoks, Seq("d_id"))
      .join(idx.toks, Seq("b_id"))
      .filter(round(jaccard_sorted(col("dtok"), col("btok")), 4) >= threshold)
      .groupBy(col("d_id")).agg(min(col("b_id")).as("near_keeper"))
    withDigest.select(col("doc_id"), col("digest"), col("exact_keeper"))
      .join(near.withColumnRenamed("d_id", "doc_id"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("digest"),
        when(col("exact_keeper").isNotNull, lit("exact"))
          .when(col("near_keeper").isNotNull, lit("near"))
          .otherwise(lit("new")).as("verdict"),
        coalesce(col("exact_keeper"), col("near_keeper")).as("matched_doc"))
  }

  /** Build-once materialized store for the STANDING dedup index of
    * `dir`'s base corpus (doc_id % 7 != 3) — r15 optimization: both
    * `dedup_incremental` and `stream_dedup_incremental` rebuilt the
    * identical index (digest group-by + rep collapse + signature scan
    * + band explode + token sets) per entry, ~1.5 s apiece at sf0.1,
    * and the docstrings had always said "in production it is
    * PERSISTED and amortized across drops". Now it actually is: first
    * consumer writes digests/bands/toks parquet once per (JVM,
    * corpus), later consumers scan them (guide §2.4). mode(overwrite)
    * + per-JVM memo: a fresh JVM always rebuilds from the parquet
    * inputs, nothing persists across bench/verify invocations.
    */
  private val dedupIdxBuilt =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private[graft] def dedupIndexStore(spark: SparkSession, dir: String): String =
    dedupIdxBuilt.computeIfAbsent(dir, d => {
      val p = "/tmp/graft_dedupidx_" +
        d.replaceAll("[^a-zA-Z0-9._-]", "_") + "_" +
        Integer.toHexString(d.hashCode)
      graft.TmpDirs.cleanupOnExit(java.nio.file.Paths.get(p))
      val base = Tables.rebalanced(Tables.documents(spark, d))
        .filter(col("doc_id") % 7 =!= 3)
      val idx = buildDedupIndex(base)
      idx.digests.write.mode("overwrite").parquet(s"$p/digests")
      idx.bands.write.mode("overwrite").parquet(s"$p/bands")
      idx.toks.write.mode("overwrite").parquet(s"$p/toks")
      p
    })

  private[graft] def storedDedupIndex(spark: SparkSession, dir: String): DedupIndex = {
    val p = dedupIndexStore(spark, dir)
    DedupIndex(spark.read.parquet(s"$p/digests"),
      spark.read.parquet(s"$p/bands"), spark.read.parquet(s"$p/toks"))
  }

  def dedupIncremental(spark: SparkSession, dir: String, threshold: Double = 0.5): DataFrame = {
    val docs = Tables.rebalanced(Tables.documents(spark, dir))
    val delta = docs.filter(col("doc_id") % 7 === 3)
    probeDedupIndex(delta, storedDedupIndex(spark, dir), threshold)
      .select(col("doc_id"), col("verdict"), col("matched_doc"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[dedupIncremental]] — identical split, digest,
    * signature/band and token-set Jaccard construction; the near probe
    * runs only for delta docs with no exact hit, like the engine.
    */
  private def incrSigExprs: String = (0 until MinhashK).map { k =>
    s"list_aggregate(list_transform(sh, x -> md5('$k|' || x)), 'min') AS sig$k"
  }.mkString(",\n  ")
  private def incrBandSelects(sigCte: String): String = (0 until LshBands).map { b =>
    val cat = (0 until 3).map(r => s"sig${3 * b + r}").mkString(" || ")
    s"SELECT doc_id, CAST($b AS BIGINT) AS band_idx, md5($cat) AS band_hash FROM $sigCte"
  }.mkString("\n  UNION ALL ")

  def incrementalOracleSql(threshold: Double = 0.5): String = {
    val sigExprs = incrSigExprs
    def bandSelects(sigCte: String) = incrBandSelects(sigCte)
    s"""WITH base AS (SELECT * FROM documents WHERE doc_id % 7 <> 3),
       |delta AS (SELECT * FROM documents WHERE doc_id % 7 = 3),
       |bdig AS (SELECT md5(lower(text)) AS digest, min(doc_id) AS exact_keeper
       |  FROM base GROUP BY 1),
       |brep AS (SELECT text, min(doc_id) AS doc_id FROM base GROUP BY text),
       |bt AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM brep),
       |bs AS (SELECT doc_id, list_transform(range(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS sh FROM bt),
       |bsig AS MATERIALIZED (SELECT doc_id,
       |  $sigExprs
       |  FROM bs),
       |bbands AS MATERIALIZED (${bandSelects("bsig")}),
       |btok AS MATERIALIZED (SELECT brep.doc_id AS b_id,
       |  list_distinct(bt.toks) AS btok FROM brep JOIN bt USING (doc_id)),
       |dd AS (SELECT d.doc_id, d.text, bdig.exact_keeper
       |  FROM (SELECT doc_id, text, md5(lower(text)) AS digest FROM delta) d
       |  LEFT JOIN bdig USING (digest)),
       |unm AS (SELECT doc_id, text FROM dd WHERE exact_keeper IS NULL),
       |dt AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM unm),
       |ds AS (SELECT doc_id, list_transform(range(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS sh FROM dt),
       |dsig AS MATERIALIZED (SELECT doc_id,
       |  $sigExprs
       |  FROM ds),
       |dbands AS (${bandSelects("dsig")}),
       |cand AS (SELECT DISTINCT d.doc_id AS d_id, b.doc_id AS b_id
       |  FROM dbands d JOIN bbands b
       |    ON d.band_idx = b.band_idx AND d.band_hash = b.band_hash),
       |nearm AS (SELECT d_id AS doc_id, min(b_id) AS near_keeper FROM cand
       |  JOIN (SELECT doc_id AS d_id, list_distinct(toks) AS dtok FROM dt) USING (d_id)
       |  JOIN btok USING (b_id)
       |  WHERE round(CAST(len(list_filter(dtok, x -> list_contains(btok, x))) AS DOUBLE)
       |    / CAST(len(list_distinct(list_concat(dtok, btok))) AS DOUBLE), 4) >= $threshold
       |  GROUP BY d_id)
       |SELECT dd.doc_id,
       |  CASE WHEN dd.exact_keeper IS NOT NULL THEN 'exact'
       |       WHEN nearm.near_keeper IS NOT NULL THEN 'near'
       |       ELSE 'new' END AS verdict,
       |  coalesce(dd.exact_keeper, nearm.near_keeper) AS matched_doc
       |FROM dd LEFT JOIN nearm USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** DuckDB oracle for [[dedupIncrementalStreamQuery]]: the
    * closed-form of the sequential replay. Identical base index CTEs
    * as [[incrementalOracleSql]]; the delta additionally carries its
    * ntile drop_id, and docs with neither a base exact hit nor a
    * near match resolve by digest group — min doc_id is 'new', the
    * rest are 'exact' against that keeper. Because drops are
    * doc_id-ordered slices and same-digest docs share near status,
    * this equals the stream's land/drain sequence exactly (argued in
    * the operator's scaladoc).
    */
  def incrementalStreamOracleSql(threshold: Double = 0.5): String = {
    val sigExprs = incrSigExprs
    def bandSelects(sigCte: String) = incrBandSelects(sigCte)
    s"""WITH base AS (SELECT * FROM documents WHERE doc_id % 7 <> 3),
       |delta AS (SELECT doc_id, text,
       |  CAST(ntile(3) OVER (ORDER BY doc_id) - 1 AS BIGINT) AS drop_id
       |  FROM documents WHERE doc_id % 7 = 3),
       |bdig AS (SELECT md5(lower(text)) AS digest, min(doc_id) AS exact_keeper
       |  FROM base GROUP BY 1),
       |brep AS (SELECT text, min(doc_id) AS doc_id FROM base GROUP BY text),
       |bt AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM brep),
       |bs AS (SELECT doc_id, list_transform(range(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS sh FROM bt),
       |bsig AS MATERIALIZED (SELECT doc_id,
       |  $sigExprs
       |  FROM bs),
       |bbands AS MATERIALIZED (${bandSelects("bsig")}),
       |btok AS MATERIALIZED (SELECT brep.doc_id AS b_id,
       |  list_distinct(bt.toks) AS btok FROM brep JOIN bt USING (doc_id)),
       |dd AS (SELECT d.doc_id, d.text, d.drop_id, d.digest, bdig.exact_keeper
       |  FROM (SELECT doc_id, text, drop_id, md5(lower(text)) AS digest FROM delta) d
       |  LEFT JOIN bdig USING (digest)),
       |unm AS (SELECT doc_id, text FROM dd WHERE exact_keeper IS NULL),
       |dt AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM unm),
       |ds AS (SELECT doc_id, list_transform(range(1, len(toks) - 1),
       |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS sh FROM dt),
       |dsig AS MATERIALIZED (SELECT doc_id,
       |  $sigExprs
       |  FROM ds),
       |dbands AS (${bandSelects("dsig")}),
       |cand AS (SELECT DISTINCT d.doc_id AS d_id, b.doc_id AS b_id
       |  FROM dbands d JOIN bbands b
       |    ON d.band_idx = b.band_idx AND d.band_hash = b.band_hash),
       |nearm AS (SELECT d_id AS doc_id, min(b_id) AS near_keeper FROM cand
       |  JOIN (SELECT doc_id AS d_id, list_distinct(toks) AS dtok FROM dt) USING (d_id)
       |  JOIN btok USING (b_id)
       |  WHERE round(CAST(len(list_filter(dtok, x -> list_contains(btok, x))) AS DOUBLE)
       |    / CAST(len(list_distinct(list_concat(dtok, btok))) AS DOUBLE), 4) >= $threshold
       |  GROUP BY d_id),
       |rem AS (SELECT dd.doc_id, dd.digest FROM dd LEFT JOIN nearm USING (doc_id)
       |  WHERE dd.exact_keeper IS NULL AND nearm.near_keeper IS NULL),
       |grp AS (SELECT digest, min(doc_id) AS keeper FROM rem GROUP BY digest)
       |SELECT dd.doc_id, dd.drop_id,
       |  CASE WHEN dd.exact_keeper IS NOT NULL THEN 'exact'
       |       WHEN nearm.near_keeper IS NOT NULL THEN 'near'
       |       WHEN dd.doc_id = grp.keeper THEN 'new'
       |       ELSE 'exact' END AS verdict,
       |  CASE WHEN dd.exact_keeper IS NOT NULL THEN dd.exact_keeper
       |       WHEN nearm.near_keeper IS NOT NULL THEN nearm.near_keeper
       |       WHEN dd.doc_id = grp.keeper THEN NULL
       |       ELSE grp.keeper END AS matched_doc
       |FROM dd LEFT JOIN nearm USING (doc_id) LEFT JOIN grp ON dd.digest = grp.digest
       |ORDER BY dd.doc_id""".stripMargin
  }

  /** §2.7 `stream_dedup_incremental` — the streaming twin of
    * [[dedupIncremental]]: a document ingest stream dedups each
    * micro-batch against a PERSISTED digest+band index, not against
    * watermark-bounded state (`stream_dedup` dedups only WITHIN the
    * watermark; a corpus ingest pipeline must dedup against
    * everything ever accepted). Inside `foreachBatch` each drop
    *   1. probes the index ([[probeDedupIndex]]: |batch| digest
    *      lookups + |batch|·bands bucket probes),
    *   2. resolves intra-batch digest groups (first doc by doc_id is
    *      the keeper, the rest are exact dups of it),
    *   3. appends its verdicts to the sink and the ACCEPTED docs'
    *      digests to the index — so later drops exact-dedup against
    *      earlier accepted docs.
    * Per-batch cost is |batch| probes of a storage-resident table;
    * the index is NOT state-store state because at 100 TB the digest
    * set outgrows any executor-local store — storage + foreachBatch
    * is the production shape (the state-store ops cover the
    * bounded-state families).
    *
    * Band-index updates are deliberately deferred to the nightly
    * compaction (a [[dedupIncremental]] batch run): intra-stream
    * near-dup chaining would make verdicts arrival-order-dependent,
    * while the digest append is order-insensitive (same digest ⇒
    * same text modulo case ⇒ same verdict class), so every verdict
    * is deterministic and the oracle is closed-form. Drops here are
    * the three doc_id-ordered ntile slices of the delta landed and
    * drained one `Trigger.AvailableNow` run at a time (the
    * checkpoint's seen-files log is the cursor) — fixture
    * construction; in production drops arrive as real files.
    */
  def dedupIncrementalStreamQuery(spark: SparkSession, dir: String,
      threshold: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.streaming.Trigger
    val docs = Tables.rebalanced(Tables.documents(spark, dir))
    val delta = docs.filter(col("doc_id") % 7 === 3)
    val root = graft.TmpDirs.cleanupOnExit(
      java.nio.file.Files.createTempDirectory("graft-sdedup-"))
    val dropsDir = root.resolve("drops"); java.nio.file.Files.createDirectory(dropsDir)
    val digDir = s"$root/index/digests"
    val sink = s"$root/verdicts"
    val ck = s"$root/ck"
    // nightly-compaction artifact: the standing index, materialized —
    // served from the shared per-corpus store (r15: the batch twin
    // `dedup_incremental` reads the same one; the build happens once
    // per JVM, guide §2.4). Bands/toks are never appended to, so the
    // stream reads them straight from the store; the DIGEST index is
    // append-per-batch, so it gets its own writer-layout root: one
    // subdirectory per writer (`bid_base` + one `bid_<batchId>` per
    // micro-batch), making a RETRIED micro-batch idempotent — it
    // overwrites its own subdir and its index view excludes its own
    // partial output (see the foreachBatch body below).
    val store = dedupIndexStore(spark, dir)
    val bandsDir = s"$store/bands"
    val toksDir = s"$store/toks"
    // the base digests stay in the shared store (no per-run copy into
    // the writer layout); each batch's live view reads store digests
    // plus the per-batch bid_* appends below
    val baseDigests = s"$store/digests"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(digDir))
    // stage the three drops as single files (ntile is fixture-side
    // arrival simulation, not operator work). One checkpointed pass
    // computes the global ntile window; the three per-drop writes
    // read the materialized rows instead of re-running the window
    // sort per drop (r15, guide §1/§2 — was 3× the same single
    // -partition window).
    val wd = Window.orderBy(col("doc_id"))
    val staged = delta.select(col("doc_id"), col("text"),
      (ntile(3).over(wd) - 1).cast("long").as("drop_id"))
      .cutLineage()
    (0 until 3).foreach { k =>
      val stage = s"$root/stage_$k"
      staged.filter(col("drop_id") === k).coalesce(1)
        .write.mode("overwrite").parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_")).get
      java.nio.file.Files.move(part.toPath, root.resolve(s"stage_$k.parquet"))
    }
    val schema = spark.read.parquet(s"$root/stage_0.parquet").schema
    // land all three drops up front with strictly increasing mtimes:
    // ONE AvailableNow query with maxFilesPerTrigger=1 then drains
    // them as three ordered micro-batches (drop k = batch k, exactly
    // the former land/drain/land/drain sequence) while paying one
    // stream startup instead of three (r15; the file source admits
    // oldest-mtime first, and the explicit stamps make that order
    // deterministic even on a coarse-mtime filesystem).
    def land(k: Int): Unit = {
      val landed = dropsDir.resolve(s"drop_$k.parquet")
      java.nio.file.Files.move(root.resolve(s"stage_$k.parquet"), landed)
      java.nio.file.Files.setLastModifiedTime(landed,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + k * 60000L))
    }
    def drain(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dropsDir.toString)
        .writeStream.trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ck)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
          val s = batch.sparkSession
          // idempotent-retry protocol: foreachBatch re-runs a whole
          // batch after any partial failure, and the verdict-sink and
          // digest-index writes below are two non-atomic parquet
          // writes. Both are therefore batch-scoped overwrites
          // (`bid_<batchId>` subdirs) — a retry replaces its own
          // output instead of appending duplicates — and the index
          // view EXCLUDES the current batch's own subdir, so a retry
          // recomputes the same verdicts even if the failed attempt
          // already landed this batch's digests.
          val digFs = new org.apache.hadoop.fs.Path(digDir)
            .getFileSystem(s.sessionState.newHadoopConf())
          val liveDigDirs = baseDigests +: digFs
            .listStatus(new org.apache.hadoop.fs.Path(digDir))
            .filter(_.isDirectory).map(_.getPath.toString)
            .filterNot(_.endsWith(s"/bid_$batchId")).toIndexedSeq
          val liveIdx = DedupIndex(s.read.parquet(liveDigDirs: _*),
            s.read.parquet(bandsDir), s.read.parquet(toksDir))
          val probed = probeDedupIndex(
            batch.select(col("doc_id"), col("text")), liveIdx, threshold)
          // intra-batch digest groups among the would-be-new docs:
          // min doc_id is the keeper, the rest exact-match it
          val grp = probed.filter(col("verdict") === "new")
            .groupBy(col("digest")).agg(min(col("doc_id")).as("keeper"))
          val fin = probed.join(grp, Seq("digest"), "left_outer")
            .select(col("doc_id"), col("digest"),
              when(col("verdict") =!= "new", col("verdict"))
                .when(col("doc_id") === col("keeper"), lit("new"))
                .otherwise(lit("exact")).as("verdict"),
              when(col("verdict") =!= "new", col("matched_doc"))
                .when(col("doc_id") === col("keeper"), lit(null).cast("long"))
                .otherwise(col("keeper")).as("matched_doc"))
            .join(batch.select(col("doc_id"), col("drop_id")), Seq("doc_id"))
            // run-once fence on EXECUTORS (the BackupPipeline ledger
            // pattern): both writes below consume the frozen blocks —
            // the second write appends to digDir, which this plan
            // READS, so it must never recompute
            .cutLineage(eager = true)
          fin.select(col("doc_id"), col("drop_id"), col("verdict"), col("matched_doc"))
            .write.mode("overwrite").parquet(s"$sink/bid_$batchId")
          // accepted docs enter the index: later drops exact-dedup
          // against them with the same one-lookup probe
          fin.filter(col("verdict") === "new")
            .select(col("digest"), col("doc_id").as("exact_keeper"))
            .write.mode("overwrite").parquet(s"$digDir/bid_$batchId")
          ()
        }
        .start()
      q.awaitTermination()
    }
    land(0); land(1); land(2); drain()
    spark.read.option("recursiveFileLookup", "true").parquet(sink)
      .select(col("doc_id"), col("drop_id"), col("verdict"), col("matched_doc"))
      .orderBy(col("doc_id"))
  }

  /** §2.3 `dedup_substring` — exact substring dedup ACROSS documents
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"): a token span of length ≥ n appearing in ≥ 2
    * distinct documents is a duplicated substring; overlapping
    * duplicated windows merge into MAXIMAL duplicated regions, and
    * each document reports its duplicated-region count, covered
    * tokens, longest region, and ppm coverage — the readout the
    * span-removal pass consumes. The published implementation builds
    * a corpus suffix array; the Spark-native equivalent is sorted
    * span-hash runs: every n-token window's md5 keyed by hash is a
    * suffix-array bucket of depth n, and the shuffle IS the sort.
    *
    * Scale: verbatim copies collapse to one representative BEFORE
    * span hashing (the house rep-collapse rule — a 1,250-copy cluster
    * costs one doc of span work, with the copy count folded into the
    * span's document multiplicity), so span volume is Σ tokens over
    * DISTINCT texts — linear. The per-span multiplicity rollup, the
    * dup-position join, and the per-rep region merge are all single
    * hash shuffles; nothing is pairwise. Within-doc repetition alone
    * (multiplicity from one document) does NOT count — that axis is
    * [[graft.text.TextAnalysis.textRepetition]]'s job.
    */
  def dedupSubstring(spark: SparkSession, dir: String, n: Int = 15): DataFrame = {
    // rep-collapse on TOKEN-level identity (the axis spans are hashed
    // over): whitespace variants with identical token streams share
    // every span, so they must share one representative too
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), tokensCol(col("text")).as("toks"))
      .withColumn("digest", md5(array_join(col("toks"), " ")))
    val reps = docs.groupBy(col("digest"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_copies"))
    val repDocs = docs.join(reps.withColumnRenamed("rep_id", "doc_id"), Seq("doc_id", "digest"))
    val spans = repDocs.select(col("doc_id").as("rep_id"), col("n_copies"),
      posexplode(graft.functions.TextFunctions.ngram_span_hashes_pos(col("toks"), n))
        .as(Seq("pos", "h")))
    // a span's document multiplicity: Σ copy-counts over the DISTINCT
    // reps carrying it (≥2 ⇔ the span text lives in ≥2 documents)
    val spanDocs = spans.select(col("h"), col("rep_id"), col("n_copies")).distinct()
      .groupBy(col("h")).agg(sum(col("n_copies")).as("n_docs"))
    val dupPos = spans.join(spanDocs.filter(col("n_docs") >= 2), Seq("h"))
      .select(col("rep_id"), col("pos"))
    // merge OVERLAPPING duplicated windows (start gap ≤ n−1) into
    // maximal regions; union coverage is contiguous by construction
    val wreg = Window.partitionBy(col("rep_id")).orderBy(col("pos"))
    val regions = dupPos
      .withColumn("prev", lag(col("pos"), 1).over(wreg))
      .withColumn("brk",
        when(col("prev").isNull || col("pos") > col("prev") + (n - 1), 1L).otherwise(0L))
      .withColumn("region", sum(col("brk")).over(
        wreg.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("rep_id"), col("region"))
      .agg((max(col("pos")) - min(col("pos")) + n).cast("long").as("region_toks"))
    val perRep = regions.groupBy(col("rep_id"))
      .agg(count(lit(1)).as("n_dup_regions"), sum(col("region_toks")).as("dup_tokens"),
        max(col("region_toks")).as("longest_dup_region"))
    docs.select(col("doc_id"), col("digest"), size(col("toks")).cast("long").as("n_tokens"))
      .join(reps.select(col("digest"), col("rep_id")), Seq("digest"))
      .join(perRep, Seq("rep_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_regions"), lit(0L)).as("n_dup_regions"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("longest_dup_region"), lit(0L)).as("longest_dup_region"))
      .withColumn("dup_ppm", expr("(1000000 * dup_tokens) div n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[dedupSubstring]]: identical rep-collapse,
    * positioned span md5s (the same `md5(toks[i] || ' ' || …)` recipe
    * as the contamination oracle), multiplicity rollup, overlap-merge
    * region windows, and ppm floor-division.
    */
  def dedupSubstringOracleSql(n: Int = 15): String = {
    val spanTerms = (0 until n).map(j => s"toks[i+$j]").mkString(" || ' ' || ")
    s"""WITH t0 AS (SELECT doc_id,
       |  string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
       |t AS (SELECT doc_id, toks, md5(array_to_string(toks, ' ')) AS digest FROM t0),
       |reps AS (SELECT digest, min(doc_id) AS rep_id, count(*) AS n_copies
       |  FROM t GROUP BY digest),
       |rd AS (SELECT r.rep_id, r.n_copies, t.toks FROM reps r
       |  JOIN t ON t.doc_id = r.rep_id),
       |spans AS (SELECT rep_id, n_copies, sp['pos'] AS pos, sp['h'] AS h FROM (
       |  SELECT rep_id, n_copies,
       |    unnest(list_transform(range(1, greatest(len(toks) - ${n - 2}, 1)),
       |      i -> {'pos': i - 1, 'h': md5($spanTerms)})) AS sp
       |  FROM rd)),
       |sd AS (SELECT h, sum(n_copies) AS n_docs FROM (
       |  SELECT DISTINCT h, rep_id, n_copies FROM spans) GROUP BY h),
       |dp AS (SELECT s.rep_id, s.pos FROM spans s JOIN sd USING (h)
       |  WHERE sd.n_docs >= 2),
       |brks AS (SELECT rep_id, pos,
       |    CASE WHEN lag(pos) OVER w IS NULL
       |         OR pos > lag(pos) OVER w + ${n - 1} THEN 1 ELSE 0 END AS brk
       |  FROM dp WINDOW w AS (PARTITION BY rep_id ORDER BY pos)),
       |regs AS (SELECT rep_id, pos,
       |    sum(brk) OVER (PARTITION BY rep_id ORDER BY pos) AS region FROM brks),
       |regions AS (SELECT rep_id, region, max(pos) - min(pos) + $n AS region_toks
       |  FROM regs GROUP BY rep_id, region),
       |pr AS (SELECT rep_id, count(*) AS n_dup_regions,
       |    CAST(sum(region_toks) AS BIGINT) AS dup_tokens,
       |    CAST(max(region_toks) AS BIGINT) AS longest_dup_region
       |  FROM regions GROUP BY rep_id)
       |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(pr.n_dup_regions, 0) AS BIGINT) AS n_dup_regions,
       |  coalesce(pr.dup_tokens, 0) AS dup_tokens,
       |  coalesce(pr.longest_dup_region, 0) AS longest_dup_region,
       |  (1000000 * coalesce(pr.dup_tokens, 0)) // len(t.toks) AS dup_ppm
       |FROM t JOIN reps USING (digest) LEFT JOIN pr ON pr.rep_id = reps.rep_id
       |ORDER BY t.doc_id""".stripMargin
  }

  /** §2.3#336 `corpus_dup_provenance` — the source×source near-dup
    * flow matrix: for every unordered source pair, how many FULL-graph
    * candidate pairs (docs sharing ≥1 LSH band) connect a doc of one
    * to a doc of the other. The provenance readout behind
    * [[corpusNearDupBySource]]'s per-source rates: which feeds mirror
    * WHICH — the table a curator reads before deciding whose copies
    * to keep. Computed entirely rep-collapsed: per-rep source
    * composition (rep_id, source, c) is a doc-keyed join + bounded
    * agg; intra-group cliques contribute C(c,2) same-source and
    * c_a·c_b cross-source pairs via a rep-keyed self-join whose
    * fan-out is bounded by the source catalog; rep edges contribute
    * n_a·n_b split by both endpoints' compositions (≤ |sources|² rows
    * per edge). A million-copy boilerplate group costs its
    * composition rows, never 10¹² materialized pairs. Output ≤
    * C(|sources|+1, 2) rows. Oracle recomputes over the materialized
    * full pair set ([[candOracleBody]]'s `cand`), so the closed form
    * is verified, not assumed.
    */
  def corpusDupProvenance(spark: SparkSession, dir: String): DataFrame = {
    val g = candGraph(spark, dir)
    val comp = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
      .join(g.docMap, Seq("doc_id"))
      .groupBy(col("rep_id"), col("source"))
      .agg(count(lit(1)).as("c"))
      // columnar pin: consumed three times below (intra self-join + both
      // edge endpoints); see CachePins / dedupNgramJaccard note
      .transform(CachePins.pin)
    val intra = comp.select(col("rep_id"), col("source").as("sa"), col("c").as("ca"))
      .join(comp.select(col("rep_id"), col("source").as("sb"), col("c").as("cb")),
        Seq("rep_id"))
      .filter(col("sa") <= col("sb"))
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        when(col("sa") === col("sb"), expr("ca * (ca - 1) div 2"))
          .otherwise(col("ca") * col("cb")).as("pairs"))
    val cross = g.edges
      .join(comp.select(col("rep_id").as("doc_a"), col("source").as("sa"),
        col("c").as("ca")), Seq("doc_a"))
      .join(comp.select(col("rep_id").as("doc_b"), col("source").as("sb"),
        col("c").as("cb")), Seq("doc_b"))
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"),
        (col("ca") * col("cb")).as("pairs"))
    intra.union(cross)
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("pairs")).as("n_pairs"))
      .filter(col("n_pairs") > 0)
      .orderBy(col("source_a"), col("source_b"))
  }

  /** DuckDB oracle for [[corpusDupProvenance]] — counted over the
    * materialized full-graph candidate pair set.
    */
  def dupProvenanceOracleSql: String =
    s"""WITH $candOracleBody,
       |ds AS (SELECT doc_id, source FROM documents)
       |SELECT least(a.source, b.source) AS source_a,
       |  greatest(a.source, b.source) AS source_b,
       |  count(*) AS n_pairs
       |FROM cand JOIN ds a ON cand.doc_a = a.doc_id
       |  JOIN ds b ON cand.doc_b = b.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
