package graft.graph

import graft.Ckpt.CutOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Candidate-graph analytics (SURVEY.md §2.3 additions): the near-dup
  * candidate pairs form a graph whose shape a dedup pipeline monitors
  * — degree distribution (is any doc a hub that will blow up
  * verification?) and triangle count (how clique-like are the
  * clusters?).
  *
  * Every operator here runs on the REP-COLLAPSED candidate graph
  * ([[Dedup.candGraph]]): one node per distinct signature group with its
  * copy multiplicity, cross-rep candidate edges with both
  * multiplicities. The full-corpus graph is exactly the clique
  * blow-up of that graph (verbatim copies share every LSH band), so
  * degree/triangle/PageRank/k-core/label readouts are recovered in
  * CLOSED FORM from multiplicities — a boilerplate text duplicated n
  * times costs O(n), never the O(n²) clique edges the full band
  * self-join would materialize. The DuckDB oracles (except PageRank,
  * whose float iteration must replay the same operation multiset)
  * still compute over the FULL graph, so the blow-up equivalence is
  * verified per run, not assumed.
  */
object GraphOps {

  /** Rep-collapsed candidate graph per [[Dedup.candGraph]]. */
  private def graphOf(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val g = Dedup.candGraph(spark, dir)
    (g.nodes, g.edges)
  }

  /** Build-once materialized store for the label-prop FAMILY
    * (`graph_label_prop`, `graph_community_members`,
    * `graph_communities`, `graph_modularity`): each entry used to
    * rebuild the LSH candidate graph + 3-round label-prop chain from
    * scratch — ~4× redundant suite work for identical rep-scale
    * frames (VERDICT r14 #4). Same shape as the materialized IVF
    * index ([[graft.similarity.Ann.ivfIndex]]): the first family
    * member writes the candidate-graph frames and the label fixpoint
    * to a per-corpus parquet store (build-once per JVM via
    * computeIfAbsent), and every member afterwards READS the store —
    * which survives a harness's cache drain between queries, unlike a
    * memory pin, and is exactly the index-maintenance shape a 100 TB
    * deployment runs (rebuild per corpus snapshot, probe from disk).
    * Assumes `dir` is immutable for the JVM (true for the testdata
    * corpora the family runs on); ops whose tests rewrite dirs in
    * place keep the unmaterialized [[graphOf]].
    */
  private val famBuilt = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def famStore(spark: SparkSession, dir: String, rounds: Int): String =
    famBuilt.computeIfAbsent(s"$dir#$rounds", _ => {
      val p = "/tmp/graft_labelprop_" +
        Integer.toHexString(dir.hashCode) + "_r" + rounds
      graft.TmpDirs.cleanupOnExit(java.nio.file.Paths.get(p))
      // r15 optimization: the graph frames now come from the shared
      // candidate-graph store ([[Dedup.candGraph]]) — this store only
      // adds the label-prop fixpoint, instead of re-deriving and
      // re-writing its own copy of nodes/edges/docMap (guide §2.4).
      val g = Dedup.candGraph(spark, dir)
      labelPropLabels(g.nodes, g.edges, rounds)
        .write.mode("overwrite").parquet(s"$p/labels")
      p
    })

  private def famGraph(spark: SparkSession, dir: String, rounds: Int): Dedup.CandGraph =
    Dedup.candGraph(spark, dir)

  /** The label-prop fixpoint frame from the family store — the single
    * dominant chain every family member consumes.
    */
  private def famLabels(spark: SparkSession, dir: String, rounds: Int): DataFrame =
    spark.read.parquet(s"${famStore(spark, dir, rounds)}/labels")

  /** Per-rep full-graph degree: every copy of rep r has degree
    * (n_r − 1) + Σ_{s~r} n_s — its own clique siblings plus every copy
    * of every adjacent rep. One explode + bounded agg on the rep
    * edges. Returns (doc_id, n_copies, deg).
    */
  private def repDegrees(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val sym = edges.select(col("doc_a").as("doc_id"), col("nb").as("w"))
      .union(edges.select(col("doc_b").as("doc_id"), col("na").as("w")))
    val nbr = sym.groupBy(col("doc_id")).agg(sum(col("w")).as("nbr_n"))
    nodes.join(nbr, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_copies"),
        (col("n_copies") - 1 + coalesce(col("nbr_n"), lit(0L))).as("deg"))
  }

  /** §2.3#128 — degree histogram of the candidate graph: all n_r
    * copies of a rep share one degree, so the histogram weights each
    * rep's degree cell by its multiplicity.
    */
  def graphDegreeHist(spark: SparkSession, dir: String): DataFrame = {
    val (nodes, edges) = graphOf(spark, dir)
    repDegrees(nodes, edges)
      .groupBy(col("deg").as("degree"))
      .agg(sum(col("n_copies")).as("n_nodes"))
      .orderBy(col("degree"))
  }

  /** §2.3#129 — global graph profile: nodes, edges, triangles of the
    * full graph, in closed form over the rep graph. Triangles
    * decompose by how many vertices share a clique: three distinct
    * reps (ordered wedge join, multiplicity product n_a·n_b·n_c), two
    * in one clique + one adjacent (C(n,2)·n_other per rep edge), or
    * all three in one clique (C(n,3) per rep).
    */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    val (nodes, edges) = graphOf(spark, dir)
    trianglesOf(nodes, edges)
  }

  /** [[graphTriangles]]' closed form over an already-built rep graph —
    * shared with [[graphTransitivity]] so consumers needing triangles
    * plus another statistic build the candidate graph ONCE.
    */
  private def trianglesOf(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // the wedge join reads the edge list three times — materialize it
    // once instead of tripling the band join in one plan
    val e = edges.cutLineage()
    // all multiplicity products run in decimal(38,0): a clique of n
    // verbatim copies puts n³ in a single t1/t3 term, which wraps a
    // long (non-ANSI) already at n ≈ 2.1M — inside the documented
    // million-copy-boilerplate design point. The final counts cast
    // back to long (null, never a wrapped value, if a corpus ever
    // exceeds 2^63 triangles).
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val t1 = e.as("e1")
      .join(e.as("e2"), col("e1.doc_b") === col("e2.doc_a"))
      .join(e.as("e3"),
        col("e3.doc_a") === col("e1.doc_a") && col("e3.doc_b") === col("e2.doc_b"))
      .agg(coalesce(sum(dec(col("e1.na")) * col("e1.nb") * col("e2.nb")),
        lit(0L).cast("decimal(38,0)")).as("t1"))
    val t2 = e.agg(coalesce(
      floor(sum(dec(col("na")) * (col("na") - 1) * col("nb") +
        dec(col("nb")) * (col("nb") - 1) * col("na")) / 2).cast("decimal(38,0)"),
      lit(0L).cast("decimal(38,0)")).as("t2"))
    // n(n−1)(n−2) is divisible by 6 term-wise, so dividing the decimal
    // SUM by 6 is exact; floor() strips the decimal scale the division
    // introduces without touching the value
    val t3 = nodes.agg(coalesce(
      floor(sum(dec(col("n_copies")) * (col("n_copies") - 1) * (col("n_copies") - 2)) / 6)
        .cast("decimal(38,0)"), lit(0L).cast("decimal(38,0)")).as("t3"))
    val nNodes = nodes.agg(coalesce(sum(col("n_copies")), lit(0L)).as("n_nodes"))
    val nEdges = e.agg(coalesce(sum(dec(col("na")) * col("nb")),
        lit(0L).cast("decimal(38,0)")).as("cross_e"))
      .crossJoin(nodes.agg(coalesce(
        floor(sum(dec(col("n_copies")) * (col("n_copies") - 1)) / 2)
          .cast("decimal(38,0)"),
        lit(0L).cast("decimal(38,0)")).as("within_e")))
      .select((col("cross_e") + col("within_e")).cast("long").as("n_edges"))
    nNodes.crossJoin(nEdges).crossJoin(t1).crossJoin(t2).crossJoin(t3)
      .select(col("n_nodes"), col("n_edges"),
        (col("t1") + col("t2") + col("t3")).cast("long").as("n_triangles"))
  }

  /** §2.3 `graph_transitivity` — global clustering coefficient
    * (transitivity) of the candidate graph: C = 3·triangles / wedges,
    * where wedges = Σ_v C(deg(v), 2) counts connected vertex triples.
    * High transitivity = the near-dup graph is clique-like (verbatim
    * copy families); low = chain/star shaped (template drift).
    *
    * Triangles come from [[graphTriangles]]' closed-form
    * rep-collapsed decomposition; wedges fold the SAME multiplicity
    * law over [[repDegrees]] — all n_r copies of rep r share one
    * degree d, so they contribute n_r·d(d−1)/2 wedges, accumulated
    * in decimal(38,0) (d(d−1) is even, so the /2 is exact). Both
    * counts are exact integers; the single final float op is the
    * 3T/W division, mirrored verbatim in the oracle — the repo's
    * exact-sufficient-sums convention.
    */
  def graphTransitivity(spark: SparkSession, dir: String): DataFrame = {
    val (nodes, edges) = graphOf(spark, dir) // built once, feeds both counts
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    // d(d−1)/2 halved exactly per term via the even factor (deg div 2
    // stays in long range for any deg; products widen in decimal), so
    // there is no floor/scale-widening division whose overflow-null
    // could be confused with the empty-graph null. The count guard
    // coalesces ONLY the empty-input case: a genuine decimal overflow
    // now surfaces as a null n_wedges (loud), not a silent 0.
    val wedges = repDegrees(nodes, edges)
      .agg(count(lit(1)).as("n_reps"),
        sum(dec(col("n_copies")) *
          when(col("deg") % 2 === 0,
            dec(expr("deg div 2")) * (dec(col("deg")) - 1))
          .otherwise(dec(col("deg")) * dec(expr("(deg - 1) div 2"))))
          .as("w_raw"))
      .select(when(col("n_reps") === 0, lit(0L))
        .otherwise(col("w_raw").cast("long")).as("n_wedges"))
    trianglesOf(nodes, edges).select(col("n_triangles"))
      .crossJoin(wedges)
      .select(col("n_triangles"), col("n_wedges"),
        when(col("n_wedges") > 0,
          (lit(3.0) * col("n_triangles")) / col("n_wedges"))
          .as("transitivity"))
  }

  /** SQL twin of [[graphTransitivity]] over the full candidate graph
    * (exact-integer triangle/wedge counts verify the rep-collapse
    * closed forms on every run, like [[trianglesOracleSql]]).
    */
  def transitivityOracleSql: String =
    "WITH " + Dedup.candOracleBody +
      """,
        |tri AS (SELECT count(*) AS n_triangles FROM cand e1
        |  JOIN cand e2 ON e1.doc_b = e2.doc_a
        |  JOIN cand e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
        |sym AS (SELECT doc_a AS d FROM cand UNION ALL SELECT doc_b FROM cand),
        |deg AS (SELECT d, count(*) AS dg FROM sym GROUP BY 1),
        |w AS (SELECT COALESCE(CAST(sum(dg * (dg - 1)) // 2 AS BIGINT), 0) AS n_wedges
        |  FROM deg)
        |SELECT tri.n_triangles, w.n_wedges,
        |  CASE WHEN n_wedges > 0
        |    THEN (3.0 * n_triangles) / n_wedges END AS transitivity
        |FROM tri, w""".stripMargin

  /** §2.3 `graph_assortativity` — degree assortativity of the
    * candidate graph: Pearson correlation of endpoint degrees over
    * the symmetric edge incidence (each undirected edge counted both
    * directions). Positive r = hubs pair with hubs (clique-like
    * near-dup clusters, the verification hotspots); negative = star
    * families around one template doc.
    *
    * Computed from EXACT integer sufficient sums over the rep graph
    * (degrees and multiplicities are integers; sums accumulate in
    * decimal so nothing wraps), with one IEEE division at the end —
    * the same engine-exact contract as the money paths. A cross edge
    * (a,b) stands for n_a·n_b full edges with endpoint degrees
    * (d_a, d_b); a clique contributes C(n,2) edges with (d, d). By
    * symmetry Σx = Σy, so r = (N·Σxy − (Σx)²) / (N·Σx² − (Σx)²).
    */
  def graphAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val (nodes, edges) = graphOf(spark, dir)
    val dm = repDegrees(nodes, edges)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    // per-row exact contributions computed IN DECIMAL, not long: for a
    // million-copy clique deg ≈ n ≈ 1e6 and c2 ≈ 1e12, so c2·deg²
    // ≈ 1e24 — far past 2^63. Casting the first factor to
    // decimal(38,0) makes every subsequent multiply decimal, so the
    // per-row products are exact at the documented design point
    // instead of wrapping before the decimal sum ever sees them.
    val crossC = edges
      .join(dm.select(col("doc_id").as("doc_a"), col("deg").as("da")), Seq("doc_a"))
      .join(dm.select(col("doc_id").as("doc_b"), col("deg").as("db")), Seq("doc_b"))
      .select((dec(col("na")) * col("nb")).as("w"), col("da"), col("db"))
      .select((col("w") * 2).as("n"),
        (col("w") * (col("da") + col("db"))).as("sx"),
        (col("w") * (dec(col("da")) * col("da") + dec(col("db")) * col("db"))).as("sxx"),
        (col("w") * 2 * col("da") * col("db")).as("sxy"))
    val withinC = dm.filter(col("n_copies") >= 2)
      .select((dec(col("n_copies")) * (col("n_copies") - 1)).as("c2"), col("deg"))
      .select(col("c2").as("n"), (col("c2") * col("deg")).as("sx"),
        (col("c2") * col("deg") * col("deg")).as("sxx"),
        (col("c2") * col("deg") * col("deg")).as("sxy"))
    crossC.union(withinC)
      .agg(sum(dec(col("n"))).as("n"), sum(dec(col("sx"))).as("sx"),
        sum(dec(col("sxx"))).as("sxx"), sum(dec(col("sxy"))).as("sxy"))
      .select(col("n").cast("long").as("n_endpoints"),
        when(col("n") * col("sxx") - col("sx") * col("sx") === 0, lit(null))
          // exact-integer moments, one division → emitted unrounded
          .otherwise(
            (col("n") * col("sxy") - col("sx") * col("sx")).cast("double") /
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("assortativity"))
  }

  /** DuckDB oracle for [[graphAssortativity]] — the FULL graph, same
    * exact-integer moment formula (DuckDB sums BIGINT into HUGEINT, so
    * both engines form the identical exact integers before the one
    * double division).
    */
  def assortativityOracleSql: String =
    "WITH " + Dedup.candOracleBody +
      """,
        |deg AS (SELECT d, count(*) AS deg FROM (
        |  SELECT doc_a AS d FROM cand UNION ALL SELECT doc_b FROM cand)
        |  GROUP BY 1),
        |sym AS (SELECT doc_a AS u, doc_b AS v FROM cand
        |  UNION ALL SELECT doc_b AS u, doc_a AS v FROM cand),
        |j AS (SELECT a.deg AS du, b.deg AS dv
        |  FROM sym JOIN deg a ON sym.u = a.d JOIN deg b ON sym.v = b.d),
        |st AS (SELECT count(*) AS n, sum(du) AS sx,
        |  sum(du * du) AS sxx, sum(du * dv) AS sxy FROM j)
        |SELECT CAST(n AS BIGINT) AS n_endpoints,
        |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
        |    ELSE CAST(n * sxy - sx * sx AS DOUBLE)
        |      / CAST(n * sxx - sx * sx AS DOUBLE) END AS assortativity
        |FROM st""".stripMargin

  /** §2.3#149 — PageRank over the undirected candidate graph: five
    * fixed damped iterations (d = 0.85) of pregel-style message
    * passing ON THE REP GRAPH. In the clique blow-up every copy of a
    * rep is symmetric, so all copies share one rank value and the
    * full-graph update collapses exactly to
    * p'_t = (1−d)/N + d·[(n_t−1)·p_t/deg_t + Σ_{s~t} n_s·p_s/deg_s]
    * with N = Σ n_r full nodes and deg the blown-up degree — one
    * join + re-aggregate shuffle pair per iteration, lineage cut per
    * step, and only the scalar N driver-resident. The per-doc output
    * fans the rep ranks back out through the doc→rep map (linear).
    */
  def graphPagerank(spark: SparkSession, dir: String, iters: Int = 5,
      damp: Double = 0.85): DataFrame = {
    val g = Dedup.candGraph(spark, dir)
    val (nodes, edges) = (g.nodes, g.edges)
    // one materialization of the edge list feeds the degree table,
    // the adjacency and every iteration; the node-count scalar reads
    // the checkpointed degrees, not the corpus again
    val e = edges.cutLineage()
    val stat = repDegrees(nodes, e).cutLineage()
    val n = stat.agg(coalesce(sum(col("n_copies")), lit(0L)))
      .first().getLong(0) // scalar full-node count, the only driver-side value
    val adj = e.select(col("doc_a").as("s"), col("doc_b").as("t"), col("na").as("ns"))
      .union(e.select(col("doc_b").as("s"), col("doc_a").as("t"), col("nb").as("ns")))
    var r = stat.select(col("doc_id").as("node"), lit(1.0 / n).as("r"))
    var it = 0
    while (it < iters) {
      val msgs = adj
        .join(r.withColumnRenamed("node", "s"), Seq("s"))
        .join(stat.select(col("doc_id").as("s"), col("deg").as("ds")), Seq("s"))
        .select(col("t").as("node"), (col("ns") * col("r") / col("ds")).as("m"))
      val self = r
        .join(stat.select(col("doc_id").as("node"), col("n_copies"), col("deg")),
          Seq("node"))
        .select(col("node"),
          ((col("n_copies") - 1) * col("r") / col("deg")).as("m"))
      r = msgs.union(self)
        .groupBy(col("node"))
        .agg(sum(col("m")).as("contrib"))
        .select(col("node"),
          (lit((1 - damp) / n) + lit(damp) * col("contrib")).as("r"))
        .cutLineage()
      it += 1
    }
    g.docMap
      .join(r.select(col("node").as("rep_id"),
        (round(col("r"), 6) + lit(0.0)).as("pagerank")), Seq("rep_id"))
      .select(col("doc_id"), col("pagerank"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[graphPagerank]]: the same rep-collapsed
    * closed-form iterations unrolled (the float sums must replay the
    * same operation multiset — the full-graph restatement would add
    * p/d to itself n times where the collapsed form multiplies once,
    * an ulp-level divergence that compounds across iterations), with
    * the per-doc fan-out through the same doc→rep join. Every CTE
    * MATERIALIZED (multiply-referenced plain CTEs re-inline their
    * whole prefix per reference).
    */
  def pagerankOracleSql(iters: Int = 5): String = {
    val sigExprs = (0 until Dedup.MinhashK).map { k =>
      s"list_aggregate(list_transform(sh, x -> md5('$k|' || x)), 'min') AS sig$k"
    }.mkString(",\n  ")
    val sigList = (0 until Dedup.MinhashK).map(k => s"sig$k").mkString(", ")
    val bandSelects = (0 until Dedup.LshBands).map { b =>
      val cat = (0 until 3).map(r => s"sig${3 * b + r}").mkString(" || ")
      s"SELECT doc_id, CAST($b AS BIGINT) AS band_idx, md5($cat) AS band_hash FROM srep"
    }.mkString("\n  UNION ALL ")
    val sb = new StringBuilder
    sb ++= s"""WITH t AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
              |s AS (SELECT doc_id, list_transform(range(1, len(toks) - 1),
              |        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS sh FROM t),
              |sig AS MATERIALIZED (SELECT doc_id,
              |  $sigExprs
              |  FROM s),
              |srep AS MATERIALIZED (SELECT min(doc_id) AS doc_id,
              |  CAST(count(*) AS BIGINT) AS n_copies, $sigList
              |  FROM sig GROUP BY $sigList),
              |bands AS ($bandSelects),
              |cand AS MATERIALIZED (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
              |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx
              |    AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
              |docmap AS MATERIALIZED (SELECT sig.doc_id AS doc_id, srep.doc_id AS rep
              |  FROM sig JOIN srep USING ($sigList)),
              |ed AS MATERIALIZED (
              |  SELECT c.doc_a AS s, c.doc_b AS t, ra.n_copies AS ns FROM cand c
              |    JOIN srep ra ON c.doc_a = ra.doc_id
              |  UNION ALL
              |  SELECT c.doc_b AS s, c.doc_a AS t, rb.n_copies AS ns FROM cand c
              |    JOIN srep rb ON c.doc_b = rb.doc_id),
              |nodes AS MATERIALIZED (SELECT r.doc_id AS node, r.n_copies FROM srep r
              |  WHERE r.n_copies >= 2 OR r.doc_id IN (
              |    SELECT doc_a FROM cand UNION ALL SELECT doc_b FROM cand)),
              |deg AS MATERIALIZED (SELECT n.node, n.n_copies,
              |  CAST(n.n_copies - 1 + coalesce((SELECT sum(e.ns) FROM ed e
              |    WHERE e.t = n.node), 0) AS DOUBLE) AS d
              |  FROM nodes n),
              |nn AS MATERIALIZED (SELECT CAST(sum(n_copies) AS DOUBLE) AS n FROM nodes),
              |r0 AS MATERIALIZED (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM deg)""".stripMargin
    for (k <- 1 to iters) {
      sb ++= s""",
                |r$k AS MATERIALIZED (SELECT node,
                |  0.15 / (SELECT n FROM nn) + 0.85 * sum(m) AS r FROM (
                |  SELECT ed.t AS node, ed.ns * p.r / deg.d AS m
                |    FROM ed JOIN r${k - 1} p ON ed.s = p.node
                |    JOIN deg ON ed.s = deg.node
                |  UNION ALL
                |  SELECT p.node AS node, (deg.n_copies - 1) * p.r / deg.d AS m
                |    FROM r${k - 1} p JOIN deg ON p.node = deg.node)
                |  GROUP BY node)""".stripMargin
    }
    sb ++= s"""
              |SELECT docmap.doc_id, round(r$iters.r, 6) + 0.0 AS pagerank
              |FROM docmap JOIN r$iters ON docmap.rep = r$iters.node
              |ORDER BY docmap.doc_id""".stripMargin
    sb.toString
  }

  /** DuckDB oracle for [[graphDegreeHist]] (full graph). */
  def degreeHistOracleSql: String =
    "WITH " + Dedup.candOracleBody +
      """,
        |deg AS (SELECT doc_id, count(*) AS degree FROM (
        |  SELECT doc_a AS doc_id FROM cand
        |  UNION ALL SELECT doc_b AS doc_id FROM cand)
        |  GROUP BY doc_id)
        |SELECT degree, count(*) AS n_nodes FROM deg
        |GROUP BY degree ORDER BY degree""".stripMargin

  /** §2.3#168 — multi-source BFS layers from the deterministic seed
    * set (doc_id % 29 == 0 over graph nodes), k fixed rounds, on the
    * rep graph. Copies of one rep are symmetric except for seedhood,
    * so the doc-level layers have a closed form: a seeded rep's seed
    * copies sit at distance 0 and its remaining copies at distance 1
    * (clique edge to a seed); every copy of a rep first reached at
    * rep-round k sits at distance k. Each round is one frontier join
    * + anti-join, work proportional to the frontier.
    */
  def graphBfsLayers(spark: SparkSession, dir: String, iters: Int = 4): DataFrame = {
    val g = Dedup.candGraph(spark, dir)
    val (nodes, edges) = (g.nodes, g.edges)
    val seeds = g.docMap
      .filter(col("doc_id") % 29 === 0)
      .groupBy(col("rep_id")).agg(count(lit(1)).as("n_seeds"))
    val st = nodes
      .join(seeds.withColumnRenamed("rep_id", "doc_id"), Seq("doc_id"), "left_outer")
      .select(col("doc_id").as("node"), col("n_copies"),
        coalesce(col("n_seeds"), lit(0L)).as("n_seeds"))
      .cutLineage()
    val e = edges.select(col("doc_a").as("s"), col("doc_b").as("t"))
      .union(edges.select(col("doc_b").as("s"), col("doc_a").as("t")))
      .cutLineage()
    var visited = st.filter(col("n_seeds") > 0)
      .select(col("node"), lit(0L).as("dist"))
      .cutLineage()
    var frontier = visited
    var it = 0
    while (it < iters) {
      val next = e.join(frontier.select(col("node").as("f")), col("s") === col("f"))
        .select(col("t").as("node")).distinct()
        .join(visited.select(col("node").as("seen")),
          col("node") === col("seen"), "left_anti")
        .select(col("node"), lit(it + 1L).as("dist"))
        .cutLineage()
      visited = visited.union(next).cutLineage()
      frontier = next
      it += 1
    }
    val repDist = visited.join(st, Seq("node"))
    val zero = repDist.filter(col("dist") === 0)
      .select(lit(0L).as("dist"), col("n_seeds").as("w"))
    val cliqueOne = repDist.filter(col("dist") === 0)
      .select(lit(1L).as("dist"), (col("n_copies") - col("n_seeds")).as("w"))
    val rest = repDist.filter(col("dist") >= 1)
      .select(col("dist"), col("n_copies").as("w"))
    zero.union(cliqueOne).union(rest)
      .groupBy(col("dist")).agg(sum(col("w")).as("n_nodes"))
      .filter(col("n_nodes") > 0)
      .orderBy(col("dist"))
  }

  /** DuckDB oracle for [[graphBfsLayers]] — the FULL graph rounds
    * unrolled (checks the closed-form layer expansion).
    */
  def bfsOracleSql(iters: Int = 4): String = {
    val sb = new StringBuilder
    sb ++= "WITH " + Dedup.candOracleBody
    sb ++= """,
             |ed AS MATERIALIZED (SELECT doc_a AS s, doc_b AS t FROM cand
             |  UNION ALL SELECT doc_b AS s, doc_a AS t FROM cand),
             |v0 AS MATERIALIZED (SELECT DISTINCT s AS node, CAST(0 AS BIGINT) AS dist
             |  FROM ed WHERE s % 29 = 0),
             |f0 AS MATERIALIZED (SELECT node FROM v0)""".stripMargin
    for (k <- 1 to iters) {
      sb ++= s""",
                |f$k AS MATERIALIZED (SELECT DISTINCT ed.t AS node
                |  FROM ed JOIN f${k - 1} ON ed.s = f${k - 1}.node
                |  WHERE ed.t NOT IN (SELECT node FROM v${k - 1})),
                |v$k AS MATERIALIZED (SELECT node, dist FROM v${k - 1}
                |  UNION ALL SELECT node, CAST($k AS BIGINT) AS dist FROM f$k)""".stripMargin
    }
    sb ++= s"""
              |SELECT dist, count(*) AS n_nodes FROM v$iters
              |GROUP BY dist ORDER BY dist""".stripMargin
    sb.toString
  }

  /** §2.3#194 — k-core peeling profile: repeatedly drop nodes of
    * degree < k, a fixed number of rounds, on the rep graph. Copies
    * of a rep share one degree at every round, so whole rep groups
    * peel together and the per-round removed/remaining counts are
    * multiplicity sums. Work shrinks with the surviving subgraph;
    * only two per-round scalars are driver-resident; lineage cut per
    * round like the CC/PageRank loops.
    */
  def graphKcore(spark: SparkSession, dir: String, k: Int = 3,
      rounds: Int = 4): DataFrame = {
    import spark.implicits._
    val (nodes0, edges0) = graphOf(spark, dir)
    var cur = nodes0.select(col("doc_id"), col("n_copies"))
    var edges = edges0.select(col("doc_a"), col("doc_b"), col("na"), col("nb"))
      .cutLineage()
    val profile = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var r = 1
    while (r <= rounds) {
      val sym = edges.select(col("doc_a").as("doc_id"), col("nb").as("w"))
        .union(edges.select(col("doc_b").as("doc_id"), col("na").as("w")))
      val nbr = sym.groupBy(col("doc_id")).agg(sum(col("w")).as("nbr_n"))
      // present = still carries ≥1 edge (a clique of its own copies
      // counts); nodes whose edges all vanished drop out uncounted,
      // exactly like the full-graph edge-list degree scan
      val present = cur.join(nbr, Seq("doc_id"), "left_outer")
        .filter(col("n_copies") >= 2 || col("nbr_n").isNotNull)
        .select(col("doc_id"), col("n_copies"),
          (col("n_copies") - 1 + coalesce(col("nbr_n"), lit(0L))).as("deg"))
        .cutLineage()
      val keep = present.filter(col("deg") >= k).cutLineage()
      val nKeep = keep.agg(coalesce(sum(col("n_copies")), lit(0L))).first().getLong(0)
      val nPresent = present.agg(coalesce(sum(col("n_copies")), lit(0L))).first().getLong(0)
      edges = edges
        .join(keep.select(col("doc_id").as("doc_a")), Seq("doc_a"), "left_semi")
        .join(keep.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
        .cutLineage()
      cur = keep.select(col("doc_id"), col("n_copies"))
      profile += ((r.toLong, nPresent - nKeep, nKeep))
      r += 1
    }
    profile.toSeq.toDF("round", "n_removed", "n_remaining")
  }

  /** DuckDB oracle for [[graphKcore]] — the FULL graph peel rounds
    * unrolled (checks the grouped-peel closed form).
    */
  def kcoreOracleSql(k: Int = 3, rounds: Int = 4): String = {
    val sb = new StringBuilder
    sb ++= "WITH " + Dedup.candOracleBody
    sb ++= """,
             |ed0 AS MATERIALIZED (SELECT doc_a AS s, doc_b AS t FROM cand
             |  UNION ALL SELECT doc_b AS s, doc_a AS t FROM cand)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
                |deg$r AS MATERIALIZED (SELECT s, count(*) AS d FROM ed${r - 1} GROUP BY 1),
                |keep$r AS MATERIALIZED (SELECT s AS node FROM deg$r WHERE d >= $k),
                |stat$r AS (SELECT CAST($r AS BIGINT) AS round,
                |  (SELECT count(*) FROM deg$r WHERE d < $k) AS n_removed,
                |  (SELECT count(*) FROM keep$r) AS n_remaining),
                |ed$r AS MATERIALIZED (SELECT ed.s AS s, ed.t AS t FROM ed${r - 1} ed
                |  WHERE ed.s IN (SELECT node FROM keep$r)
                |    AND ed.t IN (SELECT node FROM keep$r))""".stripMargin
    }
    sb ++= "\n|SELECT round, n_removed, n_remaining FROM (".stripMargin
    sb ++= (1 to rounds).map(r => s"SELECT * FROM stat$r").mkString(" UNION ALL ")
    sb ++= ") ORDER BY round"
    sb.toString
  }

  /** §2.3 `graph_label_prop` — bounded-round min-label propagation on
    * the rep graph. After t ≥ 1 rounds a node's label is the minimum
    * id within its radius-t ball; in the blow-up every copy's ball
    * covers its whole group (distance ≤ 1) plus all groups within
    * rep-distance t, so every copy inherits exactly the rep-graph
    * label and cluster sizes are multiplicity sums. Each round is one
    * keyed join + partial-agg min, lineage cut per round.
    */
  def graphLabelProp(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    famLabels(spark, dir, rounds)
      .groupBy(col("label")).agg(sum(col("n_copies")).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))
  }

  /** The label-prop fixpoint frame behind [[graphLabelProp]] and
    * [[graphModularity]]: (node, label, n_copies) after `rounds`
    * min-label rounds on the rep graph. Because a rep's id is the min
    * doc_id of its copies and full-graph balls equal rep-graph balls
    * (copy groups are cliques, rep edges complete-bipartite), each
    * copy's full-graph label IS its rep's label.
    */
  private def labelPropLabels(nodes: DataFrame, edges: DataFrame,
      rounds: Int): DataFrame = {
    val e = edges.select(col("doc_a").as("s"), col("doc_b").as("t"))
      .union(edges.select(col("doc_b").as("s"), col("doc_a").as("t")))
      .cutLineage()
    var labels = nodes
      .select(col("doc_id").as("node"), col("doc_id").as("label"), col("n_copies"))
      .cutLineage()
    var it = 0
    while (it < rounds) {
      val nbrMin = e
        .join(labels.select(col("node").as("s"), col("label").as("nl")), Seq("s"))
        .groupBy(col("t").as("node")).agg(min(col("nl")).as("nbr_min"))
      labels = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"),
          col("n_copies"))
        .cutLineage()
      it += 1
    }
    labels
  }

  /** §2.3#305 — modularity of the label-prop partition: Newman's
    * Q = Σ_c (e_c/m − (d_c/2m)²) over the FULL blown-up graph,
    * computed entirely in rep-collapsed closed form — a copy group of
    * n_g is an n_g-clique (C(n_g,2) internal edges, each copy degree
    * n_g−1 inside the group) and a rep edge (a,b) is complete
    * bipartite (n_a·n_b edges, adding n_b to each of a's copies).
    * All of m, e_c, d_c are exact integers from two partial-agg
    * passes (one over the node list, one over the rep edge list), and
    * so is the whole sufficient-statistics reduction: Q factors as
    * Q = Σ_c e_c/m − Σ_c d_c²/(4m²) = (4m·Σe_c − Σd_c²)/(4m²), with
    * Σd_c² accumulated in decimal(38,0). Communities that touch no
    * edge contribute nothing and are excluded on both sides (d_c>0).
    *
    * The emitted surface is 100% INTEGER — no IEEE op anywhere. Q
    * itself ships as `modularity_e12 = (4m·Σe_c − Σd_c²)·10¹² div
    * 4m²`, the quotient in parts-per-10¹² computed with
    * multiply-before-divide integral arithmetic: Spark decimal(38,0)
    * `div` and DuckDB HUGEINT `//` both truncate toward zero
    * (verified: −7 div 2 = −3 on both), so the longs are equal by
    * construction, not merely to float precision. History: rounds
    * 11-14 emitted the same sums with ONE final IEEE division as a
    * `modularity` double; the r14 float-free companion rows
    * ([[graphCommunityMembers]], [[graphCommunities]], and the
    * since-folded global-sums row) proved every exact surface equal
    * in the driver env while the double row alone stayed red — so
    * per VERDICT r14 #1 the float left the hashed surface entirely.
    * The global sums (n_communities, m_edges, intra_edges = Σe_c,
    * s2 = Σd_c²) ride along as columns, which is why the r14
    * `graph_modularity_sums` diagnostic row folded into this one.
    * Headroom: ·10¹² puts the numerator near 4m²·10¹²; decimal(38,0)
    * holds it to m ≈ 1.5·10¹² full-graph edges, far beyond any
    * candidate graph the dedup gate admits, and overflow is loud
    * (decimal overflow → null row, not a wrap).
    */
  /** Shared sufficient-statistics frames behind [[graphModularity]],
    * [[graphCommunities]]: the label-prop
    * labels, the per-community exact (e_c, d_c) pairs, and the exact
    * full-graph edge count m — all integers, all in the rep-collapsed
    * closed form documented at [[graphModularity]].
    */
  private case class CommStats(labels: DataFrame, comm: DataFrame, mFrame: DataFrame)

  private def commStatsOf(spark: SparkSession, dir: String, rounds: Int): CommStats = {
    val edges = famGraph(spark, dir, rounds).edges
    val labels = famLabels(spark, dir, rounds)
    // per-group clique contributions: C(n,2) intra edges, n(n-1) degree
    val fromGroups = labels.select(col("label"),
      expr("n_copies * (n_copies - 1) div 2").as("e_in"),
      expr("n_copies * (n_copies - 1)").as("d"))
    // per rep edge: n_a·n_b full edges; intra iff both ends share a label
    val eLab = edges
      .join(labels.select(col("node").as("doc_a"), col("label").as("la")), Seq("doc_a"))
      .join(labels.select(col("node").as("doc_b"), col("label").as("lb")), Seq("doc_b"))
      .select(col("la"), col("lb"), (col("na") * col("nb")).as("w"))
    val fromEdges = eLab.select(col("la").as("label"),
        when(col("la") === col("lb"), col("w")).otherwise(lit(0L)).as("e_in"),
        col("w").as("d"))
      .union(eLab.select(col("lb").as("label"), lit(0L).as("e_in"), col("w").as("d")))
    val comm = fromGroups.union(fromEdges)
      .groupBy(col("label"))
      .agg(sum(col("e_in")).as("e_c"), sum(col("d")).as("d_c"))
      .filter(col("d_c") > 0)
    val mFrame = labels.agg(sum(expr("n_copies * (n_copies - 1) div 2")).as("mg"))
      .crossJoin(edges.agg(sum(col("na") * col("nb")).as("me")))
      .select((col("mg") + col("me")).as("m"))
    CommStats(labels, comm, mFrame)
  }

  /** §2.3#318 `graph_community_members` — the label-prop partition
    * itself, per FULL-graph node: (node, label) for every document in
    * the blown-up candidate graph (each copy inherits its rep's label
    * — the ball argument at [[labelPropLabels]]). Pure exact
    * integers/ids, no floats anywhere. This certifies the one surface
    * [[graphLabelProp]]'s size histogram is provably blind to: a
    * size-preserving relabel or partition swap leaves the histogram
    * fixed while Q's per-community e_c/d_c sums move. A driver-env
    * divergence of the partition turns THIS row red and localizes the
    * `graph_modularity` break (ROUND_AUDIT_r14 has the decision
    * table). Cost: one docMap join onto rep labels — linear, no new
    * shuffle shape.
    */
  def graphCommunityMembers(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val g = famGraph(spark, dir, rounds)
    val labels = famLabels(spark, dir, rounds)
    g.docMap
      .join(labels.select(col("node").as("rep_id"), col("label")), Seq("rep_id"))
      .select(col("doc_id").as("node"), col("label"))
      .orderBy(col("node"))
  }

  /** DuckDB oracle for [[graphCommunityMembers]] — the full-graph
    * label-prop rounds unrolled, node set = edge endpoints.
    */
  def communityMembersOracleSql(rounds: Int = 3): String =
    labelPropUnrollCtes(rounds) +
      s"\nSELECT node, label FROM l$rounds ORDER BY node"

  /** §2.3#319 `graph_communities` — per-community exact sufficient
    * statistics of the modularity sum: full-graph member count,
    * intra-community full-graph edge count e_c, and total degree d_c,
    * every value an exact integer in the same rep-collapsed closed
    * form as [[graphModularity]]. Between [[graphCommunityMembers]]
    * (partition), this row (per-community reduction), and the global
    * sums columns on [[graphModularity]] itself, a driver-env hash
    * break on the family is bracketed to one surface by which rows
    * flip. Also a first-class readout: community size
    * vs internal density is the standard cluster-quality table a
    * dedup pipeline reviews before collapsing clusters.
    */
  def graphCommunities(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val st = commStatsOf(spark, dir, rounds)
    val sizes = st.labels.groupBy(col("label"))
      .agg(sum(col("n_copies")).as("n_members"))
    st.comm.join(sizes, Seq("label"))
      .select(col("label").as("community"), col("n_members"),
        col("e_c"), col("d_c"))
      .orderBy(col("community"))
  }

  /** DuckDB oracle for [[graphCommunities]] — recomputed on the
    * materialized full graph.
    */
  def communitiesOracleSql(rounds: Int = 3): String =
    labelPropUnrollCtes(rounds) + s""",
       |sz AS (SELECT label, count(*) AS n_members FROM l$rounds GROUP BY 1),
       |ec AS (SELECT la.label AS label, count(*) AS e_c FROM cand
       |  JOIN l$rounds la ON cand.doc_a = la.node
       |  JOIN l$rounds lb ON cand.doc_b = lb.node
       |  WHERE la.label = lb.label GROUP BY 1),
       |dc AS (SELECT l.label AS label, count(*) AS d_c
       |  FROM ed JOIN l$rounds l ON ed.s = l.node GROUP BY 1)
       |SELECT sz.label AS community, sz.n_members,
       |  coalesce(ec.e_c, 0) AS e_c, dc.d_c
       |FROM sz JOIN dc ON sz.label = dc.label
       |  LEFT JOIN ec ON sz.label = ec.label
       |ORDER BY community""".stripMargin

  def graphModularity(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val st = commStatsOf(spark, dir, rounds)
    // exact sufficient sums: S1 = Σe_c (long), S2 = Σd_c² (decimal);
    // the quotient ships as truncated parts-per-10¹² — zero IEEE ops.
    st.comm.crossJoin(broadcast(st.mFrame))
      .agg(count(lit(1)).as("n_communities"),
        first(col("m")).as("m_edges"),
        sum(col("e_c")).as("intra_edges"),
        sum(col("d_c").cast("decimal(38,0)") * col("d_c")).as("s2d"))
      .select(col("n_communities"), col("m_edges"), col("intra_edges"),
        col("s2d").cast("long").as("s2"),
        expr("""((4 * CAST(m_edges AS decimal(38,0)) * intra_edges - s2d)
               |  * 1000000000000) div
               |(4 * CAST(m_edges AS decimal(38,0)) * m_edges)""".stripMargin)
          .as("modularity_e12"))
  }

  /** Shared CTE prefix for every label-prop oracle: candidate pairs →
    * full-graph symmetric edge list `ed` → `rounds` unrolled
    * min-label rounds ending at `l$rounds`. One text, four oracles
    * (`graph_label_prop`, `graph_modularity`, and the r14 diagnostic
    * companions) — so a driver-env divergence of the chain moves ALL
    * of their rows together, never just one.
    */
  private def labelPropUnrollCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= "WITH " + Dedup.candOracleBody
    sb ++= """,
             |ed AS MATERIALIZED (SELECT doc_a AS s, doc_b AS t FROM cand
             |  UNION ALL SELECT doc_b AS s, doc_a AS t FROM cand),
             |l0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS label FROM ed)""".stripMargin
    for (r <- 1 to rounds) {
      sb ++= s""",
                |m$r AS MATERIALIZED (SELECT ed.t AS node, min(l.label) AS nbr
                |  FROM ed JOIN l${r - 1} l ON ed.s = l.node GROUP BY 1),
                |l$r AS MATERIALIZED (SELECT l.node,
                |  least(l.label, coalesce(m.nbr, l.label)) AS label
                |  FROM l${r - 1} l LEFT JOIN m$r m ON l.node = m.node)""".stripMargin
    }
    sb.toString
  }

  /** DuckDB oracle for [[graphModularity]] — Q recomputed on the
    * materialized FULL graph with the label-prop rounds unrolled
    * (checks the rep-collapsed closed form).
    */
  def modularityOracleSql(rounds: Int = 3): String = {
    val sb = new StringBuilder
    sb ++= labelPropUnrollCtes(rounds)
    sb ++= s"""
              |, mm AS (SELECT count(*) AS m FROM cand),
              |ec AS (SELECT la.label AS label, count(*) AS e_c FROM cand
              |  JOIN l$rounds la ON cand.doc_a = la.node
              |  JOIN l$rounds lb ON cand.doc_b = lb.node
              |  WHERE la.label = lb.label GROUP BY 1),
              |dc AS (SELECT l.label AS label, count(*) AS d_c
              |  FROM ed JOIN l$rounds l ON ed.s = l.node GROUP BY 1),
              |per AS (SELECT dc.label, coalesce(ec.e_c, 0) AS e_c, dc.d_c
              |  FROM dc LEFT JOIN ec ON dc.label = ec.label)
              |SELECT count(*) AS n_communities,
              |  (SELECT m FROM mm) AS m_edges,
              |  CAST(sum(e_c) AS BIGINT) AS intra_edges,
              |  CAST(sum(CAST(d_c AS HUGEINT) * d_c) AS BIGINT) AS s2,
              |  CAST(((4 * CAST((SELECT m FROM mm) AS HUGEINT) * sum(e_c)
              |          - sum(CAST(d_c AS HUGEINT) * d_c)) * 1000000000000)
              |    // (4 * CAST((SELECT m FROM mm) AS HUGEINT)
              |          * (SELECT m FROM mm)) AS BIGINT) AS modularity_e12
              |FROM per""".stripMargin
    sb.toString
  }

  /** DuckDB oracle for [[graphLabelProp]] — the FULL graph rounds
    * unrolled (checks the ball-radius closed form).
    */
  def labelPropOracleSql(rounds: Int = 3): String =
    labelPropUnrollCtes(rounds) + s"""
       |SELECT cluster_size, count(*) AS n_clusters FROM (
       |  SELECT label, count(*) AS cluster_size FROM l$rounds GROUP BY 1)
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** §2.3 `q_copurchase_jaccard` — item-item similarity from the
    * bipartite order↔part structure: for part pairs co-occurring in
    * ≥2 orders, the Jaccard of their order sets, top 20. Pair
    * generation is the per-basket self-join — bounded by basket size
    * (≤7 lines in this schema), so the blow-up is O(orders·b²), never
    * all-pairs across the catalog — and the min-support filter prunes
    * the long random-co-occurrence tail before the degree joins. The
    * same shape is how market-basket recommenders and co-citation
    * graphs are built at 100 TB.
    */
  def copurchaseJaccard(spark: SparkSession, dir: String): DataFrame = {
    // one shuffle on order key collects each basket; the pair set is
    // then a narrow combination explode (bounded by basket size²),
    // NOT a lineitem self-join — same result, two fewer exchanges,
    // and the per-basket bound survives any catalog size
    val baskets = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ord"), col("l_partkey").as("part"))
      .groupBy(col("ord")).agg(sort_array(collect_set(col("part"))).as("parts"))
      .cutLineage(eager = false) // lazy: blocks die with the RDD, no session-lifetime cache pin
    val nOrd = baskets.select(explode(col("parts")).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("n_ord"))
    val pairsOf = expr(
      """flatten(transform(parts, (x, i) ->
        |  transform(slice(parts, i + 2, size(parts) - i - 1),
        |    y -> struct(x AS pa, y AS pb))))""".stripMargin)
    val pairs = baskets.select(explode(pairsOf).as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("common"))
      .filter(col("common") >= 2)
    val na = nOrd.select(col("part").as("pa"), col("n_ord").as("n_a"))
    val nb = nOrd.select(col("part").as("pb"), col("n_ord").as("n_b"))
    pairs.join(na, Seq("pa")).join(nb, Seq("pb"))
      .select(col("pa"), col("pb"), col("common"), col("n_a"), col("n_b"),
        // exact-count quotient, emitted unrounded (tie-attractor rule);
        // bit-identical on both engines so the top-20 order it keys is
        // identical too
        (col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common"))).as("jaccard"))
      .orderBy(col("jaccard").desc, col("pa"), col("pb"))
      .limit(20)
  }

  /** DuckDB oracle for [[copurchaseJaccard]]. */
  def copurchaseJaccardOracleSql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ord, l_partkey AS part
      |  FROM lineitem),
      |n AS (SELECT part, CAST(count(*) AS BIGINT) AS n_ord FROM li GROUP BY 1),
      |p AS (SELECT a.part AS pa, b.part AS pb, CAST(count(*) AS BIGINT) AS common
      |  FROM li a JOIN li b ON a.ord = b.ord AND a.part < b.part
      |  GROUP BY 1, 2 HAVING count(*) >= 2)
      |SELECT p.pa AS pa, p.pb AS pb, p.common AS common,
      |  na.n_ord AS n_a, nb.n_ord AS n_b,
      |  CAST(p.common AS DOUBLE) / (na.n_ord + nb.n_ord - p.common)
      |    AS jaccard
      |FROM p JOIN n na ON p.pa = na.part JOIN n nb ON p.pb = nb.part
      |ORDER BY jaccard DESC, pa, pb LIMIT 20""".stripMargin

  /** DuckDB oracle for [[graphTriangles]] (full graph). */
  def trianglesOracleSql: String =
    "WITH " + Dedup.candOracleBody +
      """,
        |tri AS (SELECT count(*) AS n_triangles FROM cand e1
        |  JOIN cand e2 ON e1.doc_b = e2.doc_a
        |  JOIN cand e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b),
        |nn AS (SELECT count(DISTINCT doc_id) AS n_nodes FROM (
        |  SELECT doc_a AS doc_id FROM cand
        |  UNION ALL SELECT doc_b AS doc_id FROM cand)),
        |ne AS (SELECT count(*) AS n_edges FROM cand)
        |SELECT nn.n_nodes, ne.n_edges, tri.n_triangles FROM nn, ne, tri""".stripMargin
}
