package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.Dedup

/** Candidate-graph analytics (SURVEY.md §2.3 additions): the near-dup
  * candidate pairs form a graph whose shape a dedup pipeline monitors
  * — degree distribution (is any doc a hub that will blow up
  * verification?) and triangle count (how clique-like are the
  * clusters?). Both stay distributed: degree is one explode + two
  * bounded aggregations; triangles use the ordered-edge join (each
  * triangle counted exactly once at its smallest vertex), never an
  * all-pairs pass. LSH band width bounds bucket sizes and therefore
  * node degree, which is what keeps the e1⋈e2 wedge join from
  * exploding at 100 TB.
  */
object GraphOps {

  private def pairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashCandidatePairs(spark, dir)

  /** §2.3#128 — degree histogram of the candidate graph. */
  def graphDegreeHist(spark: SparkSession, dir: String): DataFrame =
    pairs(spark, dir)
      .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("degree"))

  /** §2.3#129 — global graph profile: nodes, edges, triangles. The
    * triangle pass joins ordered edges (doc_a < doc_b everywhere):
    * wedges e1=(a,b), e2=(b,c) close iff (a,c) is an edge.
    */
  def graphTriangles(spark: SparkSession, dir: String): DataFrame = {
    // localCheckpoint (eager) instead of cache(): the pair set is
    // materialized once for its three consumers, and the blocks are
    // released by the ContextCleaner when the plan is GC'd — a
    // .cache() here leaked CacheManager entries on every invocation
    val e = pairs(spark, dir).localCheckpoint()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.doc_b") === col("e2.doc_a"))
      .join(e.as("e3"),
        col("e3.doc_a") === col("e1.doc_a") && col("e3.doc_b") === col("e2.doc_b"))
      .agg(count(lit(1)).as("n_triangles"))
    val nodes = e.select(explode(array(col("doc_a"), col("doc_b"))).as("d"))
      .agg(countDistinct(col("d")).as("n_nodes"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(edges).crossJoin(tri)
  }

  /** §2.3 `graph_assortativity` — degree assortativity of the
    * candidate graph: Pearson correlation of endpoint degrees over
    * the symmetric edge incidence (each undirected edge counted both
    * directions). Positive r = hubs pair with hubs (clique-like
    * near-dup clusters, the verification hotspots); negative = star
    * families around one template doc. Degrees are one explode +
    * bounded agg; the corr is a single-pass moment aggregate after
    * two bounded-key joins.
    */
  def graphAssortativity(spark: SparkSession, dir: String): DataFrame = {
    val e = pairs(spark, dir).localCheckpoint()
    val deg = e.select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("deg"))
    val sym = e.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(e.select(col("doc_b").as("u"), col("doc_a").as("v")))
    sym
      .join(deg.select(col("doc_id").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("doc_id").as("v"), col("deg").as("dv")), Seq("v"))
      .agg(count(lit(1)).as("n_endpoints"),
        round(corr(col("du").cast("double"), col("dv").cast("double")), 4)
          .as("assortativity"))
  }

  /** DuckDB oracle for [[graphAssortativity]]. */
  def assortativityOracleSql: String =
    "WITH " + Dedup.candOracleBody +
      """,
        |deg AS (SELECT d, count(*) AS deg FROM (
        |  SELECT doc_a AS d FROM cand UNION ALL SELECT doc_b FROM cand)
        |  GROUP BY 1),
        |sym AS (SELECT doc_a AS u, doc_b AS v FROM cand
        |  UNION ALL SELECT doc_b AS u, doc_a AS v FROM cand)
        |SELECT count(*) AS n_endpoints,
        |  round(corr(a.deg, b.deg), 4) AS assortativity
        |FROM sym JOIN deg a ON sym.u = a.d JOIN deg b ON sym.v = b.d""".stripMargin

  /** §2.3#149 — PageRank over the undirected candidate graph: five
    * fixed damped iterations (d = 0.85) of the pregel-style
    * message-passing layout — each step joins ranks to the edge list
    * on the source key and re-aggregates on the destination, so one
    * iteration is exactly two shuffles on node id and nothing is ever
    * driver-resident except the node count (a scalar). Lineage is cut
    * per step with an eager localCheckpoint exactly like the
    * connected-components loop. Fixed iteration count keeps the
    * result a deterministic function the SQL oracle replays unrolled.
    */
  def graphPagerank(spark: SparkSession, dir: String, iters: Int = 5,
      damp: Double = 0.85): DataFrame = {
    val p = pairs(spark, dir)
    val e = p.select(col("doc_a").as("s"), col("doc_b").as("t"))
      .union(p.select(col("doc_b").as("s"), col("doc_a").as("t")))
      .localCheckpoint()
    val deg = e.groupBy(col("s")).agg(count(lit(1)).as("d"))
    val n = deg.count() // scalar node count, the only driver-side value
    var r = deg.select(col("s").as("node"), lit(1.0 / n).as("r"))
    var it = 0
    while (it < iters) {
      r = e.join(r, e("s") === r("node"))
        .join(deg, "s")
        .groupBy(col("t"))
        .agg(sum(col("r") / col("d")).as("contrib"))
        .select(col("t").as("node"),
          (lit((1 - damp) / n) + lit(damp) * col("contrib")).as("r"))
        .localCheckpoint()
      it += 1
    }
    r.select(col("node").as("doc_id"),
        (round(col("r"), 6) + lit(0.0)).as("pagerank"))
      .orderBy(col("doc_id"))
  }

  /** DuckDB oracle for [[graphPagerank]]: the same five damped
    * iterations unrolled, every CTE MATERIALIZED (multiply-referenced
    * plain CTEs re-inline their whole prefix per reference).
    */
  def pagerankOracleSql(iters: Int = 5): String = {
    val sb = new StringBuilder
    sb ++= "WITH " + Dedup.candOracleBody
    sb ++= """,
             |ed AS MATERIALIZED (SELECT doc_a AS s, doc_b AS t FROM cand
             |  UNION ALL SELECT doc_b AS s, doc_a AS t FROM cand),
             |deg AS MATERIALIZED (SELECT s, CAST(count(*) AS DOUBLE) AS d FROM ed GROUP BY 1),
             |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
             |r0 AS MATERIALIZED (SELECT s AS node, 1.0 / (SELECT n FROM nn) AS r FROM deg)""".stripMargin
    for (k <- 1 to iters) {
      sb ++= s""",
                |r$k AS MATERIALIZED (SELECT ed.t AS node,
                |  0.15 / (SELECT n FROM nn) + 0.85 * sum(r${k - 1}.r / deg.d) AS r
                |  FROM ed JOIN r${k - 1} ON ed.s = r${k - 1}.node
                |  JOIN deg ON ed.s = deg.s GROUP BY 1)""".stripMargin
    }
    sb ++= s"""
              |SELECT node AS doc_id, round(r, 6) + 0.0 AS pagerank
              |FROM r$iters ORDER BY doc_id""".stripMargin
    sb.toString
  }

  /** DuckDB oracle for [[graphDegreeHist]]. */
  def degreeHistOracleSql: String =
    "WITH " + Dedup.candOracleBody +
      """,
        |deg AS (SELECT doc_id, count(*) AS degree FROM (
        |  SELECT doc_a AS doc_id FROM cand
        |  UNION ALL SELECT doc_b AS doc_id FROM cand)
        |  GROUP BY doc_id)
        |SELECT degree, count(*) AS n_nodes FROM deg
        |GROUP BY degree ORDER BY degree""".stripMargin

  /** §2.3#168 — multi-source BFS layers: frontier expansion from the
    * deterministic seed set (node % 29 == 0) over the candidate
    * graph, k fixed rounds. Each round is ONE equi-join of the
    * current frontier to the edge list plus an anti-join against the
    * visited set — the textbook distributed BFS where work per round
    * is proportional to the frontier, never the whole graph; lineage
    * is cut per round like the pagerank/CC loops. Output is the
    * bounded per-level node count (reachability profile).
    */
  def graphBfsLayers(spark: SparkSession, dir: String, iters: Int = 4): DataFrame = {
    val p = pairs(spark, dir)
    val e = p.select(col("doc_a").as("s"), col("doc_b").as("t"))
      .union(p.select(col("doc_b").as("s"), col("doc_a").as("t")))
      .localCheckpoint()
    var visited = e.select(col("s").as("node")).distinct()
      .filter(col("node") % 29 === 0)
      .select(col("node"), lit(0L).as("dist"))
      .localCheckpoint()
    var frontier = visited
    var it = 0
    while (it < iters) {
      val next = e.join(frontier.select(col("node").as("f")), col("s") === col("f"))
        .select(col("t").as("node")).distinct()
        .join(visited.select(col("node").as("seen")),
          col("node") === col("seen"), "left_anti")
        .select(col("node"), lit(it + 1L).as("dist"))
        .localCheckpoint()
      visited = visited.union(next).localCheckpoint()
      frontier = next
      it += 1
    }
    visited.groupBy(col("dist")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("dist"))
  }

  /** DuckDB oracle for [[graphBfsLayers]] — the same rounds unrolled. */
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
    * degree < k and restrict the edge list to survivors, a fixed
    * number of rounds (the dense-community filter used to pick
    * high-connectivity dup clusters). Each round is one partial-agg
    * degree count plus two semi-joins — work shrinks with the
    * surviving subgraph, nothing driver-resident but two per-round
    * scalars, lineage cut per round like the CC/PageRank loops. Fixed
    * rounds keep it a deterministic function the oracle unrolls.
    */
  def graphKcore(spark: SparkSession, dir: String, k: Int = 3,
      rounds: Int = 4): DataFrame = {
    import spark.implicits._
    val p = pairs(spark, dir)
    var edges = p.select(col("doc_a").as("s"), col("doc_b").as("t"))
      .union(p.select(col("doc_b").as("s"), col("doc_a").as("t")))
      .localCheckpoint()
    val profile = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    var r = 1
    while (r <= rounds) {
      val deg = edges.groupBy(col("s")).agg(count(lit(1)).as("d"))
        .localCheckpoint()
      val keep = deg.filter(col("d") >= k).select(col("s").as("node"))
        .localCheckpoint()
      val nKeep = keep.count()
      val nRemoved = deg.count() - nKeep
      edges = edges
        .join(keep.select(col("node").as("ks")), col("s") === col("ks"), "left_semi")
        .join(keep.select(col("node").as("kt")), col("t") === col("kt"), "left_semi")
        .localCheckpoint()
      profile += ((r.toLong, nRemoved, nKeep))
      r += 1
    }
    profile.toSeq.toDF("round", "n_removed", "n_remaining")
  }

  /** DuckDB oracle for [[graphKcore]] — the same peel rounds unrolled. */
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

  /** §2.3 `graph_label_prop` — bounded-round min-label propagation
    * over the candidate graph: every node starts as its own label and
    * each round takes the min of its own and its neighbors' labels.
    * Full connected components ([[graft.dedup.Dedup.dedupCcClusters]])
    * iterates this to fixpoint; at 100 TB you cap the rounds — label
    * propagation converges within the graph diameter, and near-dup
    * cluster diameters are small — and read off the cluster-size
    * histogram. Each round is one keyed join + partial-agg min, the
    * lineage cut per round (the PageRank/BFS loop shape); nothing is
    * ever driver-resident.
    */
  def graphLabelProp(spark: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val p = pairs(spark, dir)
    val e = p.select(col("doc_a").as("s"), col("doc_b").as("t"))
      .union(p.select(col("doc_b").as("s"), col("doc_a").as("t")))
      .localCheckpoint()
    var labels = e.select(col("s").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var it = 0
    while (it < rounds) {
      val nbrMin = e
        .join(labels.select(col("node").as("s"), col("label").as("nl")), Seq("s"))
        .groupBy(col("t").as("node")).agg(min(col("nl")).as("nbr_min"))
      labels = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label"))
        .localCheckpoint()
      it += 1
    }
    labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size")).agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("cluster_size"))
  }

  /** DuckDB oracle for [[graphLabelProp]] — the same rounds unrolled. */
  def labelPropOracleSql(rounds: Int = 3): String = {
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
    sb ++= s"""
              |SELECT cluster_size, count(*) AS n_clusters FROM (
              |  SELECT label, count(*) AS cluster_size FROM l$rounds GROUP BY 1)
              |GROUP BY 1 ORDER BY 1""".stripMargin
    sb.toString
  }

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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
        round(col("common").cast("double") /
          (col("n_a") + col("n_b") - col("common")), 4).as("jaccard"))
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
      |  round(CAST(p.common AS DOUBLE) / (na.n_ord + nb.n_ord - p.common), 4)
      |    AS jaccard
      |FROM p JOIN n na ON p.pa = na.part JOIN n nb ON p.pb = nb.part
      |ORDER BY jaccard DESC, pa, pb LIMIT 20""".stripMargin

  /** DuckDB oracle for [[graphTriangles]]. */
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
