package graft

import org.apache.spark.sql.functions._

import graft.functions.GramMatrixAggFunctions.gram_matrix

/** Gram-matrix aggregate + PCA projection behavior beyond the DuckDB
  * oracle: partitioning-independence of the mergeable buffer, exact
  * values on a hand-computed fixture, and the eigen-residual of the
  * power-iterated principal direction.
  */
class GramPcaSpec extends GraftSpec {

  import spark.implicits._

  private def gramOf(rows: Seq[Seq[Float]], parts: Int): Map[(Long, Long), Double] =
    rows.toDF("embedding").repartition(parts)
      .agg(gram_matrix(col("embedding"), rows.head.size).as("cells"))
      .select(explode(col("cells")).as("c"))
      .select(col("c.i"), col("c.j"), col("c.g"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap

  test("gram matrix matches the hand-computed fixture") {
    // vectors (1,2), (3,4): Σ v·vᵀ = [[10, 14], [14, 20]]
    val g = gramOf(Seq(Seq(1f, 2f), Seq(3f, 4f)), parts = 2)
    assert(g === Map((0L, 0L) -> 10.0, (0L, 1L) -> 14.0, (1L, 1L) -> 20.0))
  }

  test("gram buffer merge is partitioning-independent") {
    // dyadic values (multiples of 0.25): every product and partial sum
    // is exactly representable, so the merge-order independence check
    // is exact, not approximate
    val vecs = (0 until 97).map(i => Seq(i * 0.25f, (i % 7) - 3f, (i % 5) * 0.5f))
    val one = gramOf(vecs, parts = 1)
    assert(gramOf(vecs, parts = 8) === one)
  }

  test("pca direction is a near-eigenvector of the gram matrix") {
    val d = 64
    val cells = graft.sources.Tables.embeddings(spark, sf)
      .agg(gram_matrix(col("embedding"), d).as("cells"))
      .select(explode(col("cells")).as("c"))
      .select(col("c.i"), col("c.j"), col("c.g"))
      .collect()
    val g = Array.ofDim[Double](d, d)
    cells.foreach { r =>
      val i = r.getLong(0).toInt; val j = r.getLong(1).toInt; val v = r.getDouble(2)
      g(i)(j) = v; g(j)(i) = v
    }
    // the registry query fixes 10 iterations for oracle determinism;
    // here run the same iteration to (near-)convergence to check the
    // method itself finds an eigenvector of this Gram matrix
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    (0 until 50).foreach { _ =>
      val w = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * v(j)).sum)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
    }
    val gv = Array.tabulate(d)(i => (0 until d).map(j => g(i)(j) * v(j)).sum)
    val lambda = (0 until d).map(i => v(i) * gv(i)).sum // Rayleigh quotient
    val residual = math.sqrt((0 until d).map(i => math.pow(gv(i) - lambda * v(i), 2)).sum)
    assert(lambda > 0.0)
    assert(residual / lambda < 0.01, s"residual $residual vs lambda $lambda")
  }

  test("pca projection output is one score per vector") {
    val out = graft.similarity.Ann.vecPcaProject(spark, sf).collect()
    val n = graft.sources.Tables.embeddings(spark, sf).count()
    assert(out.length === n.toInt)
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    // scores are finite and not all identical (the direction separates something)
    val scores = out.map(_.getDouble(2))
    assert(scores.forall(s => !s.isNaN && !s.isInfinite))
    assert(scores.distinct.length > 1)
  }
}
