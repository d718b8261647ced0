package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for cosine similarity over
  * `array<double>` columns — the hot inner loop of the ANN operators
  * (SURVEY.md §2.4).
  *
  * Why a custom expression instead of the higher-order-function
  * composition in [[graft.similarity.VectorOps]]: `aggregate`/
  * `zip_with` allocate an intermediate array and evaluate a lambda
  * per element per term (dot, |a|, |b| = three passes); this fuses
  * all three accumulations into one loop over the two backing
  * arrays with zero allocation, and participates in whole-stage
  * codegen via `doGenCode`. Semantics are kept bit-identical to the
  * HOF form (same left-to-right double accumulation, same
  * dot/(sqrt(na)*sqrt(nb)) final form) so either path yields the
  * same oracle-checked results — asserted in VectorExprSpec.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Native squared-L2 distance over `array<double>` columns, with the
  * SAME left-to-right accumulation order as the portable
  * `aggregate(sequence(1, n), 0.0, (acc, j) -> acc + (a[j]-b[j])²)`
  * fold it replaces (and as DuckDB's `list_sum(list_transform(...))`),
  * so distances — and therefore argmins and rank cuts — stay
  * bit-equal across engines. The HOF form allocates a boxed closure
  * per element per row; on the ADC probe×corpus scoring grid that
  * allocation pressure was the dominant cost at 30× scale
  * (BENCH_STRESS_r10.md), and this fused loop removes it.
  */
case class SquaredL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused PQ sub-distance kernel: for a vector and a K-entry codebook
  * (array of K full vectors) it computes the M per-subspace distance
  * vectors d0..d(M-1), each K entries, where
  * `out[mi][kk] = Σ_{j=0..sub-1} (v[mi·sub+j] − cb[kk][mi·sub+j])²`
  * — the code-assignment inner loop of the product-quantization
  * family (§2.4 `ann_pq_codes` and descendants).
  *
  * Replaces the interpreted `transform(sequence(0, K−1), kk →
  * aggregate(sequence(1, sub), …))` HOF nest, which evaluated
  * M×K×sub boxed closures per row; at 30× scale that allocation/GC
  * pressure turned a linear plan into a 24× in-suite blowup
  * (BENCH_STRESS_r10.md — the r10 verdict's `ann_pq_codes` weak
  * mark). The inner accumulation is the same left fold, so every
  * distance is bit-identical to the HOF form and to DuckDB's
  * `list_sum(list_transform(...))` oracle.
  */
case class PqSubDistances(left: Expression, right: Expression,
    m: Int, sub: Int, k: Int)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any =
    PqSubDistances.dists(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      m, sub, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("pqKernel", PqSubDistances,
      "graft.functions.PqSubDistances$")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $kernel.dists($a, $b, $m, $sub, $k);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object PqSubDistances {
  /** One pass per (subspace, codebook entry): primitive-array math,
    * no per-element allocation. Codebook entries are decoded to
    * `double[]` once per call (K×dim doubles — trivial next to the
    * closure traffic this replaces; the broadcast row itself is
    * shared, not copied, by the columnar reader).
    */
  def dists(vec: ArrayData, cb: ArrayData, m: Int, sub: Int, k: Int): ArrayData = {
    val out = new Array[Any](m)
    val v = vec.toDoubleArray()
    val cbv = new Array[Array[Double]](k)
    var kk = 0
    while (kk < k) { cbv(kk) = cb.getArray(kk).toDoubleArray(); kk += 1 }
    var mi = 0
    while (mi < m) {
      val d = new Array[Double](k)
      val base = mi * sub
      kk = 0
      while (kk < k) {
        val c = cbv(kk)
        var acc = 0.0
        var j = 0
        while (j < sub) {
          val diff = v(base + j) - c(base + j)
          acc += diff * diff
          j += 1
        }
        d(kk) = acc
        kk += 1
      }
      out(mi) = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(d)
      mi += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorFunctions {
  /** Column-level API for [[CosineSimilarity]]. */
  def cosine_sim(a: Column, b: Column): Column =
    Shim.toColumn(CosineSimilarity(Shim.toExpression(a), Shim.toExpression(b)))

  /** Column-level API for [[SquaredL2]]. */
  def squared_l2(a: Column, b: Column): Column =
    Shim.toColumn(SquaredL2(Shim.toExpression(a), Shim.toExpression(b)))

  /** Column-level API for [[PqSubDistances]]. */
  def pq_sub_dists(v: Column, cb: Column, m: Int, sub: Int, k: Int): Column =
    Shim.toColumn(PqSubDistances(Shim.toExpression(v), Shim.toExpression(cb), m, sub, k))
}
