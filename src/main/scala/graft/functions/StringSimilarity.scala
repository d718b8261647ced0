package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler string similarity as a native Catalyst expression.
  *
  * Spark has `levenshtein` but no Jaro-Winkler; this fills the gap
  * for fuzzy-match/record-linkage pipelines with the standard
  * Winkler variant (prefix scale p = 0.1, prefix cap 4, boost only
  * when jaro > 0.7) — the same constants DuckDB's
  * `jaro_winkler_similarity` uses, which is what the Verify oracle
  * compares against. One allocation-light pass per row (two boolean
  * scratch arrays sized to the inputs), no per-char closures.
  * `doGenCode` emits a direct kernel call, so a filter or projection
  * using it stays inside whole-stage codegen instead of falling back
  * to interpreted per-row evaluation.
  */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.similarity(
      l.asInstanceOf[UTF8String].toString,
      r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("jwKernel", JaroWinkler,
      "graft.functions.JaroWinkler$")
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $kernel.similarity($a.toString(), $b.toString());")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Standard Jaro similarity with Winkler prefix boost above 0.7. */
  def similarity(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val hi = math.min(lb - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true
          bMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t / 2.0) / md) / 3.0
    if (jaro > 0.7) {
      val maxP = math.min(4, math.min(la, lb))
      var p = 0
      while (p < maxP && a.charAt(p) == b.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }

  def jaro_winkler(l: Column, r: Column): Column =
    Shim.toColumn(JaroWinkler(Shim.toExpression(l), Shim.toExpression(r)))
}
