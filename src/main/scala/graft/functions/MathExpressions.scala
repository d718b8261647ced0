package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** `java.lang.Math.pow`-backed power — NOT Spark's built-in `POWER`.
  *
  * Spark's `Pow` expression evaluates through `StrictMath.pow`
  * (fdlibm), which is specified to ≤1 ulp but is NOT the correctly
  * rounded result; DuckDB evaluates through the platform libm, whose
  * pow IS correctly rounded on this image. The two disagree by 1 ulp
  * on real inputs — measured: `POWER(0.8, 42)` = 0x3f164cfda3281e48
  * (Spark/fdlibm) vs 0x3f164cfda3281e47 (DuckDB/libm/CPython), which
  * put a 1-ulp wobble into `q_ewma`'s unrounded output at sf0.01.
  * `Math.pow` delegates to the platform intrinsic/libm and matches
  * DuckDB bit-for-bit here; the PureFunctionProps pow pin freezes
  * that equivalence (digest over k=0..256 at base 0.8) so a platform
  * where `Math.pow` drifts fails loudly instead of silently breaking
  * oracle parity.
  *
  * Null semantics and type contract match `pow(col, col)` with both
  * sides already DoubleType (callers cast explicitly — no implicit
  * coercion is wired up for this internal expression).
  */
case class LibmPow(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Math.pow(a.asInstanceOf[Double], b.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = java.lang.Math.pow($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object MathFunctions {
  /** Column-level API for [[LibmPow]]; casts both sides to double
    * (mirroring the built-in `pow`'s implicit input cast).
    */
  def libm_pow(base: Column, exp: Column): Column =
    Shim.toColumn(LibmPow(
      Shim.toExpression(base.cast("double")),
      Shim.toExpression(exp.cast("double"))))
}
