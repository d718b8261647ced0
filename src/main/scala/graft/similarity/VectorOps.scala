package graft.similarity

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector primitives over `array<float>` embedding columns, built on
  * codegen'd higher-order functions (`transform`/`zip_with`/
  * `aggregate`) so they stay inside WholeStageCodegen. All math is in
  * double with left-to-right accumulation — the same order the DuckDB
  * oracle's list functions use — so rounded results compare exactly.
  */
object VectorOps {

  /** array<float> → array<double> */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(v: Column): Column =
    sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  def vSum(v: Column): Column = aggregate(v, lit(0.0), (acc, x) => acc + x)
  def vMin(v: Column): Column = array_min(v)
  def vMax(v: Column): Column = array_max(v)
}
