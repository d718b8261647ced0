package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Uncentered Gram (scatter) matrix of a vector column as a mergeable
  * imperative aggregate (SURVEY.md §2.4): the buffer is the d(d+1)/2
  * upper triangle of Σ v·vᵀ in doubles — O(d²) regardless of row
  * count, so partial aggregation (map-side combine) reduces a 100 TB
  * embedding table to one tiny array per partition before a single
  * final merge. This is the one-pass input to covariance/PCA: the
  * d×d result is a bounded driver-side object (d = 64 → 2080 cells),
  * never a data-sized intermediate — the explode-and-self-join
  * formulation it replaces would shuffle n·d² rows.
  */
case class GramMatrixAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] {

  private val triLen = dim * (dim + 1) / 2

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("g", DoubleType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Array[Double] = new Array[Double](triLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"gram_matrix(dim=$dim) got a ${arr.numElements()}-element vector")
      val x = new Array[Double](dim)
      var k = 0
      while (k < dim) { x(k) = arr.getFloat(k).toDouble; k += 1 }
      var i = 0
      var idx = 0
      while (i < dim) {
        val xi = x(i)
        var j = i
        while (j < dim) { buf(idx) += xi * x(j); j += 1; idx += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var k = 0
    while (k < triLen) { a(k) += b(k); k += 1 }
    a
  }

  override def eval(buf: Array[Double]): Any = {
    val out = new Array[Any](triLen)
    var i = 0
    var idx = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        out(idx) = new GenericInternalRow(
          Array[Any](i.toLong, j.toLong, buf(idx)))
        j += 1; idx += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(triLen * 8)
    var k = 0
    while (k < triLen) { bb.putDouble(buf(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](triLen)
    var k = 0
    while (k < triLen) { buf(k) = bb.getDouble(); k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

object GramMatrixAggFunctions {
  /** Upper-triangle Gram matrix cells (i ≤ j) of a float-vector
    * column, as array&lt;struct&lt;i,j,g&gt;&gt;.
    */
  def gram_matrix(vec: Column, dim: Int): Column =
    Shim.toColumn(GramMatrixAgg(Shim.toExpression(vec), dim)
      .toAggregateExpression(isDistinct = false))
}
