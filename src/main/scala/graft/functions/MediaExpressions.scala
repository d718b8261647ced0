package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType}

/** 32-bit difference hash (dHash) over an opaque binary media
  * payload: the payload is cut into 33 equal byte blocks, each block
  * is reduced to its mean, and bit i records whether block i's mean
  * exceeds block i+1's — the 1-D analogue of the classic image dHash
  * (9×8 luminance grid → 64 gradient bits). One narrow pass per blob,
  * no shuffle: the scale path for perceptual near-dup detection over
  * a 100 TB media corpus is phash → LSH band join, exactly like
  * [[graft.dedup.Dedup.dedupSimhash]] for text. A real deployment
  * feeds decoded luminance bytes instead of the raw payload; the
  * gradient kernel is unchanged.
  *
  * Payloads shorter than 33 bytes hash to 0 (no meaningful gradient).
  */
case class DHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private val Blocks = 33

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length
    if (n < Blocks) return 0L
    // block i = bytes[i*n/33, (i+1)*n/33); mean in double so the
    // comparison matches any engine computing sum/count in IEEE 754
    val means = new Array[Double](Blocks)
    var i = 0
    while (i < Blocks) {
      val start = i * n / Blocks
      val end = (i + 1) * n / Blocks
      var sum = 0L
      var j = start
      while (j < end) { sum += bytes(j) & 0xff; j += 1 }
      means(i) = sum.toDouble / (end - start)
      i += 1
    }
    var hash = 0L
    var k = 0
    while (k < Blocks - 1) {
      if (means(k) > means(k + 1)) hash |= 1L << k
      k += 1
    }
    hash
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MediaFunctions {
  def dhash32(payload: Column): Column =
    Shim.toColumn(DHash32(Shim.toExpression(payload)))
}
