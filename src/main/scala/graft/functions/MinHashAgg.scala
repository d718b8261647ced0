package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distributed MinHash sketch as a custom imperative aggregate
  * (SURVEY.md §2.3): per group, the element-wise minimum of k
  * md5-based signatures over every member's shingles. The buffer is
  * the k-vector of current minima, so partial aggregation (map-side
  * combine) and merge are exact and tiny — the canonical
  * mergeable-sketch pattern for set-similarity over 100 TB groups.
  * Signature definition matches [[MinHashSigs]] (and the DuckDB
  * oracle) md5-for-md5: sketch(group) == MinHashSigs(concat of all
  * members' shingles).
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[String]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def createAggregationBuffer(): Array[String] = new Array[String](k)

  private lazy val prefixes: Array[Array[Byte]] =
    (0 until k).map(j => s"$j|".getBytes(StandardCharsets.UTF_8)).toArray

  override def update(buf: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val shingles = v.asInstanceOf[ArrayData]
      val md = Digests.threadMd5.get()
      var s = 0
      while (s < shingles.numElements()) {
        if (!shingles.isNullAt(s)) {
          val sb = shingles.getUTF8String(s).getBytes
          var j = 0
          while (j < k) {
            val p = prefixes(j)
            val bytes = new Array[Byte](p.length + sb.length)
            System.arraycopy(p, 0, bytes, 0, p.length)
            System.arraycopy(sb, 0, bytes, p.length, sb.length)
            val hex = new String(Digests.md5Hex(md, bytes))
            if (buf(j) == null || hex.compareTo(buf(j)) < 0) buf(j) = hex
            j += 1
          }
        }
        s += 1
      }
    }
    buf
  }

  override def merge(a: Array[String], b: Array[String]): Array[String] = {
    var j = 0
    while (j < k) {
      if (a(j) == null || (b(j) != null && b(j).compareTo(a(j)) < 0)) a(j) = b(j)
      j += 1
    }
    a
  }

  override def eval(buf: Array[String]): Any =
    new GenericArrayData(buf.map(m => if (m == null) null else UTF8String.fromString(m)))

  override def serialize(buf: Array[String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { s => out.writeBoolean(s != null); if (s != null) out.writeUTF(s) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[String] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(if (in.readBoolean()) in.readUTF() else null)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

object MinHashAggFunctions {
  /** Column API: group-level MinHash sketch over a shingle-array column. */
  def minhash_agg(shingles: Column, k: Int): Column =
    Shim.toColumn(MinHashAgg(Shim.toExpression(shingles), k)
      .toAggregateExpression(isDistinct = false))
}
