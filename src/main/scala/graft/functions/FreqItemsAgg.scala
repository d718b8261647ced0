package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items sketch as a mergeable imperative
  * aggregate (SURVEY.md §2.3): per group, a bounded map of at most
  * `capacity` candidate heavy hitters. The buffer is O(capacity)
  * regardless of input size, partial aggregation (map-side combine)
  * works, and the merge is the standard summary merge (combine, then
  * subtract the (capacity+1)-th largest count from every candidate) —
  * the canonical bounded-memory answer to "top tokens over a 100 TB
  * corpus" where an exact groupBy of the full vocabulary would not
  * fit. Counts are exact whenever the true distinct count stays at or
  * under `capacity` (the regime the oracle checks); above it they are
  * undercounts within the classic n/(capacity+1) Misra–Gries bound.
  */
case class FreqItemsAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  /** Decrement every candidate by `d` and evict the non-positive —
    * the Misra–Gries step that bounds the summary.
    */
  private def decrement(buf: mutable.HashMap[String, Long], d: Long): Unit = {
    if (d <= 0) return
    val dead = mutable.ArrayBuffer.empty[String]
    buf.mapValuesInPlace((_, c) => c - d)
    buf.foreach { case (k, c) => if (c <= 0) dead += k }
    dead.foreach(buf.remove)
  }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity => buf.update(key, 1L)
        case None => decrement(buf, 1L)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // summary merge: subtract the (capacity+1)-th largest count so
      // at most `capacity` candidates stay positive
      val counts = a.values.toArray.sortInPlace()(Ordering[Long].reverse)
      decrement(a, counts(capacity))
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toArray.sortBy(_._1)
    new ArrayBasedMapData(
      new GenericArrayData(entries.map(e => UTF8String.fromString(e._1)): Array[Any]),
      new GenericArrayData(entries.map(e => java.lang.Long.valueOf(e._2)): Array[Any]))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) => out.writeUTF(k); out.writeLong(c) }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) { buf.update(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

object FreqItemsAggFunctions {
  /** Bounded heavy-hitter map of `values` with at most `capacity`
    * tracked candidates.
    */
  def freq_items_sketch(values: Column, capacity: Int): Column =
    Shim.toColumn(FreqItemsAgg(Shim.toExpression(values), capacity)
      .toAggregateExpression(isDistinct = false))
}
