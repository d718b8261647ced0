package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic HyperLogLog sketch as a custom mergeable aggregate
  * (the approximate-distinct scale path of SURVEY.md §2.2 #24, made
  * cross-engine exact).
  *
  * Construction (md5-based so a SQL oracle reproduces it bit-exactly,
  * like every other hash in this engine):
  *   - m = 64 registers; bucket = low 6 bits of md5 byte 0;
  *   - rho = (leading zero bits of md5 bytes 1..15) + 1, capped at 30;
  *   - register = max rho; merge = element-wise max (the buffer is 64
  *     bytes — map-side partials and shuffle payloads are tiny
  *     regardless of group size, which is the whole point vs exact
  *     countDistinct's per-group hash set at 100 TB);
  *   - estimate = α₆₄·m² / Σ 2^(−reg). The harmonic sum is computed
  *     as the EXACT integer Σ 2^(30−reg) (order-independent — no
  *     float summation nondeterminism), divided once.
  *
  * Output: struct(estimate DOUBLE, reg_digest STRING) where
  * reg_digest is md5 over the ordered "bucket:reg" list — the oracle
  * checks the full register state, not just the estimate.
  */
case class HllAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val M = 64
  private val RhoCap = 30

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("estimate", DoubleType, nullable = false),
    StructField("reg_digest", StringType, nullable = false)))

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val md = Digests.threadMd5.get()
      md.reset()
      val d = md.digest(v.asInstanceOf[UTF8String].getBytes)
      val bucket = d(0) & 0x3f
      var zeros = 0
      var i = 1
      var done = false
      while (i < 16 && !done) {
        val b = d(i) & 0xff
        if (b == 0) zeros += 8
        else { zeros += Integer.numberOfLeadingZeros(b) - 24; done = true }
        i += 1
      }
      val rho = math.min(zeros + 1, RhoCap).toByte
      if (rho > buf(bucket)) buf(bucket) = rho
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var sInt = 0L
    var zeroRegs = 0
    var i = 0
    while (i < M) {
      sInt += (1L << (RhoCap - buf(i)))
      if (buf(i) == 0) zeroRegs += 1
      i += 1
    }
    // α₆₄ = 0.709; scale by 2^30 to divide the exact integer sum once
    val raw = 0.709 * 4096.0 * 1073741824.0 / sInt.toDouble
    // standard small-range (linear counting) correction: below 2.5m
    // with empty registers, the zero-register count is the better
    // estimator (the raw formula overshoots badly at n ≪ m)
    val estimate =
      if (raw <= 2.5 * M && zeroRegs > 0) M.toDouble * math.log(M.toDouble / zeroRegs)
      else raw
    val regs = (0 until M).map(b => s"$b:${buf(b)}").mkString(",")
    val md = Digests.threadMd5.get()
    val digest = new String(Digests.md5Hex(md,
      regs.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    InternalRow(estimate, UTF8String.fromString(digest))
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** The same deterministic HLL, evaluating to the RAW 64-register
  * array instead of the finished estimate — the mergeable-sketch
  * face: registers from different groups/partitions/days combine by
  * element-wise max (set union) without touching the raw data again,
  * which is what makes sketch algebra (union/intersection estimates
  * across segments) an O(segments) post-pass at 100 TB. Update and
  * merge logic is [[HllAgg]]'s, byte for byte.
  */
case class HllRegsAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val inner = HllAgg(child)

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def createAggregationBuffer(): Array[Byte] =
    inner.createAggregationBuffer()

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] =
    inner.update(buf, input)

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    inner.merge(a, b)

  override def eval(buf: Array[Byte]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(o: Int): HllRegsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllRegsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

object HllAggFunctions {
  /** Column API: HLL sketch over a STRING column (cast beforehand). */
  def hll_sketch(values: Column): Column =
    Shim.toColumn(HllAgg(Shim.toExpression(values))
      .toAggregateExpression(isDistinct = false))

  /** Column API: raw HLL registers (array<int>, length 64). */
  def hll_registers(values: Column): Column =
    Shim.toColumn(HllRegsAgg(Shim.toExpression(values))
      .toAggregateExpression(isDistinct = false))
}
