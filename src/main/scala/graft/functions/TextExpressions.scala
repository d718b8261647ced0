package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native expressions for the text-dedup hot loops (SURVEY.md §2.3).
  *
  * The portable formulations in Dedup.scala (higher-order
  * `filter`/`transform` with per-element md5 + substring lambdas)
  * evaluate an interpreted closure per token per bit/seed; these
  * expressions make one pass per row with a reused MessageDigest and
  * produce bit-identical results (asserted against the HOF forms in
  * NativeTextExprSpec, and against the DuckDB oracle by Verify):
  * md5 is computed on the same UTF-8 bytes, hex/nibble addressing
  * matches the oracle's `substr(md5(x), p, 1)` reading, and string
  * mins compare byte-wise like both engines' VARCHAR min.
  */
private object Digests {
  val threadMd5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  val HexChars: Array[Char] = "0123456789abcdef".toCharArray

  def md5Hex(md: MessageDigest, bytes: Array[Byte]): Array[Char] = {
    md.reset()
    val d = md.digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    out
  }
}

/** 32-bit SimHash over a token array: one md5 per token, nibble-bit
  * votes, '0'/'1'-string fingerprint — semantics of
  * [[graft.dedup.Dedup.dedupSimhash]]'s portable form.
  */
case class SimHash32(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val n = toks.numElements()
    val md = Digests.threadMd5.get()
    val votes = new Array[Int](32)
    var t = 0
    while (t < n) {
      val bytes = toks.getUTF8String(t).getBytes
      md.reset()
      val d = md.digest(bytes)
      // bit k reads hex char k/4 = nibble of digest byte (k/8),
      // high nibble for even hex positions; bit (3 - k%4) of it
      var k = 0
      while (k < 32) {
        val hexPos = k / 4
        val b = d(hexPos / 2)
        val nibble = if (hexPos % 2 == 0) (b >> 4) & 0xf else b & 0xf
        if (((nibble >> (3 - (k % 4))) & 1) == 1) votes(k) += 1
        k += 1
      }
      t += 1
    }
    val out = new Array[Char](32)
    var k = 0
    while (k < 32) {
      out(k) = if (2 * votes(k) > n) '1' else '0'
      k += 1
    }
    UTF8String.fromString(new String(out))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** k MinHash signatures over a shingle array: sig_j = min over
  * shingles of md5Hex("j|" ++ shingle) — semantics of the exploded
  * groupBy form in [[graft.dedup.Dedup.minhashSignatures]], fused
  * into one pass returning array<string>.
  */
case class MinHashSigs(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  private lazy val prefixes: Array[Array[Byte]] =
    (0 until k).map(j => s"$j|".getBytes(StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    val md = Digests.threadMd5.get()
    val mins = new Array[String](k)
    var s = 0
    while (s < n) {
      val sb = shingles.getUTF8String(s).getBytes
      var j = 0
      while (j < k) {
        val p = prefixes(j)
        val buf = new Array[Byte](p.length + sb.length)
        System.arraycopy(p, 0, buf, 0, p.length)
        System.arraycopy(sb, 0, buf, p.length, sb.length)
        val hex = new String(Digests.md5Hex(md, buf))
        if (mins(j) == null || hex.compareTo(mins(j)) < 0) mins(j) = hex
        j += 1
      }
      s += 1
    }
    new GenericArrayData(mins.map(m => if (m == null) null else UTF8String.fromString(m)))
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Jaccard similarity of two SORTED distinct string arrays via a
  * merge walk: |∩| / (|a| + |b| − |∩|). Same integers — hence the
  * same double — as the array_intersect/array_union composition.
  */
case class JaccardSorted(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val union = nx + ny - inter
    if (union == 0) 0.0 else inter.toDouble / union.toDouble
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Winnowing fingerprint set: md5 each k-gram character window, take
  * the minimum hash of every w-window of consecutive k-grams
  * (monotonic-deque sliding minimum — O(n), no per-window slices),
  * return the distinct selected hashes sorted ascending. Semantics of
  * [[graft.text.TextAnalysis.textWinnowing]]'s portable form.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // window over Unicode code points, not UTF-16 code units — the
    // oracle's substr/len count code points, and a surrogate pair
    // split across a window boundary would hash differently
    val cps = text.codePoints().toArray
    val n = cps.length - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    // UTF-8-encode once and record each code point's byte offset, so
    // every k-gram hashes a slice of the shared buffer — the naive
    // form allocates two strings per k-gram, which dominates the
    // whole operator's runtime on a large corpus
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    val offsets = new Array[Int](cps.length + 1)
    var ci = 0
    var boff = 0
    while (ci < cps.length) {
      val cp = cps(ci)
      boff += (if (cp < 0x80) 1 else if (cp < 0x800) 2
               else if (cp < 0x10000) 3 else 4)
      ci += 1
      offsets(ci) = boff
    }
    // the per-code-point widths above assume well-formed UTF-16 input:
    // UTF8String.toString cannot yield lone surrogates, but getBytes
    // would encode one as a single '?' byte and silently desync every
    // later offset — fail loudly rather than hash misaligned slices
    require(boff == bytes.length,
      s"UTF-8 offset table desync: computed $boff, encoded ${bytes.length}")
    val md = Digests.threadMd5.get()
    // raw 16-byte digests; unsigned byte order == hex-string order,
    // so compares are digest compares and hex is only rendered for
    // the selected minima at the end
    val hashes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, offsets(i), offsets(i + k) - offsets(i))
      hashes(i) = md.digest()
      i += 1
    }
    val cmp = new java.util.Comparator[Array[Byte]] {
      def compare(a: Array[Byte], b: Array[Byte]): Int =
        java.util.Arrays.compareUnsigned(a, b)
    }
    val selected = new java.util.TreeSet[Array[Byte]](cmp)
    if (n < w) {
      // fewer k-grams than the window width: no complete window, no
      // fingerprints (matches the portable sequence(1, m-w+1) form)
    } else {
      // monotonic deque of candidate indices, increasing hash order
      val deque = new java.util.ArrayDeque[Int]()
      var j = 0
      while (j < n) {
        while (!deque.isEmpty &&
            cmp.compare(hashes(deque.peekLast()), hashes(j)) >= 0)
          deque.pollLast()
        deque.addLast(j)
        if (deque.peekFirst() <= j - w) deque.pollFirst()
        if (j >= w - 1) selected.add(hashes(deque.peekFirst()))
        j += 1
      }
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) {
      val d = it.next()
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = Digests.HexChars((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = Digests.HexChars(d(b) & 0xf)
        b += 1
      }
      out(o) = UTF8String.fromString(new String(hex))
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Distinct md5 hashes of all n-token spans of a token array (tokens
  * joined by a single space, as the contamination oracle's
  * `md5(toks[i] || ' ' || …)` does). One pass per row: token bytes
  * are fetched once and each span hashes slices of a shared buffer —
  * the portable form (transform + element_at over the raw tokenizer
  * expression, then array_distinct) re-ran split() per element_at
  * once Spark's infer-filter-from-generate inlined it below the
  * projection (~750 tokenizations/doc). Hashing also shrinks the
  * exploded probe rows to fixed 32-char keys before the
  * contamination join's shuffle/broadcast.
  */
case class NGramSpanHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val Space: Byte = ' '.toByte

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val tb = new Array[Array[Byte]](m)
    var t = 0
    while (t < m) { tb(t) = toks.getUTF8String(t).getBytes; t += 1 }
    val md = Digests.threadMd5.get()
    // insertion-ordered distinct: order never reaches the output (the
    // operator explodes/counts spans), but determinism is free
    val seen = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i <= m - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(Space)
        md.update(tb(i + j))
        j += 1
      }
      val d = md.digest()
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = Digests.HexChars((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = Digests.HexChars(d(b) & 0xf)
        b += 1
      }
      seen.add(new String(hex))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Positioned variant of [[NGramSpanHashes]]: every n-token window's
  * md5 IN POSITION ORDER, duplicates kept — the input to cross-doc
  * substring dedup, which needs window POSITIONS to merge duplicated
  * windows into maximal duplicated regions (Lee et al. 2022 shape).
  * Same one-pass shared-buffer hashing; the oracle mirrors
  * `md5(toks[i] || ' ' || …)` per position.
  */
case class NGramSpanHashesPos(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  private val Space: Byte = ' '.toByte

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val tb = new Array[Array[Byte]](m)
    var t = 0
    while (t < m) { tb(t) = toks.getUTF8String(t).getBytes; t += 1 }
    val md = Digests.threadMd5.get()
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(Space)
        md.update(tb(i + j))
        j += 1
      }
      val d = md.digest()
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = Digests.HexChars((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = Digests.HexChars(d(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromString(new String(hex))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Subword token count under a pair-merge vocabulary (BPE truncated
  * to one merge-rank class): a word splits BETWEEN two adjacent
  * characters iff that character pair is NOT in the merges table, so
  * pieces(word) = 1 + #non-merged adjacent pairs and the row value is
  * Σ pieces over the token array. This closed form is what makes the
  * tokenizer replayable in SQL (a greedy longest-match loop is
  * sequential per word; a pair-connectivity split is one scan), while
  * keeping the real BPE apply shape: a broadcast merges table + a
  * narrow per-row kernel. Pairs step by CODE POINTS to match the
  * oracle's substr() character semantics.
  */
case class BpeTokenCount(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  // the merges array arrives via a 1-row broadcast join, so every row
  // in a task sees the same ArrayData instance: cache the decoded set
  // per thread, keyed by reference (expressions may be shared across
  // local-mode tasks, hence ThreadLocal rather than a plain field)
  @transient private lazy val cache =
    new ThreadLocal[(AnyRef, java.util.HashSet[String])]()

  private def mergeSet(merges: ArrayData): java.util.HashSet[String] = {
    val c = cache.get()
    if (c != null && (c._1 eq merges)) return c._2
    val s = new java.util.HashSet[String](merges.numElements() * 2)
    var i = 0
    while (i < merges.numElements()) { s.add(merges.getUTF8String(i).toString); i += 1 }
    cache.set((merges, s))
    s
  }

  override def nullSafeEval(toksAny: Any, mergesAny: Any): Any = {
    val toks = toksAny.asInstanceOf[ArrayData]
    val set = mergeSet(mergesAny.asInstanceOf[ArrayData])
    var total = 0L
    var t = 0
    while (t < toks.numElements()) {
      val s = toks.getUTF8String(t).toString
      total += 1L
      val cps = s.codePointCount(0, s.length)
      if (cps >= 2) {
        // pair at code point j = substring spanning code points j, j+1
        var offJ = 0
        var offJ1 = s.offsetByCodePoints(0, 1)
        var j = 0
        while (j <= cps - 2) {
          val offJ2 = if (offJ1 < s.length) s.offsetByCodePoints(offJ1, 1) else s.length
          if (!set.contains(s.substring(offJ, offJ2))) total += 1L
          offJ = offJ1
          offJ1 = offJ2
          j += 1
        }
      }
      t += 1
    }
    total
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Fused repetition-diagnostic kernel: bigram/trigram totals and
  * exact distinct counts in ONE pass over the token array — replaces
  * two HOF `transform` + `array_distinct` pipelines that materialized
  * every n-gram twice through interpreted lambdas (the same fix shape
  * as [[NGramSpanHashes]] for the contamination scan). Distinctness
  * is computed on the real n-gram strings (a per-row hash set), so
  * results are bit-identical to the portable formulation and the
  * DuckDB oracle — no hash-collision caveat.
  */
case class NGramDupStats(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n2", LongType, nullable = false),
    StructField("d2", LongType, nullable = false),
    StructField("n3", LongType, nullable = false),
    StructField("d3", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    NGramDupStats.stats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kernel = ctx.addReferenceObj("dupKernel", NGramDupStats,
      "graft.functions.NGramDupStats$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kernel.stats($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NGramDupStats {
  /** One pass over the token array: bigram/trigram totals and exact
    * distinct counts (real strings in a per-row hash set — no
    * hash-collision caveat vs the oracle).
    */
  def stats(arr: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = arr.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) {
      toks(i) = arr.getUTF8String(i).toString
      i += 1
    }
    val set2 = new java.util.HashSet[String]()
    val set3 = new java.util.HashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var n2 = 0L
    var n3 = 0L
    i = 0
    while (i + 1 < n) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
      set2.add(sb.toString)
      n2 += 1
      if (i + 2 < n) {
        sb.append(' ').append(toks(i + 2))
        set3.add(sb.toString)
        n3 += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      n2, set2.size.toLong, n3, set3.size.toLong)
  }
}

/** One-pass per-document code-point histogram statistics: total code
  * points, distinct code points, and Σ round(c·log2 c · 10⁶) over the
  * per-code-point counts as an exact long (so the entropy derived
  * from it is immune to float summation order — the same fence the
  * HOF formulation used, minus its O(distinct × length) counting
  * loop). Semantics match substr-per-code-point counting exactly:
  * `length()` and `substr()` in both engines address code points.
  */
case class CharHistStats(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("k", LongType, nullable = false),
    StructField("sum_scaled", LongType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    CharHistStats.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val kernel = ctx.addReferenceObj("charHistKernel", CharHistStats,
      "graft.functions.CharHistStats$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kernel.stats($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharHistStats {
  private val Log2 = math.log(2.0)

  def stats(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1
      i += Character.charCount(cp)
    }
    var sumScaled = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      // Math.round == HALF_UP for the non-negative c·log2(c) terms,
      // matching both engines' round() on the same IEEE product
      sumScaled += Math.round(c * (math.log(c) / Log2) * 1e6)
    }
    org.apache.spark.sql.catalyst.InternalRow(n, counts.size.toLong, sumScaled)
  }
}

object TextFunctions {
  def char_hist_stats(text: Column): Column =
    Shim.toColumn(CharHistStats(Shim.toExpression(text)))

  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    Shim.toColumn(WinnowFingerprints(Shim.toExpression(text), k, w))

  def ngram_span_hashes(tokens: Column, n: Int): Column =
    Shim.toColumn(NGramSpanHashes(Shim.toExpression(tokens), n))

  def ngram_span_hashes_pos(tokens: Column, n: Int): Column =
    Shim.toColumn(NGramSpanHashesPos(Shim.toExpression(tokens), n))

  def bpe_token_count(tokens: Column, merges: Column): Column =
    Shim.toColumn(BpeTokenCount(Shim.toExpression(tokens), Shim.toExpression(merges)))

  def simhash32(tokens: Column): Column =
    Shim.toColumn(SimHash32(Shim.toExpression(tokens)))

  def minhash_sigs(shingles: Column, k: Int): Column =
    Shim.toColumn(MinHashSigs(Shim.toExpression(shingles), k))

  def jaccard_sorted(a: Column, b: Column): Column =
    Shim.toColumn(JaccardSorted(Shim.toExpression(a), Shim.toExpression(b)))

  def ngram_dup_stats(tokens: Column): Column =
    Shim.toColumn(NGramDupStats(Shim.toExpression(tokens)))
}
