package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernel behind [[GopherStats]]; a plain top-level object so the
  * generated whole-stage code can call the static forwarder
  * `graft.functions.GopherKernel.compute(arr)` directly.
  */
object GopherKernel {
  private val SPACE = ' '.toByte
  private val EMPTY = UTF8String.EMPTY_UTF8

  /** One joined byte buffer (tokens separated by single spaces — exactly
    * what concat_ws(' ', slice(toks, i, n)) concatenates) plus token start
    * offsets; every gram is a zero-copy UTF8String view into it. Returns
    * null iff a token slot is null (the graft_cosine convention).
    */
  private def joined(toks: ArrayData): (Array[Byte], Array[Int], Int) = {
    val L = toks.numElements()
    val tokArr = new Array[UTF8String](L)
    var bytes = 0L
    var i = 0
    while (i < L) {
      val u = toks.getUTF8String(i)
      if (u == null) return null
      tokArr(i) = u
      bytes += u.numBytes()
      i += 1
    }
    val bufLen = bytes + math.max(L - 1, 0)
    // Unreachable for split()-derived tokens (disjoint substrings of one
    // <= 2 GiB UTF8String), but a CONSTRUCTED array can exceed a JVM byte
    // array: NULL, not a truncated .toInt allocation.
    if (bufLen > Int.MaxValue - 16) return null
    val buf = new Array[Byte](bufLen.toInt)
    val starts = new Array[Int](L + 1)
    var off = 0
    i = 0
    while (i < L) {
      starts(i) = off
      val u = tokArr(i)
      u.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + off)
      off += u.numBytes()
      if (i < L - 1) { buf(off) = SPACE; off += 1 }
      i += 1
    }
    starts(L) = off + (if (L > 0) 1 else 0) // virtual separator past the end
    (buf, starts, L)
  }

  /** Sorted zero-copy gram views for one n over a [[joined]] buffer. Gram
    * i (n tokens) spans [starts(i), starts(i+n) - 1) — the -1 drops the
    * trailing separator slot of the LAST token in the gram. Byte-wise
    * UTF8String order IS array_sort's StringType order.
    */
  private def sortedGrams(
      buf: Array[Byte], starts: Array[Int], L: Int, n: Int): Array[UTF8String] = {
    val m = L - n + 1
    val grams = new Array[UTF8String](m)
    var j = 0
    while (j < m) {
      val s = starts(j)
      grams(j) = UTF8String.fromBytes(buf, s, starts(j + n) - 1 - s)
      j += 1
    }
    java.util.Arrays.sort(grams.asInstanceOf[Array[AnyRef]])
    grams
  }

  /** All five Gopher repetition statistics of one token array in one pass
    * per n, on zero-copy byte slices of a single joined buffer. Returns
    * null iff a token slot is null (the graft_cosine convention). Fields:
    * (top2c, top3c, top4c, dup5c, dup10c) — char masses, see
    * [[GopherStats]] for the exact recurrence they replicate.
    */
  def compute(toks: ArrayData): InternalRow = {
    val j0 = joined(toks)
    if (j0 == null) return null
    val (buf, starts, l) = j0

    def stats(n: Int): (Long, Long) = {
      val m = l - n + 1
      if (m <= 0) return (0L, 0L)
      val grams = sortedGrams(buf, starts, l, n)
      // The HOF fold, verbatim: run-length over the sorted grams carrying
      // (best run with the pinned tie-break, duplicated char mass).
      var prev: UTF8String = null
      var run = 0L
      var bestc = 0L
      var bestg = EMPTY
      var bestgChars = 0L
      var dup = 0L
      var j = 0
      while (j < m) {
        val x = grams(j)
        var newRun = 1L
        if (prev != null && x.equals(prev)) newRun = run + 1
        else if (run >= 2) dup += run * prev.numChars()
        if (newRun > bestc) {
          bestc = newRun; bestg = x; bestgChars = x.numChars()
        } else if (newRun == bestc) {
          val lx = x.numChars()
          if (lx > bestgChars || (lx == bestgChars && x.compareTo(bestg) < 0)) {
            bestg = x; bestgChars = lx
          }
        }
        run = newRun
        prev = x
        j += 1
      }
      if (run >= 2) dup += run * prev.numChars()
      (bestc * bestgChars, dup)
    }

    val (t2, _) = stats(2)
    val (t3, _) = stats(3)
    val (t4, _) = stats(4)
    val (_, d5) = stats(5)
    val (_, d10) = stats(10)
    new GenericInternalRow(Array[Any](t2, t3, t4, d5, d10))
  }

  /** N-gram profile of one token array: (n_grams, n_distinct, top_cnt) —
    * total gram count, distinct gram count, and the count of the single
    * most frequent gram (ANY of the tied grams: the consumers take the
    * count, never the gram). One sorted zero-copy pass, the [[compute]]
    * discipline. Returns null iff a token slot is null; non-positive n
    * yields null (no aliased slice semantics); L < n yields (0, 0, 0).
    */
  def profile(toks: ArrayData, n: Int): InternalRow = {
    if (n <= 0) return null
    val j0 = joined(toks)
    if (j0 == null) return null
    val (buf, starts, l) = j0
    val m = l - n + 1
    if (m <= 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))
    val grams = sortedGrams(buf, starts, l, n)
    var prev: UTF8String = null
    var run = 0L
    var distinct = 0L
    var top = 0L
    var j = 0
    while (j < m) {
      val x = grams(j)
      if (prev != null && x.equals(prev)) run += 1
      else { distinct += 1; run = 1L }
      if (run > top) top = run
      prev = x
      j += 1
    }
    new GenericInternalRow(Array[Any](m.toLong, distinct, top))
  }

  /** xxhash64 (seed 42, Spark's SQL default) of every word n-gram, hashed
    * directly over the gram's byte span in the [[joined]] buffer — the
    * same bytes `xxhash64(concat_ws(' ', slice(toks, i, n)))` hashes, so
    * the values are bit-identical without materializing a gram string per
    * position. Returns null iff a token slot is null or n <= 0; L < n
    * yields the empty array.
    */
  def gramHashes(toks: ArrayData, n: Int): ArrayData = {
    if (n <= 0) return null
    val j0 = joined(toks)
    if (j0 == null) return null
    val (buf, starts, l) = j0
    val m = l - n + 1
    if (m <= 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s0 = starts(i)
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s0,
        starts(i + n) - 1 - s0, 42L)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Seeded-md5 fold (the portable [[graft.pipeline.Sampling.hexFold]]
    * value: the md5's first 4 bytes big-endian, unsigned) of every word
    * n-gram, digested directly over the gram's byte span in the
    * [[joined]] buffer — the same bytes `md5(concat_ws(' ', slice(toks,
    * i, n)))` hashes, so values are bit-identical to the composable
    * `transform(transform(sequence(1, m), i -> md5(...)), h -> fold)`
    * WITHOUT a gram string, a 32-char hex string, or an 8-term
    * substring/instr fold per position. md5 stays the hash because the
    * DuckDB oracle must recompute the identical values from first
    * principles (xxhash64's seed-42 spans are not expressible there);
    * what the kernel removes is the interpreted pipeline around it.
    * Returns null iff a token slot is null or n <= 0; L < n yields the
    * empty array.
    */
  /** Content-defined-chunking boundary positions (the q_cdc_dedup cut
    * rule): for every 1-based char position i in [w, numChars], the
    * portable md5 fold ([[graft.pipeline.Sampling.hexFold]]: first 4
    * digest bytes, big-endian unsigned) of the trailing w-char window's
    * UTF-8 bytes; i is a boundary iff fold % dMod == 0. Bit-identical to
    * the composable `filter(transform(transform(sequence(w, len), i ->
    * md5(substring(text, i-w+1, w))), ...)` chain — which allocated a
    * w-char substring, a 32-char hex string, and an 8-term
    * substring/instr fold PER CHARACTER POSITION (the suite's densest
    * per-position expression after the winnow family got its kernels) —
    * but digests each window in place over one byte buffer. Positions
    * and window extents are CODE POINTS (the substring()/length() unit
    * both engines count), so multi-byte text chunks identically.
    * NULL text, w <= 0, or dMod <= 0 yields null; numChars < w yields
    * the empty array (the expression's `IF(len < w, array(), ...)` arm).
    */
  def cdcBounds(text: UTF8String, w: Int, dMod: Int): ArrayData = {
    if (w <= 0 || dMod <= 0) return null
    val buf = text.getBytes
    val nb = buf.length
    // Char-start byte offsets: starts(c) = byte offset of 0-based char c.
    var chars = 0
    var off = 0
    while (off < nb) {
      chars += 1
      off += UTF8String.numBytesForFirstByte(buf(off))
    }
    if (chars < w)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val starts = new Array[Int](chars + 1)
    var c = 0
    off = 0
    while (off < nb) {
      starts(c) = off
      off += UTF8String.numBytesForFirstByte(buf(off))
      c += 1
    }
    starts(chars) = nb
    val md = DsirKernel.sharedMd5()
    val out = new Array[Long](chars - w + 1)
    var k = 0
    var i = w // 1-based char position of the window END
    while (i <= chars) {
      val s0 = starts(i - w)
      md.reset()
      md.update(buf, s0, starts(i) - s0)
      val d = md.digest()
      val fold = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      if (fold % dMod == 0L) { out(k) = i.toLong; k += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  def gramFoldHashes(toks: ArrayData, n: Int): ArrayData = {
    if (n <= 0) return null
    val j0 = joined(toks)
    if (j0 == null) return null
    val (buf, starts, l) = j0
    val m = l - n + 1
    if (m <= 0)
      return org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](m)
    val md = DsirKernel.sharedMd5()
    var i = 0
    while (i < m) {
      val s0 = starts(i)
      md.reset()
      md.update(buf, s0, starts(i + n) - 1 - s0)
      val d = md.digest()
      out(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native codegen'd Gopher repetition statistics (Rae et al. 2021,
  * appendix A1.1).
  *
  * `graft_gopher_stats(toks)` computes, in ONE compiled pass over the
  * token array, the five character-mass statistics the Gopher repetition
  * gate thresholds: `struct(top2c, top3c, top4c, dup5c, dup10c)` — for
  * n ∈ {2, 3, 4} the char mass of the single most frequent word n-gram
  * (count desc, gram length desc, then lexicographic — the pinned
  * tie-break), for n ∈ {5, 10} the char mass of all occurrences of
  * n-grams appearing more than once. Char masses, not fractions: the
  * caller divides by len(text) so the division stays visible in the plan.
  *
  * Why it exists: the composable form is five interpreted `aggregate()`
  * HOF folds per document (array_sort + a named_struct allocation per
  * gram per n — the suite's worst CPU decade law, the q_quality_gopher /
  * q_quality_auc / q_calibration_ece family). This kernel builds ONE
  * joined byte buffer per document and sorts zero-copy gram VIEWS into
  * it; byte-wise UTF8String order is exactly array_sort's StringType
  * order, so the run-length fold — replicated verbatim, including the
  * tie-break comparison against the pre-update best — is bit-identical
  * (asserted differentially in FunctionsSpec). NULL array or a NULL
  * token slot yields NULL (graft_cosine convention; the HOF form would
  * concat_ws-skip null tokens — split() output never contains them).
  *
  * Reference anchor: datafusion-dist exposes the same repetition-gate
  * family through its quality-filter surface; the statistics and
  * thresholds are the published Gopher ones.
  */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${dt.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("top2c", LongType, nullable = false),
    StructField("top3c", LongType, nullable = false),
    StructField("top4c", LongType, nullable = false),
    StructField("dup5c", LongType, nullable = false),
    StructField("dup10c", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gopher_stats"

  override def nullSafeEval(a: Any): Any =
    GopherKernel.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val r = ctx.freshName("gopherRow")
      s"""
        final org.apache.spark.sql.catalyst.InternalRow $r =
          graft.functions.GopherKernel.compute($v);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

/** Native codegen'd n-gram profile.
  *
  * `graft_gram_profile(toks, n)` returns `struct(n_grams, n_distinct,
  * top_cnt)` for the word n-grams of a token array — the three
  * partition-local facts the within-doc repetition family
  * (q_quality_repetition's top-bigram fraction and duplicate-trigram
  * fraction) previously obtained by exploding (doc, gram) pairs through
  * a hash exchange whose keys NEVER crossed a partition (every gram of a
  * document derives from the document's own row — the same defect the
  * r11 stage probe found in q_quality_gopher's first plan). One compiled
  * sorted pass over zero-copy gram views, the [[GopherStats]] kernel
  * shape. NULL array, NULL token slot, or n <= 0 yields NULL.
  */
case class GramProfile(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, int), got " +
        s"${l.catalogString}, ${r.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("n_grams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gram_profile"

  override def nullSafeEval(a: Any, n: Any): Any =
    GopherKernel.profile(a.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val r = ctx.freshName("gramProfileRow")
      s"""
        final org.apache.spark.sql.catalyst.InternalRow $r =
          graft.functions.GopherKernel.profile($v, $n);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramProfile =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd n-gram xxhash64.
  *
  * `graft_gram_hashes(toks, n)` returns `array<bigint>` — the seed-42
  * xxhash64 of every word n-gram, the fingerprint relation
  * q_substring_dedup explodes. The composable form materializes a gram
  * STRING per position (`xxhash64(concat_ws(' ', slice(toks, i, n)))`
  * inside an interpreted transform); this kernel hashes each gram's byte
  * span in one joined buffer in place — identical values, zero gram
  * allocations (FunctionsSpec differential). NULL array, NULL token
  * slot, or n <= 0 yields NULL; fewer than n tokens yields the empty
  * array.
  */
case class GramHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, int), got " +
        s"${l.catalogString}, ${r.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(a: Any, n: Any): Any =
    GopherKernel.gramHashes(a.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val r = ctx.freshName("gramHashArr")
      s"""
        final org.apache.spark.sql.catalyst.util.ArrayData $r =
          graft.functions.GopherKernel.gramHashes($v, $n);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramHashes =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd n-gram seeded-md5 fold.
  *
  * `graft_gram_fold_hashes(toks, n)` returns `array<bigint>` — the
  * portable hexFold(md5(gram)) value of every word n-gram, the hash the
  * winnowing fingerprint family orders its window minima by. The
  * composable form (q_winnow_fingerprint through r12) was two nested
  * interpreted `transform`s allocating a gram string, a 32-char hex
  * string, and an 8-term substring/instr fold per position — the query's
  * dominant cost term after the selection kernel landed (VERDICT r12
  * #3). This kernel digests each gram's byte span in the one joined
  * buffer in place; md5 is retained (not switched to xxhash64 spans)
  * deliberately: the hash VALUES are structural here — the window
  * minimum is an argmin over them — and the DuckDB oracle must
  * recompute the identical values from first principles, which the
  * portable md5 fold allows and a Spark-seeded xxhash64 would not.
  * NULL array, NULL token slot, or n <= 0 yields NULL; fewer than n
  * tokens yields the empty array.
  */
case class GramFoldHashes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, int), got " +
        s"${l.catalogString}, ${r.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_gram_fold_hashes"

  override def nullSafeEval(a: Any, n: Any): Any =
    GopherKernel.gramFoldHashes(a.asInstanceOf[ArrayData], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) => {
      val r = ctx.freshName("gramFoldArr")
      s"""
        final org.apache.spark.sql.catalyst.util.ArrayData $r =
          graft.functions.GopherKernel.gramFoldHashes($v, $n);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GramFoldHashes =
    copy(left = newLeft, right = newRight)
}

/** Native codegen'd content-defined-chunking boundary scan.
  *
  * `graft_cdc_bounds(text, w, d)` returns `array<bigint>` — the 1-based
  * char positions where the portable md5 fold of the trailing w-char
  * window is ≡ 0 (mod d), i.e. q_cdc_dedup's chunk cut points. The
  * composable form evaluated an interpreted transform/filter chain
  * allocating a substring + hex string + 8-term fold PER CHARACTER of
  * every document — the suite's densest per-position expression after
  * the winnow kernels landed; this kernel digests each window's byte
  * span in place ([[GopherKernel.cdcBounds]]) with values bit-identical
  * by construction. md5 stays the hash deliberately: the boundary RULE
  * is the portable contract the DuckDB oracle recomputes from first
  * principles (a production deployment would swap a gear/Rabin
  * O(1)-slide hash — same contract, different constants). NULL text or
  * non-positive w/d yields NULL; fewer than w chars yields the empty
  * array.
  */
case class CdcBounds(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int, int), got " +
          s"${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cdc_bounds"

  override def nullSafeEval(t: Any, w: Any, d: Any): Any =
    GopherKernel.cdcBounds(t.asInstanceOf[UTF8String],
      w.asInstanceOf[Int], d.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, w, d) => {
      val r = ctx.freshName("cdcBoundsArr")
      s"""
        final org.apache.spark.sql.catalyst.util.ArrayData $r =
          graft.functions.GopherKernel.cdcBounds($t, $w, $d);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r;
        }
      """
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): CdcBounds =
    copy(first = newFirst, second = newSecond, third = newThird)
}
