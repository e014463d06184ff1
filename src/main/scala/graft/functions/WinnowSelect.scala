package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StructField, StructType}

/** Compiled kernel behind [[WinnowSelect]] — a plain top-level object so
  * generated whole-stage code calls the static forwarder directly.
  */
object WinnowKernel {
  /** Winnowing window selection (Schleimer/Wilkerson/Aiken 2003) over a
    * gram-hash array: for every length-`w` window keep (position of the
    * window MINIMUM, rightmost on ties; the minimum value), first-
    * occurrence-deduplicated — exactly `array_distinct(transform(...))`
    * over the composable slice/reverse/array_position/array_min form.
    * Positions are 1-based gram indices, the HOF form's convention.
    *
    * O(m) via a monotonic deque of indices (ADVICE r12; the r12 form
    * rescanned each window right-to-left, O(m·w) with boxed-tuple set
    * inserts): popping BACK entries with value >= the incoming value
    * keeps the deque strictly increasing and makes the front the
    * window's RIGHTMOST minimum (an equal earlier element is evicted by
    * the later one — exactly the paper's tie rule). Selected positions
    * are then non-decreasing window-over-window (the previous rightmost
    * minimum stays minimal until it slides out), so the first-occurrence
    * dedup degenerates to skip-if-same-as-last — no hash set at all.
    * Returns null iff a hash slot is null or w <= 0; an array shorter
    * than w yields the empty selection.
    */
  def select(gh: ArrayData, w: Int): ArrayData = {
    if (w <= 0) return null
    val m = gh.numElements()
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) {
      if (gh.isNullAt(i)) return null
      hs(i) = gh.getLong(i)
      i += 1
    }
    val nWin = m - w + 1
    if (nWin <= 0) return new GenericArrayData(Array.empty[Any])
    val dq = new Array[Int](m) // index ring, values strictly increasing
    var head = 0
    var tail = 0 // active range [head, tail)
    val outP = new Array[Long](nWin)
    val outH = new Array[Long](nWin)
    var cnt = 0
    i = 0
    while (i < m) {
      while (tail > head && hs(dq(tail - 1)) >= hs(i)) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) {
        val p = dq(head)
        if (cnt == 0 || outP(cnt - 1) != (p + 1).toLong) {
          outP(cnt) = (p + 1).toLong // 1-based gram index
          outH(cnt) = hs(p)
          cnt += 1
        }
      }
      i += 1
    }
    val out = new Array[Any](cnt)
    var o = 0
    while (o < cnt) {
      out(o) = new GenericInternalRow(Array[Any](outP(o), outH(o)))
      o += 1
    }
    new GenericArrayData(out)
  }
}

/** Native codegen'd winnowing selection.
  *
  * `graft_winnow(gh, w)` returns `array<struct<pos, fph>>` — the
  * deduplicated (rightmost-min position, min hash) selections of every
  * length-`w` window over a gram-hash array. The composable form
  * evaluates `slice` + `reverse` + `array_position` + `array_min` per
  * window — four interpreted array allocations per window per document,
  * the q_winnow_fingerprint CPU wall the 100x stage drill measured at
  * ~33 s/task. This is ONE compiled monotonic-deque pass over the whole
  * array (O(m), no per-window rescan), bit-identical to the HOF form
  * (FunctionsSpec differential; ties and duplicate selections included).
  * NULL array, NULL hash slot, or w <= 0 yields NULL (the graft_cosine
  * convention).
  */
case class WinnowSelect(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, int), got " +
        s"${l.catalogString}, ${r.catalogString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("pos", LongType, nullable = false),
    StructField("fph", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(a: Any, w: Any): Any =
    WinnowKernel.select(a.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, w) => {
      val r = ctx.freshName("winnowSel")
      s"""
        final org.apache.spark.sql.catalyst.util.ArrayData $r =
          graft.functions.WinnowKernel.select($v, $w);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WinnowSelect =
    copy(left = newLeft, right = newRight)
}
