package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, TernaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd product-quantization encoder.
  *
  * `graft_pq_encode(vec, cb, sd, ks)` splits `vec` (M*sd dims) into M
  * subspaces of `sd` dims and, per subspace m, returns the index of the
  * codebook entry `cb[(m*ks + cc)*sd ..]` with the minimal L2² distance —
  * strict `<` keeps the LOWEST centroid id on ties, the same total order
  * as the oracle's ROW_NUMBER (d2 ASC, cl ASC). `cb` is the flattened
  * M x ks x sd codebook tensor.
  *
  * The composable formulation runs one interpreted
  * `aggregate(sequence(0, ks-1), ...)` higher-order function per subspace
  * per row — HOFs are CodegenFallback — and its IF-accumulator evaluates
  * the candidate distance expression TWICE whenever it improves. This
  * expression is ONE fused loop inside whole-stage codegen: the kernel
  * shape for encoding 100 TB of embeddings into PQ codes.
  *
  * Exactness: inputs are integer-valued doubles (the [[graft.pipeline.Similarity]]
  * quantization grid); every squared-diff product and subspace sum stays
  * an exact integer < 2^53, so the distances — and therefore the argmin —
  * are bit-identical to the HOF formulation (asserted in FunctionsSpec).
  * NULL on null input, a null element, non-positive sd/ks, vec not
  * divisible by sd, or a codebook not exactly M*ks*sd long.
  */
case class PqEncode(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (arr(first.dataType) && arr(second.dataType) &&
        third.dataType == IntegerType && fourth.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>, int, int), got " +
        s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
        s"${third.dataType.catalogString}, ${fourth.dataType.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def nullSafeEval(v0: Any, c0: Any, s0: Any, k0: Any): Any = {
    val v = v0.asInstanceOf[ArrayData]
    val cb = c0.asInstanceOf[ArrayData]
    val sd = s0.asInstanceOf[Int]
    val ks = k0.asInstanceOf[Int]
    val dim = v.numElements()
    if (sd <= 0 || ks <= 0 || dim == 0 || dim % sd != 0) return null
    val m = dim / sd
    if (cb.numElements().toLong != m.toLong * ks * sd) return null
    val codes = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      var best = 1e18
      var bestC = 0
      var cc = 0
      while (cc < ks) {
        var d2 = 0.0
        val base = (mm * ks + cc) * sd
        var pi = 0
        while (pi < sd) {
          val vi = mm * sd + pi
          if (v.isNullAt(vi) || cb.isNullAt(base + pi)) return null
          val diff = v.getDouble(vi) - cb.getDouble(base + pi)
          d2 += diff * diff
          pi += 1
        }
        if (d2 < best) { best = d2; bestC = cc }
        cc += 1
      }
      codes(mm) = bestC
      mm += 1
    }
    UnsafeArrayData.fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, sd, ks) => {
      val dim = ctx.freshName("dim")
      val m = ctx.freshName("m")
      val codes = ctx.freshName("codes")
      val mm = ctx.freshName("mm")
      val cc = ctx.freshName("cc")
      val pi = ctx.freshName("pi")
      val vi = ctx.freshName("vi")
      val base = ctx.freshName("base")
      val d2 = ctx.freshName("d2")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestC = ctx.freshName("bestC")
      val outer = ctx.freshName("outer")
      s"""
        final int $dim = $v.numElements();
        if ($sd <= 0 || $ks <= 0 || $dim == 0 || $dim % $sd != 0 ||
            $cb.numElements() != ((long) ($dim / $sd)) * $ks * $sd) {
          ${ev.isNull} = true;
        } else {
          final int $m = $dim / $sd;
          final int[] $codes = new int[$m];
          $outer:
          for (int $mm = 0; $mm < $m; $mm++) {
            double $best = 1e18;
            int $bestC = 0;
            for (int $cc = 0; $cc < $ks; $cc++) {
              double $d2 = 0.0;
              final int $base = ($mm * $ks + $cc) * $sd;
              for (int $pi = 0; $pi < $sd; $pi++) {
                final int $vi = $mm * $sd + $pi;
                if ($v.isNullAt($vi) || $cb.isNullAt($base + $pi)) {
                  ${ev.isNull} = true; break $outer;
                }
                final double $diff = $v.getDouble($vi) - $cb.getDouble($base + $pi);
                $d2 += $diff * $diff;
              }
              if ($d2 < $best) { $best = $d2; $bestC = $cc; }
            }
            $codes[$mm] = $bestC;
          }
          if (!${ev.isNull}) {
            ${ev.value} =
              org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
          }
        }
      """
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): PqEncode =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** Native codegen'd asymmetric-distance (ADC) lookup-sum.
  *
  * `graft_pq_adc(dtf, codes, ks)` returns Σ_m dtf[m*ks + codes[m]] — the
  * PQ posting-list scan's per-candidate distance: `dtf` is the query's
  * flattened M x ks distance table, `codes` the candidate's M PQ codes.
  *
  * The composable `aggregate(sequence(0, M-1), ...)` formulation is an
  * interpreted HOF evaluated once per (query, candidate) row — the inner
  * loop of the IVF-PQ scan. This is the same sum as ONE fused codegen
  * loop, left-to-right in subspace order (all addends are integer-valued
  * doubles on the quantization grid, so the sum is exact either way).
  * NULL on null input, a null element, non-positive ks, dtf not divisible
  * by ks, or a code outside [0, ks) / beyond the table.
  */
case class PqAdc(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _), IntegerType) => true
      case _ => false
    }
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<int>, int), got " +
        s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
        s"${third.dataType.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_adc"

  override def nullSafeEval(d0: Any, c0: Any, k0: Any): Any = {
    val dtf = d0.asInstanceOf[ArrayData]
    val codes = c0.asInstanceOf[ArrayData]
    val ks = k0.asInstanceOf[Int]
    val nd = dtf.numElements()
    val m = codes.numElements()
    if (ks <= 0 || nd % ks != 0) return null
    var acc = 0.0
    var mm = 0
    while (mm < m) {
      if (codes.isNullAt(mm)) return null
      val c = codes.getInt(mm)
      val idx = mm * ks + c
      if (c < 0 || c >= ks || idx >= nd || dtf.isNullAt(idx)) return null
      acc += dtf.getDouble(idx)
      mm += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (dtf, codes, ks) => {
      val nd = ctx.freshName("nd")
      val m = ctx.freshName("m")
      val mm = ctx.freshName("mm")
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      s"""
        final int $nd = $dtf.numElements();
        final int $m = $codes.numElements();
        if ($ks <= 0 || $nd % $ks != 0) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $mm = 0; $mm < $m; $mm++) {
            if ($codes.isNullAt($mm)) { ${ev.isNull} = true; break; }
            final int $c = $codes.getInt($mm);
            final int $idx = $mm * $ks + $c;
            if ($c < 0 || $c >= $ks || $idx >= $nd || $dtf.isNullAt($idx)) {
              ${ev.isNull} = true; break;
            }
            $acc += $dtf.getDouble($idx);
          }
          if (!${ev.isNull}) { ${ev.value} = $acc; }
        }
      """
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqAdc =
    copy(first = newFirst, second = newSecond, third = newThird)
}
