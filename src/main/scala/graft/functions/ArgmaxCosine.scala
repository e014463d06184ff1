package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, StructField, StructType}

/** Native codegen'd nearest-centroid lookup by cosine.
  *
  * `graft_argmax_cos(v, tensor)` scans a flattened k x dim centroid tensor
  * and returns `struct(idx int, cos double)` for the centroid with the
  * highest cosine to `v`; ties keep the LOWEST index (strict-greater
  * update — the same first-match rule as `array_position(arr,
  * array_max(arr))`, so swapping a k-wide expression array for this
  * expression cannot change an assignment). k is derived as tensor.length
  * / v.length.
  *
  * Why it exists: the composable form is k separate cosine expressions in
  * one Project — at the k = sqrt(N) settings the semantic-dedup probe uses,
  * that Project fell out of whole-stage codegen and evaluated interpreted
  * with per-element boxing (measured 13 s tasks for 2500 rows x 141
  * centroids). This is ONE fused loop reading the tensor in place — the
  * [[LshSignatures]] kernel shape, applied to coarse-quantizer routing of
  * 100 TB of embeddings.
  *
  * Numerics match `graft_cosine` exactly per centroid: left-to-right IEEE
  * dot and norms, `dot / (sqrt(nv) * sqrt(nc))`, one comparison per
  * centroid. NULL on: null/empty inputs, a null element (graft_cosine
  * convention), a tensor not divisible by dim, or a zero-norm side (the
  * composable form's Divide-by-zero null, applied to the argmax whole).
  */
case class ArgmaxCosine(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }
  override def dataType: DataType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("cos", DoubleType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_argmax_cos"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val t = b.asInstanceOf[ArrayData]
    val dim = v.numElements()
    if (dim == 0 || t.numElements() == 0 || t.numElements() % dim != 0)
      return null
    val k = t.numElements() / dim
    var nv = 0.0
    var i = 0
    while (i < dim) {
      if (v.isNullAt(i)) return null
      val x = v.getDouble(i)
      nv += x * x
      i += 1
    }
    if (nv == 0.0) return null
    val snv = math.sqrt(nv)
    var bestIdx = -1
    var bestCos = 0.0
    var c = 0
    while (c < k) {
      val base = c * dim
      var dot = 0.0
      var nc = 0.0
      var j = 0
      while (j < dim) {
        if (t.isNullAt(base + j)) return null
        val x = v.getDouble(j)
        val y = t.getDouble(base + j)
        dot += x * y
        nc += y * y
        j += 1
      }
      val denom = snv * math.sqrt(nc)
      if (denom == 0.0) return null
      val cos = dot / denom
      if (bestIdx < 0 || cos > bestCos) {
        bestIdx = c
        bestCos = cos
      }
      c += 1
    }
    InternalRow(bestIdx, bestCos)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, t) => {
      val dim = ctx.freshName("dim")
      val k = ctx.freshName("k")
      val nv = ctx.freshName("nv")
      val snv = ctx.freshName("snv")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val j = ctx.freshName("j")
      val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      val nc = ctx.freshName("nc")
      val denom = ctx.freshName("denom")
      val cos = ctx.freshName("cos")
      val bestIdx = ctx.freshName("bestIdx")
      val bestCos = ctx.freshName("bestCos")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val done = ctx.freshName("done")
      s"""
        final int $dim = $v.numElements();
        if ($dim == 0 || $t.numElements() == 0 || $t.numElements() % $dim != 0) {
          ${ev.isNull} = true;
        } else {
          final int $k = $t.numElements() / $dim;
          double $nv = 0.0;
          for (int $i = 0; $i < $dim; $i++) {
            if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
            final double $x = $v.getDouble($i);
            $nv += $x * $x;
          }
          if (!${ev.isNull} && $nv == 0.0) ${ev.isNull} = true;
          if (!${ev.isNull}) {
            final double $snv = java.lang.Math.sqrt($nv);
            int $bestIdx = -1;
            double $bestCos = 0.0;
            $done:
            for (int $c = 0; $c < $k; $c++) {
              final int $base = $c * $dim;
              double $dot = 0.0;
              double $nc = 0.0;
              for (int $j = 0; $j < $dim; $j++) {
                if ($t.isNullAt($base + $j)) { ${ev.isNull} = true; break $done; }
                final double $x = $v.getDouble($j);
                final double $y = $t.getDouble($base + $j);
                $dot += $x * $y;
                $nc += $y * $y;
              }
              final double $denom = $snv * java.lang.Math.sqrt($nc);
              if ($denom == 0.0) { ${ev.isNull} = true; break $done; }
              final double $cos = $dot / $denom;
              if ($bestIdx < 0 || $cos > $bestCos) {
                $bestIdx = $c;
                $bestCos = $cos;
              }
            }
            if (!${ev.isNull}) {
              ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
                new Object[] { java.lang.Integer.valueOf($bestIdx),
                  java.lang.Double.valueOf($bestCos) });
            }
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArgmaxCosine =
    copy(left = newLeft, right = newRight)
}
