package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen'd hyperplane-LSH signature builder.
  *
  * `graft_lsh_sigs(v, planes, bits)` computes, for every table t, the
  * signature whose bit b is set when dot(v, plane[t][b]) >= 0, and returns
  * them as array<int> (one element per table). `planes` is the flattened
  * tables x bits x dim hyperplane tensor; the table count is derived as
  * planes.length / (bits * v.length).
  *
  * The composable formulation evaluates tables x bits separate
  * `aggregate(zip_with(...))` higher-order functions per row — HOFs are
  * CodegenFallback, so that is 128 interpreted lambda walks per vector at
  * the q_ann_lsh settings. This expression is ONE fused loop inside
  * whole-stage codegen reading the plane tensor in place: the kernel shape
  * for bucketing 100 TB of embeddings. Bit-for-bit the same signatures on
  * null-free inputs (same left-to-right IEEE dot products, `>= 0` sign
  * rule; asserted against the HOF formulation in FunctionsSpec). A NULL
  * array element yields NULL — the graft_cosine convention (the HOF form
  * would instead zero the poisoned bits, a silent wrong signature).
  * `bits` outside [1, 31] or a plane tensor not divisible by bits*dim
  * yields NULL rather than aliased shifts or a divide-by-zero.
  */
case class LshSignatures(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (arr(first.dataType) && arr(second.dataType) && third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<double>, int), got " +
        s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
        s"${third.dataType.catalogString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lsh_sigs"

  override def nullSafeEval(v0: Any, p0: Any, b0: Any): Any = {
    val v = v0.asInstanceOf[ArrayData]
    val p = p0.asInstanceOf[ArrayData]
    val bits = b0.asInstanceOf[Int]
    val dim = v.numElements()
    // bits capped at 31 (the signature is a positive Int; a larger value
    // would alias 1 << b mod 32); bits * dim is computed ONCE in long and
    // the division runs on that long — an int product could wrap (e.g.
    // bits=16, dim=2^28) to 0 or negative and slip past the guard.
    val bd = bits.toLong * dim
    if (bits <= 0 || bits > 31 || dim == 0 ||
      p.numElements() % bd != 0) return null
    val tables = (p.numElements() / bd).toInt
    val sigs = new Array[Int](tables)
    var t = 0
    while (t < tables) {
      var sig = 0
      var b = 0
      while (b < bits) {
        val base = (t * bits + b) * dim
        var dot = 0.0
        var i = 0
        while (i < dim) {
          // NULL element -> NULL result, the graft_cosine convention.
          if (v.isNullAt(i) || p.isNullAt(base + i)) return null
          dot += v.getDouble(i) * p.getDouble(base + i)
          i += 1
        }
        if (dot >= 0) sig |= 1 << b
        b += 1
      }
      sigs(t) = sig
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p, bits) => {
      val dim = ctx.freshName("dim")
      val tables = ctx.freshName("tables")
      val sigs = ctx.freshName("sigs")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      val outer = ctx.freshName("outer")
      val bd = ctx.freshName("bd")
      s"""
        final int $dim = $v.numElements();
        final long $bd = (long) $bits * $dim;
        if ($bits <= 0 || $bits > 31 || $dim == 0 ||
            $p.numElements() % $bd != 0) {
          ${ev.isNull} = true;
        } else {
          final int $tables = (int) ($p.numElements() / $bd);
          final int[] $sigs = new int[$tables];
          $outer:
          for (int $t = 0; $t < $tables; $t++) {
            int $sig = 0;
            for (int $b = 0; $b < $bits; $b++) {
              final int $base = ($t * $bits + $b) * $dim;
              double $dot = 0.0;
              for (int $i = 0; $i < $dim; $i++) {
                if ($v.isNullAt($i) || $p.isNullAt($base + $i)) {
                  ${ev.isNull} = true; break $outer;
                }
                $dot += $v.getDouble($i) * $p.getDouble($base + $i);
              }
              if ($dot >= 0) $sig |= 1 << $b;
            }
            $sigs[$t] = $sig;
          }
          if (!${ev.isNull}) {
            ${ev.value} =
              org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sigs);
          }
        }
      """
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LshSignatures =
    copy(first = newFirst, second = newSecond, third = newThird)
}
