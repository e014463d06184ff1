package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernel behind [[DsirBuckets]]; a plain top-level object so the
  * generated whole-stage code can call the static forwarder directly.
  */
object DsirKernel {
  private val SPACE = ' '.toByte

  // One digest instance per task thread: MessageDigest is stateful and
  // not thread-safe, and allocating one per row would dominate short docs.
  // Shared with [[GopherKernel.gramFoldHashes]] (same task threads).
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private[functions] def sharedMd5(): java.security.MessageDigest = md5.get()

  /** Hashed-unigram bucket ids of one text: for every non-empty
    * space-separated token, the first 32 bits (big-endian, unsigned) of
    * md5(salt || token) modulo `b` — bit-identical to the composable
    * `hexFold(md5(concat(salt, tok))) % b` over
    * `filter(split(text, ' '), x -> x != '')` (the first 8 hex chars of
    * an md5 ARE its first 4 bytes), without materializing a token
    * string, a concat, or a 32-char hex string per token instance.
    * One byte scan over the document; the only per-token work is the
    * digest itself. Returns null iff b <= 0.
    */
  def buckets(text: UTF8String, salt: UTF8String, b: Int): ArrayData = {
    if (b <= 0) return null
    val bytes = text.getBytes
    val sb = salt.getBytes
    val bl = b.toLong
    val L = bytes.length
    // Pass 1: token count (0x20 never occurs inside a multi-byte UTF-8
    // sequence, so the byte scan is codepoint-safe).
    var n = 0
    var i = 0
    while (i < L) {
      if (bytes(i) != SPACE) {
        n += 1
        while (i < L && bytes(i) != SPACE) i += 1
      } else i += 1
    }
    val out = new Array[Long](n)
    val md = md5.get()
    var k = 0
    i = 0
    while (i < L) {
      if (bytes(i) != SPACE) {
        val s0 = i
        while (i < L && bytes(i) != SPACE) i += 1
        md.reset()
        md.update(sb)
        md.update(bytes, s0, i - s0)
        val d = md.digest()
        val v = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        out(k) = v % bl
        k += 1
      } else i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Native codegen'd hashed-unigram feature buckets (the DSIR family's
  * feature extraction — Xie et al. 2023, public).
  *
  * `graft_dsir_buckets(text, salt, b)` returns `array<bigint>` — one
  * bucket id in [0, b) per non-empty whitespace token instance, each the
  * seeded-md5 fold `hexFold(md5(salt || tok)) % b`. The composable form
  * (q_dsir_select through r12) was an interpreted `filter()` HOF, a
  * token-string explode, a per-token concat + md5 hex string, and an
  * 8-term substring/instr fold — the suite's last interpreted
  * feature-extraction hot path (its wall drifted +13%/round while the
  * kernel-compiled families around it got faster; VERDICT r12 #2). This
  * kernel does one byte scan per document and one digest per token —
  * identical values (FunctionsSpec differential), whole-stage-codegen
  * fused. NULL text/salt yields NULL; b <= 0 yields NULL.
  *
  * Reference anchor: datafusion-dist's importance-resampling selection
  * surface uses the same hashed-n-gram feature model.
  */
case class DsirBuckets(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, string, int), got " +
          s"${a.catalogString}, ${b.catalogString}, ${c.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dsir_buckets"

  override def nullSafeEval(t: Any, s: Any, b: Any): Any =
    DsirKernel.buckets(t.asInstanceOf[UTF8String],
      s.asInstanceOf[UTF8String], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, s, b) => {
      val r = ctx.freshName("dsirArr")
      s"""
        final org.apache.spark.sql.catalyst.util.ArrayData $r =
          graft.functions.DsirKernel.buckets($t, $s, $b);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r;
        }
      """
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): DsirBuckets =
    copy(first = newFirst, second = newSecond, third = newThird)
}
