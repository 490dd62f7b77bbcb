package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Rabin–Karp rolling hashes of a string.
  *
  * `rolling_hash(text, w)` returns a fingerprint of EVERY w-character window
  * of `text` — length−w+1 longs computed in one O(length) pass via the
  * rolling update h′ = (h − c_out·B^{w−1})·B + c_in (mod M), instead of
  * O(length·w) recomputation. Each fingerprint packs TWO independent
  * polynomial hashes (base 256 mod 1e9+7 and base 131 mod 998244353) into
  * one 61-bit long: a single 30-bit modulus would collide at birthday rate
  * ~n²/2³¹ (≈ hundreds of spurious matches per million windows), while the
  * packed pair keeps the collision expectation below 10⁻⁴ even at 10⁹
  * distinct windows — so hash equality is effectively substring equality.
  * This is the content-defined fingerprint primitive behind chunk-level
  * dedup: two documents sharing any w-char run share the corresponding
  * fingerprint, so shared-content detection becomes an equi-join on hash
  * values. Registered as SQL function `rolling_hash` by
  * [[graft.GraftExtensions]]; evaluates inside whole-stage codegen through
  * one static call.
  */
case class RollingHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"rolling_hash requires (string, int), got ($l, $r)")
    }

  override def nullSafeEval(s: Any, w: Any): Any =
    RollingHash.hashes(s.asInstanceOf[UTF8String], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, w) => s"graft.functions.RollingHash.hashes($s, $w)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RollingHashExpr =
    copy(left = newLeft, right = newRight)
}

object RollingHash {
  private final val B1 = 256L
  private final val M1 = 1000000007L
  private final val B2 = 131L
  private final val M2 = 998244353L

  /** All w-char window fingerprints (h1 · 2³¹ + h2) in one pass. Called from
    * generated code.
    */
  def hashes(s: UTF8String, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    if (w <= 0 || n < w) return new GenericArrayData(Array.empty[Long])
    // B^(w-1) mod M for both hash families
    var pw1 = 1L
    var pw2 = 1L
    var i = 1
    while (i < w) { pw1 = pw1 * B1 % M1; pw2 = pw2 * B2 % M2; i += 1 }
    val out = new Array[Long](n - w + 1)
    var h1 = 0L
    var h2 = 0L
    i = 0
    while (i < w) {
      val c = str.charAt(i)
      h1 = (h1 * B1 + c) % M1
      h2 = (h2 * B2 + c) % M2
      i += 1
    }
    out(0) = (h1 << 31) + h2
    var k = 1
    while (k <= n - w) {
      val cOut = str.charAt(k - 1)
      val cIn = str.charAt(k + w - 1)
      h1 = ((h1 - cOut * pw1 % M1 + M1) % M1 * B1 + cIn) % M1
      h2 = ((h2 - cOut * pw2 % M2 + M2) % M2 * B2 + cIn) % M2
      out(k) = (h1 << 31) + h2
      k += 1
    }
    new GenericArrayData(out)
  }
}
