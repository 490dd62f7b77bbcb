package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Rabin–Karp rolling hashes of a string.
  *
  * `rolling_hash(text, w)` returns the polynomial hash (base 256, modulus
  * 1e9+7) of EVERY w-character window of `text` — length−w+1 longs computed
  * in one O(length) pass via the rolling update
  * h′ = (h − c_out·B^{w−1})·B + c_in (mod M), instead of O(length·w)
  * recomputation. This is the content-defined fingerprint primitive behind
  * chunk-level dedup: two documents sharing any w-char run share the
  * corresponding hash, so shared-content detection becomes an equi-join on
  * hash values. Registered as SQL function `rolling_hash` by
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
  private final val B = 256L
  private final val M = 1000000007L

  /** All w-char window hashes in one pass. Called from generated code. */
  def hashes(s: UTF8String, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    if (w <= 0 || n < w) return new GenericArrayData(Array.empty[Long])
    // B^(w-1) mod M
    var pw = 1L
    var i = 1
    while (i < w) { pw = pw * B % M; i += 1 }
    val out = new Array[Long](n - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = (h * B + str.charAt(i)) % M; i += 1 }
    out(0) = h
    var k = 1
    while (k <= n - w) {
      h = ((h - str.charAt(k - 1) * pw % M + M) % M * B + str.charAt(k + w - 1)) % M
      out(k) = h
      k += 1
    }
    new GenericArrayData(out)
  }
}
