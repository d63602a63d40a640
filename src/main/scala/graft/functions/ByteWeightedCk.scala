package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Weighted byte checksum Σ_{k=1..n} (byte_k + 1) · (offset + k) over a
  * string's UTF-8 bytes (bytes unsigned, k 1-based) — the roundtrip
  * fingerprint q207 compares on both sides of its encode/decode chain.
  *
  * The built-in spelling — hex(encode(text)) + an `aggregate` lambda (or
  * a transform + posexplode + per-byte rows) — pays a hex expansion, one
  * substr + conv STRING PARSE per byte, and (because higher-order
  * functions are CodegenFallback) interpreted per-element evaluation
  * with boxing; this expression is one allocation-free loop over the
  * UTF8String's own bytes inside whole-stage codegen via a static call
  * (the [[SortedIntersectCount]] pattern — measured ~3× on q207's
  * original-side stage, and it removes the per-byte row explosion
  * entirely).
  */
case class ByteWeightedCk(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "byte_weighted_ck requires (string, bigint) inputs, got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(s: Any, off: Any): Any =
    ByteWeightedCk.ckOf(
      s.asInstanceOf[UTF8String], off.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, off) =>
      s"graft.functions.ByteWeightedCk.ckOf($s, $off)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ByteWeightedCk =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "byte_weighted_ck"
}

object ByteWeightedCk {

  /** Static loop shared by interpreted eval and generated code. */
  def ckOf(s: UTF8String, offset: Long): Long = {
    val n = s.numBytes()
    var k = 0
    var sum = 0L
    while (k < n) {
      sum += ((s.getByte(k) & 0xff) + 1L) * (offset + k + 1L)
      k += 1
    }
    sum
  }

  /** Idempotent session registration (the [[VectorMax.register]] shape) so
    * call sites can use `expr("byte_weighted_ck(text, 0L)")`. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident =
      org.apache.spark.sql.catalyst.FunctionIdentifier("byte_weighted_ck")
    if (!registry.functionExists(ident))
      registry.createOrReplaceTempFunction("byte_weighted_ck",
        exprs => ByteWeightedCk(exprs(0), exprs(1)), "scala_udf")
  }
}
