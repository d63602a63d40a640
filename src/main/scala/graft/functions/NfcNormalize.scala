package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * canonical-composition pass every multilingual corpus needs before
  * hashing or dedup (an NFD "é" (e + U+0301) and an NFC "é" (U+00E9) are
  * different byte strings, so every digest-keyed operator in the engine —
  * exact dedup, MinHash shingles, fingerprints — silently treats
  * canonically-equal texts as distinct unless the corpus is normalized
  * first). Spark has no built-in; a Scala UDF would be a codegen barrier
  * + SerDe boundary in the hottest full-corpus projection, so this is a
  * codegen'd `UnaryExpression` (the [[VectorMax]] pattern): interpreted
  * eval and generated code share one static helper, and the fast path
  * (`Normalizer.isNormalized`, true for ASCII-dominant corpora) returns
  * the input UTF8String with ZERO allocation — the normalize pass costs
  * one scan unless composition actually fires.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {

  /** Static entry shared by interpreted eval and generated code. The
    * isNormalized probe is a single pass with no allocation — the common
    * (already-NFC) case never copies. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Register `nfc_normalize` in the session's function registry
    * (idempotent — the [[VectorMax.register]] discipline). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier("nfc_normalize")
    if (!registry.functionExists(ident))
      registry.createOrReplaceTempFunction(
        "nfc_normalize", exprs => NfcNormalize(exprs.head), "scala_udf")
  }
}
