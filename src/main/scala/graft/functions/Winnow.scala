package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowed document fingerprints as a single codegen'd Catalyst Expression.
  *
  * Winnowing (Schleimer/Wilkerson/Aiken MOSS scheme) is row-local: hash every
  * character k-gram, keep the min of each sliding window of `window`
  * consecutive hashes, emit the distinct mins. The declarative form
  * (posexplode → partitionBy(doc_id) window-min → filter → distinct) pays a
  * full sort shuffle of ~|text| rows per document plus a global distinct
  * shuffle for what is a per-row computation. This Expression does the whole
  * thing in one linear pass over the string — the fingerprint query becomes
  * scan → project → explode with ZERO exchanges, which is the shape that
  * survives 100 TB: no winnowing shuffle at all, and per-doc output is
  * already distinct so no global dedup pass is needed for (doc_id, fp) rows.
  *
  * Hash families match [[TextFunctions.sketch60]] exactly:
  * `oracleFamily = false` → `xxhash64(gram) & (2^60-1)` (seed 42, Spark's
  * built-in); `true` → hex60 (first 15 md5 hex digits as a BIGINT), the
  * engine-portable family the DuckDB oracle recomputes. The family is fixed
  * at plan construction, like every sketch operator.
  */
case class WinnowedFingerprints(child: Expression, k: Int, window: Int,
    oracleFamily: Boolean) extends UnaryExpression {

  require(k > 0 && window > 0, s"k and window must be positive, got k=$k window=$window")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnowed_fingerprints requires a string input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    WinnowedFingerprints.compute(
      input.asInstanceOf[UTF8String], k, window, oracleFamily)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowedFingerprints.compute($c, $k, $window, $oracleFamily)")

  override protected def withNewChildInternal(newChild: Expression)
      : WinnowedFingerprints = copy(child = newChild)

  override def prettyName: String = "winnowed_fingerprints"
}

object WinnowedFingerprints {

  private val Mask60 = (1L << 60) - 1
  private val Seed = 42L // Spark's xxhash64 default seed

  /** Static entry shared by interpreted eval and generated code.
    * Replicates, per gram i in 1..max(len-k+1, 1):
    * `sketch60(text.substr(i, k))` — char-based substring clipped at the end
    * (a shorter-than-k text yields one gram: the whole text) — then the
    * sliding window-min over starts 0..max(n-window, 0), deduplicated. */
  def compute(text: UTF8String, k: Int, window: Int,
      oracleFamily: Boolean): ArrayData = {
    val numChars = text.numChars()
    val nGrams = math.max(numChars - k + 1, 1)
    val hashes = new Array[Long](nGrams)
    if (!oracleFamily && text.numBytes() == numChars) {
      // ASCII fast path: char i..i+k is bytes i..i+k — hash straight off the
      // backing bytes, zero allocation per gram
      val base = text.getBaseObject
      val off = text.getBaseOffset
      var i = 0
      while (i < nGrams) {
        val len = math.min(k, numChars - i)
        hashes(i) = XXH64.hashUnsafeBytes(base, off + i, len, Seed) & Mask60
        i += 1
      }
    } else {
      val md = if (oracleFamily) MessageDigest.getInstance("MD5") else null
      var i = 0
      while (i < nGrams) {
        val gram = text.substring(i, math.min(i + k, numChars))
        hashes(i) =
          if (oracleFamily) hex60(md, gram.getBytes)
          else XXH64.hashUnsafeBytes(
            gram.getBaseObject, gram.getBaseOffset, gram.numBytes, Seed) & Mask60
        i += 1
      }
    }
    val nStarts = math.max(nGrams - window + 1, 1)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new scala.collection.mutable.ArrayBuffer[Long](
      math.min(nStarts, 16))
    var p = 0
    while (p < nStarts) {
      var m = Long.MaxValue
      var j = p
      val e = math.min(p + window, nGrams)
      while (j < e) { if (hashes(j) < m) m = hashes(j); j += 1 }
      if (seen.add(m)) out += m
      p += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** First 60 bits of md5 as a non-negative long — byte-wise twin of
    * [[TextFunctions.hex60]] (`parseLong(hexDigest.take(15), 16)`). */
  private def hex60(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Column form; the sketch family is captured from
    * [[TextFunctions.oracleMode]] at construction, like every sketch op. */
  def winnowed(text: Column, k: Int = 8, window: Int = 4): Column =
    ColumnBridge.column(WinnowedFingerprints(
      ColumnBridge.expression(text), k, window, TextFunctions.oracleMode))
}
