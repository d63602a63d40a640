package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Codegen'd vector kernels for the similarity family (q30/q35/q115/q117/
  * q130/q158/q186 …): the [[graft.operators.Similarity]] helpers were
  * built-in higher-order-function chains (`aggregate(zip_with(...))`),
  * which are CodegenFallback — interpreted per ELEMENT with boxing, and
  * they run once per candidate PAIR in every within-cell verify join.
  * These expressions run the identical arithmetic as one compiled loop
  * (the [[SortedIntersectCount]] pattern).
  *
  * Semantics are replicated EXACTLY, not approximated:
  *  - [[ArrDot]]: left-fold Σ aᵢ·bᵢ starting from 0.0 in index order —
  *    the same IEEE operation sequence as
  *    `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, (acc,x)=>acc+x)`, so
  *    results are bit-identical;
  *  - [[ArrL2Fixed]]: Σ trunc((aᵢ−bᵢ)²·2²⁰) as longs (order-independent
  *    integer sum; truncation toward zero = the double→long cast);
  *  - null semantics: a null input array, arrays of DIFFERENT lengths
  *    (zip_with pads the shorter side with null, which nulls the fold),
  *    or any null element ⇒ null result, exactly like the HOF chain.
  */
case class ArrDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "arr_dot requires two array<double> inputs, got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrKernels.dotBoxed(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
      java.lang.Double ${ev.value}_r = graft.functions.ArrKernels.dotBoxed($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "arr_dot"
}

case class ArrL2Fixed(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "arr_l2fixed requires two array<double> inputs, got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ArrKernels.l2FixedBoxed(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
      java.lang.Long ${ev.value}_r = graft.functions.ArrKernels.l2FixedBoxed($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrL2Fixed =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "arr_l2fixed"
}

object ArrKernels {

  /** Left-fold dot product; null on length mismatch or null element
    * (the zip_with-pads-with-null contract). */
  def dotBoxed(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Σ trunc((aᵢ−bᵢ)²·2²⁰) as longs; null on length mismatch or null
    * element. NaN is rejected loudly (the ANSI double→long cast the HOF
    * spelling ran would throw too — silence would corrupt the sum). */
  def l2FixedBoxed(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      val sq = d * d * 1048576d
      if (java.lang.Double.isNaN(sq))
        throw new ArithmeticException("arr_l2fixed: NaN distance component")
      // r22 (ADVICE): sq.toLong would SATURATE at Long.MaxValue past
      // ±2⁶³, silently diverging from the replaced HOF spelling, whose
      // ANSI double→long cast throws there (components |a−b| ≳ 3e6) —
      // throw like the NaN guard so the 'replicated exactly' contract
      // holds at every input
      if (sq >= 9.223372036854776e18)
        throw new ArithmeticException(
          "arr_l2fixed: component overflows the 44.20 fixed-point sum")
      acc += sq.toLong
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
