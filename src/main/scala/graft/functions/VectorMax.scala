package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, UserDefinedType}

/** Max element of an ml VectorUDT column — the reference's ONLY UDF
  * (`udf((v: Vector) => v.toArray.max)`, ref: SelfTraining.scala:128), which
  * is a codegen barrier + SerDe boundary in its training loop. This custom
  * Expression consumes the UDT's serialized form directly (struct of
  * type/size/indices/values — the public VectorUDT layout): no Vector
  * object, no toArray copy, and it participates in whole-stage codegen via
  * a static helper call.
  *
  * (`array_max(vector_to_array(c))` is the built-in alternative; this skips
  * the intermediate array materialization.)
  */
case class VectorMax(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case udt: UserDefinedType[_]
        if udt.userClass == classOf[org.apache.spark.ml.linalg.Vector] =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"vector_max requires a VectorUDT input, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    VectorMax.maxOf(input.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorMax.maxOf((org.apache.spark.sql.catalyst.InternalRow) $c)")

  override protected def withNewChildInternal(newChild: Expression): VectorMax =
    copy(child = newChild)

  override def prettyName: String = "vector_max"
}

object VectorMax {

  /** Static entry shared by interpreted eval and generated code. Operates on
    * the VectorUDT struct: (type: byte [0=sparse,1=dense], size: int,
    * indices: array<int>, values: array<double>). Sparse vectors include
    * their implicit zeros, matching `toArray.max`. */
  def maxOf(serialized: InternalRow): Double = {
    val tpe = serialized.getByte(0)
    val values = serialized.getArray(3)
    val n = values.numElements()
    var m = Double.NegativeInfinity
    if (tpe == 0) { // sparse: implicit zeros count if any slot is inactive
      val size = serialized.getInt(1)
      if (n < size) m = 0.0
    }
    var i = 0
    while (i < n) {
      val x = values.getDouble(i)
      if (x > m) m = x
      i += 1
    }
    m
  }

  /** Register `vector_max` in the session's function registry so it is
    * callable from Column/SQL surfaces (`expr("vector_max(probability)")`).
    * Idempotent: skips when already present, so per-fit callers don't spam
    * the registry's replace-warnings. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = org.apache.spark.sql.catalyst.FunctionIdentifier("vector_max")
    if (!registry.functionExists(ident))
      registry.createOrReplaceTempFunction(
        "vector_max", exprs => VectorMax(exprs.head), "scala_udf")
  }
}
