package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{DoubleParam, LongParam, Param, ParamMap, ParamValidators}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Synthetically unlabels a fraction of rows: a seeded random split keeps
  * `percentageLabeled` of rows labeled (mask = label) and NaNs the rest
  * (mask = label * NaN), reassembled with a bag union.
  *
  * Matches the reference's `UnlabeledTransformer` semantics (ref:
  * UnlabeledTransformer.scala:41-46: randomSplit([p, 1-p], seed=11),
  * unstratified), but uses the ml.param API (free `copy`/persistence,
  * validated ranges) instead of bare `var`s. The split is row-level random —
  * same distributional behavior on any partitioning, no shuffle.
  */
class UnlabeledTransformer(override val uid: String)
    extends Transformer with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("unlabeledTransformer"))

  final val percentageLabeled: DoubleParam = new DoubleParam(this,
    "percentageLabeled", "fraction of rows that keep their label",
    ParamValidators.inRange(0.0, 1.0))
  final val seed: LongParam = new LongParam(this, "seed", "split seed")
  final val labelCol: Param[String] = new Param[String](this, "labelCol",
    "input label column")
  final val outputCol: Param[String] = new Param[String](this, "outputCol",
    "mask column: label value for labeled rows, NaN for unlabeled")

  setDefault(percentageLabeled -> 0.1, seed -> 11L,
    labelCol -> "label", outputCol -> "labelSelection")

  def setPercentageLabeled(v: Double): this.type = set(percentageLabeled, v)
  def setSeed(v: Long): this.type = set(seed, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)

  override def transform(data: Dataset[_]): DataFrame = {
    val Array(keep, drop) = data.toDF.randomSplit(
      Array($(percentageLabeled), 1 - $(percentageLabeled)), seed = $(seed))
    keep.withColumn($(outputCol), col($(labelCol)))
      .union(drop.withColumn($(outputCol), Sentinels.unlabel(col($(labelCol)))))
  }

  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): UnlabeledTransformer = defaultCopy(extra)
}

object UnlabeledTransformer extends DefaultParamsReadable[UnlabeledTransformer]
