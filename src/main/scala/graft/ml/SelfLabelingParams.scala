package graft.ml

import org.apache.spark.ml.param.{DoubleParam, IntParam, Param, Params, ParamValidators}

/** Shared parameter surface of the self-labeling meta-estimators
  * (ref: SelfTraining.scala:26-38, CoTraining.scala params — bare `var`s in
  * the reference, ml.param here).
  */
trait SelfLabelingParams extends Params {

  /** Confidence gate for the `threshold` criterion; strictly greater-than,
    * matching the reference (ref: SelfTraining.scala:149 `probMax > t`,
    * remainder `<= t`). */
  final val threshold: DoubleParam = new DoubleParam(this, "threshold",
    "min classifier confidence (strict >) to accept a self-label",
    ParamValidators.inRange(0.0, 1.0))

  /** Max refit iterations (ref default 7 for self-training,
    * 3 for co-training). */
  final val maxIter: IntParam = new IntParam(this, "maxIter",
    "maximum self-labeling iterations", ParamValidators.gtEq(1))

  /** `threshold` | `kBest` (ref: SelfTraining.scala:146,172). */
  final val criterion: Param[String] = new Param[String](this, "criterion",
    "self-labeling acceptance criterion",
    ParamValidators.inArray(Array("threshold", "kBest")))

  /** Fraction for the kBest criterion. k is computed ONCE before the loop
    * from the initial unlabeled count: round(kBest·U₀/(maxIter−1))
    * (ref: SelfTraining.scala:173 — preserved exactly, incl. rounding). */
  final val kBest: DoubleParam = new DoubleParam(this, "kBest",
    "fraction of initially-unlabeled rows to self-label per iteration",
    ParamValidators.inRange(0.0, 1.0))

  /** Column whose NaN marks an unlabeled row (ref columnNameNewLabels;
    * notebooks pass "labelSelection" produced by UnlabeledTransformer). */
  final val unlabeledCol: Param[String] = new Param[String](this,
    "unlabeledCol", "mask column: NaN = unlabeled")

  final val featuresCol: Param[String] =
    new Param[String](this, "featuresCol", "features column")
  final val labelCol: Param[String] =
    new Param[String](this, "labelCol", "label column")

  setDefault(threshold -> 0.7, criterion -> "threshold", kBest -> 1.0,
    unlabeledCol -> "labelSelection", featuresCol -> "features",
    labelCol -> "label")

  def getThreshold: Double = $(threshold)
  def getMaxIter: Int = $(maxIter)
  def getCriterion: String = $(criterion)
  def getKBest: Double = $(kBest)
  def getUnlabeledCol: String = $(unlabeledCol)
}
