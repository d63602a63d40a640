package graft.ml

import org.apache.spark.ml.classification.{ProbabilisticClassificationModel, ProbabilisticClassifier}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.{DoubleParam, IntParam, Param, ParamMap, ParamValidators}
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Final model of [[ProbabilisticSelfTraining]]: a
  * `ProbabilisticClassificationModel` delegating all scoring to the fitted
  * base model, so it slots into every surface that expects the standard
  * classification model contract (`OneVsRestModel`, evaluators, thresholds).
  */
class SelfLabeledModel[M <: ProbabilisticClassificationModel[Vector, M]](
    override val uid: String, val innerModel: M)
  extends ProbabilisticClassificationModel[Vector, SelfLabeledModel[M]] {

  override def numClasses: Int = innerModel.numClasses
  override def numFeatures: Int = innerModel.numFeatures
  override def predictRaw(features: Vector): Vector =
    innerModel.predictRaw(features)
  override def raw2probabilityInPlace(raw: Vector): Vector =
    RawProbBridge.raw2probabilityInPlace(innerModel, raw)
  override def copy(extra: ParamMap): SelfLabeledModel[M] =
    copyValues(new SelfLabeledModel[M](uid, innerModel), extra)
      .setParent(parent)
}

/** `ProbabilisticClassifier`-conformant facade over
  * [[SelfTrainingClassifier]], closing the documented API delta with the
  * reference (whose estimators extend `ProbabilisticClassifier` — ref:
  * SelfTraining.scala:17-24) so the self-labeling flow nests anywhere a
  * classifier fits: `OneVsRest`, `CrossValidator` with a classifier slot,
  * pipelines written against the reference's types.
  *
  * Mask-column contract: meta-estimators like `OneVsRest` re-derive their
  * training frame as (label, features) ONLY, dropping the NaN mask column.
  * When `unlabeledCol` is absent from the input, nothing is marked
  * unlabeled and the fit degenerates to ONE supervised fit of the base
  * classifier — the exact semantics of "no rows to self-label". When the
  * mask is present, the full self-training loop runs.
  */
class ProbabilisticSelfTraining[
    E <: ProbabilisticClassifier[Vector, E, M],
    M <: ProbabilisticClassificationModel[Vector, M]](
    override val uid: String,
    val baseClassifier: ProbabilisticClassifier[Vector, E, M])
  extends ProbabilisticClassifier[
    Vector, ProbabilisticSelfTraining[E, M], SelfLabeledModel[M]] {

  def this(baseClassifier: ProbabilisticClassifier[Vector, E, M]) =
    this(Identifiable.randomUID("probSelfTraining"), baseClassifier)

  // facade twins of SelfLabelingParams (that trait redeclares
  // featuresCol/labelCol, which ProbabilisticClassifier already owns here)
  final val threshold: DoubleParam = new DoubleParam(this, "threshold",
    "min classifier confidence (strict >) to accept a self-label",
    ParamValidators.inRange(0.0, 1.0))
  final val maxIter: IntParam = new IntParam(this, "maxIter",
    "maximum self-labeling iterations", ParamValidators.gtEq(1))
  final val criterion: Param[String] = new Param[String](this, "criterion",
    "self-labeling acceptance criterion",
    ParamValidators.inArray(Array("threshold", "kBest")))
  final val kBest: DoubleParam = new DoubleParam(this, "kBest",
    "fraction of initially-unlabeled rows to self-label per iteration",
    ParamValidators.inRange(0.0, 1.0))
  final val unlabeledCol: Param[String] = new Param[String](this,
    "unlabeledCol", "mask column: NaN = unlabeled")

  setDefault(threshold -> 0.7, maxIter -> 7, criterion -> "threshold",
    kBest -> 1.0, unlabeledCol -> "labelSelection")

  def setThreshold(v: Double): this.type = set(threshold, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setCriterion(v: String): this.type = set(criterion, v)
  def setKBest(v: Double): this.type = set(kBest, v)
  def setUnlabeledCol(v: String): this.type = set(unlabeledCol, v)

  override protected def train(dataset: Dataset[_]): SelfLabeledModel[M] = {
    val inner: M =
      if (!dataset.columns.contains($(unlabeledCol))) {
        // no mask column → nothing is marked unlabeled → one supervised fit
        // (this is the OneVsRest path; base cols renamed to its contract)
        val slim = dataset.select(
          col($(featuresCol)).as(baseClassifier.getFeaturesCol),
          col($(labelCol)).cast("double").as(baseClassifier.getLabelCol))
        baseClassifier.fit(slim)
      } else {
        new SelfTrainingClassifier[E, M](baseClassifier)
          .setThreshold($(threshold)).setMaxIter($(maxIter))
          .setCriterion($(criterion)).setKBest($(kBest))
          .setUnlabeledCol($(unlabeledCol))
          .setFeaturesCol($(featuresCol)).setLabelCol($(labelCol))
          .fit(dataset)
      }
    copyValues(new SelfLabeledModel[M](
      Identifiable.randomUID("selfLabeledModel"), inner).setParent(this))
  }

  // NOT defaultCopy: that reflects for a (String) constructor, which a
  // meta-estimator carrying a base classifier doesn't have
  override def copy(extra: ParamMap): ProbabilisticSelfTraining[E, M] =
    copyValues(new ProbabilisticSelfTraining[E, M](
      uid, baseClassifier.copy(ParamMap.empty)), extra)
}
