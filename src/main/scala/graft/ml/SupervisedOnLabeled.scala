package graft.ml

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.classification.{ClassificationModel, Classifier}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Supervised baseline: drop the NaN-masked (unlabeled) rows, fit the base
  * classifier on what remains (ref: Supervised.scala:12-43).
  *
  * The reference computes the labeled slice as
  * `dataset.exceptAll(filter(isNaN))` (ref :39-40); here it is the direct
  * `!isnan` predicate — identical rows, no shuffle.
  *
  * Bound is `Classifier`, not `ProbabilisticClassifier`: the supervised-only
  * path must also take LinearSVC, which the reference's supervised grid
  * includes (ref: notebooks/Supervised/BaseClassifiers.scala:334) and which
  * produces rawPrediction but no probability column. The self-labeling
  * estimators keep the probabilistic bound — they need `probability` for
  * their confidence criterion.
  */
class SupervisedOnLabeled[
    E <: Classifier[Vector, E, M],
    M <: ClassificationModel[Vector, M]](
    override val uid: String,
    val baseClassifier: Classifier[Vector, E, M])
  extends Estimator[M] with SelfLabelingParams {

  def this(baseClassifier: Classifier[Vector, E, M]) =
    this(Identifiable.randomUID("supervisedOnLabeled"), baseClassifier)

  setDefault(maxIter -> 1)

  def setUnlabeledCol(v: String): this.type = set(unlabeledCol, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)

  override def fit(dataset: Dataset[_]): M = {
    val labeled = dataset.toDF
      .filter(Sentinels.isLabeled(col($(unlabeledCol))))
      .select(col($(featuresCol)), col($(labelCol)))
    baseClassifier.fit(labeled)
  }

  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): Estimator[M] = defaultCopy(extra)
}
