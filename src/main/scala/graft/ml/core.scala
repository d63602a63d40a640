package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** NaN-sentinel semantics shared by all semi-supervised operators.
  *
  * The reference encodes "unlabeled" as `label * Double.NaN` in a mask column
  * and detects it with `isNaN` (ref: UnlabeledTransformer.scala:44,
  * SelfTraining.scala:129). NaN ≠ NULL: `isnan` is false for null, and
  * `na.drop` would not remove NaN. The engine preserves that encoding but
  * derives the labeled complement with a negated predicate instead of the
  * reference's `exceptAll` (ref: SelfTraining.scala:130) — identical rows,
  * zero shuffle (exceptAll hashes entire rows incl. the features vector,
  * the 100 TB scalability cliff called out in SURVEY §7).
  */
object Sentinels {
  def isUnlabeled(c: Column): Column = isnan(c)
  def isLabeled(c: Column): Column = !isnan(c)

  /** NaN-out a label column the same way the reference does (multiplication
    * propagates NaN and keeps the column DoubleType). */
  def unlabel(label: Column): Column = label * lit(Double.NaN)

  def splitByMask(df: DataFrame, maskCol: String): (DataFrame, DataFrame) =
    (df.filter(isLabeled(col(maskCol))), df.filter(isUnlabeled(col(maskCol))))
}

/** Immutable run summary — replaces the reference's mutable
  * `SemiSupervisedDataResults` side-channel (ref:
  * SemiSupervisedDataResults.scala:3-11; hazard noted in SURVEY §3.3: one
  * shared instance mutated across folds/configs is only correct under
  * strictly sequential execution). An immutable value returned with the
  * model makes grid cells independently parallelizable.
  */
case class SemiSupervisedSummary(
    labeledInitial: Long,
    unlabeledInitial: Long,
    labeledFinal: Long,
    unlabeledFinal: Long,
    iterations: Int) {
  def percentageLabeledFinal: Double =
    if (labeledInitial + unlabeledInitial == 0) 0.0
    else labeledFinal.toDouble / (labeledInitial + unlabeledInitial)
}
