package graft.ml

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.evaluation.{BinaryClassificationEvaluator, MulticlassClassificationEvaluator}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** k-fold cross-validation + experiment-grid harness.
  *
  * Replaces the reference's RDD-boundary CV (`MLUtils.kFold(data.rdd, …)` +
  * `createDataFrame` per fold + mllib metrics on an RDD[(Double,Double)],
  * ref: FunctionsSemiSupervised.scala:263-330) with a DF-native seeded fold
  * column and the ml evaluators — no DF↔RDD hops, and fold slices are plain
  * filters over one cached frame.
  *
  * Results keep the reference's EXACT 15-column schema (ref:
  * FunctionsSemiSupervised.scala:168-182), but rows are emitted directly and
  * unioned — not scatter-updated into a template with |grid|×10 stacked
  * `withColumn(when…)` projections (ref :203-253, the plan-depth hazard
  * SURVEY §4 flags).
  */
object Evaluation {

  /** Averaged CV metrics + self-labeling counters. */
  case class CvMetrics(
      accuracy: Double, auc: Double, pr: Double, f1: Double,
      labeledInitial: Long, unlabeledInitial: Long,
      labeledFinal: Long, unlabeledFinal: Long, iterations: Int)

  /** One grid cell, reference M8 schema — field order IS the 15-column
    * result schema (data … F1score). */
  case class ExperimentResult(
      data: String, classifier: String, criterion: String,
      percentageLabeled: Double, thresholdOrKBest: Double, iteration: Int,
      LabeledInitial: Long, UnLabeledInitial: Long, LabeledFinal: Long,
      UnLabeledFinal: Long, percentageLabeledFinal: Double,
      accuracy: Double, AUC: Double, PR: Double, F1score: Double)

  /** DF-native k-fold CV. `fitFn` fits on the train slice and returns the
    * fitted transformer plus an optional self-labeling summary.
    * Fold assignment: seeded uniform fold id (ref uses mllib kFold with
    * seed 8; exact row-level fold parity across Spark versions is a
    * non-goal per SURVEY §7 — distributional properties are tested instead).
    */
  def crossValidate(
      data: DataFrame, k: Int, seed: Long,
      fitFn: DataFrame => (Transformer, Option[SemiSupervisedSummary]))
      : CvMetrics = {
    require(k >= 2, s"k-fold needs k>=2, got $k")
    val folded = data.withColumn("__fold", (rand(seed) * k).cast("int"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    folded.count()
    try crossValidateSlices((0 until k).map { i =>
      (folded.filter(col("__fold") =!= i).drop("__fold"),
        folded.filter(col("__fold") === i).drop("__fold"))
    }, fitFn)
    finally folded.unpersist()
  }

  /** k-fold CV over PRECOMPUTED (train, test) fold slices — the shared-grid
    * path ([[Experiments.runGridShared]]) hoists the fold split and the
    * per-(fold, pct) masked frame out of the per-cell loop and feeds the
    * slices here. This IS [[crossValidate]]'s evaluation body (that method
    * delegates), so the two paths cannot drift; equivalence is also pinned
    * by ExperimentsSpec and the q84 golden oracle. */
  def crossValidateSlices(
      slices: Seq[(DataFrame, DataFrame)],
      fitFn: DataFrame => (Transformer, Option[SemiSupervisedSummary]))
      : CvMetrics = {
    val acc = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy")
    val f1 = new MulticlassClassificationEvaluator()
      .setMetricName("fMeasureByLabel").setMetricLabel(1.0)
    val auc = new BinaryClassificationEvaluator()
      .setMetricName("areaUnderROC")
    val pr = new BinaryClassificationEvaluator()
      .setMetricName("areaUnderPR")

    // folds are independent seeded fits over disjoint pre-built slices, so
    // they run concurrently (same shape as Spark's own CrossValidator with
    // parallelism = k: shared evaluator instances, one model per future);
    // `per` keeps slice order, so the fold-mean summation order is fixed
    val per = Par.mapAll(slices) { case (train, test) =>
      val (model, summary) = fitFn(train)
      val predictions = model.transform(test)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val m = (acc.evaluate(predictions), auc.evaluate(predictions),
        pr.evaluate(predictions), f1.evaluate(predictions))
      predictions.unpersist()
      (m, summary.getOrElse(SemiSupervisedSummary(0, 0, 0, 0, 0)))
    }

    val n = per.size.toDouble
    // counters are rounded means (integer division would truncate toward
    // zero and systematically under-report)
    def meanL(f: SemiSupervisedSummary => Long): Long =
      math.round(per.map(s => f(s._2)).sum.toDouble / n)
    CvMetrics(
      accuracy = per.map(_._1._1).sum / n,
      auc = per.map(_._1._2).sum / n,
      pr = per.map(_._1._3).sum / n,
      f1 = per.map(_._1._4).sum / n,
      labeledInitial = meanL(_.labeledInitial),
      unlabeledInitial = meanL(_.unlabeledInitial),
      labeledFinal = meanL(_.labeledFinal),
      unlabeledFinal = meanL(_.unlabeledFinal),
      iterations = math.round(per.map(_._2.iterations).sum.toDouble / n).toInt)
  }

  /** Assemble grid-cell results into the reference's 15-column results
    * DataFrame (exact column names, ref FunctionsSemiSupervised.scala:168-182). */
  def resultsDF(spark: SparkSession, rows: Seq[ExperimentResult]): DataFrame = {
    import spark.implicits._
    rows.toDF()
  }
}
