package graft.ml

import org.apache.spark.ml.Transformer
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

  /** Score `test` once and compute the four metrics in TWO jobs, not four:
    * accuracy + F1(label 1) come from ONE confusion-matrix aggregation (a
    * ≤|classes|²-row collect — MulticlassClassificationEvaluator would run
    * a full pass per metric), and ROC/PR AUC share ONE
    * BinaryClassificationMetrics whose internal cumulative counts are
    * persisted, so the score sort runs once (each
    * BinaryClassificationEvaluator.evaluate re-sorts from scratch).
    * numBins=1000 matches the evaluator default, so all four values are
    * identical to the evaluator outputs (parity-tested in MlSpec at
    * 1e-12). AUC/PR are rawPrediction-based so non-probabilistic models
    * (LinearSVC) evaluate too. Returns (accuracy, auc, pr, f1). */
  def evaluate4(model: Transformer, test: DataFrame)
      : (Double, Double, Double, Double) = {
    val predictions = model.transform(test)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val cm = predictions.groupBy(col("prediction"), col("label"))
      .agg(count(lit(1)).as("n")).collect()
    val n = cm.map(_.getLong(2)).sum.toDouble
    // loud beats NaN: correct/0 would flow a silent NaN into the result row
    require(n > 0, "evaluate4: empty test frame (no rows to score)")
    val correct = cm.filter(r => r.getDouble(0) == r.getDouble(1))
      .map(_.getLong(2)).sum.toDouble
    val tp = cm.filter(r => r.getDouble(0) == 1.0 && r.getDouble(1) == 1.0)
      .map(_.getLong(2)).sum
    val fp = cm.filter(r => r.getDouble(0) == 1.0 && r.getDouble(1) != 1.0)
      .map(_.getLong(2)).sum
    val fn = cm.filter(r => r.getDouble(0) != 1.0 && r.getDouble(1) == 1.0)
      .map(_.getLong(2)).sum
    val acc = correct / n
    val f1 =
      if (2 * tp + fp + fn == 0) 0.0
      else 2.0 * tp / (2.0 * tp + fp + fn)
    val scoreAndLabels = predictions
      .select(col("rawPrediction"), col("label")).rdd
      .map { r =>
        (r.getAs[org.apache.spark.ml.linalg.Vector](0)(1), r.getDouble(1))
      }
    val metrics = new org.apache.spark.mllib.evaluation
      .BinaryClassificationMetrics(scoreAndLabels, 1000)
    val auc = metrics.areaUnderROC()
    val pr = metrics.areaUnderPR()
    metrics.unpersist()
    predictions.unpersist(blocking = false)
    (acc, auc, pr, f1)
  }

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
    // folds are independent seeded fits over disjoint pre-built slices, so
    // they run concurrently (same shape as Spark's own CrossValidator with
    // parallelism = k: one model per future); `per` keeps slice order, so
    // the fold-mean summation order is fixed. Metrics via the fused
    // [[evaluate4]] — 2 jobs per fold instead of 4 separate evaluator
    // passes (each BinaryClassificationEvaluator.evaluate re-sorts the
    // score RDD from scratch); with 22 concurrent fold fits in the q84
    // grid that halves the evaluation job count.
    val per = Par.mapAll(slices) { case (train, test) =>
      val (model, summary) = fitFn(train)
      val (a, u, p, f) = evaluate4(model, test)
      ((a, u, p, f), summary.getOrElse(SemiSupervisedSummary(0, 0, 0, 0, 0)))
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
