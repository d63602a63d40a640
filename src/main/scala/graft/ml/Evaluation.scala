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

  /** Score `test` once and compute the four metrics in TWO jobs, not four+:
    * accuracy + F1(label 1) come from ONE confusion-matrix aggregation (a
    * ≤|classes|²-row collect — MulticlassClassificationEvaluator would run
    * a full pass per metric), and ROC/PR AUC come from ONE
    * top-k-ordered per-distinct-score aggregation finished on the driver
    * ([[binaryAucPrLocal]]). The driver finish is the grid runner's
    * biggest fixed cost killed: BinaryClassificationMetrics spends 5+
    * driver-scheduled jobs per call (combineByKey, a RangePartitioner
    * sample, the sort, a partition-count collect, cumulative-count
    * staging, one aggregate per area) plus an internal persist/unpersist
    * pair — ~0.2 s of pure job latency per fit+evaluate chain measured at
    * sf0.1, ×240 chains in q177. The replacement runs ONE
    * TakeOrderedAndProject job over the per-score counts and replays
    * BCM's exact-regime math on ≤2000 collected rows.
    *
    * Scale guard: the driver finish is only valid (and only collected)
    * when the fold has < 2000 DISTINCT scores — exactly the regime where
    * BinaryClassificationMetrics(numBins=1000) does NO downsampling, so
    * the two compute the same curve from the same points (parity
    * property-tested in MlSpec, incl. ties/degenerate folds). At ≥2000
    * distinct scores (a corpus-sized fold), the take(2000) probe — a
    * bounded top-k, never a corpus collect — detects the regime and the
    * computation falls back to the distributed BCM path unchanged.
    * AUC/PR are rawPrediction-based so non-probabilistic models
    * (LinearSVC) evaluate too. Returns (accuracy, auc, pr, f1). */
  def evaluate4(model: Transformer, test: DataFrame)
      : (Double, Double, Double, Double) = {
    import org.apache.spark.ml.functions.vector_to_array
    // r22 (ADVICE): persist BEFORE the bounded probe below — on the
    // corpus-sized (non-local) path the probe job and the fallback's two
    // dedicated jobs all read this frame, and an unpersisted probe ran
    // model.transform + the full grouped aggregation once extra on
    // exactly the large folds the regime guard exists for. The local
    // regime unpersists immediately after the single probe job (its one
    // and only action), so small folds pay one persist round-trip — the
    // storage write rides the probe job itself.
    val predictions = model.transform(test)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // ONE aggregation job feeds BOTH metric families (r21 — the old path
    // ran a confusion-matrix job AND a per-score-counts job over a
    // persisted predictions frame; with 240+ fit+evaluate chains per
    // grid query, the second job plus the persist/unpersist round-trip
    // was the grid runner's largest remaining fixed cost): group by
    // (score, prediction, label) — the confusion matrix is this frame
    // re-aggregated over (prediction, label) and the per-threshold
    // (positives, negatives) counts are it re-aggregated over score,
    // both exact integer sums of the same rows the two old jobs read.
    // The top-k cut keeps the collect bounded: binary folds carry at
    // most 4 rows per distinct score, so 8000 complete rows certify
    // < 2000 distinct scores — exactly the old local-path guard; a
    // truncated result or >= 2000 distinct scores falls back to the
    // distributed BCM path unchanged (value-neutral at the boundary:
    // below 2000 distinct scores BCM does no downsampling and computes
    // the identical curve, per binaryAucPrLocal's contract).
    val s = element_at(vector_to_array(col("rawPrediction")), 2)
    val g = predictions
      .groupBy(s.as("s"), col("prediction"), col("label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("s").desc)
      .take(8001)
    val nDistinct = {
      var d = 0; var prev = Double.NaN; var first = true
      g.foreach { r =>
        val v = r.getDouble(0)
        if (first || java.lang.Double.compare(prev, v) != 0) d += 1
        prev = v; first = false
      }
      d
    }
    val localRegime = g.length <= 8000 && nDistinct < 2000
    // local regime: the probe was this fold's ONLY distributed action —
    // release the blocks before the driver-side finish
    if (localRegime) predictions.unpersist(blocking = false)
    val cm: Seq[(Double, Double, Long)] =
      if (localRegime)
        g.toSeq.groupBy(r => (r.getDouble(1), r.getDouble(2)))
          .map { case ((p, l), rs) => (p, l, rs.map(_.getLong(3)).sum) }.toSeq
      else
        predictions.groupBy(col("prediction"), col("label"))
          .agg(count(lit(1)).as("n")).collect()
          .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2))).toSeq
    val n = cm.map(_._3).sum.toDouble
    // loud beats NaN: correct/0 would flow a silent NaN into the result row
    require(n > 0, "evaluate4: empty test frame (no rows to score)")
    val correct = cm.filter(r => r._1 == r._2).map(_._3).sum.toDouble
    val tp = cm.filter(r => r._1 == 1.0 && r._2 == 1.0).map(_._3).sum
    val fp = cm.filter(r => r._1 == 1.0 && r._2 != 1.0).map(_._3).sum
    val fn = cm.filter(r => r._1 != 1.0 && r._2 == 1.0).map(_._3).sum
    val acc = correct / n
    val f1 =
      if (2 * tp + fp + fn == 0) 0.0
      else 2.0 * tp / (2.0 * tp + fp + fn)
    val (auc, pr) =
      if (localRegime) {
        // per-distinct-score (positives, negatives), score descending —
        // adjacent rows of the sorted collect fold into one entry per
        // score (same integer sums the old per-score job produced)
        val counts = scala.collection.mutable.ArrayBuffer
          .empty[(Double, Long, Long)]
        g.foreach { r =>
          val v = r.getDouble(0)
          val pos = if (r.getDouble(2) > 0.5) r.getLong(3) else 0L
          val neg = if (r.getDouble(2) > 0.5) 0L else r.getLong(3)
          if (counts.nonEmpty &&
              java.lang.Double.compare(counts.last._1, v) == 0) {
            val last = counts.last
            counts(counts.length - 1) = (v, last._2 + pos, last._3 + neg)
          } else counts += ((v, pos, neg))
        }
        binaryAucPrLocal(counts.toSeq)
      } else {
        try binaryAucPrDistributed(predictions)
        finally predictions.unpersist(blocking = false)
      }
    (acc, auc, pr, f1)
  }

  /** ROC-AUC and PR-AUC from per-distinct-score (positives, negatives)
    * counts sorted score-DESCENDING — the exact math
    * BinaryClassificationMetrics runs in its no-downsampling regime
    * (numBins=1000, < 2000 distinct scores → grouping < 2): cumulative
    * counts per threshold, ROC curve (0,0) ⊕ (fpr,tpr)* ⊕ (1,1), PR curve
    * (0, first precision) ⊕ (recall, precision)*, trapezoid areas; the
    * degenerate-denominator conventions (no positives → recall 0, no
    * negatives → fpr 0, empty prediction → precision 1) mirror mllib's
    * BinaryClassificationMetricComputers. Equality with BCM is pinned by
    * a randomized parity property in MlSpec (ties, single-class folds,
    * constant scores). */
  private[graft] def binaryAucPrLocal(
      counts: Seq[(Double, Long, Long)]): (Double, Double) = {
    val totP = counts.map(_._2).sum.toDouble
    val totN = counts.map(_._3).sum.toDouble
    var cp = 0L; var cn = 0L
    val cum = counts.map { case (_, p, ng) =>
      cp += p; cn += ng; (cp, cn)
    }
    def tpr(c: (Long, Long)): Double =
      if (totP == 0.0) 0.0 else c._1 / totP
    def fpr(c: (Long, Long)): Double =
      if (totN == 0.0) 0.0 else c._2 / totN
    def precision(c: (Long, Long)): Double = {
      val predPos = (c._1 + c._2).toDouble
      if (predPos == 0.0) 1.0 else c._1 / predPos
    }
    def area(points: Iterator[(Double, Double)]): Double = {
      var sum = 0.0
      var prev: (Double, Double) = null
      points.foreach { pt =>
        if (prev != null)
          sum += (pt._1 - prev._1) * (pt._2 + prev._2) / 2.0
        prev = pt
      }
      sum
    }
    val auc = area(Iterator((0.0, 0.0)) ++
      cum.iterator.map(c => (fpr(c), tpr(c))) ++ Iterator((1.0, 1.0)))
    val prA =
      if (cum.isEmpty) 0.0
      else area(Iterator((0.0, precision(cum.head))) ++
        cum.iterator.map(c => (tpr(c), precision(c))))
    (auc, prA)
  }

  /** The distributed fallback for corpus-sized folds (≥2000 distinct
    * scores): BinaryClassificationMetrics unchanged — including its
    * numBins=1000 downsampling, which the local path deliberately never
    * replicates (its bin boundaries depend on partitioning). */
  private[graft] def binaryAucPrDistributed(predictions: DataFrame)
      : (Double, Double) = {
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
    (auc, pr)
  }

  /** Partition count for a CV input frame, a pure function of its ROW
    * COUNT — never of core count or parent partitioning. Grid fold slices
    * are small relative to the corpus (they feed driver-coordinated
    * mllib fits), and every Spark job over a slice pays scheduling per
    * task: at gate scale the frames are a few thousand rows spread over
    * parquet-file-count partitions, and the grid's thousands of tiny
    * per-fit jobs each carried 2-3 near-empty tasks through the
    * single-threaded DAGScheduler — measured at sf0.1: the concurrent
    * 40-cell grid runs 17.1 s on 2-partition slices vs 11.3 s on 1
    * (GridProbe). 64 Ki rows per partition, capped at 2000 for a
    * genuinely huge fold.
    *
    * Determinism scope, stated precisely: in the coalesce(1) regime
    * (≤ 65,536 rows — every gated frame; guarded in ExperimentsSpec) the
    * fold/mask lineage is bit-identical across local[4]/local[32],
    * because a single merged partition's row order is
    * parallelism-invariant. ABOVE 64 Ki rows, coalesce(m>1) grouping
    * follows the parent scan's split layout, which follows
    * defaultParallelism — fold assignment then varies across core counts
    * exactly as the raw rand(seed)-on-scan-partitions lineage always did
    * (the pre-existing golden contract was already scoped to
    * single-split sf0.01 reads, per MlOracleGen's scaladoc). */
  private[graft] def cvSlicePartitions(n: Long): Int =
    math.max(1L, math.min(2000L, (n + 65535) / 65536)).toInt

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
    // one extra count to size the slice partitioning (cvSlicePartitions);
    // the coalesce must sit BELOW the fold/mask rand lineage so the same
    // rule in runGridShared yields the same folds (ExperimentsSpec parity)
    val folded = data.coalesce(cvSlicePartitions(data.count()))
      .withColumn("__fold", (rand(seed) * k).cast("int"))
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
      : CvMetrics =
    combineFolds(crossValidateSlicesPerFold(slices, fitFn))

  /** The per-fold raw results behind [[crossValidateSlices]], in slice
    * order: the (accuracy, auc, pr, f1) quadruple and the self-labeling
    * summary of each fold. Exposed (r22) so the grid runner's
    * fit-equivalence classes can re-combine ONE class's fold results
    * into every member cell's CvMetrics — the supervised member zeroes
    * the summaries ([[Experiments.runGridShared]]'s collapse note)
    * without re-running the fits. */
  private[graft] def crossValidateSlicesPerFold(
      slices: Seq[(DataFrame, DataFrame)],
      fitFn: DataFrame => (Transformer, Option[SemiSupervisedSummary]))
      : Seq[((Double, Double, Double, Double), SemiSupervisedSummary)] =
    // folds are independent seeded fits over disjoint pre-built slices, so
    // they run concurrently (same shape as Spark's own CrossValidator with
    // parallelism = k: one model per future); the result keeps slice
    // order, so the fold-mean summation order is fixed. Metrics via the
    // fused [[evaluate4]] — 2 jobs per fold instead of 4 separate
    // evaluator passes (each BinaryClassificationEvaluator.evaluate
    // re-sorts the score RDD from scratch); with 22 concurrent fold fits
    // in the q84 grid that halves the evaluation job count.
    Par.mapAll(slices) { case (train, test) =>
      val (model, summary) = fitFn(train)
      val (a, u, p, f) = evaluate4(model, test)
      ((a, u, p, f), summary.getOrElse(SemiSupervisedSummary(0, 0, 0, 0, 0)))
    }

  /** Fold means → CvMetrics — [[crossValidateSlices]]'s combination
    * body, factored out so per-fold results can be re-combined. */
  private[graft] def combineFolds(
      per: Seq[((Double, Double, Double, Double), SemiSupervisedSummary)])
      : CvMetrics = {
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
