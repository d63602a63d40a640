package graft.ml

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.classification.{ProbabilisticClassificationModel, ProbabilisticClassifier}
import org.apache.spark.ml.graftbridge.MlPersistenceBridge
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.{Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** Self-Training (Yarowsky 1995) meta-estimator: fit the base classifier on
  * the labeled slice, self-label the unlabeled rows the model is confident
  * about, refit, repeat (ref: SelfTraining.scala:121-207).
  *
  * Same generic bounds as the reference (any Spark ML
  * `ProbabilisticClassifier`), same acceptance criteria (`threshold` strict
  * `>`, `kBest` with k frozen before the loop from the initial unlabeled
  * count — ref :149,:173), same relabeling (`prediction` becomes the new
  * `label` — ref :152).
  *
  * Deliberate departures for scale (SURVEY §7):
  *  - labeled/unlabeled partition via `isnan` predicate pair, not
  *    `exceptAll` (ref :129-130) — no whole-row shuffle on vector columns;
  *  - per-iteration bookkeeping fused into ONE aggregate job instead of two
  *    `count()` actions (ref :156-157);
  *  - kBest acceptance via an exact distributed order-statistic cutoff
  *    ([[graft.plans.Selection]]), not `orderBy.limit(k)` over vectors with
  *    k ∝ |unlabeled| (ref :173-178 funnels k rows through one task);
  *  - iterations that would accept zero new labels terminate the loop (the
  *    reference keeps refitting an unchanged training set until maxIter —
  *    same final model, wasted jobs);
  *  - summary is an immutable value (see [[SemiSupervisedSummary]]), not a
  *    shared mutable side-channel.
  */
class SelfTrainingClassifier[
    E <: ProbabilisticClassifier[Vector, E, M],
    M <: ProbabilisticClassificationModel[Vector, M]](
    override val uid: String,
    val baseClassifier: ProbabilisticClassifier[Vector, E, M])
  extends Estimator[M] with SelfLabelingParams with MLWritable {

  def this(baseClassifier: ProbabilisticClassifier[Vector, E, M]) =
    this(Identifiable.randomUID("selfTraining"), baseClassifier)

  setDefault(maxIter -> 7)

  def setThreshold(v: Double): this.type = set(threshold, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setCriterion(v: String): this.type = set(criterion, v)
  def setKBest(v: Double): this.type = set(kBest, v)
  def setUnlabeledCol(v: String): this.type = set(unlabeledCol, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)

  @volatile private var lastSummary: Option[SemiSupervisedSummary] = None

  /** Summary of the most recent `fit` on this estimator instance. */
  def summary: Option[SemiSupervisedSummary] = lastSummary

  override def fit(dataset: Dataset[_]): M = {
    val (model, s) = fitWithSummary(dataset)
    lastSummary = Some(s)
    model
  }

  def fitWithSummary(dataset: Dataset[_]): (M, SemiSupervisedSummary) = {
    val fCol = $(featuresCol); val lCol = $(labelCol)
    // Materialize the narrow input ONCE: the initial-count aggregate, the
    // labeled fit and the unlabeled scoring all fork from here, and without
    // this persist each would recompute the full upstream lineage (for the
    // driver queries that lineage contains two randomSplit per-partition
    // sorts over the corpus — three redundant sorted scans per fit).
    // FitNonce: makes this fit's persisted plans canonically unique so a
    // concurrent fit over the same staged input can never share (and then
    // tear down) this fit's cache entries — see FitNonce's scaladoc
    val df = dataset.toDF.select(col(fCol), col(lCol), col($(unlabeledCol)),
        FitNonce.column())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (labeled0, unlabeled0) = Sentinels.splitByMask(df, $(unlabeledCol))

    var labeled = labeled0.select(col(fCol), col(lCol))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var unlabeled = unlabeled0.select(col(fCol), col(lCol))
      .persist(StorageLevel.MEMORY_AND_DISK)

    // one fused job for both initial counts (ref runs four separate counts,
    // SelfTraining.scala:133-140)
    val ini = df.agg(
      sum(when(Sentinels.isLabeled(col($(unlabeledCol))), 1L).otherwise(0L)),
      sum(when(Sentinels.isUnlabeled(col($(unlabeledCol))), 1L).otherwise(0L)))
      .head
    val labeledIni = Option(ini.get(0)).fold(0L)(_.asInstanceOf[Long])
    val unlabeledIni = Option(ini.get(1)).fold(0L)(_.asInstanceOf[Long])
    var labeledCount = labeledIni
    var unlabeledCount = unlabeledIni

    var model = baseClassifier.fit(labeled)
    var iter = 1

    // custom codegen'd expression instead of the reference's UDF barrier
    // (graft.functions.VectorMax; built-in equivalent:
    // array_max(vector_to_array(col)))
    graft.functions.VectorMax.register(df.sparkSession)
    // nanvl: a NaN probability (degenerate fit) means "not confident" —
    // coalesce to 0.0 so threshold comparison and kBest selection both keep
    // the row in the pool instead of dropping it from BOTH filter branches
    // (NaN fails > t and <= t alike) and breaking the counters
    val probMax = nanvl(
      expr(s"vector_max(`${baseClassifier.getProbabilityCol}`)"), lit(0.0))
    // k frozen BEFORE the loop from the initial unlabeled count
    // (ref: SelfTraining.scala:173 — rounding preserved)
    val numberOfKBest = (($(kBest) * unlabeledCount) / ($(maxIter) - 1).max(1))
      .round.toInt

    // Loop contract (ref: SelfTraining.scala:147-169): refit after every
    // acceptance; `iter` counts passes and only advances while unlabeled
    // rows remain, so a run that labels everything on pass 1 reports iter=1
    // (matches the reference's published degenerate rows, BASELINE.md).
    var converged = false
    // kBest intermediates stay cached while their lazy consumers (`rest`)
    // are in flight; released together at the end of the fit
    val deferredUnpersist = scala.collection.mutable.ListBuffer.empty[DataFrame]
    while (iter < $(maxIter) && unlabeledCount > 0 && !converged) {
      val preds = model.transform(unlabeled)
        .withColumn("probMax", probMax)
        .persist(StorageLevel.MEMORY_AND_DISK)

      val (newLabeled, rest, nNew): (DataFrame, DataFrame, Long) =
        if ($(criterion) == "threshold") {
          val conf = preds.filter(col("probMax") > $(threshold))
          val rst = preds.filter(col("probMax") <= $(threshold))
          val n = preds.agg(
            sum(when(col("probMax") > $(threshold), 1L).otherwise(0L))).head
          (conf, rst, Option(n.get(0)).fold(0L)(_.asInstanceOf[Long]))
        } else { // kBest
          val withId = preds.withColumn("__id", monotonically_increasing_id())
            .persist(StorageLevel.MEMORY_AND_DISK)
          deferredUnpersist += withId
          val nU = withId.count() // pins __id; also the pass's pool size
          val kNow = math.min(numberOfKBest.toLong, nU)
          // exact top-k acceptance WITHOUT a single-point funnel: the
          // histogram-refined cutoff (probMax > c, ties by smallest __id)
          // replaces orderBy.limit(k) + broadcast anti-join — no
          // TakeOrderedAndProject with data-dependent k, no k-row
          // broadcast; acceptance and remainder are complementary filters
          val pred = graft.plans.Selection
            .topKPredicate(withId, "probMax", "__id", kNow, nU)
          (withId.filter(pred), withId.filter(!pred), kNow)
        }

      val relabel = (d: DataFrame) => d
        .select(col(fCol), col(baseClassifier.getPredictionCol).as(lCol))

      if (nNew == 0) {
        // A deterministic base learner refit on an unchanged training set
        // yields the same model → no later pass can accept either. The
        // reference keeps refitting until maxIter (same final model, wasted
        // jobs); we stop and report iter as the reference would.
        preds.unpersist()
        iter = $(maxIter)
        converged = true
      } else {
        val prevLabeled = labeled
        val prevUnlabeled = unlabeled
        labeled = labeled.union(relabel(newLabeled))
          .persist(StorageLevel.MEMORY_AND_DISK)
        unlabeled = relabel(rest).persist(StorageLevel.MEMORY_AND_DISK)
        labeledCount += nNew
        unlabeledCount -= nNew
        model = baseClassifier.fit(labeled)
        if (unlabeledCount > 0) iter += 1
        // release the PREVIOUS iteration's handles (the reference unpersists
        // the freshly-built plans before refitting — SelfTraining.scala:167,
        // a subtle inefficiency SURVEY §4 flags; we release the old ones)
        prevLabeled.unpersist()
        prevUnlabeled.unpersist()
        preds.unpersist()
      }
    }
    labeled.unpersist()
    unlabeled.unpersist()
    deferredUnpersist.foreach(_.unpersist())
    df.unpersist()

    (model, SemiSupervisedSummary(labeledIni, unlabeledIni,
      labeledCount, unlabeledCount, iter))
  }

  override def transformSchema(schema: StructType): StructType = schema
  // NOT defaultCopy: that reflects for a (String) constructor, which a
  // meta-estimator carrying a base classifier doesn't have
  override def copy(extra: ParamMap): Estimator[M] =
    copyValues(new SelfTrainingClassifier[E, M](
      uid, baseClassifier.copy(ParamMap.empty)), extra)

  /** OneVsRest-style layout: own params at `path/metadata`, the (itself
    * MLWritable) base classifier under `path/baseClassifier`. A fitted
    * Pipeline containing this estimator can therefore be saved/loaded like
    * the reference's `DefaultParamsWritable` transformer
    * (ref: UnlabeledTransformer.scala:12). */
  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      MlPersistenceBridge.saveMetadata(
        SelfTrainingClassifier.this, path, sparkSession)
      baseClassifier.asInstanceOf[MLWritable].write
        .save(s"$path/baseClassifier")
    }
  }
}

object SelfTrainingClassifier extends MLReadable[SelfTrainingClassifier[_, _]] {
  // concrete stand-ins for the erased type arguments when loading (the
  // actual runtime class comes from the saved metadata, not these)
  private type E0 = org.apache.spark.ml.classification.DecisionTreeClassifier
  private type M0 = org.apache.spark.ml.classification.DecisionTreeClassificationModel

  override def read: MLReader[SelfTrainingClassifier[_, _]] =
    new MLReader[SelfTrainingClassifier[_, _]] {
      override def load(path: String): SelfTrainingClassifier[_, _] = {
        val cls = classOf[SelfTrainingClassifier[_, _]].getName
        val uid = MlPersistenceBridge.loadUid(path, sparkSession, cls)
        val base = MlPersistenceBridge.loadParamsInstance[
          ProbabilisticClassifier[Vector, E0, M0]](
          s"$path/baseClassifier", sparkSession)
        val st = new SelfTrainingClassifier[E0, M0](uid, base)
        MlPersistenceBridge.loadAndSetParams(st, path, sparkSession, cls)
        st
      }
    }
}
