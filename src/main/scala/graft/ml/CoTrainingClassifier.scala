package graft.ml

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.classification.{ProbabilisticClassificationModel, ProbabilisticClassifier}
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.ml.graftbridge.MlPersistenceBridge
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.ml.param.{LongParam, ParamMap}
import org.apache.spark.ml.util.{Identifiable, MLReadable, MLReader, MLWritable, MLWriter}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** Co-Training (Blum & Mitchell 1998, the reference's single-classifier
  * two-view variant): labeled and unlabeled data are each split 50/50 into
  * two views (ref: CoTraining.scala:137-142, seed 8); each view's model
  * teaches the OTHER view its confident self-labels (cross-teaching, ref
  * :172-173); the final model is fit on the union of both views' labeled
  * sets (ref :251).
  *
  * Departures (documented behavioral deltas):
  *  - the reference's kBest branch shadows its unlabeled-view vars with loop
  *    locals (ref :207,:214), so refits keep predicting the ORIGINAL
  *    unlabeled views and the loop counters go stale — a latent bug SURVEY
  *    §7 flags. Here the frontier is updated properly in both criteria.
  *  - same scale fixes as [[SelfTrainingClassifier]]: isnan partition pair
  *    instead of exceptAll, fused count jobs, exact order-statistic cutoff
  *    for kBest acceptance ([[graft.plans.Selection]]), early exit when
  *    neither view accepts anything.
  */
class CoTrainingClassifier[
    E <: ProbabilisticClassifier[Vector, E, M],
    M <: ProbabilisticClassificationModel[Vector, M]](
    override val uid: String,
    val baseClassifier: ProbabilisticClassifier[Vector, E, M])
  extends Estimator[M] with SelfLabelingParams with MLWritable {

  def this(baseClassifier: ProbabilisticClassifier[Vector, E, M]) =
    this(Identifiable.randomUID("coTraining"), baseClassifier)

  final val viewSeed: LongParam = new LongParam(this, "viewSeed",
    "seed for the 50/50 view splits")

  /** false (default): the reference's row-split views (50/50 random rows).
    * true: Blum & Mitchell's original formulation — the FEATURE vector is
    * split in half; both views see all labeled rows but only their feature
    * slice, teach each other from a shared unlabeled pool, and the final
    * model is fit on full features over everything labeled by either view. */
  final val featureSplit: org.apache.spark.ml.param.BooleanParam =
    new org.apache.spark.ml.param.BooleanParam(this, "featureSplit",
      "split features (Blum-Mitchell) instead of rows")

  setDefault(maxIter -> 3, viewSeed -> 8L, featureSplit -> false)

  def setThreshold(v: Double): this.type = set(threshold, v)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  def setCriterion(v: String): this.type = set(criterion, v)
  def setKBest(v: Double): this.type = set(kBest, v)
  def setUnlabeledCol(v: String): this.type = set(unlabeledCol, v)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
  def setLabelCol(v: String): this.type = set(labelCol, v)
  def setViewSeed(v: Long): this.type = set(viewSeed, v)
  def setFeatureSplit(v: Boolean): this.type = set(featureSplit, v)

  @volatile private var lastSummary: Option[SemiSupervisedSummary] = None
  def summary: Option[SemiSupervisedSummary] = lastSummary

  override def fit(dataset: Dataset[_]): M = {
    val (model, s) = fitWithSummary(dataset)
    lastSummary = Some(s)
    model
  }

  def fitWithSummary(dataset: Dataset[_]): (M, SemiSupervisedSummary) =
    if ($(featureSplit)) fitFeatureSplit(dataset)
    else fitRowSplit(dataset)

  private def fitRowSplit(dataset: Dataset[_]): (M, SemiSupervisedSummary) = {
    val fCol = $(featuresCol); val lCol = $(labelCol)
    // one materialization of the narrow input — the initial-count aggregate
    // and all four view caches fork from here (see SelfTrainingClassifier).
    // FitNonce: private cache entries per fit (see FitNonce's scaladoc)
    val df = dataset.toDF.select(col(fCol), col(lCol), col($(unlabeledCol)),
        FitNonce.column())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (labeled0, unlabeled0) = Sentinels.splitByMask(df, $(unlabeledCol))

    val ini = df.agg(
      sum(when(Sentinels.isLabeled(col($(unlabeledCol))), 1L).otherwise(0L)),
      sum(when(Sentinels.isUnlabeled(col($(unlabeledCol))), 1L).otherwise(0L)))
      .head
    val labeledIni = Option(ini.get(0)).fold(0L)(_.asInstanceOf[Long])
    val unlabeledIni = Option(ini.get(1)).fold(0L)(_.asInstanceOf[Long])

    val sel = (d: DataFrame) => d.select(col(fCol), col(lCol))
    val Array(l1a, l2a) = labeled0.randomSplit(Array(0.5, 0.5), $(viewSeed))
    val Array(u1a, u2a) = unlabeled0.randomSplit(Array(0.5, 0.5), $(viewSeed))

    val persist = (d: DataFrame) => d.persist(StorageLevel.MEMORY_AND_DISK)
    var labeled1 = persist(sel(l1a)); var labeled2 = persist(sel(l2a))
    var unlabeled1 = persist(sel(u1a)); var unlabeled2 = persist(sel(u2a))

    // four initial view counts in ONE tagged-union job instead of four
    // count() actions (the job also populates all four view caches)
    val viewCounts = labeled1.select(lit(0).as("__v"))
      .union(labeled2.select(lit(1).as("__v")))
      .union(unlabeled1.select(lit(2).as("__v")))
      .union(unlabeled2.select(lit(3).as("__v")))
      .groupBy(col("__v")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var lCount1 = viewCounts.getOrElse(0, 0L)
    var lCount2 = viewCounts.getOrElse(1, 0L)
    var uCount1 = viewCounts.getOrElse(2, 0L)
    var uCount2 = viewCounts.getOrElse(3, 0L)

    // r22 (guide §1.2 "don't compute things you throw away"): the view
    // models exist ONLY to drive the self-labeling loop — the returned
    // model is fit on the views' labeled union below regardless, and the
    // summary reads the count variables, not the models. When the loop
    // provably cannot run (maxIter <= 1, or an empty unlabeled view —
    // the loop's own guard), fitting them is dead compute: 2 of this
    // fit's 3 base fits at q141/q177's maxIter = 1. When it can run,
    // the two view fits are independent — concurrent jobs (the second
    // on a param-copy so no estimator instance is shared across
    // threads); deterministic per view regardless of scheduling.
    val loopCanRun = 1 < $(maxIter) && uCount1 > 0 && uCount2 > 0
    var (model1, model2): (M, M) =
      if (loopCanRun) Par.both(
        baseClassifier.fit(labeled1),
        baseClassifier.copy(ParamMap.empty).fit(labeled2))
      else (null.asInstanceOf[M], null.asInstanceOf[M])
    var iter = 1

    // custom codegen'd expression instead of the reference's UDF barrier
    // (graft.functions.VectorMax; built-in equivalent:
    // array_max(vector_to_array(col)))
    graft.functions.VectorMax.register(df.sparkSession)
    // NaN confidence → 0.0 ("not confident"), see SelfTrainingClassifier
    val probMax = nanvl(
      expr(s"vector_max(`${baseClassifier.getProbabilityCol}`)"), lit(0.0))
    val relabel = (d: DataFrame) => d
      .select(col(fCol), col(baseClassifier.getPredictionCol).as(lCol))
    // k frozen before the loop from the TOTAL initial unlabeled count
    // (ref: CoTraining.scala:199 uses countDataUnLabeled, the full set)
    val numberOfKBest = (($(kBest) * unlabeledIni) / ($(maxIter) - 1).max(1))
      .round.toInt

    // kBest intermediates released together at the end of the fit (their
    // lazy consumers are still in flight during the loop)
    val deferredUnpersist = scala.collection.mutable.ListBuffer.empty[DataFrame]

    /** One view's acceptance pass → (newly-labeled, rest, nNew). */
    def accept(preds: DataFrame): (DataFrame, DataFrame, Long) =
      if ($(criterion) == "threshold") {
        val conf = preds.filter(col("probMax") > $(threshold))
        val rst = preds.filter(col("probMax") <= $(threshold))
        val n = preds.agg(
          sum(when(col("probMax") > $(threshold), 1L).otherwise(0L))).head
        (conf, rst, Option(n.get(0)).fold(0L)(_.asInstanceOf[Long]))
      } else {
        val withId = preds.withColumn("__id", monotonically_increasing_id())
          .persist(StorageLevel.MEMORY_AND_DISK)
        // the two views' accepts run concurrently — guard the shared buffer
        deferredUnpersist.synchronized { deferredUnpersist += withId }
        val nU = withId.count() // pins __id; also the pass's pool size
        val kNow = math.min(numberOfKBest.toLong, nU)
        // exact top-k via distributed order-statistic cutoff — see
        // SelfTrainingClassifier's kBest branch for the scale rationale
        val pred = graft.plans.Selection
          .topKPredicate(withId, "probMax", "__id", kNow, nU)
        (withId.filter(pred), withId.filter(!pred), kNow)
      }

    var converged = false
    while (iter < $(maxIter) && uCount1 > 0 && uCount2 > 0 && !converged) {
      val preds1 = persist(model1.transform(unlabeled1).withColumn("probMax", probMax))
      val preds2 = persist(model2.transform(unlabeled2).withColumn("probMax", probMax))

      val ((new1, rest1, n1), (new2, rest2, n2)) =
        Par.both(accept(preds1), accept(preds2))

      if (n1 == 0 && n2 == 0) {
        preds1.unpersist(); preds2.unpersist()
        iter = $(maxIter)
        converged = true
      } else {
        val prev = Seq(labeled1, labeled2, unlabeled1, unlabeled2)
        // cross-teaching: view 1 learns view 2's confident labels & v.v.
        // (ref: CoTraining.scala:172-173)
        labeled1 = persist(labeled1.union(relabel(new2)))
        labeled2 = persist(labeled2.union(relabel(new1)))
        unlabeled1 = persist(relabel(rest1))
        unlabeled2 = persist(relabel(rest2))
        lCount1 += n2; lCount2 += n1
        uCount1 -= n1; uCount2 -= n2
        if (uCount1 > 0 && uCount2 > 0) {
          val (m1, m2) = Par.both(
            baseClassifier.fit(labeled1),
            baseClassifier.copy(ParamMap.empty).fit(labeled2))
          model1 = m1; model2 = m2
          iter += 1
        }
        prev.foreach(_.unpersist())
        preds1.unpersist(); preds2.unpersist()
      }
    }

    // final model on both views' labeled union (ref: CoTraining.scala:251)
    val both = persist(labeled1.union(labeled2))
    val finalModel = baseClassifier.fit(both)
    both.unpersist()
    Seq(labeled1, labeled2, unlabeled1, unlabeled2).foreach(_.unpersist())
    deferredUnpersist.foreach(_.unpersist())
    df.unpersist()

    (finalModel, SemiSupervisedSummary(labeledIni, unlabeledIni,
      lCount1 + lCount2, uCount1 + uCount2, iter))
  }

  /** Blum-Mitchell feature-split co-training. Views see feature halves:
    * view i trains on (slice_i(features), label) over ALL labeled rows and
    * predicts the shared unlabeled pool; rows a view accepts get its
    * predicted label, are removed from the pool, and teach the OTHER view.
    * The returned model is fit on FULL features over labeled ∪ accepted
    * (view-1 label wins if both views accept the same row in one pass).
    */
  private def fitFeatureSplit(dataset: Dataset[_]): (M, SemiSupervisedSummary) = {
    import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
    val fCol = $(featuresCol); val lCol = $(labelCol)
    // one materialization of the narrow input — the dim probe, three labeled
    // slices and the pool all fork from here (see SelfTrainingClassifier).
    // FitNonce: private cache entries per fit (see FitNonce's scaladoc)
    val df = dataset.toDF.select(col(fCol), col(lCol), col($(unlabeledCol)),
        FitNonce.column())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (labeled0, unlabeled0) = Sentinels.splitByMask(df, $(unlabeledCol))

    val dim = labeled0.select(col(fCol)).head
      .getAs[org.apache.spark.ml.linalg.Vector](0).size
    require(dim >= 2, s"featureSplit needs >=2 features, got $dim")
    val half = dim / 2
    val asArr = vector_to_array(col(fCol))
    val f1 = array_to_vector(slice(asArr, 1, half))
    val f2 = array_to_vector(slice(asArr, half + 1, dim - half))

    val persist = (d: DataFrame) => d.persist(StorageLevel.MEMORY_AND_DISK)
    // full-featured labeled set (also the final model's training base)
    var labeledFull = persist(labeled0.select(col(fCol), col(lCol)))
    var labeled1 = persist(labeled0.select(f1.as(fCol), col(lCol)))
    var labeled2 = persist(labeled0.select(f2.as(fCol), col(lCol)))
    // shared pool with a stable row id and both slices
    var pool = persist(unlabeled0
      .select(monotonically_increasing_id().as("__pid"),
        col(fCol), f1.as("__f1"), f2.as("__f2")))

    val labeledIni = labeledFull.count()
    // one count does double duty: the initial tally AND the pool
    // materialization that pins __pid across uses
    val unlabeledIni = pool.count()
    var labeledCount = labeledIni
    var poolCount = unlabeledIni

    // dead-fit guard + concurrent view fits — see fitRowSplit's note
    val loopCanRun = 1 < $(maxIter) && poolCount > 0
    var (model1, model2): (M, M) =
      if (loopCanRun) Par.both(
        baseClassifier.fit(labeled1),
        baseClassifier.copy(ParamMap.empty).fit(labeled2))
      else (null.asInstanceOf[M], null.asInstanceOf[M])
    var iter = 1

    graft.functions.VectorMax.register(df.sparkSession)
    // NaN confidence → 0.0 ("not confident"), see SelfTrainingClassifier
    val probMax = nanvl(
      expr(s"vector_max(`${baseClassifier.getProbabilityCol}`)"), lit(0.0))
    val predCol = baseClassifier.getPredictionCol
    val numberOfKBest = (($(kBest) * unlabeledIni) / ($(maxIter) - 1).max(1))
      .round.toInt

    // kBest intermediates stay cached while their lazy consumers are in
    // flight; released together at the end of the fit
    val deferredUnpersist = scala.collection.mutable.ListBuffer.empty[DataFrame]

    /** View pass: predict the pool on this view's slice, accept per
      * criterion → (pid, predictedLabel) rows. */
    def accept(model: M, sliceCol: String): DataFrame = {
      val preds = model.transform(
          pool.select(col("__pid"), col(sliceCol).as(fCol)))
        .withColumn("probMax", probMax)
      if ($(criterion) == "threshold")
        preds.filter(col("probMax") > $(threshold))
          .select(col("__pid"), col(predCol))
      else {
        val cached = preds.persist(StorageLevel.MEMORY_AND_DISK)
        // the two views' accepts run concurrently — guard the shared buffer
        deferredUnpersist.synchronized { deferredUnpersist += cached }
        val nPool = cached.count()
        // exact top-k via distributed order-statistic cutoff (__pid is
        // unique and pinned by the pool materialization) — no
        // TakeOrderedAndProject with data-dependent k
        val pred = graft.plans.Selection.topKPredicate(
          cached, "probMax", "__pid", math.min(numberOfKBest.toLong, nPool), nPool)
        cached.filter(pred).select(col("__pid"), col(predCol))
      }
    }

    var converged = false
    while (iter < $(maxIter) && poolCount > 0 && !converged) {
      val (a1, a2) = Par.both(accept(model1, "__f1"), accept(model2, "__f2"))
      val acc1 = persist(a1)
      val acc2 = persist(a2)
      // distinct accepted ids; view-1 wins duplicate rows for the full set
      val acceptedIds = persist(
        acc1.select("__pid").union(acc2.select("__pid")).distinct())
      val nAccepted = acceptedIds.count()

      if (nAccepted == 0) {
        Seq(acc1, acc2, acceptedIds).foreach(_.unpersist())
        iter = $(maxIter)
        converged = true
      } else {
        val prev = Seq(labeledFull, labeled1, labeled2, pool)
        // cross-teach: view 2 learns rows view 1 accepted, and vice versa
        labeled2 = persist(labeled2.union(
          acc1.join(pool, "__pid").select(col("__f2").as(fCol),
            col(predCol).as(lCol))))
        labeled1 = persist(labeled1.union(
          acc2.join(pool, "__pid").select(col("__f1").as(fCol),
            col(predCol).as(lCol))))
        // full set: view-1's label where both accepted (left-anti the overlap)
        val onlyAcc2 = acc2.join(acc1.select("__pid"), Seq("__pid"), "left_anti")
        labeledFull = persist(labeledFull
          .union(acc1.join(pool, "__pid").select(col(fCol), col(predCol).as(lCol)))
          .union(onlyAcc2.join(pool, "__pid").select(col(fCol), col(predCol).as(lCol))))
        pool = persist(pool.join(broadcast(acceptedIds), Seq("__pid"), "left_anti"))
        labeledCount += nAccepted
        poolCount -= nAccepted
        if (poolCount > 0) {
          val (m1, m2) = Par.both(
            baseClassifier.fit(labeled1),
            baseClassifier.copy(ParamMap.empty).fit(labeled2))
          model1 = m1; model2 = m2
          iter += 1
        }
        prev.foreach(_.unpersist())
        Seq(acc1, acc2, acceptedIds).foreach(_.unpersist())
      }
    }

    val finalModel = baseClassifier.fit(labeledFull)
    Seq(labeledFull, labeled1, labeled2, pool).foreach(_.unpersist())
    deferredUnpersist.foreach(_.unpersist())
    df.unpersist()
    (finalModel, SemiSupervisedSummary(labeledIni, unlabeledIni,
      labeledCount, poolCount, iter))
  }

  override def transformSchema(schema: StructType): StructType = schema
  // NOT defaultCopy: that reflects for a (String) constructor, which a
  // meta-estimator carrying a base classifier doesn't have
  override def copy(extra: ParamMap): Estimator[M] =
    copyValues(new CoTrainingClassifier[E, M](
      uid, baseClassifier.copy(ParamMap.empty)), extra)

  /** Same persistence layout as [[SelfTrainingClassifier.write]]. */
  override def write: MLWriter = new MLWriter {
    override protected def saveImpl(path: String): Unit = {
      MlPersistenceBridge.saveMetadata(
        CoTrainingClassifier.this, path, sparkSession)
      baseClassifier.asInstanceOf[MLWritable].write
        .save(s"$path/baseClassifier")
    }
  }
}

object CoTrainingClassifier extends MLReadable[CoTrainingClassifier[_, _]] {
  // concrete stand-ins for the erased type arguments when loading (the
  // actual runtime class comes from the saved metadata, not these)
  private type E0 = org.apache.spark.ml.classification.DecisionTreeClassifier
  private type M0 = org.apache.spark.ml.classification.DecisionTreeClassificationModel

  override def read: MLReader[CoTrainingClassifier[_, _]] =
    new MLReader[CoTrainingClassifier[_, _]] {
      override def load(path: String): CoTrainingClassifier[_, _] = {
        val cls = classOf[CoTrainingClassifier[_, _]].getName
        val uid = MlPersistenceBridge.loadUid(path, sparkSession, cls)
        val base = MlPersistenceBridge.loadParamsInstance[
          ProbabilisticClassifier[Vector, E0, M0]](
          s"$path/baseClassifier", sparkSession)
        val ct = new CoTrainingClassifier[E0, M0](uid, base)
        MlPersistenceBridge.loadAndSetParams(ct, path, sparkSession, cls)
        ct
      }
    }
}
