package graft.operators

import org.apache.spark.ml.classification.DecisionTreeClassifier
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ml._
import graft.sources.Tables

/** Semi-supervised learning flows exposed as driver queries (rows-only —
  * model fits have no SQL oracle). Each emits one 15-column result row in
  * the reference's results schema, exercising the full chain:
  * embeddings → features vector → UnlabeledTransformer → estimator →
  * evaluators (SURVEY §2.11 M1-M4, M8-M10).
  */
object SemiSupervised {

  /** Binary classification frame from the embeddings table: features from
    * the 64-dim embedding, label = label mod 2 (the testdata's label column
    * is 10-class). */
  def dataset(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(
        array_to_vector(col("embedding")).as("features"),
        (col("label") % 2).cast("double").as("label"))

  private def base() = new DecisionTreeClassifier().setSeed(8L)

  /** Fused 2-job metric computation — see [[graft.ml.Evaluation
    * .evaluate4]] (moved there so the CV harness shares it; this forwarder
    * keeps the operator-side call sites and specs stable). */
  private[graft] def evaluate4(model: org.apache.spark.ml.Transformer,
      test: DataFrame): (Double, Double, Double, Double) =
    Evaluation.evaluate4(model, test)

  private def evalRow(spark: SparkSession, algo: String, criterion: String,
      pct: Double, thr: Double, model: org.apache.spark.ml.Transformer,
      s: SemiSupervisedSummary, test: DataFrame): DataFrame = {
    val (acc, auc, pr, f1) = evaluate4(model, test)
    Evaluation.resultsDF(spark, Seq(Evaluation.ExperimentResult(
      "embeddings", algo, criterion, pct, thr, s.iterations,
      s.labeledInitial, s.unlabeledInitial, s.labeledFinal, s.unlabeledFinal,
      s.percentageLabeledFinal, acc, auc, pr, f1)))
  }

  /** Seeded 75/25 train/test holdout (the reference's holdout shape —
    * BaseClassifiers.scala:100 splits with seed 8), so every emitted metric
    * is a GENERALIZATION number, not resubstitution accuracy on the
    * training frame. */
  private def holdout(df: DataFrame): (DataFrame, DataFrame) = {
    val Array(tr, te) = df.randomSplit(Array(0.75, 0.25), seed = 8L)
    (tr, te)
  }

  /** Self-training with threshold criterion (flagship flow, ref M1). */
  def qSelfTraining(spark: SparkSession, dir: String): DataFrame = {
    val (train, test) = holdout(dataset(spark, dir))
    val df = new UnlabeledTransformer()
      .setPercentageLabeled(0.3).setSeed(11L)
      .transform(train)
    val st = new SelfTrainingClassifier(base())
      .setThreshold(0.8).setMaxIter(3).setCriterion("threshold")
    val (model, s) = st.fitWithSummary(df)
    evalRow(spark, "ST-DT", "threshold", 0.3, 0.8, model, s, test)
  }

  /** Self-training with kBest criterion (ref M1 kBest branch). */
  def qSelfTrainingKBest(spark: SparkSession, dir: String): DataFrame = {
    val (train, test) = holdout(dataset(spark, dir))
    val df = new UnlabeledTransformer()
      .setPercentageLabeled(0.3).setSeed(11L)
      .transform(train)
    val st = new SelfTrainingClassifier(base())
      .setCriterion("kBest").setKBest(0.5).setMaxIter(3)
    val (model, s) = st.fitWithSummary(df)
    evalRow(spark, "ST-DT", "kBest", 0.3, 0.5, model, s, test)
  }

  /** Co-training with cross-teaching views (ref M2). */
  def qCoTraining(spark: SparkSession, dir: String): DataFrame = {
    val (train, test) = holdout(dataset(spark, dir))
    val df = new UnlabeledTransformer()
      .setPercentageLabeled(0.3).setSeed(11L)
      .transform(train)
    val ct = new CoTrainingClassifier(base())
      .setThreshold(0.8).setMaxIter(3).setCriterion("threshold")
    val (model, s) = ct.fitWithSummary(df)
    evalRow(spark, "CT-DT", "threshold", 0.3, 0.8, model, s, test)
  }

  /** Feature-split (Blum-Mitchell) co-training — the engine's beyond-parity
    * variant: views see feature halves of a shared pool. */
  def qCoTrainingFeatureSplit(spark: SparkSession, dir: String): DataFrame = {
    val (train, test) = holdout(dataset(spark, dir))
    val df = new UnlabeledTransformer()
      .setPercentageLabeled(0.3).setSeed(11L)
      .transform(train)
    val ct = new CoTrainingClassifier(base())
      .setFeatureSplit(true).setThreshold(0.8).setMaxIter(3)
    val (model, s) = ct.fitWithSummary(df)
    evalRow(spark, "CTFS-DT", "threshold", 0.3, 0.8, model, s, test)
  }

  /** The reference's full supervised base-classifier roster (M12): DT, RF,
    * NB, LR plus LinearSVC (supervised-only, ref:
    * notebooks/Supervised/BaseClassifiers.scala:334). One result row per
    * classifier, all fit on the same masked frame. Features are
    * abs(embedding): multinomial NaiveBayes requires non-negative inputs,
    * and a shared representation keeps the five rows comparable. */
  def qSupervisedRoster(spark: SparkSession, dir: String): DataFrame = {
    val data = Tables.load(spark, dir, "embeddings")
      .select(
        array_to_vector(transform(col("embedding"), x => abs(x))).as("features"),
        (col("label") % 2).cast("double").as("label"))
    val (train, test0) = holdout(data)
    // five models each score the test frame — materialize its randomSplit
    // lineage once instead of five sorted rescans of the corpus
    val test = test0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = new UnlabeledTransformer()
      .setPercentageLabeled(0.5).setSeed(11L).transform(train)
      .cache()
    val counts = df.agg(
      sum(when(isnan(col("labelSelection")), 0L).otherwise(1L)),
      sum(when(isnan(col("labelSelection")), 1L).otherwise(0L))).head
    val (lab, unl) = (counts.getLong(0), counts.getLong(1))
    // the five fits are independent jobs — schedule them concurrently so
    // the cluster isn't idle through each job's tapering final stages;
    // bounded to 4 in flight (r22 fan-out audit, guide §2.6)
    val rows = Par.mapBounded(Seq("DT", "RF", "NB", "LR", "SVM"), 4) { name =>
      val model = Experiments.fitSupervised(name, df)
      val (acc, auc, pr, f1) = evaluate4(model, test)
      Evaluation.ExperimentResult(
        "embeddings", s"supervised-$name", "na", 0.5, 0.0, 1,
        lab, unl, lab, unl, 0.5, acc, auc, pr, f1)
    }
    df.unpersist()
    test.unpersist()
    Evaluation.resultsDF(spark, rows)
  }

  /** The experiment GRID end-to-end (ref M7+M9+M11 composed — the flow
    * whose product is the reference's AllResults.csv): a multi-cell grid
    * through [[Experiments.runGrid]], each cell k-fold cross-validated,
    * emitting one 15-column result row per cell in grid order. The eleven
    * cells cover every runner branch (ST-threshold, ST-kBest,
    * CT-threshold, supervised) across the FULL roster — the
    * probabilistic four (DT, NB, RF, LR) plus supervised-only LSVC —
    * AND three datasets — the grid's first axis, like the
    * reference's 7-dataset AllResults.csv: "embeddings" (full 64-dim
    * abs(embedding)), "embeddings_front" (the front 32-dim slice, a
    * distinct derived frame), and "keel_csv" (a CSV-INGESTED Keel-style
    * dataset through loadKeelCsv + the featurization pipeline — the
    * reference's actual dataset format). Cells run as bounded concurrent job
    * streams; every value is seeded, so the frame is pinned exactly by
    * the oracle. Features are abs(embedding), the roster's shared
    * non-negative representation (multinomial NaiveBayes rejects
    * negative inputs). */
  /** Stage the deterministic Keel-style CSV fixture once per embeddings
    * fingerprint (crash-safe publishOnce; swept by Staging.gc like every
    * staged artifact); returns the staged directory. Bench prewarms this
    * directly — staging it through the whole grid query would run 22
    * untimed fits for a ~0.3 s CSV write. */
  def stageKeelCsv(spark: SparkSession, dir: String): String = {
    val src = new java.io.File(s"$dir/embeddings.parquet")
    val slug = graft.util.Staging.pathSlug(dir) + "_" +
      graft.util.Staging.fileFingerprint(src)
    val root = new java.io.File(
      s"${graft.util.Staging.stagingRoot}/graft_keel/$slug")
    graft.util.Staging.publishOnce(root, s"keel:${root.getName}") { staging =>
      Tables.load(spark, dir, "embeddings")
        .filter(col("vec_id") % 5 === 0)
        .orderBy(col("vec_id"))
        .select((1 to 6).map(i =>
          abs(element_at(col("embedding"), i)).cast("double").as(s"a$i")) :+
          concat(lit("c"), (col("label") % 2).cast("int")).as("clazz"): _*)
        .coalesce(1)
        .write.option("header", "true").mode("overwrite")
        .csv(staging.getPath)
    }
  }

  def qExperimentGrid(spark: SparkSession, dir: String): DataFrame = {
    def frame(dims: Option[Int]): DataFrame = {
      val emb = dims.fold(col("embedding"))(n => slice(col("embedding"), 1, n))
      Tables.load(spark, dir, "embeddings")
        .select(
          array_to_vector(transform(emb, x => abs(x))).as("features"),
          (col("label") % 2).cast("double").as("label"))
    }
    // third dataset-axis value: a CSV-INGESTED Keel-style frame, through
    // the real reader + featurization pipeline — the reference's grid is
    // CSV-dataset-driven (each AllResults.csv dataset is read
    // header+inferSchema, all-but-last assembled, last column
    // label-indexed; ref SemiSupervisedAndBaseClassifiers.scala:46-70), so
    // the gate exercises that whole chain, not just parquet frames. The
    // fixture is derived deterministically from the embeddings table
    // (every 5th vector, 6 abs dims, string class labels), written as ONE
    // sorted CSV file so the seeded fold/mask lineage downstream is
    // layout-invariant. The file is STAGED via publishOnce keyed on the
    // embeddings fingerprint — a real Keel dataset IS an on-disk source,
    // so regenerating the fixture per query run would bill scaffolding,
    // not ingestion, to the timed path; the ingestion chain itself
    // (CSV read → featurization fits) stays inside the query.
    def keelCsvFrame(): DataFrame = {
      // glob: the staged dir also holds the _BUILT marker and _SUCCESS,
      // which a bare directory read would list as (empty) csv inputs
      val (raw, featureCols, labelIn) = graft.sources.Ingestion
        .loadKeelCsv(spark, s"${stageKeelCsv(spark, dir)}/*.csv")
      graft.ml.Featurization.pipeline(featureCols.toSeq, Nil, labelIn)
        .fit(raw).transform(raw).select(col("features"), col("label"))
    }
    val datasets = Map(
      "embeddings" -> frame(None),
      "embeddings_front" -> frame(Some(32)),
      "keel_csv" -> keelCsvFrame())
    val cells = Experiments.grid("embeddings",
      classifiers = Seq("DT", "NB"), algos = Seq("ST", "supervised"),
      pcts = Seq(0.3), criterionValues = Map("threshold" -> Seq(0.8)),
      maxIter = 2) ++ Seq(
      // the runner branches the cross-product above misses: the
      // CoTraining grid path and the kBest criterion (r8 ran them only as
      // single-cell queries q41/q42 — this puts them through runCell)
      Experiments.Cell("embeddings", "DT", "CT", "threshold", 0.3, 0.8,
        maxIter = 2),
      Experiments.Cell("embeddings", "DT", "ST", "kBest", 0.3, 0.5,
        maxIter = 2),
      // RF and LR through the CV runner (r9 gate-checked them only as
      // supervised roster fits in q39), on the second dataset so the
      // grid's dataset axis is exercised end-to-end
      Experiments.Cell("embeddings_front", "RF", "ST", "threshold", 0.3, 0.8,
        maxIter = 2),
      Experiments.Cell("embeddings_front", "LR", "CT", "threshold", 0.3, 0.8,
        maxIter = 2),
      // LSVC is supervised-only by the same type bound as the reference
      // (no probability column → cannot drive self-labeling); this cell
      // puts the roster's fifth member through the CV runner too
      Experiments.Cell("embeddings_front", "LSVC", "supervised", "na", 0.3,
        0.0, maxIter = 2),
      // the CSV-ingested dataset through a self-labeling AND a supervised
      // cell — same pct as the rest so its masked slices join the shared
      // phase-1 materialization
      Experiments.Cell("keel_csv", "DT", "ST", "threshold", 0.3, 0.8,
        maxIter = 2),
      Experiments.Cell("keel_csv", "DT", "supervised", "na", 0.3, 0.0,
        maxIter = 2))
    // the shared-grid path: all cells use pct=0.3, so each (dataset, fold)
    // pair's featurized+masked frame is materialized ONCE and every cell
    // fits over it (bit-identical results to a sequential per-cell sweep —
    // the mask is a pure function of (frame, pct, seed); pinned by the
    // golden oracle). All eleven cells run as concurrent job streams over
    // the pre-materialized slices.
    Experiments.runGridShared(datasets, cells, k = 2, seed = 8L,
      parallelism = 11)
  }

  /** q141: ONE dataset through the reference's FULL cross-product grid —
    * the shape of its flagship artifact (AllResults.csv: every dataset ×
    * every classifier × every algorithm × every criterion × every label
    * fraction; ref FunctionsSemiSupervised.scala:188-257 loops exactly
    * this product, 2,288 rows over 7 datasets). Here: {ST, CT, supervised}
    * × {DT, RF, NB, LR} × {threshold 0.8, kBest 0.5} × labeled fractions
    * {0.1, 0.3} = 40 cells (supervised collapses across criteria), each
    * 2-fold cross-validated → one 15-column row per cell in grid order,
    * pinned end-to-end by the golden-value oracle.
    *
    * Runtime is bounded the same way the reference's runner ISN'T: all 40
    * cells share the per-(fold, pct) masked frames ([[Experiments
    * .runGridShared]] materializes 1 fold table + 4 masked slices ONCE —
    * the reference recomputes its randomSplit per cell) and run as
    * bounded concurrent job streams. The frame is a deterministic quarter
    * of the embeddings table (vec_id % 4 = 0) on the front 32 dims: the
    * grid's cost is fit-dominated (measured 38 s steady at sf0.1 on the
    * half/64-dim frame — it would double the whole bench) and the
    * cross-product itself, not data volume, is what this query gates.
    * Features abs()'d for multinomial NB. */
  /** q141's dataset frame, factored so the bench's per-classifier
    * tranche probes ([[qFullGridTranche]]) grid EXACTLY the frame the
    * monolithic query does. */
  private def fullGridFrame(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") % 4 === 0)
      .select(
        array_to_vector(transform(slice(col("embedding"), 1, 32),
          x => abs(x))).as("features"),
        (col("label") % 2).cast("double").as("label"))

  def qFullGrid(spark: SparkSession, dir: String): DataFrame = {
    val cells = Experiments.grid("embeddings_half",
      classifiers = Seq("DT", "RF", "NB", "LR"),
      algos = Seq("ST", "CT", "supervised"),
      pcts = Seq(0.1, 0.3),
      criterionValues = Map("threshold" -> Seq(0.8), "kBest" -> Seq(0.5)),
      // one self-labeling round: the gate here is the 40-cell cross-product
      // reaching every runner branch, not iteration depth (q40-q42 pin
      // multi-iteration convergence); each extra round is ~80 more fits
      maxIter = 1)
    Experiments.runGridShared(
      Map("embeddings_half" -> fullGridFrame(spark, dir)), cells,
      k = 2, seed = 8L, parallelism = 32)
  }

  /** ONE of q141's four per-classifier tranches (10 of the 40 cells:
    * {ST, CT, supervised} × criteria × label fractions for a single
    * base classifier), as its own separately-timed grid run — the
    * retime-pass adjudication probe for the monolithic q141, symmetric
    * with q177's dataset tranches ([[qGridDatasetsTranche]]): a
    * throttled window during a grid-class RETIME now lands in a named
    * tranche between two probes instead of somewhere inside a
    * monolithic sample (r19's unexplained 216 s / 122 s retime
    * excursions). Σ(tranches) upper-bounds the monolith's steady state
    * (the four classifiers no longer share one work queue or one
    * fold/mask staging pass). NOT a gate query — no oracle entry. */
  def qFullGridTranche(spark: SparkSession, dir: String,
      classifier: String): DataFrame = {
    val cells = Experiments.grid("embeddings_half",
      classifiers = Seq(classifier),
      algos = Seq("ST", "CT", "supervised"),
      pcts = Seq(0.1, 0.3),
      criterionValues = Map("threshold" -> Seq(0.8), "kBest" -> Seq(0.5)),
      maxIter = 1)
    Experiments.runGridShared(
      Map("embeddings_half" -> fullGridFrame(spark, dir)), cells,
      k = 2, seed = 8L, parallelism = 32)
  }

  /** q177: the reference's AllResults ARTIFACT SHAPE gated end-to-end —
    * the SAME cross-product grid replicated over ≥3 datasets through one
    * shared-grid run (ref FunctionsSemiSupervised.scala:188-257 iterates 7
    * Keel datasets × the full grid into one 2,288-row AllResults.csv).
    * q84 pins the dataset AXIS (heterogeneous cells across 3 datasets) and
    * q141 pins one dataset's FULL 40-cell product; this pins the
    * dataset × uniform-grid CROSS — every dataset through q141's exact
    * {DT,RF,NB,LR} × {ST,CT,supervised} × {threshold,kBest} × {10%,30%}
    * product, 40 cells × 3 datasets = 120 result rows, one runGridShared
    * invocation so all three datasets' fold/mask frames stage and their
    * fits interleave in the same concurrent job stream (the 100 TB
    * posture: the grid scheduler treats datasets as one work queue, not
    * three sequential runs).
    * Datasets: two DISJOINT strided embedding slices (stride-4 residues 0
    * and 1 — provably row-disjoint, so per-dataset metrics must differ)
    * plus the CSV-ingested Keel frame (q84's staged fixture, through the
    * real reader + featurization pipeline). */
  /** q177's dataset axis, by name — factored so the bench's tranche
    * probes ([[qGridDatasetsTranche]]) run EXACTLY the frames the
    * monolithic query grids over. */
  private def gridDatasetFrame(spark: SparkSession, dir: String,
      name: String): DataFrame = {
    // stride 4 (q141's frame size): the 120 cells are OVERHEAD-dominated
    // (240 fit+evaluate chains at ~0.2 s fixed cost each — measured:
    // shrinking rows 4× saved almost nothing and made 10%-labeled folds
    // single-class at sf0.01), so the honest cost of gating the
    // artifact's full shape is ~50 s steady, the price of 240 real fits
    def frame(offset: Int): DataFrame = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") % 4 === offset)
      .select(
        array_to_vector(transform(slice(col("embedding"), 1, 32),
          x => abs(x))).as("features"),
        (col("label") % 2).cast("double").as("label"))
    name match {
      case "emb_res0" => frame(0)
      case "emb_res1" => frame(1)
      case "keel_csv" =>
        val (raw, featureCols, labelIn) = graft.sources.Ingestion
          .loadKeelCsv(spark, s"${stageKeelCsv(spark, dir)}/*.csv")
        graft.ml.Featurization.pipeline(featureCols.toSeq, Nil, labelIn)
          .fit(raw).transform(raw).select(col("features"), col("label"))
      case other => throw new IllegalArgumentException(
        s"unknown grid dataset '$other'")
    }
  }

  def qGridDatasets(spark: SparkSession, dir: String): DataFrame = {
    val datasets = Map(
      "emb_res0" -> gridDatasetFrame(spark, dir, "emb_res0"),
      "emb_res1" -> gridDatasetFrame(spark, dir, "emb_res1"),
      "keel_csv" -> gridDatasetFrame(spark, dir, "keel_csv"))
    // q141's EXACT 40-cell cross-product, replicated per dataset: the
    // reference's AllResults artifact is full-roster × both label
    // fractions over EVERY dataset, and 3 × 40 = 120 cells is the
    // smallest grid that pins the multi-dataset artifact at that shape
    // (DT/NB-only drafts gated the runner but not the artifact)
    val cells = datasets.keys.toSeq.sorted.flatMap(n => Experiments.grid(n,
      classifiers = Seq("DT", "RF", "NB", "LR"),
      algos = Seq("ST", "CT", "supervised"),
      pcts = Seq(0.1, 0.3),
      criterionValues = Map("threshold" -> Seq(0.8), "kBest" -> Seq(0.5)),
      maxIter = 1))
    Experiments.runGridShared(datasets, cells, k = 2, seed = 8L,
      parallelism = 32)
  }

  /** ONE of q177's three 40-cell dataset tranches, as its own
    * separately-timed grid run — the bench's adjudication probe for the
    * monolithic q177 (r18: a 570 s driver-host first sample vs a 74 s
    * builder-host sample, same code, with no way to name WHICH portion
    * of the 120-cell run absorbed the pollution). Same frame, same
    * 40-cell product, same runner; the only difference from the
    * monolith is that the three datasets no longer interleave in one
    * work queue, so Σ(tranches) upper-bounds the monolith's steady
    * state. NOT a gate query — no oracle entry; the bench times it
    * between calib probes and stamps each tranche's own JVM/host
    * deltas. */
  def qGridDatasetsTranche(spark: SparkSession, dir: String,
      name: String): DataFrame = {
    val cells = Experiments.grid(name,
      classifiers = Seq("DT", "RF", "NB", "LR"),
      algos = Seq("ST", "CT", "supervised"),
      pcts = Seq(0.1, 0.3),
      criterionValues = Map("threshold" -> Seq(0.8), "kBest" -> Seq(0.5)),
      maxIter = 1)
    Experiments.runGridShared(
      Map(name -> gridDatasetFrame(spark, dir, name)), cells,
      k = 2, seed = 8L, parallelism = 32)
  }

  /** q199: GRID RESUME — the restartability the reference's real workload
    * demands: its full AllResults artifact is 2,288 grid rows (hours of
    * fits), and a lost driver without a per-cell manifest refits all of
    * them. The gate simulates the interruption inside one invocation: a
    * first [[Experiments.runGridResumable]] pass completes only the first
    * 3 of 6 cells (publishing each row to the manifest via
    * staging+atomic-rename), a torn staging dir is planted (a cell killed
    * mid-write), and the second pass must LOAD the 3 published rows
    * (was_resumed=true), ignore the torn entry, and fit only the missing
    * 3. Golden-pinned: resumed rows are bit-identical to fresh fits
    * because fits are seeded and fold/mask staging is a pure function of
    * (frame, seed) — the ST-DT cell's 15 metric columns here equal
    * q141's same cell, cross-checkable in the two VALUES blocks. */
  def qGridResume(spark: SparkSession, dir: String): DataFrame = {
    val manifest = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q199_" +
      java.util.UUID.randomUUID().toString
    new java.io.File(manifest).mkdirs()
    def frame(): DataFrame = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") % 4 === 0)
      .select(
        array_to_vector(transform(slice(col("embedding"), 1, 32),
          x => abs(x))).as("features"),
        (col("label") % 2).cast("double").as("label"))
    val cells = Experiments.grid("emb_res0",
      classifiers = Seq("DT", "NB"),
      algos = Seq("ST", "CT", "supervised"),
      pcts = Seq(0.3),
      criterionValues = Map("threshold" -> Seq(0.8)),
      maxIter = 1)
    val datasets = Map("emb_res0" -> frame())
    // the "interrupted" first run: 3 of 6 cells publish their rows
    Experiments.runGridResumable(datasets, cells.take(3), k = 2, seed = 8L,
      parallelism = 8, manifest).count()
    // a cell killed mid-publish leaves a staging dir with no rename —
    // the resume must ignore it, not read a torn row
    new java.io.File(manifest, ".staging_torn").mkdirs()
    val out = Experiments.runGridResumable(datasets, cells, k = 2,
      seed = 8L, parallelism = 8, manifest).localCheckpoint()
    graft.util.Fs.deleteRecursively(manifest)
    out
  }

  /** Supervised baseline through k-fold CV (ref M3 + M10). */
  def qSupervisedCv(spark: SparkSession, dir: String): DataFrame = {
    val df = new UnlabeledTransformer()
      .setPercentageLabeled(0.5).setSeed(11L)
      .transform(dataset(spark, dir))
    val m = Evaluation.crossValidate(df, k = 2, seed = 8L, train => {
      val sup = new SupervisedOnLabeled(base())
      (sup.fit(train), None)
    })
    Evaluation.resultsDF(spark, Seq(Evaluation.ExperimentResult(
      "embeddings", "supervised-DT", "na", 0.5, 0.0, 1,
      m.labeledInitial, m.unlabeledInitial, m.labeledFinal, m.unlabeledFinal,
      0.5, m.accuracy, m.auc, m.pr, m.f1)))
  }
}
