package graft

import org.apache.spark.ml.classification.DecisionTreeClassifier
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml._

/** Algorithm-level tests on a deterministic, linearly separable dataset
  * (SURVEY §5 test plan — the reference ships no tests at all). */
class MlSpec extends AnyFunSuite {
  import TestSpark._

  /** Two well-separated blobs: class 0 around (0,0), class 1 around (10,10).
    * Seeded → identical across runs. */
  private lazy val separable: DataFrame = {
    val rnd = new scala.util.Random(42)
    val rows = (0 until 400).map { i =>
      val label = (i % 2).toDouble
      val cx = label * 10.0
      (Vectors.dense(cx + rnd.nextGaussian(), cx + rnd.nextGaussian()), label)
    }
    import spark.implicits._
    rows.toDF("features", "label")
  }

  private def masked(pct: Double): DataFrame =
    new UnlabeledTransformer().setPercentageLabeled(pct).setSeed(11L)
      .transform(separable)

  private def base = new DecisionTreeClassifier().setSeed(8L)

  test("UnlabeledTransformer partitions exactly: labeled + unlabeled = total, NaN is the sentinel") {
    val out = masked(0.25)
    val total = out.count()
    val unlabeled = out.filter(isnan(col("labelSelection"))).count()
    val labeled = out.filter(!isnan(col("labelSelection"))).count()
    assert(total === separable.count())
    assert(labeled + unlabeled === total)
    // seeded split should be within a loose band of the requested fraction
    assert(labeled.toDouble / total > 0.15 && labeled.toDouble / total < 0.35)
    // labeled rows carry the original label in the mask column
    assert(out.filter(!isnan(col("labelSelection")) &&
      col("labelSelection") =!= col("label")).count() === 0)
  }

  test("SelfTraining labels everything on separable data at t=0.5 within 2 iterations") {
    val st = new SelfTrainingClassifier(base)
      .setThreshold(0.5).setMaxIter(7)
    val (_, s) = st.fitWithSummary(masked(0.3))
    assert(s.unlabeledFinal === 0,
      s"expected full self-labeling, got $s")
    assert(s.iterations <= 2)
    assert(s.labeledFinal === s.labeledInitial + s.unlabeledInitial)
  }

  test("SelfTraining counts are conserved and monotone") {
    val st = new SelfTrainingClassifier(base)
      .setThreshold(0.95).setMaxIter(3)
    val (_, s) = st.fitWithSummary(masked(0.3))
    assert(s.labeledInitial + s.unlabeledInitial === 400L)
    assert(s.labeledFinal >= s.labeledInitial)
    assert(s.unlabeledFinal <= s.unlabeledInitial)
    assert(s.labeledFinal + s.unlabeledFinal === 400L)
  }

  test("SelfTraining kBest accepts exactly round(kBest·U0/(maxIter-1)) per pass") {
    val df = masked(0.3)
    val u0 = df.filter(isnan(col("labelSelection"))).count()
    val st = new SelfTrainingClassifier(base)
      .setCriterion("kBest").setKBest(0.4).setMaxIter(3)
    val (_, s) = st.fitWithSummary(df)
    val k = ((0.4 * u0) / 2).round
    // two passes of exactly k (second pass may be truncated by remaining rows)
    assert(s.labeledFinal === s.labeledInitial + math.min(2 * k, u0))
  }

  test("SelfTraining summary model predicts the held-out blob correctly") {
    val st = new SelfTrainingClassifier(base).setThreshold(0.5).setMaxIter(5)
    val model = st.fit(masked(0.3))
    val preds = model.transform(separable)
    val acc = preds.filter(col("prediction") === col("label")).count().toDouble / 400
    assert(acc > 0.95, s"accuracy $acc")
  }

  test("CoTraining cross-teaches and fits a final model on both views") {
    val ct = new CoTrainingClassifier(base)
      .setThreshold(0.5).setMaxIter(3)
    val (model, s) = ct.fitWithSummary(masked(0.3))
    assert(s.labeledInitial + s.unlabeledInitial === 400L)
    assert(s.labeledFinal >= s.labeledInitial)
    val acc = model.transform(separable)
      .filter(col("prediction") === col("label")).count().toDouble / 400
    assert(acc > 0.9, s"accuracy $acc")
  }

  test("SupervisedOnLabeled ignores unlabeled rows") {
    val df = masked(0.3)
    val sup = new SupervisedOnLabeled(base)
    val model = sup.fit(df)
    val acc = model.transform(separable)
      .filter(col("prediction") === col("label")).count().toDouble / 400
    assert(acc > 0.9, s"accuracy $acc")
  }

  test("crossValidate produces sane averaged metrics on separable data") {
    val m = Evaluation.crossValidate(masked(0.5), k = 3, seed = 8L, train => {
      (new SupervisedOnLabeled(base).fit(train), None)
    })
    assert(m.accuracy > 0.9, s"cv accuracy ${m.accuracy}")
    assert(m.auc > 0.9 && m.pr > 0.9 && m.f1 > 0.9)
  }

  test("UnlabeledTransformer save/load round-trips params (DefaultParamsWritable)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ut_persist")
      .resolve("ut").toString
    val ut = new UnlabeledTransformer()
      .setPercentageLabeled(0.42).setSeed(99L).setOutputCol("mask")
    ut.write.overwrite().save(dir)
    val loaded = UnlabeledTransformer.load(dir)
    assert(loaded.getOrDefault(loaded.percentageLabeled) === 0.42)
    assert(loaded.getOrDefault(loaded.seed) === 99L)
    assert(loaded.getOrDefault(loaded.outputCol) === "mask")
    // loaded instance produces the identical split (same seed)
    val a = ut.transform(separable).filter(isnan(col("mask"))).count()
    val b = loaded.transform(separable).filter(isnan(col("mask"))).count()
    assert(a === b)
  }

  test("SelfTrainingClassifier save/load round-trips params and base classifier") {
    val dir = java.nio.file.Files.createTempDirectory("graft_st_persist")
      .resolve("st").toString
    val st = new SelfTrainingClassifier(
      new org.apache.spark.ml.classification.DecisionTreeClassifier()
        .setSeed(8L).setMaxDepth(3))
      .setThreshold(0.85).setMaxIter(4).setCriterion("kBest").setKBest(0.25)
    st.write.save(dir)
    val loaded = SelfTrainingClassifier.load(dir)
    assert(loaded.uid === st.uid)
    assert(loaded.getOrDefault(loaded.threshold) === 0.85)
    assert(loaded.getOrDefault(loaded.maxIter) === 4)
    assert(loaded.getOrDefault(loaded.criterion) === "kBest")
    assert(loaded.getOrDefault(loaded.kBest) === 0.25)
    val lb = loaded.baseClassifier
      .asInstanceOf[org.apache.spark.ml.classification.DecisionTreeClassifier]
    assert(lb.getSeed === 8L && lb.getMaxDepth === 3)
    // the loaded estimator fits end-to-end and converges like the original
    val (_, s) = loaded.fitWithSummary(masked(0.3))
    assert(s.labeledFinal > s.labeledInitial)
    graft.util.Fs.deleteRecursively(
      new java.io.File(dir).getParentFile)
  }

  test("CoTrainingClassifier save/load round-trips params and base classifier") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ct_persist")
      .resolve("ct").toString
    val ct = new CoTrainingClassifier(
      new org.apache.spark.ml.classification.DecisionTreeClassifier().setSeed(8L))
      .setThreshold(0.75).setMaxIter(2).setViewSeed(17L).setFeatureSplit(true)
    ct.write.save(dir)
    val loaded = CoTrainingClassifier.load(dir)
    assert(loaded.uid === ct.uid)
    assert(loaded.getOrDefault(loaded.threshold) === 0.75)
    assert(loaded.getOrDefault(loaded.maxIter) === 2)
    assert(loaded.getOrDefault(loaded.viewSeed) === 17L)
    assert(loaded.getOrDefault(loaded.featureSplit) === true)
    val (_, s) = loaded.fitWithSummary(masked(0.3))
    assert(s.labeledFinal >= s.labeledInitial)
    graft.util.Fs.deleteRecursively(
      new java.io.File(dir).getParentFile)
  }

  test("ProbabilisticSelfTraining facade nests inside OneVsRest") {
    import spark.implicits._
    // 3-class separable blobs; OneVsRest drops the mask column by design →
    // each binary fit degenerates to one supervised base fit
    val data = (0 until 300).map { i =>
      val c = i % 3
      (org.apache.spark.ml.linalg.Vectors.dense(
        c * 10.0 + (i % 7) * 0.1, c * -5.0 + (i % 5) * 0.1), c.toDouble)
    }.toDF("features", "label")
    val ovr = new org.apache.spark.ml.classification.OneVsRest()
      .setClassifier(new ProbabilisticSelfTraining(base))
    val model = ovr.fit(data)
    val acc = model.transform(data)
      .filter(col("prediction") === col("label")).count().toDouble / 300
    assert(acc > 0.95, s"OneVsRest(facade) accuracy $acc")
  }

  test("ProbabilisticSelfTraining runs the self-training loop when the mask is present") {
    val model = new ProbabilisticSelfTraining(base)
      .setThreshold(0.8).setMaxIter(3)
      .fit(masked(0.3))
    val scored = model.transform(separable)
    // full probabilistic surface: prediction + rawPrediction + probability
    assert(Seq("prediction", "rawPrediction", "probability")
      .forall(scored.columns.contains))
    val acc = scored.filter(col("prediction") === col("label"))
      .count().toDouble / 400
    assert(acc > 0.9, s"facade self-training accuracy $acc")
    assert(model.numClasses === 2)
  }

  test("evaluate4 fused metrics equal the four separate evaluator passes") {
    import org.apache.spark.ml.evaluation._
    val df = masked(0.6)
    val model = new SupervisedOnLabeled(base).fit(df)
    val (acc, auc, pr, f1) = graft.operators.SemiSupervised.evaluate4(model, df)
    val predictions = model.transform(df).cache()
    val accE = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy").evaluate(predictions)
    val f1E = new MulticlassClassificationEvaluator()
      .setMetricName("fMeasureByLabel").setMetricLabel(1.0).evaluate(predictions)
    val aucE = new BinaryClassificationEvaluator()
      .setMetricName("areaUnderROC").evaluate(predictions)
    val prE = new BinaryClassificationEvaluator()
      .setMetricName("areaUnderPR").evaluate(predictions)
    predictions.unpersist()
    assert(math.abs(acc - accE) < 1e-12, s"accuracy $acc vs evaluator $accE")
    assert(math.abs(f1 - f1E) < 1e-12, s"f1 $f1 vs evaluator $f1E")
    assert(math.abs(auc - aucE) < 1e-12, s"auc $auc vs evaluator $aucE")
    assert(math.abs(pr - prE) < 1e-12, s"pr $pr vs evaluator $prE")
  }

  test("binaryAucPrLocal equals BinaryClassificationMetrics across random/degenerate folds") {
    // the driver-exact AUC/PR finish must replay BCM's no-downsampling
    // math point for point: randomized folds (score ties, skewed classes)
    // plus the degenerate shapes (single row, all-positive, all-negative,
    // one constant score) — each compared against the real mllib BCM on
    // the same pairs
    val rnd = new scala.util.Random(77)
    val cases: Seq[Seq[(Double, Double)]] =
      (0 until 20).map { _ =>
        val n = 1 + rnd.nextInt(200)
        // coarse score quantization → plenty of exact ties
        Seq.fill(n)((math.floor(rnd.nextDouble() * 17) / 17.0,
          if (rnd.nextBoolean()) 1.0 else 0.0))
      } ++ Seq(
        Seq((0.7, 1.0)),                              // single row
        Seq((0.2, 1.0), (0.9, 1.0), (0.5, 1.0)),      // all positive
        Seq((0.2, 0.0), (0.9, 0.0)),                  // all negative
        Seq((0.5, 1.0), (0.5, 0.0), (0.5, 1.0)))      // one constinct score
    for ((pairs, i) <- cases.zipWithIndex) {
      val counts = pairs.groupBy(_._1).toSeq
        .map { case (s, g) =>
          (s, g.count(_._2 > 0.5).toLong, g.count(_._2 <= 0.5).toLong)
        }
        .sortBy(-_._1)
      val (aucL, prL) = graft.ml.Evaluation.binaryAucPrLocal(counts)
      val m = new org.apache.spark.mllib.evaluation.BinaryClassificationMetrics(
        spark.sparkContext.parallelize(pairs, 1 + (i % 3)), 1000)
      val aucD = m.areaUnderROC(); val prD = m.areaUnderPR(); m.unpersist()
      assert(math.abs(aucL - aucD) < 1e-13, s"case $i auc $aucL vs BCM $aucD")
      assert(math.abs(prL - prD) < 1e-13, s"case $i pr $prL vs BCM $prD")
    }
  }

  test("evaluate4 parity holds for LinearSVC (rawPrediction is a signed margin)") {
    import org.apache.spark.ml.evaluation._
    // non-probabilistic model: rawPrediction(1) is an unbounded signed
    // margin, not a probability — pins the extraction evaluate4's AUC/PR
    // ride on for the SVM roster entry
    val df = masked(0.6)
    val model = new SupervisedOnLabeled(
      new org.apache.spark.ml.classification.LinearSVC().setMaxIter(20)).fit(df)
    val (acc, auc, pr, f1) = graft.operators.SemiSupervised.evaluate4(model, df)
    val predictions = model.transform(df).cache()
    val accE = new MulticlassClassificationEvaluator()
      .setMetricName("accuracy").evaluate(predictions)
    val f1E = new MulticlassClassificationEvaluator()
      .setMetricName("fMeasureByLabel").setMetricLabel(1.0).evaluate(predictions)
    val aucE = new BinaryClassificationEvaluator()
      .setMetricName("areaUnderROC").evaluate(predictions)
    val prE = new BinaryClassificationEvaluator()
      .setMetricName("areaUnderPR").evaluate(predictions)
    predictions.unpersist()
    assert(math.abs(acc - accE) < 1e-12, s"accuracy $acc vs evaluator $accE")
    assert(math.abs(f1 - f1E) < 1e-12, s"f1 $f1 vs evaluator $f1E")
    assert(math.abs(auc - aucE) < 1e-12, s"auc $auc vs evaluator $aucE")
    assert(math.abs(pr - prE) < 1e-12, s"pr $pr vs evaluator $prE")
  }

  test("evaluate4 fails loudly on an empty test frame") {
    val df = masked(0.6)
    val model = new SupervisedOnLabeled(base).fit(df)
    val ex = intercept[IllegalArgumentException] {
      graft.operators.SemiSupervised.evaluate4(model, df.limit(0))
    }
    assert(ex.getMessage.contains("empty test frame"))
  }

  test("degenerate tiny-label case self-labels everything in one pass (BASELINE sonar-shaped)") {
    val st = new SelfTrainingClassifier(base).setThreshold(0.7).setMaxIter(7)
    val (_, s) = st.fitWithSummary(masked(0.05))
    // with 5% labels on separable blobs the model is still confident →
    // everything gets labeled fast; iterations stays small
    assert(s.unlabeledFinal === 0)
    assert(s.iterations <= 3)
  }
}

/** End-to-end SSC flow on a Keel-shaped CSV fixture (SURVEY §7 step 4: the
  * minimum slice that answers one real query — CSV → featurization →
  * UnlabeledTransformer → estimator → metric). */
class KeelEndToEndSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSpark._

  test("CSV → pipeline → self-training → accuracy on wisconsin-shaped fixture") {
    val rnd = new scala.util.Random(13)
    val header = (1 to 6).map(i => s"f$i").mkString(",") + ",diagnosis"
    val rows = (0 until 400).map { i =>
      val cls = i % 2
      val center = cls * 4.0
      (1 to 6).map(_ => f"${center + rnd.nextGaussian()}%.4f").mkString(",") +
        (if (cls == 1) ",M" else ",B")
    }
    val dir = java.nio.file.Files.createTempDirectory("keel_e2e")
    val path = dir.resolve("wisconsin.csv")
    java.nio.file.Files.write(path, (header +: rows).mkString("\n").getBytes)

    val (raw, features, labelCol) = graft.sources.Ingestion.loadKeelCsv(spark, path.toString)
    val featurized = graft.ml.Featurization.pipeline(
      numericCols = features.toSeq, categoricalCols = Nil,
      labelInputCol = labelCol).fit(raw).transform(raw)
    val masked = new graft.ml.UnlabeledTransformer()
      .setPercentageLabeled(0.2).setSeed(11L).transform(featurized)
    val st = new graft.ml.SelfTrainingClassifier(
      new org.apache.spark.ml.classification.DecisionTreeClassifier().setSeed(8L))
      .setThreshold(0.6).setMaxIter(5)
    val (model, s) = st.fitWithSummary(masked)
    assert(s.labeledFinal > s.labeledInitial, s"no self-labeling happened: $s")
    import org.apache.spark.sql.functions.col
    val acc = model.transform(featurized)
      .filter(col("prediction") === col("label")).count().toDouble / 400
    assert(acc > 0.85, s"end-to-end accuracy $acc")
  }

  test("CoTraining kBest criterion accepts k per view per pass and converges") {
    val rnd = new scala.util.Random(21)
    import spark.implicits._
    val df = (0 until 300).map { i =>
      val label = (i % 2).toDouble
      (org.apache.spark.ml.linalg.Vectors.dense(
        label * 9 + rnd.nextGaussian(), label * 9 + rnd.nextGaussian()), label)
    }.toDF("features", "label")
    val masked = new graft.ml.UnlabeledTransformer()
      .setPercentageLabeled(0.3).setSeed(11L).transform(df)
    val ct = new graft.ml.CoTrainingClassifier(
      new org.apache.spark.ml.classification.DecisionTreeClassifier().setSeed(8L))
      .setCriterion("kBest").setKBest(0.6).setMaxIter(3)
    val (model, s) = ct.fitWithSummary(masked)
    assert(s.labeledFinal > s.labeledInitial)
    assert(s.labeledFinal + s.unlabeledFinal === 300L)
    import org.apache.spark.sql.functions.col
    val acc = model.transform(df)
      .filter(col("prediction") === col("label")).count().toDouble / 300
    assert(acc > 0.9, s"CT-kBest accuracy $acc")
  }
}

/** Feature-split (Blum-Mitchell) co-training. */
class FeatureSplitCoTrainingSpec extends org.scalatest.funsuite.AnyFunSuite {
  import TestSpark._

  // 4-dim blobs: BOTH halves are independently informative (the B&M
  // conditional-independence setting)
  private lazy val fourDim = {
    val rnd = new scala.util.Random(33)
    import spark.implicits._
    (0 until 400).map { i =>
      val label = (i % 2).toDouble
      val c = label * 8
      (org.apache.spark.ml.linalg.Vectors.dense(
        c + rnd.nextGaussian(), c + rnd.nextGaussian(),
        c + rnd.nextGaussian(), c + rnd.nextGaussian()), label)
    }.toDF("features", "label")
  }

  test("feature-split co-training labels the pool and learns (threshold)") {
    val masked = new graft.ml.UnlabeledTransformer()
      .setPercentageLabeled(0.2).setSeed(11L).transform(fourDim)
    val ct = new graft.ml.CoTrainingClassifier(
      new org.apache.spark.ml.classification.DecisionTreeClassifier().setSeed(8L))
      .setFeatureSplit(true).setThreshold(0.5).setMaxIter(4)
    val (model, s) = ct.fitWithSummary(masked)
    assert(s.labeledFinal > s.labeledInitial, s"pool never shrank: $s")
    assert(s.labeledFinal + s.unlabeledFinal === 400L)
    import org.apache.spark.sql.functions.col
    val acc = model.transform(fourDim)
      .filter(col("prediction") === col("label")).count().toDouble / 400
    assert(acc > 0.9, s"feature-split accuracy $acc")
    // final model consumes FULL features (4-dim)
    assert(model.numFeatures === 4)
  }

  test("feature-split kBest accepts at most 2k rows per pass") {
    val masked = new graft.ml.UnlabeledTransformer()
      .setPercentageLabeled(0.3).setSeed(11L).transform(fourDim)
    val u0 = masked.filter(
      org.apache.spark.sql.functions.isnan(
        org.apache.spark.sql.functions.col("labelSelection"))).count()
    val ct = new graft.ml.CoTrainingClassifier(
      new org.apache.spark.ml.classification.DecisionTreeClassifier().setSeed(8L))
      .setFeatureSplit(true).setCriterion("kBest").setKBest(0.3).setMaxIter(3)
    val (_, s) = ct.fitWithSummary(masked)
    val k = ((0.3 * u0) / 2).round
    // per pass each view accepts ≤ k → ≤ 2k new labels per pass, 2 passes
    assert(s.labeledFinal - s.labeledInitial <= 2 * 2 * k)
    assert(s.labeledFinal > s.labeledInitial)
  }

  test("DF-native folds keep MLUtils.kFold's contract (SURVEY §7 step 7)") {
    import spark.implicits._
    val data = (0 until 1000).map(i => (i.toLong, (i % 2).toDouble))
      .toDF("id", "y")
    val k = 4
    // the fold assignment crossValidate uses (seeded rand column)
    val folded = data.withColumn("__fold", (rand(8) * k).cast("int")).cache()
    val total = folded.count()
    val sizes = folded.groupBy("__fold").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // contract 1: folds partition the data (disjoint by construction, cover
    // all rows, every fold id present)
    assert(sizes.keySet === (0 until k).toSet)
    assert(sizes.values.sum === total)
    // contract 2: deterministic — same seed reproduces the exact assignment
    val again = data.withColumn("__fold", (rand(8) * k).cast("int"))
    assert(folded.select("id", "__fold").exceptAll(
      again.select("id", "__fold")).count() === 0)
    // contract 3: distributional parity with the reference's MLUtils.kFold
    // on the same rows — both schemes split multinomially, so every fold
    // (ours and theirs) lands within the same spread around n/k
    val refFolds = org.apache.spark.mllib.util.MLUtils.kFold(data.rdd, k, 8)
    assert(refFolds.length === k)
    refFolds.foreach { case (train, test) =>
      assert(train.count() + test.count() === total, "kFold split not a partition")
    }
    val refSizes = refFolds.map(_._2.count())
    val expect = total.toDouble / k
    (sizes.values ++ refSizes).foreach(s =>
      assert(math.abs(s - expect) / expect < 0.2,
        s"fold size $s outside 20% of $expect"))
    folded.unpersist()
  }

  test("featureSplit rejects 1-dim feature vectors") {
    import spark.implicits._
    val tiny = Seq(
      (org.apache.spark.ml.linalg.Vectors.dense(1.0), 0.0),
      (org.apache.spark.ml.linalg.Vectors.dense(2.0), 1.0))
      .toDF("features", "label")
    val masked = new graft.ml.UnlabeledTransformer()
      .setPercentageLabeled(0.5).setSeed(11L).transform(tiny)
    val ct = new graft.ml.CoTrainingClassifier(
      new org.apache.spark.ml.classification.DecisionTreeClassifier().setSeed(8L))
      .setFeatureSplit(true)
    intercept[IllegalArgumentException] { ct.fitWithSummary(masked) }
  }
}
