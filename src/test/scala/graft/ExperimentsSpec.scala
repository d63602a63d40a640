package graft

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Experiments

class ExperimentsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val separable = {
    val rnd = new scala.util.Random(42)
    import spark.implicits._
    (0 until 300).map { i =>
      val label = (i % 2).toDouble
      (Vectors.dense(label * 8 + rnd.nextGaussian(),
        label * 8 + rnd.nextGaussian()), label)
    }.toDF("features", "label")
  }

  test("grid builder crosses configs and collapses supervised criterion to 'na'") {
    val g = Experiments.grid("toy", Seq("DT", "LR"), Seq("ST", "supervised"),
      pcts = Seq(0.1, 0.3),
      criterionValues = Map("threshold" -> Seq(0.7, 0.9), "kBest" -> Seq(0.5)))
    // ST: 2 clf × 2 pct × 3 values = 12; supervised: 2 clf × 2 pct = 4
    assert(g.count(_.algo == "ST") === 12)
    assert(g.count(_.algo == "supervised") === 4)
    assert(g.filter(_.algo == "supervised").forall(_.criterion === "na"))
  }

  test("runGrid yields one 15-column row per cell with sane metrics") {
    val cells = Seq(
      Experiments.Cell("toy", "DT", "ST", "threshold", 0.3, 0.6, maxIter = 3),
      Experiments.Cell("toy", "DT", "supervised", "na", 0.3, 0.0))
    val out = Experiments.runGrid(separable, cells, k = 2)
    assert(out.count() === 2)
    assert(out.columns.toSeq === Seq("data", "classifier", "criterion",
      "percentageLabeled", "thresholdOrKBest", "iteration", "LabeledInitial",
      "UnLabeledInitial", "LabeledFinal", "UnLabeledFinal",
      "percentageLabeledFinal", "accuracy", "AUC", "PR", "F1score"))
    val st = out.filter(col("classifier") === "ST-DT").head()
    assert(st.getAs[Double]("accuracy") > 0.9)
    assert(st.getAs[Long]("LabeledFinal") >= st.getAs[Long]("LabeledInitial"))
  }

  test("unknown classifier or algo is rejected") {
    intercept[IllegalArgumentException] {
      Experiments.baseClassifier("SVM") // probabilistic roster excludes LSVC
    }
    intercept[IllegalArgumentException] {
      Experiments.runCell(separable,
        Experiments.Cell("toy", "DT", "bogus", "threshold", 0.3, 0.6), k = 2)
    }
  }

  /** Strictly positive, proportion-separated blobs: class 0 is heavy in
    * dim 0, class 1 heavy in dim 1. Multinomial NaiveBayes rejects negative
    * features AND classifies by feature PROPORTIONS (equal-proportion blobs
    * are invisible to it), so the roster fixture needs both properties. */
  private lazy val positiveBlobs = {
    val rnd = new scala.util.Random(17)
    import spark.implicits._
    (0 until 240).map { i =>
      val label = (i % 2).toDouble
      val (hi, lo) = (8 + rnd.nextDouble() * 2, rnd.nextDouble() * 2)
      (if (label == 0.0) Vectors.dense(hi, lo) else Vectors.dense(lo, hi), label)
    }.toDF("features", "label")
  }

  test("full roster fits end-to-end: RF/NB/LR through ST and CT (VERDICT M12)") {
    for (clf <- Seq("RF", "NB", "LR"); algo <- Seq("ST", "CT")) {
      val r = Experiments.runCell(positiveBlobs,
        Experiments.Cell("toy", clf, algo, "threshold", 0.3, 0.6, maxIter = 2),
        k = 2)
      assert(r.accuracy > 0.85, s"$algo-$clf accuracy ${r.accuracy}")
      assert(r.LabeledFinal >= r.LabeledInitial, s"$algo-$clf never self-labeled")
      assert(r.classifier === s"$algo-$clf")
    }
  }

  test("LinearSVC fits through the supervised-only branch (VERDICT gap 2)") {
    val r = Experiments.runCell(positiveBlobs,
      Experiments.Cell("toy", "SVM", "supervised", "na", 0.5, 0.0), k = 2)
    assert(r.accuracy > 0.85, s"supervised-SVM accuracy ${r.accuracy}")
    // but SVM through a self-labeling algo is rejected (needs probability)
    intercept[IllegalArgumentException] {
      Experiments.runCell(positiveBlobs,
        Experiments.Cell("toy", "SVM", "ST", "threshold", 0.3, 0.6), k = 2)
    }
  }

  test("supervised roster incl. NB and RF runs under grid CV") {
    val cells = Seq("RF", "NB").map(clf =>
      Experiments.Cell("toy", clf, "supervised", "na", 0.5, 0.0))
    val out = Experiments.runGrid(positiveBlobs, cells, k = 2)
    val accs = out.select("classifier", "accuracy").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(accs.size === 2)
    assert(accs.values.forall(_ > 0.85), s"roster accuracies: $accs")
  }
}
