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
      Experiments.baseClassifier("SVM")
    }
    intercept[IllegalArgumentException] {
      Experiments.runCell(separable,
        Experiments.Cell("toy", "DT", "bogus", "threshold", 0.3, 0.6), k = 2)
    }
  }
}
