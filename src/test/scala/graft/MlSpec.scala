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

  test("degenerate tiny-label case self-labels everything in one pass (BASELINE sonar-shaped)") {
    val st = new SelfTrainingClassifier(base).setThreshold(0.7).setMaxIter(7)
    val (_, s) = st.fitWithSummary(masked(0.05))
    // with 5% labels on separable blobs the model is still confident →
    // everything gets labeled fast; iterations stays small
    assert(s.unlabeledFinal === 0)
    assert(s.iterations <= 3)
  }
}
