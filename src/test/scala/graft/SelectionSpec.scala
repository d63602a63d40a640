package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Selection

/** Exact distributed selection vs the orderBy.limit reference semantics. */
class SelectionSpec extends AnyFunSuite {
  import TestSpark._

  /** Reference implementation: the funnel plan Selection replaces. */
  private def viaSort(df: org.apache.spark.sql.DataFrame, k: Int): Set[Long] =
    df.orderBy(col("v").desc, col("id")).limit(k)
      .collect().map(_.getAs[Long]("id")).toSet

  private def viaSelection(df: org.apache.spark.sql.DataFrame, k: Int): Set[Long] = {
    val n = df.count()
    df.filter(Selection.topKPredicate(df, "v", "id", k.toLong, n))
      .collect().map(_.getAs[Long]("id")).toSet
  }

  test("matches orderBy.limit on continuous values") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 5000).map(i => (i.toLong, rnd.nextDouble()))
      .toDF("id", "v").repartition(8).cache()
    df.count()
    for (k <- Seq(1, 17, 500, 4999, 5000)) {
      assert(viaSelection(df, k) === viaSort(df, k), s"k=$k diverged")
    }
    df.unpersist()
  }

  test("matches orderBy.limit under heavy ties (tree-leaf-like values)") {
    import spark.implicits._
    // only 4 distinct values — the DecisionTree probMax regime where the
    // cutoff value has thousands of ties
    val df = (0 until 4000).map(i => (i.toLong, (i % 4) * 0.25 + 0.25))
      .toDF("id", "v").repartition(8).cache()
    df.count()
    for (k <- Seq(1, 999, 1000, 1001, 2500)) {
      assert(viaSelection(df, k) === viaSort(df, k), s"k=$k diverged")
    }
    df.unpersist()
  }

  test("all-identical values tie-break by id exactly") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (i.toLong, 1.0)).toDF("id", "v")
      .repartition(8).cache()
    df.count()
    assert(viaSelection(df, 137) === (0L until 137L).toSet)
    df.unpersist()
  }

  test("k<=0 keeps nothing, k>=n keeps everything") {
    import spark.implicits._
    val df = (0 until 10).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    assert(df.filter(Selection.topKPredicate(df, "v", "id", 0L, 10L)).count() === 0)
    assert(df.filter(Selection.topKPredicate(df, "v", "id", 99L, 10L)).count() === 10)
  }

  test("kthSmallestLong handles sparse non-contiguous ids (partition-encoded)") {
    import spark.implicits._
    // monotonically_increasing_id-shaped ids: (partition << 33) | offset
    val ids = (0 until 6).flatMap(p => (0 until 50).map(o => (p.toLong << 33) | o))
    val df = ids.map(i => Tuple1(i)).toDF("id")
    val sorted = ids.sorted
    for (m <- Seq(1, 50, 51, 150, 300))
      assert(Selection.kthSmallestLong(df, "id", m.toLong) === sorted(m - 1))
  }

  test("NaN values fail fast instead of corrupting the cutoff") {
    import spark.implicits._
    val df = ((0 until 20).map(i => (i.toLong, i.toDouble)) :+ (20L, Double.NaN))
      .toDF("id", "v")
    val ex = intercept[IllegalArgumentException] {
      Selection.kthLargestDouble(df, "v", 5L)
    }
    assert(ex.getMessage.contains("NaN"))
  }

  test("interval width overflowing to Infinity still refines (midpoint split)") {
    import spark.implicits._
    val df = Seq(
      (0L, -1.6e308), (1L, -1.2e308), (2L, 0.0), (3L, 1.1e308), (4L, 1.7e308))
      .toDF("id", "v")
    // hi - lo = Infinity on the first round; must still resolve exactly
    assert(Selection.kthLargestDouble(df, "v", 2L) === (1.1e308, 1L))
    assert(viaSelection(df, 3) === Set(2L, 3L, 4L))
  }

  test("acceptance plan is a pure filter: no TakeOrderedAndProject, no Exchange") {
    import spark.implicits._
    val df = (0 until 2000).map(i => (i.toLong, (i % 7).toDouble))
      .toDF("id", "v").cache()
    df.count()
    val pred = Selection.topKPredicate(df, "v", "id", 500L, 2000L)
    val plan = df.filter(pred).queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject"), s"funnel reappeared:\n$plan")
    assert(!plan.contains("Exchange"), s"acceptance shuffles:\n$plan")
    assert(df.filter(pred).count() === 500L)
    df.unpersist()
  }

  test("grouped kth-largest matches the per-group single refinement (40 groups, mixed density)") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    // mixed regimes across groups: continuous, heavy ties, all-identical
    val rows = (0 until 40).flatMap { gi =>
      val g = f"g$gi%02d"
      (0 until 200).map { i =>
        val v = gi % 3 match {
          case 0 => rnd.nextDouble() * 100
          case 1 => (i % 5).toDouble
          case 2 => 42.0
        }
        (g, gi * 1000L + i, v)
      }
    }
    val df = rows.toDF("grp", "id", "v").repartition(8).cache()
    df.count()
    val targets = (0 until 40).map(gi => f"g$gi%02d" -> (gi % 7 + 1).toLong * 13).toMap
    val grouped = Selection.groupedKthLargestDouble(df, "grp", "v", targets)
    targets.foreach { case (g, k) =>
      val single = Selection.kthLargestDouble(df.filter(col("grp") === g), "v", k)
      assert(grouped(g) === single, s"group $g diverged: ${grouped(g)} vs $single")
    }
    // grouped id refinement parity on the same data
    val idTargets = (0 until 40).map(gi => f"g$gi%02d" -> (gi % 11 + 1).toLong).toMap
    val gIds = Selection.groupedKthSmallestLong(df, "grp", "id", idTargets)
    idTargets.foreach { case (g, m) =>
      val single = Selection.kthSmallestLong(df.filter(col("grp") === g), "id", m)
      assert(gIds(g) === single, s"group $g id cutoff diverged")
    }
    df.unpersist()
  }
}
