package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FrequentItemsAggregator, KmvAggregator}

/** The KMV / frequent-items wing of the sketch family (q208–q212):
  * merge-order invariance for KMV (the property that licenses both the
  * map-side partials and the streaming twin's bit-identity claim), the
  * Misra–Gries candidate guarantee under arbitrary partitioning (the
  * property that makes the two-pass heavy-hitter output deterministic),
  * and the IVM invariant that q211's refreshed view is independent of
  * which rows arrived in the delta. */
class SketchSetOpsSpec extends AnyFunSuite {
  import TestSpark._

  private val params = Gen.Parameters.default

  // ---- KMV kernel ----

  private def directBottomK(xs: Seq[Long], k: Int): Vector[Long] =
    xs.distinct.sorted.take(k).toVector

  test("KMV: reduce+merge over any partitioning equals direct bottom-k (property)") {
    val agg = new KmvAggregator(8)
    var seed = org.scalacheck.rng.Seed(7L)
    val hashGen = Gen.chooseNum(0L, 200L) // small domain → many duplicates
    val streamGen = Gen.listOf(hashGen)
    for (i <- 1 to 300) {
      val xs = streamGen.pureApply(params, seed); seed = seed.next
      val nParts = 1 + (i % 5)
      // deterministic "random" partition assignment
      val parts = xs.zipWithIndex.groupBy { case (v, j) =>
        (v * 31 + j * 17 + i) % nParts
      }.values.map(_.map(_._1)).toVector
      val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      // merge in two different orders: left fold and right fold
      val m1 = partials.foldLeft(agg.zero)(agg.merge)
      val m2 = partials.reverse.foldLeft(agg.zero)(agg.merge)
      val expect = directBottomK(xs, 8)
      assert(m1.toVector === expect, s"xs=$xs parts=$parts")
      assert(m2.toVector === expect, "merge must be order-insensitive")
    }
  }

  test("KMV: insert edge cases — duplicate, above-cut, boundary fill") {
    val k = 4
    val full = Array(1L, 3L, 5L, 7L)
    assert(KmvAggregator.insert(full, 5L, k).toVector === full.toVector)
    assert(KmvAggregator.insert(full, 9L, k).toVector === full.toVector)
    assert(KmvAggregator.insert(full, 0L, k).toVector === Vector(0L, 1L, 3L, 5L))
    assert(KmvAggregator.insert(full, 6L, k).toVector === Vector(1L, 3L, 5L, 6L))
    assert(KmvAggregator.insert(Array.empty[Long], 2L, k).toVector === Vector(2L))
  }

  // ---- Misra–Gries kernel ----

  test("MG: merged candidates cover every item above n/(c+1), any split (property)") {
    val c = 4
    val agg = new FrequentItemsAggregator(c)
    var seed = org.scalacheck.rng.Seed(13L)
    // skewed alphabet: 'a'/'b' frequent, the rest tail
    val itemGen = Gen.frequency(
      (6, Gen.const("a")), (3, Gen.const("b")),
      (1, Gen.oneOf("c", "d", "e", "f", "g", "h")))
    val streamGen = Gen.listOfN(120, itemGen)
    for (i <- 1 to 300) {
      val xs = streamGen.pureApply(params, seed); seed = seed.next
      val n = xs.size
      val truth = xs.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val nParts = 1 + (i % 4)
      val parts = xs.zipWithIndex.groupBy { case (v, j) => (j * 13 + i) % nParts }
        .values.map(_.map(_._1)).toVector
      val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      // finish() converts the mutable buffer to the immutable output map
      val merged = agg.finish(partials.foldLeft(agg.zero)(agg.merge))
      assert(merged.size <= c, "summary must stay bounded")
      val heavy = truth.filter { case (_, cnt) => cnt * (c + 1) > n }.keySet
      assert(heavy.subsetOf(merged.keySet),
        s"missing heavy hitters: ${heavy -- merged.keySet} in xs of n=$n")
      // Agarwal et al. undercount bound: true − kept ≤ (n − Σkept)/(c+1)
      val kept = merged.values.sum
      merged.foreach { case (item, cnt) =>
        val t = truth.getOrElse(item, 0L)
        assert(cnt <= t, s"counter must never overcount ($item)")
        assert((t - cnt) * (c + 1) <= (n - kept),
          s"undercount bound violated for $item: true=$t kept=$cnt")
      }
    }
  }

  // ---- end-to-end pins on the fixture tables ----

  test("q208: aggregator state equals a window-computed bottom-64 (sf0.001)") {
    val got = graft.operators.Sketches.q208KmvSketch(spark, sf)
      .select("y", "k_filled", "kth", "state_ck").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val hashed = graft.sources.Tables.load(spark, sf, "orders")
      .select(year(col("o_orderdate")).cast("long").as("y"),
        graft.operators.Sketches.hash52(col("o_custkey")).as("h"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("y")).orderBy(col("h"))
    val expect = hashed
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 64)
      .groupBy(col("y"))
      .agg(count(lit(1)).as("k_filled"), max(col("h")).as("kth"),
        sum(col("h")).as("state_ck"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(got === expect)
  }

  test("q212 streaming KMV state is bit-identical to batch q208 (sf0.001)") {
    val batch = graft.operators.Sketches.q208KmvSketch(spark, sf)
      .select("y", "k_filled", "kth", "state_ck", "kmv_est")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val stream = graft.streaming.EventStreams.qStreamKmv(spark, sf)
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(stream === batch)
  }

  // ---- A-ES bottom-k kernel (q218's state) ----

  test("A-ES bottom-k: reduce+merge over any partitioning equals direct sort (property)") {
    val agg = new graft.functions.AesBottomKAggregator(6)
    var seed = org.scalacheck.rng.Seed(29L)
    // small key domain → frequent key ties, exercising the id tie-break;
    // duplicated (key, id) pairs model at-least-once replay
    val pairGen = for {
      k <- Gen.chooseNum(0, 9)
      id <- Gen.chooseNum(0L, 30L)
    } yield (k.toDouble / 4.0, id)
    val streamGen = Gen.listOf(pairGen)
    for (i <- 1 to 300) {
      val xs = streamGen.pureApply(params, seed); seed = seed.next
      val nParts = 1 + (i % 5)
      val parts = xs.zipWithIndex.groupBy { case (_, j) =>
        (j * 13 + i) % nParts
      }.values.map(_.map(_._1)).toVector
      val partials = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val m1 = partials.foldLeft(agg.zero)(agg.merge)
      val m2 = partials.reverse.foldLeft(agg.zero)(agg.merge)
      val expect = xs.distinct.sortBy(p => (p._1, p._2)).take(6).toVector
      assert(m1.toVector === expect, s"xs=$xs parts=$parts")
      assert(m2.toVector === expect, "merge must be order-insensitive")
    }
  }

  test("q218 streaming A-ES sample is bit-identical to batch q175 (sf0.001)") {
    val batch = graft.operators.Sketches.q175WeightedSample(spark, sf)
      .collect().map(_.toSeq)
    val stream = graft.streaming.EventStreams
      .qStreamWeightedSample(spark, sf)
      .collect().map(_.toSeq)
    assert(stream === batch)
    assert(batch.length === 20)
  }

  test("q211: refreshed view is invariant to the delta split (IVM contract)") {
    def run(mod: Int): Seq[Seq[Any]] =
      graft.operators.Sketches.q211MvRefresh(spark, sf, deltaMod = mod)
        .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[String]).toSeq
    val byMod16 = run(16)
    assert(run(7) === byMod16, "output must not depend on which rows were the delta")
    assert(run(2) === byMod16, "half-corpus delta must land identically")
  }

  test("q209: set-algebra identities and estimator sanity (sf0.001)") {
    val rows = graft.operators.Sketches.q209KmvSetops(spark, sf).collect()
    assert(rows.length === 21, "7 years -> 21 unordered pairs")
    rows.foreach { r =>
      val (nInter, nDiff) = (r.getAs[Long]("n_inter"), r.getAs[Long]("n_diff"))
      val (exIn, exUn, exDf) = (r.getAs[Long]("exact_inter"),
        r.getAs[Long]("exact_union"), r.getAs[Long]("exact_diff"))
      // candidates below theta partition into (in B) and (not in B)
      assert(nInter >= 0 && nDiff >= 0)
      assert(exUn >= exIn && exDf >= 0)
      // estimator sanity: within a generous 4-sigma of exact (k=64 ->
      // sigma ~ 13%); a broken theta or hash family misses by 10x
      val est = r.getAs[Double]("inter_est")
      assert(math.abs(est - exIn) <= math.max(8.0, 0.55 * exIn),
        s"inter_est $est vs exact $exIn for pair ${r.getLong(0)}/${r.getLong(1)}")
    }
  }

  test("q217: exact-regime transitions ARE the retention algebra (sf0.001)") {
    // at sf0.001 the per-day audiences (~5 users) are far below k=16, so
    // every sketch is its own set, theta is the whole hash space, and the
    // sketch counts must EQUAL the exact retention algebra row for row —
    // the degenerate-regime contract that makes small groups safe
    val rows = graft.operators.Sketches.q217ChurnKmv(spark, sf).collect()
    assert(rows.nonEmpty)
    val full = 4503599627370496L
    val exactRegime = rows.filter(_.getAs[Long]("theta") == full)
    assert(exactRegime.nonEmpty, "fixture must exercise the exact regime")
    exactRegime.foreach { r =>
      assert(r.getAs[Long]("n_ret") === r.getAs[Long]("exact_ret"))
      assert(r.getAs[Long]("n_churn") === r.getAs[Long]("exact_churn"))
      assert(r.getAs[Long]("n_new") === r.getAs[Long]("exact_new"))
    }
  }

  test("q213: an everything-window at the last day collapses to q160's registers") {
    // windowDays >= calendar span makes the trailing window at the final
    // day cover the whole corpus — its registers must equal the global
    // per-type sketch, tying the sliding machinery to the pinned q160 state
    val slid = graft.operators.Sketches.q213SlidingHll(spark, sf, windowDays = 60)
    val lastDay = slid.agg(max(col("day"))).collect()(0).getString(0)
    val got = slid.filter(col("day") === lastDay)
      .select("event_type", "n_exact", "register_sum", "register_ck")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val expect = graft.operators.Sketches.q160HllSketch(spark, sf)
      .select("event_type", "n_distinct", "register_sum", "register_ck")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(got === expect)
  }

  test("q214: grouped two-pass equals the per-source census (sf0.001)") {
    val got = graft.operators.Sketches.q214GroupHeavyHitters(spark, sf)
      .select("source", "w", "cnt").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    val words = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val totals = words.groupBy("source").agg(count(lit(1)).as("n"))
    val expect = words.groupBy("source", "w").agg(count(lit(1)).as("cnt"))
      .join(totals, Seq("source")).filter(col("cnt") * 33 > col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sorted
    assert(got === expect)
    assert(got.nonEmpty && expect.map(_._1).distinct.length > 1,
      "fixture must exercise several sources")
  }

  test("q215 streaming candidates + recount equals batch q210 (sf0.001)") {
    val batch = graft.operators.Sketches.q210HeavyHitters(spark, sf)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val stream = graft.streaming.EventStreams.qStreamHeavyHitters(spark, sf)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(stream === batch)
  }

  test("q210: two-pass output equals the full-census heavy hitters (sf0.001)") {
    val got = graft.operators.Sketches.q210HeavyHitters(spark, sf)
      .select("w", "cnt").collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val words = graft.sources.Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val n = words.count()
    val expect = words.groupBy("w").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 65 > lit(n))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(got === expect)
    assert(got.nonEmpty, "fixture must exercise a non-empty heavy-hitter set")
  }
}
