package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.SortedIntersectCount

/** Property-based tests for the engine's custom kernels: randomized
  * inputs pin semantics the fixtures can't enumerate (overlap shapes,
  * unicode ordering, degenerate sizes). */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private def arr(xs: Seq[String]): GenericArrayData =
    new GenericArrayData(xs.map(UTF8String.fromString).toArray[Any])

  // sorted, duplicate-free string arrays over a small alphabet (so
  // intersections are common), plus occasional multi-byte code points to
  // exercise UTF8 binary ordering
  private val tokenGen: Gen[String] = Gen.oneOf(
    Gen.stringOfN(2, Gen.alphaLowerChar),
    Gen.oneOf("é", "ß", "中", "aa", "ab", "b", "zz"))
  private val sortedSetGen: Gen[Vector[String]] =
    Gen.listOf(tokenGen).map(_.distinct.sortBy(UTF8String.fromString).toVector)

  test("sorted_intersect_count equals set-intersection cardinality (property)") {
    // scalacheck driven directly (the scalatest bridge isn't on the
    // offline classpath): 400 seeded cases through the generators
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(42L)
    for (_ <- 1 to 400) {
      val a = sortedSetGen.pureApply(params, seed); seed = seed.next
      val b = sortedSetGen.pureApply(params, seed); seed = seed.next
      val expected = (a.toSet & b.toSet).size.toLong
      assert(SortedIntersectCount.countOf(arr(a), arr(b)) === expected,
        s"a=$a b=$b")
    }
    // explicit degenerate shapes
    assert(SortedIntersectCount.countOf(arr(Nil), arr(Nil)) === 0L)
    assert(SortedIntersectCount.countOf(arr(Seq("x")), arr(Nil)) === 0L)
    assert(SortedIntersectCount.countOf(arr(Seq("x")), arr(Seq("x"))) === 1L)
  }

  test("sorted_intersect_count expression equals array_intersect end-to-end") {
    // randomized-but-seeded bulk comparison through real Spark eval (the
    // codegen path), against the built-in it replaces
    import spark.implicits._
    val rnd = new scala.util.Random(8)
    val rows = Seq.tabulate(300) { i =>
      def set() = Seq.fill(rnd.nextInt(12))(
        s"t${rnd.nextInt(20)}").distinct.sortBy(UTF8String.fromString)
      (i.toLong, set(), set())
    }
    val df = rows.toDF("id", "a", "b")
    SortedIntersectCount.register(spark)
    val bad = df.select(col("id"),
        expr("sorted_intersect_count(a, b)").as("got"),
        size(array_intersect(col("a"), col("b"))).cast("bigint").as("want"))
      .filter(col("got") =!= col("want"))
    assert(bad.count() === 0)
  }

  test("the Spark BPE merge fold equals a driver-side greedy fold (randomized words)") {
    // random words over a 3-letter alphabet make overlapping pairs (aa)
    // and repeated structure common; every merge list is applied both by
    // the folded Catalyst chain and by the reference greedy loop
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val words = Seq.fill(300)(
      (1 to (1 + rnd.nextInt(10))).map(_ => "abc" (rnd.nextInt(3))).mkString)
      .distinct
    val merges = Seq("a" -> "a", "a" -> "b", "ab" -> "c", "b" -> "a",
      "aa" -> "aa", "c" -> "c", "ba" -> "ba")
    def driverFold(w: String): Vector[String] = {
      var syms = w.map(_.toString).toVector
      for ((a, b) <- merges) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        for (s <- syms) {
          if (out.nonEmpty && out.last == a && s == b)
            out(out.length - 1) = a + b
          else out += s
        }
        syms = out.toVector
      }
      syms
    }
    val got = words.toDF("w")
      .select(col("w"), graft.operators.TextAnalysis.foldedSyms(merges).as("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    for (w <- words) {
      assert(got(w) === driverFold(w), s"word '$w'")
      assert(got(w).mkString === w, s"'$w': merge fold must preserve characters")
    }
  }

  test("q181 dup-5-gram interval union equals brute-force coverage (property)") {
    // random small-alphabet token streams (repetition-dense so duplicated
    // 5-grams with every overlap shape occur), engine union vs a literal
    // "is position p inside any duplicated occurrence's span" count
    import spark.implicits._
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(7L)
    val docGen = Gen.chooseNum(5, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    val docs = (1 to 60).map { i =>
      val words = docGen.pureApply(params, seed); seed = seed.next
      (i.toLong, s"s$i", words.mkString(" "))
    }
    def bruteCovered(ws: Seq[String]): Long = {
      val grams = ws.sliding(5).map(_.mkString(" ")).toVector
      val dupStarts = grams.zipWithIndex
        .filter { case (g, _) => grams.count(_ == g) >= 2 }
        .map(_._2 + 1) // 1-based
      (1 to ws.length).count(p =>
        dupStarts.exists(s => p >= s && p <= s + 4)).toLong
    }
    val expected = docs.map { case (id, src, text) =>
      val ws = text.split(" ").toSeq
      val n = ws.length.toLong
      src -> (20L * bruteCovered(ws) > 3L * n)
    }.toMap
    val got = graft.operators.Curation.repetitionRollup(
        docs.toDF("doc_id", "source", "text"))
      .collect().map(r => r.getString(0) -> (r.getLong(4) === 1L)).toMap
    assert(got === expected)
    // the generator must actually produce both verdicts
    assert(expected.values.exists(identity) && expected.values.exists(!_),
      "degenerate property corpus: only one dup5 verdict produced")
  }

  test("quantile sketch: merge is associative, commutative, and partitioning-independent (property)") {
    import graft.functions.QuantileSketch.QuantileSketchAgg
    // a TINY cap forces mid-stream escalations, the regime the gate data
    // never reaches — determinism must hold through them, not around them
    val agg = new QuantileSketchAgg(l0 = 1, cap = 12, k = 4)
    def sketchOf(xs: Seq[Long]) =
      agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    def viaSplits(xs: Seq[Long], cuts: Seq[Int]) = {
      val parts = (cuts.sorted :+ xs.length).distinct
        .foldLeft((Vector.empty[Seq[Long]], 0)) { case ((acc, from), to) =>
          (acc :+ xs.slice(from, to), to)
        }._1.filter(_.nonEmpty)
      if (parts.isEmpty) agg.finish(agg.zero)
      else agg.finish(parts.map(_.foldLeft(agg.zero)(agg.reduce))
        .reduce(agg.merge))
    }
    val params = Gen.Parameters.default
    var seed = org.scalacheck.rng.Seed(8L)
    val valuesGen = Gen.listOf(Gen.chooseNum(-50L, 200L))
    for (i <- 1 to 300) {
      val xs = valuesGen.pureApply(params, seed); seed = seed.next
      val cuts = Gen.listOfN(3, Gen.chooseNum(0, math.max(xs.length, 1)))
        .pureApply(params, seed); seed = seed.next
      val direct = sketchOf(xs)
      assert(viaSplits(xs, cuts) === direct, s"case $i: xs=$xs cuts=$cuts")
      // commutativity + a right-leaning merge tree on a fixed 3-way split
      val third = math.max(xs.length / 3, 1)
      val (p1, rest) = xs.splitAt(third)
      val (p2, p3) = rest.splitAt(third)
      val bufs = Seq(p1, p2, p3).map(_.foldLeft(agg.zero)(agg.reduce))
      val leftTree = agg.merge(agg.merge(bufs(0), bufs(1)), bufs(2))
      assert(agg.finish(leftTree) === direct, s"case $i left tree")
      // permuted order (buffers rebuilt: merge mutates its arguments)
      val bufs2 = Seq(p3, p1, p2).map(_.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(bufs2.reduce(agg.merge)) === direct,
        s"case $i permuted merge order")
      // order-insensitivity of reduce itself
      assert(sketchOf(xs.reverse) === direct, s"case $i reversed input")
    }
    // the generator must actually exercise the escalation path
    val big = (1L to 400L)
    val escalated = sketchOf(big)
    assert(escalated.level > 1, "cap-12 sketch over 400 distincts never escalated")
    assert(escalated.n_sample <= 4)
  }
}
