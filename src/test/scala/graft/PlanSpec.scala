package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the plans that make the 100 TB story
  * true must not silently degrade (SURVEY §4). */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def formatted(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("filters are pushed into the parquet scan (q06, q08)") {
    val p6 = formatted("q06_filter_gt")
    assert(p6.contains("PushedFilters") && p6.contains("GreaterThan(l_quantity,45.0)"),
      s"q06 lost filter pushdown:\n$p6")
    val p8 = formatted("q08_band_revenue")
    assert(p8.contains("GreaterThanOrEqual(l_discount,0.05)") &&
      p8.contains("LessThan(l_quantity,24.0)"),
      s"q08 lost band pushdown:\n$p8")
  }

  test("column pruning reaches the scan (q04 reads exactly 2 columns)") {
    val p = formatted("q04_project")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"q04 reads more than the projection:\n$p")
  }

  test("dimension join broadcasts (q11)") {
    val p = formatted("q11_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), s"q11 not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q11 fell back to sort-merge:\n$p")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort (q15)") {
    val p = formatted("q15_topk")
    assert(p.contains("TakeOrderedAndProject"), s"q15 lost top-k plan:\n$p")
    assert(!p.contains("\n(4) Sort"), s"q15 materializes a full sort:\n$p")
  }

  test("scan-side queries stay inside whole-stage codegen (q20 haversine)") {
    val p = formatted("q20_haversine")
    // FormattedMode marks codegen'd operators with "[codegen id : N]"
    assert(p.contains("[codegen id :"), s"q20 outside codegen:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      s"q20 contains a UDF barrier:\n$p")
  }
}
