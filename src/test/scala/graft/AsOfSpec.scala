package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** As-of join semantics (union + running window, no join node). */
class AsOfSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def fixture() = {
    import spark.implicits._
    val left = Seq(
      ("a", ts("2024-01-01 09:30:00"), 1L),
      ("a", ts("2024-01-01 10:00:00"), 2L), // exactly at a right row's ts
      ("a", ts("2024-01-01 11:45:00"), 3L),
      ("b", ts("2024-01-01 09:15:00"), 4L), // before b's first right row
      ("b", ts("2024-01-01 12:00:00"), 5L)
    ).toDF("k", "t", "ev")
    val right = Seq(
      ("a", ts("2024-01-01 09:00:00"), 100L),
      ("a", ts("2024-01-01 10:00:00"), 200L),
      ("a", ts("2024-01-01 11:00:00"), 300L),
      ("b", ts("2024-01-01 10:00:00"), 900L)
    ).toDF("k", "t", "payload")
    (left, right)
  }

  test("attaches the latest right payload at-or-before each left row") {
    val (left, right) = fixture()
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", Seq("payload"))
      .select(col("ev"), col("payload"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out === Map(
      1L -> Some(100L), // 09:30 → 09:00 row
      2L -> Some(200L), // equal ts is inclusive (>= semantics)
      3L -> Some(300L), // 11:45 → 11:00 row
      4L -> None,       // nothing at-or-before 09:15 for key b
      5L -> Some(900L)))
  }

  test("left columns and row count survive the as-of attach") {
    val (left, right) = fixture()
    val out = AsOf.asofJoin(left, right, Seq("k"), "t", Seq("payload"))
    assert(out.count() === left.count())
    assert(out.columns.toSet === Set("k", "t", "ev", "payload"))
  }

  test("plan is a single window over a union — no join node") {
    val (left, right) = fixture()
    val plan = AsOf.asofJoin(left, right, Seq("k"), "t", Seq("payload"))
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("join"),
      s"as-of must not plan a join:\n$plan")
    assert(plan.contains("Window"), s"expected a running window:\n$plan")
  }

  test("chunked as-of equals the plain form on the fixture (all chunk widths)") {
    val (left, right) = fixture()
    val l = left.withColumn("t", unix_micros(col("t")))
    val r = right.withColumn("t", unix_micros(col("t")))
    val plain = AsOf.asofJoin(l, r, Seq("k"), "t", Seq("payload"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
    // widths spanning sub-gap to everything-in-one-chunk exercise carry-in,
    // within-chunk hits, and empty boundary chunks
    for (w <- Seq(60L * 1000000L, 3600L * 1000000L, 365L * 86400L * 1000000L)) {
      val chunked = AsOf.asofJoinChunked(l, r, Seq("k"), "t", Seq("payload"), w)
        .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) -1L else x.getLong(3))).toSet
      assert(chunked === plain, s"chunk width $w diverged")
    }
  }

  test("chunked as-of equals the plain form on sf0.001 events") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_type"), col("ts"), col("event_id"))
    val rates = ev.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("rts"))
      .agg(count(lit(1)).as("rate"))
      .select(col("event_type"), col("rts").as("ts"), col("rate"))
    def key(d: org.apache.spark.sql.DataFrame) =
      d.select(col("event_id"), col("rate"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val plain = key(AsOf.asofJoin(ev, rates, Seq("event_type"), "ts", Seq("rate")))
    val chunked = key(AsOf.asofJoinChunked(
      ev, rates, Seq("event_type"), "ts", Seq("rate"), 6L * 3600L * 1000000L))
    assert(chunked === plain)
  }

  test("q59 aggregate matches a literal per-event lookup at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val evId = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"), col("ts"))
    val ev = evId.select(col("event_type"), col("ts"))
    // reference computation: correlated lookup via a plain join + row_number
    // (partitioned by the unique event_id so duplicate (type, ts) events
    // can't collapse into one window cell)
    val rates = ev.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("rts"))
      .agg(count(lit(1)).as("rate"))
    val viaJoin = evId.join(rates, Seq("event_type"))
      .filter(col("rts") <= col("ts"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_id"))
          .orderBy(col("rts").desc)))
      .filter(col("rn") === 1)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("rate")).as("sum_rate"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaAsof = AsOf.q59AsofRates(spark, dir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(viaAsof === viaJoin)
  }
}
