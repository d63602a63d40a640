package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** As-of (temporal) join: attach to each fact row the payload of the most
  * recent dimension row at-or-before its timestamp, per key — the canonical
  * "trades ⋈ latest quote" / "event ⋈ latest feature snapshot" operator of a
  * training-data pipeline. Absent from both the reference (whose flows are
  * purely batch-relational) and Spark's built-in join types.
  *
  * Scale design: NOT a range join (whose planner fallback is a broadcast
  * nested loop) and NOT a per-key collect. Both sides are tagged and
  * UNIONED, then a single `last(payload, ignoreNulls)` running window over
  * (key, ts) carries the latest dimension payload forward onto every fact
  * row: ONE shuffle on the key, no join node at all, and per-key state in
  * the window is O(payload) regardless of how many dimension versions
  * precede a fact row. The same shape handles a 1000-executor corpus — the
  * exchange partitions by key, and each task streams its keys in ts order.
  */
object AsOf {

  /** For each `left` row, attach `payloadCols` from the latest `right` row
    * with `right.tsCol <= left.tsCol` and equal `keys` (null payload when no
    * such row exists). Ties at equal ts resolve to the right row (inclusive
    * as-of, DuckDB/Pandas `>=` semantics). `right` rows must be unique per
    * (keys, tsCol) — multiple versions at one instant have no defined
    * "latest".
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val leftRest = left.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol)
    // aligned union schema: keys ++ ts ++ __src ++ payload ++ left-rest;
    // each side null-pads the other side's columns
    val lAligned = left.select(
      keys.map(col) ++ Seq(col(tsCol), lit(1).as("__src")) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        leftRest.map(col): _*)
    val rAligned = right.select(
      keys.map(col) ++ Seq(col(tsCol), lit(0).as("__src")) ++
        payloadCols.map(col) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    // __src orders the right row FIRST at equal ts, making the as-of
    // inclusive; the frame ends at the current row so later rows never leak
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lAligned.unionByName(rAligned)
      .select(
        (keys.map(col) :+ col(tsCol) :+ col("__src")) ++ leftRest.map(col) ++
          payloadCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__src") === 1)
      .drop("__src")
  }

  /** Driver query (q59): every event joined as-of to the per-type hourly
    * "rate checkpoint" feed derived from the same table (rate = that hour's
    * event count for the type — deterministic integers, so the aggregate is
    * oracle-exact). Emits one row per event_type with the count of matched
    * events and the sum of attached rates; every event matches its own
    * hour's checkpoint, so the inner/left distinction can't bite. */
  def q59AsofRates(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("ts"))
    val rates = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("rts"))
      .agg(count(lit(1)).as("rate"))
      .select(col("event_type"), col("rts").as("ts"), col("rate"))
    asofJoin(ev, rates, Seq("event_type"), "ts", Seq("rate"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("rate")).as("sum_rate"))
  }
}
