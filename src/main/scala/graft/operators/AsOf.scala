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

  /** [[asofJoin]] for LOW-CARDINALITY keys: the plain form sorts each key's
    * whole timeline in one task, so few keys (q59's five event types) means
    * few tasks no matter how many executors exist. This variant
    * sub-partitions time into `chunkUs`-wide chunks and restores
    * parallelism with a two-level prefix scan:
    *
    *  1. the running window runs per (key, chunk) — parallel in #keys ×
    *     #chunks tasks;
    *  2. each (key, chunk)'s LAST right payload (one tiny row per pair) is
    *     as-of-joined — recursively, via [[asofJoin]] on the chunk index,
    *     shifted one chunk so only strictly-earlier chunks carry in — onto
    *     the chunks each left row lives in;
    *  3. rows whose within-chunk scan found nothing take the carried-in
    *     boundary payload.
    *
    * Same contract as [[asofJoin]]; chunk width trades task granularity
    * against boundary-table size (keys × chunks rows). */
  def asofJoinChunked(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payloadCols: Seq[String], chunkUs: Long): DataFrame = {
    require(chunkUs > 0, "chunk width must be positive")
    // chunk id over epoch MICROS for timestamps, raw value otherwise (the
    // double quotient is exact enough: epoch-µs longs are < 2^53 and the
    // quotient sits several ulps from any wrong integer, so floor can't
    // misassign a boundary)
    val tsNum: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      left.schema(tsCol).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros _
        case _ => _.cast("long")
      }
    val chunk = (c: org.apache.spark.sql.Column) =>
      floor(tsNum(c).cast("double") / lit(chunkUs.toDouble)).cast("long")
    val lc = left.withColumn("__chunk", chunk(col(tsCol)))
    val rc = right.withColumn("__chunk", chunk(col(tsCol)))
    // (1) within-chunk running attach, parallel over (key, chunk)
    val within = asofJoin(lc, rc, keys :+ "__chunk", tsCol, payloadCols)
      .withColumnRenamed("__chunk", "__lchunk")
    val withinRenamed = payloadCols.foldLeft(within)(
      (d, c) => d.withColumnRenamed(c, s"__in_$c"))
    // (2) per-(key, chunk) boundary payloads: the chunk's latest right row
    val bounds = rc.groupBy((keys.map(col) :+ col("__chunk")): _*)
      .agg(max_by(struct(payloadCols.map(col): _*), col(tsCol)).as("__p"))
      // valid from the NEXT chunk on — carry-in must be strictly earlier
      .select(keys.map(col) ++ Seq((col("__chunk") + 1).as("__chunk")) ++
        payloadCols.map(c => col(s"__p.$c").as(c)): _*)
    val leftChunks = lc.select(keys.map(col) :+ col("__chunk"): _*).distinct()
    val carry = asofJoin(leftChunks, bounds, keys, "__chunk", payloadCols)
      .withColumnRenamed("__chunk", "__lchunk")
    val carryRenamed = payloadCols.foldLeft(carry)(
      (d, c) => d.withColumnRenamed(c, s"__carry_$c"))
    // (3) stitch: within-chunk hit wins, else the carried boundary payload
    withinRenamed.join(carryRenamed, keys :+ "__lchunk")
      .select(keys.map(col) ++ Seq(col(tsCol)) ++
        left.columns.toSeq.filterNot(c => keys.contains(c) || c == tsCol).map(col) ++
        payloadCols.map(c =>
          coalesce(col(s"__in_$c"), col(s"__carry_$c")).as(c)): _*)
  }

  /** Driver query (q59): every event joined as-of to the per-type hourly
    * "rate checkpoint" feed derived from the same table (rate = that hour's
    * event count for the type — deterministic integers, so the aggregate is
    * oracle-exact). Emits one row per event_type with the count of matched
    * events and the sum of attached rates; every event matches its own
    * hour's checkpoint, so the inner/left distinction can't bite.
    *
    * Uses the CHUNKED form: event_type has five values, exactly the
    * low-cardinality regime where the plain window would collapse to five
    * tasks at scale; day-wide chunks keep #keys × #days tasks in flight. */
  def q59AsofRates(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"), col("ts"))
    val rates = ev
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("rts"))
      .agg(count(lit(1)).as("rate"))
      .select(col("event_type"), col("rts").as("ts"), col("rate"))
    asofJoinChunked(ev, rates, Seq("event_type"), "ts", Seq("rate"),
        chunkUs = 24L * 3600L * 1000000L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("rate")).as("sum_rate"))
  }
}
