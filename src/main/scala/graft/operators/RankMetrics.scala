package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Rank-statistic evaluation metrics computed distributively — the
  * model-quality surface a training pipeline runs over SCORED tables
  * (classifier outputs, quality scores) at corpus scale, where
  * MLlib's BinaryClassificationMetrics-style per-row ranking would
  * force a global sort of the full score column.
  *
  * The reference evaluates classifiers through
  * MulticlassClassificationEvaluator / BinaryClassificationEvaluator on
  * collected prediction frames (ref: src/main/scala/FunctionsSemiSupervised
  * .scala:135-152); this is the same AUC statistic re-derived as a pure
  * aggregation so it runs on a 10^12-row scored corpus without ranking
  * individual rows.
  */
object RankMetrics {

  /** q120: exact ROC-AUC per segment via the Mann–Whitney U statistic over
    * a BINNED-score histogram.
    *
    * AUC equals U/(P·N) with U the rank-sum statistic, and ties handled by
    * average ranks (the trapezoidal ROC value). The scale design:
    *
    *  - Scores are binned to integer centi-units (`round(value*100)`) at
    *    the scan — the declared semantics is "AUC of the quantized scorer",
    *    which makes the ranking domain BOUNDED (≤ ~49k bins here; any real
    *    calibrated scorer is 1e3-1e6 bins) instead of corpus-sized. The
    *    whole corpus collapses into one (segment, bin) histogram in a
    *    single map-side-combined shuffle; nothing downstream ever touches a
    *    row again.
    *  - The rank window runs over the HISTOGRAM (partition = segment,
    *    order = bin), so window state is O(bins), not O(rows) — the same
    *    bounded-histogram contract as q93/q112. Parallelism = #segments;
    *    each partition is histogram-sized, so a 4-segment window over ≤49k
    *    bins is driver-trivial and a 10k-segment production run spreads
    *    evenly.
    *  - All rank arithmetic stays INTEGER: with c rows and cp positives in
    *    a bin whose strictly-lower cumulative count is n_less, twice the
    *    positive rank-sum contribution is cp·(2·n_less + c + 1) — the 2×
    *    keeps the half-rank average exact. Sums run in DECIMAL(38,0)
    *    because 2R ≤ 2·P·N overflows BIGINT at ~1e12 positives × 1e13 rows
    *    (the 100 TB regime; same reasoning as q99's lift). The single
    *    double division happens once per segment at the very end.
    *
    * AUC = (2R − P(P+1)) / (2·P·(N−P)), rounded to 6dp. Label: purchase
    * events against all other types; segments: user_id mod 4 cohorts. */
  def q120RocAuc(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      pmod(col("user_id"), lit(4L)).cast("int").as("segment"),
      round(col("value") * lit(100)).cast("bigint").as("bin"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
    val hist = ev.groupBy(col("segment"), col("bin"))
      .agg(count(lit(1)).as("c"), sum(col("pos")).as("cp"))
    val below = Window.partitionBy(col("segment")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = hist.withColumn("n_less",
      coalesce(sum(col("c")).over(below), lit(0L)))
    val agg = ranked.groupBy(col("segment")).agg(
      // cp is cast to DECIMAL(38,0) BEFORE the multiply: cp·(2·n_less+c+1)
      // reaches ~2e25 at the design point (1e12 positives in a 1e13-row
      // segment), far past BIGINT — a long multiply would overflow first
      // and only then cast. (2·n_less + c + 1 itself stays ≤ ~2e13, safely
      // long.)
      sum(col("cp").cast("decimal(38,0)") *
        (col("n_less") * 2 + col("c") + 1)).as("r2"),
      sum(col("cp")).as("p"),
      sum(col("c")).as("n"))
    // same rule for the final products: p·(p+1) and 2·p·(n−p) overflow
    // BIGINT at ~1e12 positives (q99's lift lesson)
    val pd = col("p").cast("decimal(38,0)")
    val nd = (col("n") - col("p")).cast("decimal(38,0)")
    agg.select(
      col("segment"), col("p"), (col("n") - col("p")).as("n_neg"),
      round(
        (col("r2") - pd * (pd + 1)).cast("double") /
          (pd * nd * 2).cast("double"),
        6).as("auc"))
  }

  /** q131: CALIBRATION BINS (reliability table) — q120's companion: AUC
    * measures ranking, this measures whether the score VALUES mean what
    * they claim (a quality scorer that says "0.9" should be right ~90% of
    * the time). Ten equal-width score bins; per bin, the observed
    * positive rate in exact ppm (integer floor-division) plus the mean
    * score in DECIMAL. One map-side-combined groupBy over the scored
    * corpus — 10 output rows at any scale, nothing ranks anything.
    *
    * The bin index uses explicit floor() before the cast: Spark's
    * double→int cast truncates while DuckDB's ROUNDS, so the floor must
    * happen in IEEE double arithmetic (deterministic in both) with the
    * cast applied to an already-integral value. */
  def q131CalibrationBins(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      // clamped on BOTH ends: scores outside [0, 500) land in the edge
      // bins rather than minting a bin -1 / 10+ row the "ten-bin
      // reliability table" contract promises not to emit
      greatest(lit(0L), least(lit(9L), floor(col("value") / 50d))).as("bin"),
      col("value"),
      when(col("event_type") === "purchase", 1L).otherwise(0L).as("pos"))
    ev.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        sum(col("value").cast("decimal(18,2)")).as("vsum"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("n_pos * 1000000 DIV n").as("pos_ppm"),
        round(col("vsum").cast("double") / col("n"), 4).as("mean_score"))
  }
}
