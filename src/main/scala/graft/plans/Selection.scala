package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed top-k SELECTION (order-statistic cutoff) without the
  * single-point funnel of `orderBy(...).limit(k)`.
  *
  * `TakeOrderedAndProject` ships k whole rows through one task, which is
  * fine for k=100 dashboards and fatal for k ∝ |input| (the self-labeling
  * kBest criterion accepts a constant FRACTION of the unlabeled pool per
  * pass — at 100 TB that is millions of rows with vector payloads through
  * one point, then broadcast back out). Selection instead computes the
  * exact k-th order statistic by iterative histogram refinement — each
  * round is one map-side-combinable aggregation that collects at most a
  * few thousand (bucket, count, min, max) tuples to the driver, and the
  * candidate value interval shrinks ~8192× per round — then answers with a
  * PREDICATE. Acceptance becomes `filter(pred)`: fully partition-parallel,
  * no sort, no shuffle, no row ever leaves its executor.
  *
  * Determinism matches `orderBy(value DESC, id ASC).limit(k)`: ties at the
  * cutoff value are broken by smallest id (ids must be unique non-negative
  * longs, e.g. a pinned `monotonically_increasing_id`).
  */
object Selection {

  /** Histogram resolution per refinement round (driver collects ≤ B rows). */
  private val B = 8192

  /** Exact k-th largest value of `valueCol` (non-null, non-NaN doubles),
    * plus the exact count of rows STRICTLY above it. O(rounds) small
    * aggregations, rounds ≈ log_B(range/ulp) ≤ 3 in practice (discrete
    * value sets — e.g. tree-leaf probabilities — resolve in one). */
  def kthLargestDouble(df: DataFrame, valueCol: String, k: Long): (Double, Long) = {
    require(k > 0, s"k must be positive, got $k")
    val v = col(valueCol)
    val r0 = df.agg(min(v), max(v), count(v)).head
    require(!r0.isNullAt(0), "kthLargestDouble on empty input")
    var lo = r0.getDouble(0)
    var hi = r0.getDouble(1)
    // Spark orders NaN above every double, so max() surfaces any NaN in the
    // column — fail fast instead of returning a silently-wrong cutoff
    // (callers coalesce confidences with nanvl before selection)
    require(!hi.isNaN && !lo.isNaN,
      s"NaN values in $valueCol — nanvl/filter them before selection")
    require(r0.getLong(2) >= k, s"k=$k exceeds row count ${r0.getLong(2)}")
    var nAbove = 0L // rows known to be strictly above [lo, hi]
    var rounds = 0
    while (lo < hi) {
      rounds += 1
      if (rounds > 64) {
        // adversarial density fallback: the residual interval is by now a
        // handful of representable doubles — resolve by value histogram
        val values = df.filter(v >= lo && v <= hi)
          .groupBy(v.as("value")).agg(count(lit(1)).as("cnt"))
          .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(-_._1)
        var need = k - nAbove
        for ((value, cnt) <- values) {
          if (cnt >= need) return (value, nAbove)
          nAbove += cnt; need -= cnt
        }
        throw new IllegalStateException("histogram counts exhausted below k")
      }
      val w = hi - lo
      // hi-lo can overflow to +Infinity near the double extremes, which
      // would zero every bucket index and stall refinement — halve the
      // interval at the midpoint until the width is finite again
      val bucket =
        if (w.isInfinity)
          when(v < lit(lo / 2 + hi / 2), lit(0)).otherwise(lit(1))
        else least(lit(B - 1), greatest(lit(0),
          floor((v - lit(lo)) / lit(w) * B).cast("int")))
      val hist = df.filter(v >= lo && v <= hi)
        .groupBy(bucket.as("b"))
        .agg(count(lit(1)).as("cnt"), min(v).as("mn"), max(v).as("mx"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .sortBy(-_._1) // descending bucket id = descending value range
      var need = k - nAbove
      var descend = true
      for ((_, cnt, mn, mx) <- hist if descend) {
        if (cnt < need) { nAbove += cnt; need -= cnt }
        else if (mn == mx) return (mn, nAbove) // cutoff bucket is one value
        else { lo = mn; hi = mx; descend = false } // refine into the bucket
      }
      if (descend) throw new IllegalStateException("histogram lost rows")
    }
    (lo, nAbove) // interval collapsed: single value left
  }

  /** Exact m-th smallest value of a column of UNIQUE non-negative longs.
    * Integer interval refinement: ≤ 5 rounds (64 bits / 13 per round),
    * exact arithmetic via DIV. */
  def kthSmallestLong(df: DataFrame, idCol: String, m: Long): Long = {
    require(m > 0, s"m must be positive, got $m")
    val v = col(idCol)
    val r0 = df.agg(min(v), max(v), count(v)).head
    require(!r0.isNullAt(0), "kthSmallestLong on empty input")
    var lo = r0.getLong(0)
    var hi = r0.getLong(1)
    require(r0.getLong(2) >= m, s"m=$m exceeds row count ${r0.getLong(2)}")
    var need = m
    while (lo < hi) {
      val step = math.max((hi - lo) >>> 13, 1L) // ≤ 8193 buckets
      val bucket = expr(s"(`$idCol` - ${lo}L) DIV ${step}L")
      val hist = df.filter(v >= lo && v <= hi)
        .groupBy(bucket.as("b"))
        .agg(count(lit(1)).as("cnt"), min(v).as("mn"), max(v).as("mx"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1) // ascending bucket id = ascending value range
      var ascend = true
      for ((_, cnt, mn, mx) <- hist if ascend) {
        if (cnt < need) need -= cnt
        else if (mn == mx) return mn // unique ids: single row left
        else { lo = mn; hi = mx; ascend = false }
      }
      if (ascend) throw new IllegalStateException("histogram lost rows")
    }
    lo
  }

  /** Predicate keeping EXACTLY min(k, n) rows of `df`, the top k by
    * (`valueCol` DESC, `idCol` ASC) — the filter-based replacement for
    * `orderBy(desc(valueCol), idCol).limit(k)`. `df` should be cached (the
    * refinement makes a few passes) and `n` is its row count. */
  def topKPredicate(df: DataFrame, valueCol: String, idCol: String, k: Long,
      n: Long): Column = {
    if (k <= 0) lit(false)
    else if (k >= n) lit(true)
    else {
      val (c, nAbove) = kthLargestDouble(df, valueCol, k)
      val m = k - nAbove // ≥ 1 rows still needed from the ties at c
      val idCut = kthSmallestLong(df.filter(col(valueCol) === c), idCol, m)
      col(valueCol) > c || (col(valueCol) === c && col(idCol) <= idCut)
    }
  }
}
