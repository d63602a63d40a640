package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** q203: DETERMINISTIC HASH-LEVELED QUANTILE SKETCH — the mergeable
  * percentile monitor the sketch family lacked (HLL q160 counts
  * distincts, CMS q135 frequencies, Bloom q168 membership; nothing
  * answered "what is p90 of this column" with bounded, mergeable state).
  *
  * Shape: a KLL-style compactor cascade (Karnin/Lang/Liberty, "Optimal
  * quantile approximation in streams", FOCS'16) with the compaction COIN
  * replaced by a bit of the portable md5 hash (the q160/q168 family):
  * a distinct value v is retained at level l iff hex60(v) ≡ 0 mod 2^l,
  * so level-l survivors are a deterministic 2^-l sample of the DISTINCT
  * value domain (Gibbons' distinct sampling, VLDB'01) and each survivor
  * carries its EXACT multiset count. Replacing the coin with a hash is
  * what makes the sketch a pure function of the data MULTISET:
  *   - survivor sets are NESTED across levels (filter(l') ∘ filter(l) =
  *     filter(max)), so any escalation order lands on the same state;
  *   - the canonical level (min l ≥ l0 with ≤ k survivors) is MONOTONE
  *     in multiset inclusion, so partial buffers never over-escalate;
  *   - therefore merge is associative, commutative, and partitioning-
  *     independent BIT FOR BIT — not "within error", exactly. That is
  *     the property that lets the same state be a streaming standing
  *     aggregate (q205) and lets DuckDB REPLAY the sketch registers.
  * The price vs true KLL is error measured on the DISTINCT-value domain
  * (a hash sample of values, exact counts riding along) rather than the
  * multiset — the exact p50/p90 ride along in q203's output as the error
  * audit, the q160 discipline.
  *
  * Scale shape: buffers are ≤ cap (value, count) entries + one int —
  * that is what crosses the exchange (map-side partials merge, the key
  * set never moves); reduce is O(1) amortized, escalation O(cap) and
  * amortized out by the doubling levels. At 100 TB feed it the (value,
  * count) census via [[QuantileSketchAgg.reduceCensus]]-shaped
  * pre-aggregation if values repeat heavily; raw-row reduce is one md5
  * per row.
  */
object QuantileSketch {

  /** Buffer: current escalation level + exact counts of the surviving
    * distinct values. Kryo-encoded (mutable map; the buffer lives as an
    * object inside ObjectHashAggregate / the streaming state store and
    * serializes only at exchange/checkpoint boundaries). */
  final class Buf(var level: Int, val census: mutable.HashMap[Long, Long])
      extends Serializable

  /** Finished sketch registers + the estimator read off them. All
    * arithmetic is integer (cross-multiplied ceil comparisons) so the
    * DuckDB oracle replays it exactly. */
  final case class Out(level: Long, n_sample: Long, sample_vck: Long,
      n_scaled: Long, est_p50: Long, est_p90: Long)

  /** hex60 of the value's decimal string — the portable hash family
    * (first 15 hex digits of md5 as a 60-bit BIGINT), DuckDB twin:
    * CAST(concat('0x', substr(md5(CAST(v AS VARCHAR)), 1, 15)) AS BIGINT). */
  private[graft] def hex60(v: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(v.toString.getBytes("US-ASCII"))
    // first 15 hex digits = first 7 bytes + the high nibble of byte 8
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (h(i) & 0xffL); i += 1 }
    (acc << 4) | ((h(7) & 0xf0L) >>> 4)
  }

  final class QuantileSketchAgg(l0: Int = 2, cap: Int = 4096, k: Int = 48)
      extends Aggregator[Long, Buf, Out] {
    require(l0 >= 0 && k >= 1 && cap >= k)

    def zero: Buf = new Buf(l0, mutable.HashMap.empty)

    private def escalate(b: Buf): Unit =
      while (b.census.size > cap) {
        b.level += 1
        val m = 1L << b.level
        b.census.filterInPlace((v, _) => hex60(v) % m == 0)
      }

    def reduce(b: Buf, v: Long): Buf = {
      if (hex60(v) % (1L << b.level) == 0) {
        b.census.update(v, b.census.getOrElse(v, 0L) + 1L)
        escalate(b)
      }
      b
    }

    def merge(a: Buf, b: Buf): Buf = {
      val (hi, lo) = if (a.level >= b.level) (a, b) else (b, a)
      val m = 1L << hi.level
      lo.census.foreach { case (v, c) =>
        if (hex60(v) % m == 0)
          hi.census.update(v, hi.census.getOrElse(v, 0L) + c)
      }
      escalate(hi)
      hi
    }

    def finish(b: Buf): Out = {
      // canonical level: min l >= buffer level with <= k survivors (the
      // buffer's own escalations used `cap`, so the full-data survivor
      // count at any level below b.level already exceeded cap >= k and
      // the canonical pick can never sit below the buffer level)
      var l = b.level
      var s = b.census.toSeq
      while (s.size > k && l < 62) {
        l += 1
        val m = 1L << l
        s = s.filter { case (v, _) => hex60(v) % m == 0 }
      }
      val sorted = s.sortBy(_._1)
      val scale = 1L << l
      val nScaled = scale * sorted.iterator.map(_._2).sum
      val vck = sorted.iterator.map { case (v, c) => v * c }.sum %
        1073741824L
      // est(q) = smallest survivor whose scaled cumulative rank reaches
      // ceil(q * nScaled): integer cross-multiply, x >= ceil(a/100) <=>
      // 100x >= a
      def est(qPct: Long): Long = {
        var cum = 0L
        val it = sorted.iterator
        while (it.hasNext) {
          val (v, c) = it.next()
          cum += c
          if (scale * cum * 100L >= nScaled * qPct) return v
        }
        0L
      }
      Out(l.toLong, sorted.size.toLong, vck, nScaled, est(50L), est(90L))
    }

    def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    def outputEncoder: Encoder[Out] = Encoders.product[Out]
  }

  /** The default-parameter sketch as a DataFrame-usable aggregate. */
  def sketch(col: Column): Column =
    udaf(new QuantileSketchAgg(), Encoders.scalaLong).apply(col)
}
