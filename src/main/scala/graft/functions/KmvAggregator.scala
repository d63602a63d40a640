package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed K-MINIMUM-VALUES (bottom-k / theta) sketch aggregator: folds a
  * stream of 52-bit hash values into the sorted array of the k SMALLEST
  * DISTINCT hashes seen. The KMV sketch is the distinct-count sketch that
  * HLL cannot replace when SET OPERATIONS are needed — two KMV sketches
  * support intersection and union ESTIMATES (the theta-sketch method:
  * θ = min of the two kth-smallest hashes, count the surviving candidates
  * below θ, divide by the normalized θ), while HLL registers only merge
  * by union.
  *
  * Mergeability is the 100 TB story: the buffer is a ≤k-long sorted
  * array, `merge` is a sorted-set union truncated to k — associative and
  * commutative, so Spark partial-aggregates map-side and the exchange
  * carries one ≤k·8-byte array per group instead of the key set. Because
  * the state is "the k smallest distinct values of a pure hash", it is a
  * set-function of the input multiset: insertion order, partitioning,
  * micro-batching, and duplicate replays are all invisible — which is
  * what lets the q212 streaming twin pin BIT-IDENTICAL registers against
  * batch q208, and what lets a DuckDB oracle replay the exact state with
  * a row_number window over the same md5-derived hash family (q160's
  * portable-hash discipline).
  *
  * Estimator (emitted downstream, not here): if the sketch holds fewer
  * than k values it IS the distinct set (estimate = size, exact);
  * otherwise n̂ = (k−1)/U₍ₖ₎ with U₍ₖ₎ = kth smallest hash / 2⁵².
  */
class KmvAggregator(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] with Serializable {
  require(k > 0, "k must be positive")

  override def zero: Array[Long] = Array.empty[Long]

  /** Insert one hash: no-op when h is already present or h ≥ current max
    * of a full sketch; otherwise a sorted insert truncated to k. */
  override def reduce(buf: Array[Long], h: Long): Array[Long] =
    KmvAggregator.insert(buf, h, k)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    // sorted-set union truncated to k: one pass, never re-sorts
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
        else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      // equal heads: the branch above consumed a's copy; b's duplicate
      // falls to the dedupe guard on its own turn
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(reduction: Array[Long]): Array[Long] = reduction

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object KmvAggregator {
  /** Sorted-distinct bounded insert shared by reduce and tests. */
  private[graft] def insert(buf: Array[Long], h: Long, k: Int): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(buf, h)
    if (idx >= 0) return buf // already present
    if (buf.length >= k && h > buf(buf.length - 1)) return buf // above the cut
    val ins = -idx - 1
    val n = math.min(k, buf.length + 1)
    val out = new Array[Long](n)
    System.arraycopy(buf, 0, out, 0, ins)
    out(ins) = h
    val tail = n - ins - 1
    if (tail > 0) System.arraycopy(buf, ins, out, ins + 1, tail)
    out
  }
}
