package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed BOTTOM-K aggregator over (key, id) pairs — the mergeable state
  * behind STREAMING Efraimidis–Spirakis weighted sampling (q218, the
  * standing-state twin of batch q175): A-ES reduces weighted sampling
  * without replacement to "keep the k smallest keys", and `the k
  * smallest distinct (key, id) pairs` is a KMV-shaped set-function of
  * the input multiset — insertion order, partitioning, micro-batching,
  * and at-least-once replays are all invisible (a replayed row carries
  * the IDENTICAL pair, because the A-ES key is a pure hash function of
  * the row). That is what lets the streaming twin pin BIT-IDENTICAL
  * samples against the batch TakeOrderedAndProject.
  *
  * Pairs order lexicographically by (key ASC, id ASC) — the id
  * tie-break is q175's engine-determinism contract (q31's ranking
  * rule), and including the id in the ordering makes equal-key rows
  * distinct pairs instead of silently-collapsed duplicates.
  *
  * Buffer: one sorted ≤k-long array carried as an opaque object
  * (kryo only at the exchange/state store); merge is a sorted-set
  * union truncated to k — associative, commutative, duplicate-blind.
  */
class AesBottomKAggregator(k: Int)
    extends Aggregator[(Double, Long), Array[(Double, Long)],
      Seq[(Double, Long)]]
    with Serializable {
  require(k > 0, "k must be positive")
  import AesBottomKAggregator.lt

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)],
      p: (Double, Long)): Array[(Double, Long)] =
    AesBottomKAggregator.insert(buf, p, k)

  override def merge(a: Array[(Double, Long)],
      b: Array[(Double, Long)]): Array[(Double, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[(Double, Long)](math.min(k, a.length + b.length))
    var i = 0; var j = 0; var n = 0
    while (n < k && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && !lt(b(j), a(i)))) {
          val x = a(i); i += 1; x
        } else { val x = b(j); j += 1; x }
      if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      // equal heads: a's copy is consumed first; b's duplicate falls to
      // the dedupe guard on its own turn (the KmvAggregator idiom)
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  override def finish(reduction: Array[(Double, Long)]): Seq[(Double, Long)] =
    reduction.toSeq

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.Encoders.kryo[Array[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Double, Long)]]()
}

object AesBottomKAggregator {
  /** (key, id) lexicographic strict order. */
  private[graft] def lt(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  /** Sorted-distinct bounded insert shared by reduce and tests. */
  private[graft] def insert(buf: Array[(Double, Long)], p: (Double, Long),
      k: Int): Array[(Double, Long)] = {
    if (buf.length >= k && lt(buf(buf.length - 1), p)) return buf // above cut
    // binary search for the insertion point in (key, id) order
    var lo = 0; var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(buf(mid), p)) lo = mid + 1 else hi = mid
    }
    if (lo < buf.length && buf(lo) == p) return buf // already present
    val n = math.min(k, buf.length + 1)
    val out = new Array[(Double, Long)](n)
    System.arraycopy(buf, 0, out, 0, math.min(lo, n))
    if (lo < n) {
      out(lo) = p
      val tail = n - lo - 1
      if (tail > 0) System.arraycopy(buf, lo, out, lo + 1, tail)
    }
    out
  }
}
