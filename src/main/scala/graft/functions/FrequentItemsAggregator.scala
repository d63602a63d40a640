package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed MISRA–GRIES frequent-items summary: at most `c` (item, counter)
  * pairs, maintained so that every item with true frequency
  * > n/(c+1) is GUARANTEED to survive in the summary, and every kept
  * counter undercounts its item by at most (n − n̂)/(c+1) (n̂ = Σ kept
  * counters). This is the candidate-generation half of the standard
  * two-pass distributed heavy-hitters algorithm: pass 1 folds the
  * corpus into one ≤c-entry summary (bounded state, map-side
  * combinable), pass 2 exactly recounts ONLY the ≤c candidates with a
  * broadcast semi-join — so the final output is a deterministic pure
  * function of the data even though the intermediate summary depends
  * on merge order. That recount is what makes q210 oracle-checkable:
  * the theory guarantees candidates ⊇ true heavy hitters for ANY
  * partitioning/merge order (pinned by a scalacheck property in
  * SketchSetOpsSpec), and the exact recount then matches DuckDB's plain
  * GROUP BY + HAVING.
  *
  * merge() is the Agarwal et al. (PODS'12, "Mergeable Summaries")
  * rule: sum counters pairwise, then if more than c items survive,
  * subtract the (c+1)-th largest counter from every item and drop the
  * non-positive ones — associative enough to preserve the error bound
  * under arbitrary merge trees, which is exactly the property a Spark
  * partial aggregate needs.
  *
  * The buffer is a MUTABLE java.util.HashMap carried as an opaque
  * object (kryo-encoded only at the exchange): the per-row reduce —
  * including the decrement-all miss path, the hottest loop once a
  * long-tail vocabulary fills the summary — mutates in place instead of
  * rebuilding a c-entry immutable map per event. Semantics are
  * unchanged bit for bit (same counters, same drop rule), pinned by the
  * SketchSetOpsSpec property.
  *
  * Scale: the exchange carries one ≤c-entry map per group; nothing in
  * the plan is proportional to the vocabulary. At 100 TB this is the
  * only way to find frequent tokens without shuffling the full token
  * census.
  */
class FrequentItemsAggregator(c: Int)
    extends Aggregator[String, java.util.HashMap[String, Long],
      Map[String, Long]]
    with Serializable {
  require(c > 0, "capacity must be positive")

  override def zero: java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](c * 2)

  override def reduce(buf: java.util.HashMap[String, Long],
      item: String): java.util.HashMap[String, Long] = {
    val n = buf.getOrDefault(item, 0L) // counters are >= 1, so 0 = absent
    if (n > 0) buf.put(item, n + 1)
    else if (buf.size < c) buf.put(item, 1L)
    else {
      // decrement-all step: every counter pays one; zeros drop out.
      // In-place via the entry iterator — no per-miss map rebuild.
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue
        if (v > 1) e.setValue(v - 1) else it.remove()
      }
    }
    buf
  }

  override def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val bi = b.entrySet().iterator()
    while (bi.hasNext) {
      val e = bi.next()
      a.merge(e.getKey, e.getValue, (x, y) => x + y)
    }
    if (a.size > c) {
      // subtract the (c+1)-th largest counter from all, drop <= 0
      val vals = new Array[Long](a.size)
      var i = 0
      val vi = a.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - 1 - c) // (c+1)-th largest
      val it = a.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val v = e.getValue
        if (v > cut) e.setValue(v - cut) else it.remove()
      }
    }
    a
  }

  override def finish(reduction: java.util.HashMap[String, Long])
      : Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    reduction.asScala.toMap
  }

  override def bufferEncoder: Encoder[java.util.HashMap[String, Long]] =
    org.apache.spark.sql.Encoders.kryo[java.util.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
