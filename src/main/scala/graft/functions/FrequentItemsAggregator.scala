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
  * Scale: the exchange carries one ≤c-entry map per group; nothing in
  * the plan is proportional to the vocabulary. At 100 TB this is the
  * only way to find frequent tokens without shuffling the full token
  * census.
  */
class FrequentItemsAggregator(c: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]]
    with Serializable {
  require(c > 0, "capacity must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
    buf.get(item) match {
      case Some(n) => buf.updated(item, n + 1)
      case None if buf.size < c => buf.updated(item, 1L)
      case None =>
        // decrement-all step: every counter pays one; zeros drop out
        buf.iterator.flatMap { case (k, v) =>
          if (v > 1) Iterator((k, v - 1)) else Iterator.empty
        }.toMap
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val summed = b.foldLeft(a) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v)
    }
    if (summed.size <= c) summed
    else {
      // subtract the (c+1)-th largest counter from all, drop <= 0
      val cut = summed.valuesIterator.toArray.sortBy(-_).apply(c)
      summed.iterator.flatMap { case (k, v) =>
        if (v > cut) Iterator((k, v - cut)) else Iterator.empty
      }.toMap
    }
  }

  override def finish(reduction: Map[String, Long]): Map[String, Long] = reduction

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
