package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-sketch aggregator (SURVEY §2.10 U2 — the engine's UDAF
  * surface): folds a stream of shingles into a `numHashes`-wide signature of
  * elementwise minima. Buffers are fixed-size int arrays, merge is
  * elementwise min — associative + commutative, so Spark can partial-
  * aggregate map-side and the shuffle carries one small array per group.
  *
  * Usage:
  * {{{
  *   ds.groupByKey(_.docId)
  *     .agg(new MinHashAggregator(32).toColumn)
  * }}}
  *
  * The hash family is seeded MurmurHash3 over the shingle string — self-
  * consistent (sketches from different partitions/merges agree), though not
  * the same family as the SQL `hash()` used by
  * [[graft.operators.Dedup.minhashSignatures]]; the two paths produce
  * equally valid, mutually incompatible sketches.
  */
class MinHashAggregator(numHashes: Int)
    extends Aggregator[String, Array[Int], Array[Int]] with Serializable {

  override def zero: Array[Int] = Array.fill(numHashes)(Int.MaxValue)

  override def reduce(buf: Array[Int], shingle: String): Array[Int] = {
    var i = 0
    while (i < numHashes) {
      val h = scala.util.hashing.MurmurHash3.stringHash(shingle, i)
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(reduction: Array[Int]): Array[Int] = reduction

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
}

object MinHashAggregator {
  /** Estimated Jaccard similarity of two sketches: fraction of agreeing
    * slots. */
  def estimatedJaccard(a: Array[Int], b: Array[Int]): Double = {
    require(a.length == b.length, "sketch widths differ")
    var same = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }
}
