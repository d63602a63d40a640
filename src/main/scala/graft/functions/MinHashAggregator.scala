package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.unsafe.types.UTF8String

/** Typed MinHash-sketch aggregator (SURVEY §2.10 U2 — the engine's UDAF
  * surface): folds a stream of shingles into a `numHashes`-wide signature of
  * elementwise minima. Buffers are fixed-size long arrays, merge is
  * elementwise min — associative + commutative, so Spark can partial-
  * aggregate map-side and the shuffle carries one small array per group.
  *
  * Usage:
  * {{{
  *   ds.groupByKey(_.docId)
  *     .agg(new MinHashAggregator(32).toColumn)
  * }}}
  *
  * The hash family is EXACTLY [[graft.operators.Dedup.minhashSignatures]]'s:
  * one [[TextFunctions.sketch60]] base hash per shingle (xxhash64+mask in
  * production, hex60 under oracle mode — captured at construction), folded
  * to 30 bits, then `numHashes` affine variants mod 2³¹−1. Sketches built
  * through either path are therefore interchangeable: a UDAF-built sketch
  * joins, compares, and bands against operator-built signatures
  * value-for-value (equivalence is pinned in ScaleOpsSpec).
  */
class MinHashAggregator(numHashes: Int,
    oracleFamily: Boolean = TextFunctions.oracleMode)
    extends Aggregator[String, Array[Long], Array[Long]] with Serializable {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val base = MinHashAggregator.baseHash(shingle, oracleFamily)
    var i = 0
    while (i < numHashes) {
      val h = (base * (2L * i + 1) + (7919L * i + 1)) % MinHashAggregator.P
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(reduction: Array[Long]): Array[Long] = reduction

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

object MinHashAggregator {

  /** Mersenne prime 2³¹−1 — the affine-variant modulus shared with
    * [[graft.operators.Dedup.minhashSignatures]]. */
  val P = 2147483647L

  private val Mask60 = (1L << 60) - 1

  /** JVM-side twin of `sketch60(shingle) % 2^30` — the per-shingle base
    * both MinHash paths fold affine variants over. */
  def baseHash(shingle: String, oracleFamily: Boolean): Long = {
    val h60 =
      if (oracleFamily) TextFunctions.hex60Local(shingle)
      else {
        val u = UTF8String.fromString(shingle)
        XXH64.hashUnsafeBytes(
          u.getBaseObject, u.getBaseOffset, u.numBytes, 42L) & Mask60
      }
    h60 % (1L << 30)
  }

  /** Estimated Jaccard similarity of two sketches: fraction of agreeing
    * slots. */
  def estimatedJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length, "sketch widths differ")
    var same = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toDouble / a.length
  }
}
