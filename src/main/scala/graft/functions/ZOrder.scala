package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton) curve helpers — the multi-dimensional clustering key
  * behind `OPTIMIZE ZORDER BY`-style layout maintenance: interleaving the
  * bits of two normalized dimensions makes rows that are close in BOTH
  * dimensions close on the curve, so range-partitioning + min/max file
  * stats can skip files for 2-D box predicates where a 1-D sort can only
  * prune its own leading column. Pure bitwise Catalyst expressions —
  * row-local, codegen'd, no UDF, no shuffle.
  *
  * (Public technique: Morton 1966; the layout maintenance pattern is the
  * Delta/Iceberg OPTIMIZE ZORDER staple. No reference counterpart — the
  * reference has no storage layout layer at all.)
  */
object ZOrder {

  /** Scale a value into [0, 65535] given its column min/max — the rank
    * normalization that makes bit-interleaving meaningful for dense OR
    * sparse key ranges (raw dense keys never reach the high bits, so
    * un-normalized interleaving degenerates to bucket 0). Integer-exact:
    * (x−min)·65535 DIV max(1, max−min), everything BIGINT. */
  def scale16(x: Column, minX: Column, maxX: Column): Column = {
    val num = (x - minX).cast("long") * lit(65535L)
    val den = greatest(lit(1L), (maxX - minX).cast("long"))
    // true integral divide (Spark's `div`): a double-division detour is
    // exact only while the numerator fits in 2^53, i.e. key ranges under
    // ~1.4e11 — a silent off-by-one trap at exactly the scale this
    // helper is sold for
    call_function("div", num, den)
  }

  /** Interleave two 16-bit values into the 32-bit Morton code:
    * bit 2i = x's bit i, bit 2i+1 = y's bit i. A fold of 32 shift/mask
    * terms — constant-folded into one codegen'd expression. */
  def interleave16(x16: Column, y16: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(x16, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(
          shiftleft(shiftright(y16, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
}
