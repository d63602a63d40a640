package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.EqualTo
import org.apache.spark.sql.catalyst.plans.LeftAnti
import org.apache.spark.sql.catalyst.plans.logical.{Except, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.monotonically_increasing_id

/** The bag-difference scalability fix (SURVEY §7 "what's hard").
  *
  * `exceptAll` plans as a sum-of-multiplicities aggregate + generate that
  * shuffles ENTIRE rows — including feature vectors — on all columns. At
  * 100 TB that shuffle is the cliff. When rows carry a unique id, bag
  * difference degenerates to per-row difference, which is a left ANTI join
  * on the id: the shuffle key is 8 bytes, and if the right side is small
  * (top-k remainders) it broadcasts.
  *
  * Two forms:
  *  - [[BagOps]]: explicit combinators (used by the self-labeling loops);
  *  - [[BagDifferenceToAntiJoin]]: a `Rule[LogicalPlan]` that rewrites
  *    `Except(isAll=true)` automatically when BOTH sides expose the marker
  *    id column (opt-in by construction: only [[BagOps.withUid]]-tagged
  *    plans match), injected via [[GraftExtensions]] — the engine's
  *    demonstration of extension-point optimization.
  */
object BagOps {

  val UidCol = "__uid"

  /** Tag rows with a unique id (per-partition monotonic — unique across the
    * dataset, stable once materialized/persisted). */
  def withUid(df: DataFrame): DataFrame =
    df.withColumn(UidCol, monotonically_increasing_id())

  /** a ∖ b by row id — the anti-join equivalent of `exceptAll` on uid-tagged
    * frames. */
  def exceptAllById(a: DataFrame, b: DataFrame): DataFrame =
    a.join(b.select(UidCol), Seq(UidCol), "left_anti")
}

/** Rewrites resolved `Except(left, right, isAll=true)` into
  * `left ANTI JOIN right ON left.__uid = right.__uid` when both sides carry
  * the marker column. Runs post-resolution (before the optimizer's own
  * RewriteExceptAll gets to expand it into the aggregate form).
  */
object BagDifferenceToAntiJoin extends Rule[LogicalPlan] {

  private def uidOf(p: LogicalPlan) =
    p.output.find(_.name == BagOps.UidCol)

  /** Double opt-in: the extension must be injected AND this conf enabled.
    * The rewrite changes exceptAll from value-based bag difference to
    * identity-based difference, which is only correct when both sides'
    * __uid values come from one shared tagging (e.g. a frame and its
    * filtered subset) — a property the planner cannot verify, so it must
    * not be on by default. */
  val ConfKey = "spark.graft.rewriteBagDifference"

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Except(left, right, true) if left.resolved && right.resolved &&
        conf.getConfString(ConfKey, "false") == "true" &&
        uidOf(left).isDefined && uidOf(right).isDefined &&
        // guard: a right side derived from the left shares exprIds; building
        // a Join with duplicate attribute ids is unsound — leave those to
        // Catalyst's own rewrite (the DataFrame-level BagOps.exceptAllById
        // path covers them, with analyzer-managed dedup)
        left.outputSet.intersect(right.outputSet).isEmpty =>
      Join(left, right, LeftAnti,
        Some(EqualTo(uidOf(left).get, uidOf(right).get)), JoinHint.NONE)
  }
}

/** Session extensions entry point:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPostHocResolutionRule(_ => BagDifferenceToAntiJoin)
  }
}
