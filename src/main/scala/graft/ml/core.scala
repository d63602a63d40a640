package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** NaN-sentinel semantics shared by all semi-supervised operators.
  *
  * The reference encodes "unlabeled" as `label * Double.NaN` in a mask column
  * and detects it with `isNaN` (ref: UnlabeledTransformer.scala:44,
  * SelfTraining.scala:129). NaN ≠ NULL: `isnan` is false for null, and
  * `na.drop` would not remove NaN. The engine preserves that encoding but
  * derives the labeled complement with a negated predicate instead of the
  * reference's `exceptAll` (ref: SelfTraining.scala:130) — identical rows,
  * zero shuffle (exceptAll hashes entire rows incl. the features vector,
  * the 100 TB scalability cliff called out in SURVEY §7).
  */
/** Unique-per-fit plan salt. DataFrame.persist registers in the shared
  * CacheManager keyed by the CANONICALIZED plan — two concurrent grid
  * cells over the same staged input build canonically-equal intermediate
  * frames, silently share one cache entry, and the first cell to
  * unpersist deletes blocks the other is still reading mid-job
  * ("Block rdd_N does not exist", r16 bench runs 5-6, q141). An inert
  * literal column with a process-unique value makes every fit's plan
  * tree distinct, so estimator-internal caching is private by
  * construction. The column carries no data dependence — downstream
  * projections never read it — so results are bit-identical. */
private[graft] object FitNonce {
  private val ctr = new java.util.concurrent.atomic.AtomicLong(0L)
  def column(): Column = lit(ctr.incrementAndGet()).as("__fit_nonce")
}

object Sentinels {
  def isUnlabeled(c: Column): Column = isnan(c)
  def isLabeled(c: Column): Column = !isnan(c)

  /** NaN-out a label column the same way the reference does (multiplication
    * propagates NaN and keeps the column DoubleType). */
  def unlabel(label: Column): Column = label * lit(Double.NaN)

  def splitByMask(df: DataFrame, maskCol: String): (DataFrame, DataFrame) =
    (df.filter(isLabeled(col(maskCol))), df.filter(isUnlabeled(col(maskCol))))
}

/** Driver-side concurrency for INDEPENDENT Spark actions. A Spark driver
  * schedules jobs from any thread; a sequential `fit(a); fit(b)` of two
  * independent models leaves the cluster half-idle while each job's final
  * stages taper. Running them from two threads overlaps the jobs — the
  * standard multi-tenant scheduler shape — without touching result
  * semantics (each fit is deterministic given its data and seed).
  */
object Par {
  // One shared pool for `both`, not a fresh 2-thread pool per call: `both`
  // runs inside fit loops (every co-training iteration), where per-call
  // pool construction is pure thread churn. Cached + daemon: idle threads
  // are reaped after 60 s, nested `both` calls can't deadlock on a fixed
  // bound, and the pool never blocks JVM exit.
  private lazy val sharedPool = {
    val n = new java.util.concurrent.atomic.AtomicInteger()
    java.util.concurrent.Executors.newCachedThreadPool { (r: Runnable) =>
      val t = new Thread(r, s"graft-par-${n.incrementAndGet()}")
      t.setDaemon(true)
      t
    }
  }

  /** Evaluate both thunks concurrently, return both results. Both futures
    * are awaited before any failure is rethrown: if `a`'s fit fails while
    * `b`'s is mid-flight, rethrowing immediately would leave `b` running
    * detached on the shared pool — ownerless Spark jobs still consuming
    * cluster resources after the caller has unwound. (Deliberate
    * trade-off: a sibling that HANGS now delays the first failure's
    * propagation — acceptable because a wedged Spark job means the cluster
    * is already sick, while a timeout here would kill legitimately long
    * fits.) */
  def both[A, B](a: => A, b: => B): (A, B) = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    import scala.util.{Failure, Try}
    val ec = ExecutionContext.fromExecutor(sharedPool)
    val fa = Future(a)(ec); val fb = Future(b)(ec)
    val ra = Try(Await.result(fa, Duration.Inf))
    val rb = Try(Await.result(fb, Duration.Inf))
    (ra, rb) match {
      // both failed: the second failure must not be silently discarded —
      // when e.g. both co-training view fits die for different reasons,
      // the root cause may be in either stack
      case (Failure(ea), Failure(eb)) =>
        if (eb ne ea) ea.addSuppressed(eb)
        throw ea
      case _ => (ra.get, rb.get)
    }
  }

  /** Concurrent map preserving order; one thread per element (callers pass
    * small rosters, not data-sized collections). */
  def mapAll[A, B](in: Seq[A])(f: A => B): Seq[B] =
    mapBounded(in, math.max(in.size, 1))(f)

  /** Concurrent map preserving order with at most `threads` in flight —
    * for grids whose cells each launch their own Spark jobs, where
    * unbounded fan-out would oversubscribe the scheduler. Like [[both]],
    * EVERY task is awaited before the first failure rethrows (shutdown()
    * does not cancel started tasks, so bailing early would leave sibling
    * cells running ownerless). */
  def mapBounded[A, B](in: Seq[A], threads: Int)(f: A => B): Seq[B] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    import scala.util.Try
    require(threads > 0, "threads must be positive")
    val ec = ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(threads))
    try {
      val fs = in.map(x => Future(f(x))(ec))
      val rs = fs.map(fu => Try(Await.result(fu, Duration.Inf)))
      // rethrow the FIRST failure with every later sibling failure
      // attached as suppressed — multiple failing grid cells otherwise
      // lose all but one diagnosis
      val failures = rs.collect { case scala.util.Failure(e) => e }
      failures.headOption.foreach { first =>
        failures.drop(1).foreach(e => if (e ne first) first.addSuppressed(e))
        throw first
      }
      rs.map(_.get)
    } finally ec.shutdown()
  }
}

/** Immutable run summary — replaces the reference's mutable
  * `SemiSupervisedDataResults` side-channel (ref:
  * SemiSupervisedDataResults.scala:3-11; hazard noted in SURVEY §3.3: one
  * shared instance mutated across folds/configs is only correct under
  * strictly sequential execution). An immutable value returned with the
  * model makes grid cells independently parallelizable.
  */
case class SemiSupervisedSummary(
    labeledInitial: Long,
    unlabeledInitial: Long,
    labeledFinal: Long,
    unlabeledFinal: Long,
    iterations: Int) {
  def percentageLabeledFinal: Double =
    if (labeledInitial + unlabeledInitial == 0) 0.0
    else labeledFinal.toDouble / (labeledInitial + unlabeledInitial)
}
