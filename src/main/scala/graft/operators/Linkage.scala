package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Blocked fuzzy-match record linkage — the entity-resolution primitive a
  * data-curation pipeline runs before merging corpora from overlapping
  * crawls: candidate pairs are generated ONLY within a blocking key (never
  * all-pairs), then scored with an edit-distance predicate.
  */
object Linkage {

  /** q107: blocked levenshtein self-join over customer names.
    *
    * Blocking is what makes fuzzy matching survive 100 TB: the self-join is
    * an equi-join on the block key (one hash-partitioned exchange of
    * 20-byte rows — name + key), so candidate pairs are Σ_b |b|² over
    * blocks instead of N². Hot blocks go through
    * [[graft.plans.Skew.capBuckets]] exactly like the q37 embedding
    * near-dup join: over `blockCap` members, a block is hash-split into
    * sub-blocks, trading bounded recall for bounded fan-out (inactive at
    * the gate's scale factors — every nation block is far below the cap —
    * so the oracle models the plain block join; on degenerate data the
    * engine's bounded behavior diverges intentionally; same contract as
    * q24/q37, see the oracle note there). The levenshtein predicate is
    * Catalyst's codegen'd edit distance — identical DP definition in
    * DuckDB, so pair counts are oracle-exact. Result is the per-block pair
    * count plus a min-pair witness (ka·10⁵+kb) pinning membership, not the
    * pair dump.
    */
  def q107FuzzyBlockedJoin(spark: SparkSession, dir: String,
      maxDist: Int = 2, blockCap: Int = 10000): DataFrame = {
    val c = Tables.load(spark, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_name").as("nm"),
        col("c_nationkey").cast("bigint").as("nation"))
    val blocked = graft.plans.Skew.capBuckets(c, Seq("nation"), "k", blockCap)
    val a = blocked.as("a")
    val b = blocked.as("b")
    a.join(b,
        col("a.nation") === col("b.nation") &&
        col("a.__sub") === col("b.__sub") &&
        col("a.k") < col("b.k"))
      .filter(levenshtein(col("a.nm"), col("b.nm")) <= maxDist)
      .groupBy(col("a.nation").as("nation"))
      .agg(count(lit(1)).as("n_pairs"),
        min(col("a.k") * 100000 + col("b.k")).as("first_pair"))
  }
}
