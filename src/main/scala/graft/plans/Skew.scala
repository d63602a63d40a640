package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed (the
  * classic 100 TB failure mode: one hot key pins one reducer while 999
  * executors idle). AQE's skew-join handles sort-merge cases adaptively;
  * salting is the explicit, planner-independent form, and the only option
  * when the skew is in an aggregation key.
  */
object Skew {

  private val SaltCol = "__salt"

  /** Spray each row into one of `salt` sub-keys by ROW POSITION, not row
    * content: `monotonically_increasing_id` is consecutive within each
    * partition, so `pmod(id, salt)` round-robins — identical duplicate rows
    * (exactly the hot case in a dedup-heavy pipeline) land on DIFFERENT
    * salts, where a content hash would pin them all to one reducer.
    * Deterministic given the input partitioning (no rand()). */
  private[graft] def spray(df: DataFrame, salt: Int): DataFrame = {
    require(salt > 0, "salt must be positive")
    df.withColumn(SaltCol, pmod(monotonically_increasing_id(), lit(salt.toLong))
      .cast("int"))
  }

  /** Salted equi-join: the fact side sprays each row into one of `salt`
    * sub-keys; the dim side is replicated `salt` times so every sub-key
    * finds its match. Result equals `fact.join(dim, key)` exactly; the
    * shuffle for any single key value is spread over `salt` reducers.
    * Use when `dim` is too big to broadcast but `fact`'s keys are skewed.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    val sprayed = spray(fact, salt)
    val replicated = dim.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    sprayed.join(replicated, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Cap LSH/blocking bucket fan-out before a self-join. A bucketed
    * candidate join is O(b²) per bucket; one degenerate bucket (constant
    * vectors, empty docs — signatures carry no information there) becomes a
    * straggler/OOM task at scale. This annotates each bucket member with a
    * sub-bucket `__sub` = secondary hash of `idCol` mod ceil(n/cap), so no
    * (bucket, __sub) group exceeds ~`cap` members; the self-join adds
    * `__sub` to its equi-keys and per-task fan-out is bounded by cap².
    *
    * Semantics: buckets at or under `cap` are untouched (single sub-bucket —
    * exact same pairs). Oversized buckets trade recall for boundedness:
    * pairs across sub-buckets are dropped, which is the banding math's own
    * assumption — a bucket that big means the signature failed to
    * discriminate, not that all b² pairs are genuine near-dup candidates.
    * Deterministic (hash, not rand), so results are reproducible.
    *
    * The RETURNED frame is materialized (`localCheckpoint`) — it is the
    * SINGLE materialization boundary for the self-join every caller feeds
    * it to: upstream (shingle explode → hash → agg) runs exactly once, and
    * both join sides read the cached ~16 B/row bucket table. The bucket
    * count is a window count over the same shuffle (one exchange, not an
    * aggregate + re-join). Callers must NOT re-checkpoint. On a real
    * cluster, prefer `spark.checkpoint()` with a checkpointDir for this
    * boundary — localCheckpoint blocks die with an executor; at local[n]
    * (one JVM) that distinction is moot. */
  def capBuckets(members: DataFrame, bucketCols: Seq[String], idCol: String,
      cap: Int = 1000): DataFrame = {
    require(cap > 0, "cap must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(bucketCols.map(col): _*)
    members
      .withColumn("__sub",
        pmod(hash(col(idCol)),
          ceil(count(lit(1)).over(w) / lit(cap)).cast("int")))
      .localCheckpoint()
  }

  /** Two-phase skewed aggregation: partial-aggregate on (key, salt), then
    * final-aggregate on key. For algebraic aggregates (sum/count/min/max)
    * the result is identical to a direct groupBy; the hot key's first-phase
    * work is spread over `salt` reducers. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salt: Int = 16): DataFrame = {
    val sprayed = spray(df, salt)
    sprayed
      .groupBy(col(key), col(SaltCol))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }
}
