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

  /** Salted equi-join: the fact side sprays each row into one of `salt`
    * sub-keys; the dim side is replicated `salt` times so every sub-key
    * finds its match. Result equals `fact.join(dim, key)` exactly; the
    * shuffle for any single key value is spread over `salt` reducers.
    * Use when `dim` is too big to broadcast but `fact`'s keys are skewed.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salt: Int = 16): DataFrame = {
    require(salt > 0, "salt must be positive")
    // deterministic spray: hash of the whole fact row modulo salt (spreads
    // duplicates of the hot key; no rand() so plans stay reproducible)
    val sprayed = fact.withColumn(SaltCol,
      pmod(hash(fact.columns.map(col).toSeq: _*), lit(salt)))
    val replicated = dim.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salt - 1))))
    sprayed.join(replicated, Seq(key, SaltCol)).drop(SaltCol)
  }

  /** Two-phase skewed aggregation: partial-aggregate on (key, salt), then
    * final-aggregate on key. For algebraic aggregates (sum/count/min/max)
    * the result is identical to a direct groupBy; the hot key's first-phase
    * work is spread over `salt` reducers. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salt: Int = 16): DataFrame = {
    val sprayed = df.withColumn(SaltCol,
      pmod(hash(df.columns.map(col).toSeq: _*), lit(salt)))
    sprayed
      .groupBy(col(key), col(SaltCol))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }
}
