package graft.plans

import org.apache.spark.sql.DataFrame

/** Narrow-scan widening (r22, guide §2.5 input skew): a query whose
  * per-row work is orders of magnitude heavier than the bytes that
  * carry it (codec encode/decode, corpus-length explodes) inherits the
  * SCAN's partitioning — and a small gate corpus is one parquet file,
  * i.e. one task at any core count. Spreading rows round-robin over the
  * session's parallelism costs one tiny exchange and buys full
  * parallelism; a scan already at least that wide (the production
  * shape) is returned untouched, so nothing local-only is baked in.
  */
object Spread {

  /** `df` repartitioned to the session's default parallelism iff its
    * current layout is narrower. */
  def toCores(df: DataFrame): DataFrame = {
    val parts = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < parts) df.repartition(parts) else df
  }
}
