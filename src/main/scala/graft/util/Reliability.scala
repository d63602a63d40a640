package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage-cut policy for iterative loops (q146 PageRank, q220 BPE
  * trainer). `localCheckpoint` is the right single-node cut — eager, no
  * columnar round-trip, no external storage — but its blocks are
  * UNREPLICATED and its lineage is truncated, so losing one executor
  * mid-loop kills the query unrecoverably (the VERIFY entry-tail WARN).
  * At cluster scale the standard remedy is a RELIABLE checkpoint into a
  * fault-tolerant checkpoint dir. The policy pivots on exactly the knob
  * that distinguishes the two deployments: a session that configured
  * `sparkContext.setCheckpointDir` (production clusters point it at
  * HDFS/object storage) gets reliable checkpoints; a session without one
  * (the local default — there is no replicated filesystem to write to)
  * keeps localCheckpoint. Values are identical either way: both cuts
  * materialize the same rows, only the storage and recovery story
  * differ. Bench comparability: the driver's sessions set no checkpoint
  * dir, so gated timings keep the localCheckpoint fast path.
  */
object Reliability {

  /** Materialize `df` and truncate its lineage, reliably when the
    * session has a checkpoint dir, locally otherwise. */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
}
