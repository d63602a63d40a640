package graft.util

import org.apache.spark.sql.SparkSession

/** The one SparkSession builder every driver main (Verify, Bench,
  * TimeQueries) shares. These entry points must run the SAME engine —
  * a conf added to one and forgotten in another makes the dev loop time
  * or verify a differently-planned engine than the gate runs (AQE,
  * extensions, shuffle partitioning, the NTZ/UTC timestamp contract all
  * change plans). Session-wide invariants live here once; call sites add
  * only genuinely per-tool settings.
  */
object DriverSession {
  def build(cpus: String): SparkSession =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // events.ts shipped as TIMESTAMP(NANOS) in early datagen runs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // NTZ→LTZ ts normalization is 1:1 with the DuckDB oracle ONLY
      // under UTC (Tables.normalizeEventTs asserts this)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // the engine's extension point (BagDifferenceToAntiJoin)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
}
