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
      // static conf, must be set at session build: the default 100-entry
      // codegen cache thrashes under 140 distinct queries (several
      // generated classes each), so by the bench's retime pass every
      // entry has been evicted and each retimed query pays full Janino
      // recompilation + fresh JIT inside its timing. Sized to hold the
      // whole suite's generated classes once.
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      // the engine's extension point (BagDifferenceToAntiJoin)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
}
