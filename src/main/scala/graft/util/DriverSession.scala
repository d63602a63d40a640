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
      // codegen cache thrashes under 148 distinct queries (several
      // generated classes each), and the ML grids alone emit HUNDREDS of
      // distinct sources per run (fold indices / seeds / cell params are
      // baked into the generated code as literals), so even r14's 4000
      // entries evicted across a full-suite pass — measured: q84 steady
      // 15.4 s, 22.6 s when re-run after a 25-query mix at 4000 entries,
      // 13.6 s after the same mix at 40000 (the whole gap was Janino
      // recompilation inside the timed sample). The bound costs nothing
      // until entries actually exist; at this suite's footprint the cache
      // stays well under driver heap headroom.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "40000"))
      // the engine's extension point (BagDifferenceToAntiJoin)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
}
