package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query profiler: times named SparkEntry queries cold and warm under
  * Bench-like session settings, optionally in both sketch hash families.
  *
  * {{{
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.ProfileQuery q24_dedup_minhash q49_neardup_pipeline"
  *   # add --both-families to also time the hex60 oracle family
  * }}}
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val bothFamilies = args.contains("--both-families")
    val names = args.filterNot(_.startsWith("--")).toSeq
    require(names.nonEmpty, "usage: ProfileQuery [--both-families] <query>...")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100).count()
    graft.functions.VectorMax.register(spark)
    val modes = if (bothFamilies) Seq(false, true) else Seq(false)
    for (name <- names; mode <- modes) {
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query '$name' (see SparkEntry.queries)"))
      graft.functions.TextFunctions.withOracleMode(mode) {
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        val family = if (mode) "hex60" else "xxhash64"
        println(f"PROFILE $name%-28s $family%-8s cold=${runs.head}%6.2f warm=${runs.last}%6.2f")
      }
    }
    spark.stop()
  }
}
