package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch profiler for q36 (rolling fingerprints): times the query at the
  * given SF in both sketch-hash families, warm (second run reported).
  */
object Profile36 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100).count()

    def time(label: String): Unit = {
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.operators.TextAnalysis.qRollingFingerprint(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE36 $label cold=${runs.head}%.2f warm=${runs.last}%.2f")
    }

    graft.functions.TextFunctions.oracleMode = false
    time("prod_xxhash64")
    graft.functions.TextFunctions.oracleMode = true
    time("oracle_hex60")
    graft.functions.TextFunctions.oracleMode = false
    spark.stop()
  }
}
