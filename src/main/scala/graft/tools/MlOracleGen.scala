package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
/** Regenerates the constant "golden-value" oracles for the model-fit
  * queries (q35 recall summary, q39-q44, q84): runs each at sf0.01 and
  * prints a DuckDB `SELECT * FROM (VALUES ...)` pinning the observed
  * rows. Every value is seeded and bit-deterministic (verified identical
  * across JVMs and local[4] vs local[32] — the pre-fit randomness runs on
  * the single-partition sf0.01 reads, and fits are seeded), so pinning
  * exact doubles is as safe as pinning the integer counters. Re-run and
  * paste into SparkEntry.oracleSql if the driver regenerates the
  * testdata. */
object MlOracleGen {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    def dlit(d: Double): String = {
      // a NaN/Infinity metric (e.g. a degenerate single-class fold) must
      // fail HERE, not as a DuckDB syntax error after being pasted in
      require(!d.isNaN && !d.isInfinite, s"non-finite metric $d — not pinnable")
      val s = d.toString
      if (s.contains("E") || s.contains("e")) s else s + "e0"
    }
    // q149 is not a model fit, but its oracle is pinned the same way (the
    // 20-round merge replay has no tractable SQL twin; determinism is
    // integer sums + a totally-ordered argmax, parity-tested in ScaleOpsSpec)
    val all = Seq("q35_ann_ivf", "q39_supervised_roster",
      "q40_selftrain_threshold", "q41_selftrain_kbest", "q42_cotrain",
      "q43_supervised_cv", "q44_cotrain_featsplit",
      "q84_experiment_grid", "q141_full_grid", "q149_bpe_encode",
      "q155_token_ids", "q177_grid_datasets", "q182_tokenizer_coverage",
      "q199_grid_resume")
    for (q <- if (args.nonEmpty) all.filter(n => args.exists(n.contains))
              else all) {
      val df = graft.SparkEntry.queries(q)(spark, dir)
      val schema = df.schema
      val rows = df.collect()
      val vals = rows.map { r =>
        schema.fields.zipWithIndex.map { case (f, i) =>
          f.dataType match {
            case StringType  => "'" + r.getString(i).replace("'", "''") + "'"
            case DoubleType  => dlit(r.getDouble(i))
            case LongType    => s"CAST(${r.getLong(i)} AS BIGINT)"
            case IntegerType => s"CAST(${r.getInt(i)} AS INTEGER)"
            case BooleanType => if (r.getBoolean(i)) "TRUE" else "FALSE"
            case other => sys.error(s"unhandled type $other in $q")
          }
        }.mkString("(", ", ", ")")
      }.mkString(", ")
      val cols = schema.fields.map(f => "\"" + f.name + "\"").mkString(", ")
      println(s"ORACLE $q SELECT * FROM (VALUES $vals) AS t($cols)")
    }
    spark.stop()
  }
}
