package graft.tools

/** Golden-oracle generator for q202 (byte-level BPE): prints the engine's
  * per-source rows plus the (n_tokens, id_checksum) VALUES snippet the
  * SparkEntry oracle pins. Run AFTER ScaleOpsSpec's independent
  * driver-side parity recompute is green — the golden pins what the
  * parity test proved, it doesn't self-certify. Same rationale as
  * [[MlOracleGen]] for the grid goldens. */
object Q202Gen {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.DriverSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val sfs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    for (sf <- sfs) {
      val rows = graft.operators.TextAnalysis.q202ByteBpe(spark, sf).collect()
      println(s"== $sf ==")
      rows.foreach { r =>
        println(s"ROW ${r.getString(0)} ${r.getLong(1)} ${r.getLong(2)} " +
          s"${r.getLong(3)} ${r.getLong(4)} ${r.getLong(5)}")
      }
      println("VALUES " + rows.map(r =>
        s"('${r.getString(0)}', CAST(${r.getLong(4)} AS BIGINT), " +
          s"CAST(${r.getLong(5)} AS BIGINT))").mkString(", "))
    }
    spark.stop()
  }
}
