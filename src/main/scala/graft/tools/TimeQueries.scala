package graft.tools


/** Dev-loop timing probe: run named gate queries N times against a chosen
  * sf dir and print per-run wall times. Narrower than [[graft.Bench]] (no
  * prewarm/calibration/JSON contract) — for iterating on ONE query's plan
  * without paying the full bench loop.
  *
  * Usage: runMain graft.tools.TimeQueries <sfDir> <runs> <query...>
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.DriverSession.build(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorMax.register(spark)
    for (q <- names; i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sfDir).count()
      println(f"[time] $q run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
