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
      // SPARK_GRAFT_MEMLOG=1: after-query JVM/storage telemetry for
      // chasing shared-JVM steady-state drift (heap after a forced GC,
      // storage-memory fill, live persistent RDDs)
      if (sys.env.get("SPARK_GRAFT_MEMLOG").contains("1")) {
        System.gc()
        val rt = Runtime.getRuntime
        val heapMb = (rt.totalMemory - rt.freeMemory) / (1 << 20)
        val (maxMem, remMem) =
          spark.sparkContext.getExecutorMemoryStatus.values.head
        println(f"[mem] $q heapMB=$heapMb storageUsedMB=" +
          f"${(maxMem - remMem) / (1 << 20)} nPersistent=" +
          f"${spark.sparkContext.getPersistentRDDs.size}")
      }
      // SPARK_GRAFT_KEEP_CACHE=1 keeps persisted frames warm across runs —
      // for probing how much of a steady-state sample is cache refill
      // (Bench's sweepScratch drops per-query scratch between queries)
      if (!sys.env.get("SPARK_GRAFT_KEEP_CACHE").contains("1"))
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    spark.stop()
  }
}
