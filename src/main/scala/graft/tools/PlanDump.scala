package graft.tools

/** Dev-loop plan inspector: runs named SparkEntry queries at a given sf
  * dir and prints the AQE-final executed plan — the tool behind every
  * "is the filter pushed / the join broadcast / the partition pruned"
  * iteration.
  *
  * {{{
  *   sbt "runMain graft.tools.PlanDump /root/testdata/sf0.001 q189_dynamic_pruning"
  * }}}
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <query>...")
    val spark = graft.util.DriverSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel(
      sys.env.getOrElse("SPARK_GRAFT_LOGLEVEL", "ERROR"))
    for (name <- args.drop(1)) {
      val q = graft.SparkEntry.queries(name)(spark, args(0))
      q.collect()
      println(s"===== $name =====")
      println(q.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
