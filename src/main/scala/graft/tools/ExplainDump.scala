package graft.tools

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Optimization-round plan archiver: writes each named query's
  * `.explain("formatted")` output (Exchange placement, join strategy,
  * PushedFilters/ReadSchema, codegen spans) to
  * `<outDir>/<query>_<tag>.txt`, so before/after plan claims in
  * OPTIMIZATION_rNN.md are checkable against committed artifacts.
  *
  * Queries that end in `localCheckpoint()` (or stage state via
  * intermediate actions) execute their real plan INSIDE the query
  * function — the returned frame is then just an ExistingRDD scan. A
  * QueryExecutionListener therefore records every plan executed while
  * the query builds and runs, and the dump concatenates them all
  * (action-labelled), so the interesting plan is always in the file.
  *
  * {{{
  *   sbt "runMain graft.tools.ExplainDump /root/testdata/sf0.01 plans/r21 before q207_bpe_roundtrip ..."
  * }}}
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: ExplainDump <sfDir> <outDir> <tag> <query>...")
    val Array(sfDir, outDir, tag) = args.take(3)
    val spark = graft.util.DriverSession.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorMax.register(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val captured = new ConcurrentLinkedQueue[(String, String)]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        captured.add((funcName, qe.explainString(
          org.apache.spark.sql.execution.FormattedMode)))
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    for (name <- args.drop(3)) {
      captured.clear()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val top = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      df.count()
      // listener events are posted async — poll the capture queue until
      // it stops growing (r22, ADVICE: the old fixed 1.5 s sleep dropped
      // late onSuccess events on a loaded host, silently truncating
      // committed plan artifacts). Stable-for-1s with a 30 s deadline:
      // plan capture is a dev/evidence tool, a stall must not hang it.
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var stable = 0
      var lastSize = -1
      while (stable < 5 && System.nanoTime() < deadline) {
        val s = captured.size
        if (s == lastSize) stable += 1 else { stable = 0; lastSize = s }
        Thread.sleep(200)
      }
      val sb = new StringBuilder
      sb ++= s"==== $name: returned frame ====\n$top\n"
      var i = 0
      captured.forEach { e =>
        i += 1
        sb ++= s"\n==== $name: executed plan $i (action: ${e._1}) ====\n${e._2}\n"
      }
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"), sb.toString)
      println(s"[explain] wrote $outDir/${name}_$tag.txt (${i + 1} plans)")
    }
    spark.stop()
  }
}
