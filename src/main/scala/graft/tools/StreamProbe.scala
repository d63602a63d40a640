package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Bounded experiment (r22, VERDICT r21 #8): attribute the streaming
  * family's per-query cost to its micro-batch phases from the engine's
  * own StreamingQueryProgress durations — queryPlanning vs addBatch
  * (execution) vs state commit vs offset log — over the q165-shaped
  * watermarked windowed aggregation at gate scale. The decision rule the
  * verdict set: if replanning dominates, reuse inferred schema / static
  * plan fragments; if state/exec dominates (Spark-internal, batch counts
  * semantic), document and leave the family alone.
  *
  * Usage: runMain graft.tools.StreamProbe <sfDir>
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.DriverSession.build(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val src = java.nio.file.Paths.get(s"$sfDir/events.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sprobe")
    // 3 mtime-ordered copies — the family's usual micro-batch count
    (0 until 3).foreach { i =>
      val f = tmp.resolve(s"b$i.parquet")
      java.nio.file.Files.copy(src, f)
      f.toFile.setLastModified(1000000000000L + i * 60000L)
    }
    val t0 = System.nanoTime()
    val schema = spark.read.parquet(tmp.toString).schema
    val tSchema = (System.nanoTime() - t0) / 1e9
    println(f"[sprobe] schema inference: $tSchema%.3f s")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", 8)
      val events = graft.sources.Tables.normalizeEventTs(
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(tmp.toString))
      val agg = events
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val tQ0 = System.nanoTime()
      val q = agg.writeStream.outputMode("append").format("memory")
        .queryName("sprobe").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - tQ0) / 1e9
      println(f"[sprobe] drain wall: $wall%.2f s over " +
        s"${q.recentProgress.length} progress entries")
      q.recentProgress.foreach { p =>
        val d = p.durationMs
        def ms(k: String) = Option(d.get(k)).map(_.longValue).getOrElse(-1L)
        println(s"[sprobe] batch ${p.batchId}: trigger=${ms("triggerExecution")}ms " +
          s"planning=${ms("queryPlanning")}ms addBatch=${ms("addBatch")}ms " +
          s"getBatch=${ms("getBatch")}ms latestOffset=${ms("latestOffset")}ms " +
          s"walCommit=${ms("walCommit")}ms stateCommit=${ms("commitOffsets")}ms")
      }
      spark.catalog.dropTempView("sprobe")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      graft.util.Fs.deleteRecursively(tmp.toFile)
    }
    spark.stop()
  }
}
