package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Throwaway probe: how many micro-batches does the q164 staging produce,
  * and what watermark does each carry? */
object LateProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.DriverSession.build(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val tmp = java.nio.file.Files.createTempDirectory("graft_late_probe")
    val ev = graft.sources.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"))
    def stage(name: String, pred: org.apache.spark.sql.Column,
        mtime: Long): Unit = {
      val scratch = tmp.resolve(name + "_w").toString
      ev.filter(pred).coalesce(1).write.parquet(scratch)
      val part = new java.io.File(scratch).listFiles()
        .find(f => f.getName.endsWith(".parquet") &&
          !f.getName.startsWith(".")).get
      java.nio.file.Files.move(part.toPath, tmp.resolve(name))
      tmp.resolve(name).toFile.setLastModified(mtime)
      graft.util.Fs.deleteRecursively(scratch)
    }
    val t0 = System.currentTimeMillis() - 180000L
    val cut = "2024-01-30 12:00:00"
    stage("a.parquet",
      col("ts") < cut && col("event_id") % 11 =!= 0, t0)
    stage("b.parquet", col("ts") >= cut, t0 + 60000L)
    stage("c.parquet",
      col("ts") < cut && col("event_id") % 11 === 0, t0 + 120000L)
    val agg = graft.streaming.EventStreams.readEvents(spark, tmp.toString)
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append())
      .format("memory").queryName("late_probe")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.recentProgress.foreach { p =>
      val so = p.stateOperators.toSeq
      println(s"[probe] batch=${p.batchId} in=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} " +
        s"dropped=${so.map(_.numRowsDroppedByWatermark).sum} " +
        s"stateRows=${so.map(_.numRowsTotal).sum} " +
        s"removed=${so.map(_.numRowsRemoved).sum} " +
        s"sinkOut=${p.sink.numOutputRows}")
    }
    spark.stop()
  }
}
