package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: where does q48's cold staging time go? */
object StageProbe {
  def main(args: Array[String]): Unit = {
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
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"STAGE $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val ord = graft.sources.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
    timed("li.count")(li.count())
    println("li partitions: " + li.rdd.getNumPartitions)
    timed("write li bucketed")(
      graft.plans.Bucketing.writeBucketed(li, "probe_li", "l_orderkey"))
    timed("write ord bucketed")(
      graft.plans.Bucketing.writeBucketed(ord, "probe_ord", "o_orderkey"))
    timed("write li plain")(
      li.write.mode("overwrite").parquet("/tmp/graft_probe_li"))
    timed("write li bucketed again")(
      graft.plans.Bucketing.writeBucketed(li, "probe_li2", "l_orderkey"))
    timed("join")(
      graft.plans.Bucketing.bucketedJoin(spark, "probe_li", "l_orderkey",
        "probe_ord", "o_orderkey").groupBy(col("o_orderstatus")).count().count())
    val fp = graft.plans.Bucketing.inputFingerprint(spark, s"$sfDir/lineitem.parquet")
    timed("stageOnce miss")(
      graft.plans.Bucketing.stageBucketedOnce(li, "probe_li3", "l_orderkey", fp))
    spark.sql("DROP TABLE IF EXISTS probe_li3") // forget catalog, keep files
    timed("stageOnce hit")(
      graft.plans.Bucketing.stageBucketedOnce(li, "probe_li3", "l_orderkey", fp))
    timed("q48 via entry")(
      graft.SparkEntry.queries("q48_bucketed_join")(spark, sfDir).count())
    timed("q48 via entry again")(
      graft.SparkEntry.queries("q48_bucketed_join")(spark, sfDir).count())
    spark.stop()
  }
}
