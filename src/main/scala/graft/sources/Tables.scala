package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading for the driver's TPC-H-ish testdata
  * (see /root/repo/TESTDATA.md). The reference ingests CSV/text via RDDs
  * (ref: notebooks/SemiSupervised/SemiSupervisedAndBaseClassifiers.scala:53-57,276);
  * the engine is parquet/Catalyst-first — scans get predicate pushdown and
  * column pruning for free, which is what survives at 100 TB.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events table with `ts` normalized to TimestampType.
    *
    * The testdata stores ts as parquet TIMESTAMP(NANOS), which Spark 4 only
    * reads via `spark.sql.legacy.parquet.nanosAsLong=true` (set by our
    * session builders) — that yields a LongType of nanos, converted here to
    * a microsecond timestamp with exact integer division (`DIV`, no double
    * round-trip: ns epochs exceed 2^53 and would lose precision as doubles).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = load(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts DIV 1000)"))
      case _ => df
    }
  }

  /** CSV reader matching the reference's option surface
    * (ref: SemiSupervisedAndBaseClassifiers.scala:53-57 — sep/inferSchema/header).
    * Explicit schema preferred at scale; inferSchema kept for parity.
    */
  def csv(spark: SparkSession, path: String, header: Boolean = true,
          inferSchema: Boolean = true, sep: String = ","): DataFrame =
    spark.read
      .option("sep", sep)
      .option("header", header.toString)
      .option("inferSchema", inferSchema.toString)
      .csv(path)
}
