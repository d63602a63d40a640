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

  /** Memo of ANALYZED DataFrame handles per (session, path, source
    * stamp) — a session-scoped catalog entry, exactly what a metastore
    * table provides. `spark.read.parquet` pays a driver-side listing +
    * footer read on EVERY call (~50-75 ms here), and a 227-query run
    * makes hundreds of calls against the same immutable inputs — ~15 s
    * of pure repeated schema inference (r21 measurement, LoadProbe).
    * Only the PLAN is reused: every action still scans the parquet
    * files; the stamp (mtime ^ length, recursive for directories)
    * invalidates the entry if the source ever changes. Bounded and
    * session-keyed so throwaway test sessions cannot pin plans. */
  private val planMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Long), DataFrame]

  private def sourceStamp(f: java.io.File): Long =
    if (f.isDirectory)
      Option(f.listFiles()).toSeq.flatten
        .map(sourceStamp).foldLeft(f.lastModified)(_ ^ _)
    else f.lastModified ^ (f.length << 1)

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = (spark, path, sourceStamp(new java.io.File(path)))
    val hit = planMemo.get(key)
    if (hit != null) hit
    else {
      if (planMemo.size > 64) planMemo.clear()
      val df = spark.read.parquet(path)
      planMemo.put(key, df)
      df
    }
  }

  /** events table with `ts` normalized to TimestampType.
    *
    * The driver's datagen has shipped two physical encodings of `ts` so far,
    * normalized here at the single choke point every event query reads through:
    *  - parquet TIMESTAMP(NANOS): Spark 4 only reads it via
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set by our session
    *    builders) — a LongType of nanos, converted with exact integer
    *    division (`DIV`, no double round-trip: ns epochs exceed 2^53 and
    *    would lose precision as doubles);
    *  - parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
    *    TIMESTAMP_NTZ. Cast to TIMESTAMP — under the UTC session timezone
    *    our builders pin, the cast reinterprets the wall-clock micros 1:1,
    *    which is exactly how the DuckDB oracle reads the same file (naive).
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestamp_micros(ts DIV 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // loud precondition: the NTZ→LTZ cast reinterprets wall-clock
        // micros in the SESSION timezone; anything but UTC silently
        // shifts every event time by the zone offset (watermarks, session
        // windows, and oracle comparisons all wrong with no error)
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"normalizeEventTs: TIMESTAMP_NTZ events require a UTC session " +
            s"(spark.sql.session.timeZone=$tz) — the cast is 1:1 with the " +
            "DuckDB oracle's naive read only under UTC")
        df.withColumn("ts",
          df("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }

  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(load(spark, dir, "events"))

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
