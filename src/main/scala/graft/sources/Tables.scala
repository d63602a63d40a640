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
  /** r22 memo hygiene (VERDICT r21 #5 + ADVICE): keyed by (session,
    * path) with the stamp INSIDE the entry — a stamp change replaces
    * that path's entry in place (the stale plan is dropped immediately
    * instead of lingering until a global clear), true LRU eviction at
    * the 64-entry bound (access-ordered LinkedHashMap) instead of
    * clearing everything, and entries whose session has stopped are
    * evicted on the next access so a throwaway test session cannot pin
    * its plans for the JVM lifetime. */
  private val planMemo = new java.util.LinkedHashMap[
    (SparkSession, String), (Long, DataFrame)](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[
      (SparkSession, String), (Long, DataFrame)]): Boolean = size > 64
  }

  /** Order-sensitive stamp (r22, ADVICE): the old XOR fold let two
    * independent child changes cancel and missed a same-millisecond
    * same-length rewrite of one file; a 31-multiplier hash over the
    * sorted (name, mtime, length) tuples is order-sensitive and
    * collision-resistant for the purpose. */
  private def sourceStamp(f: java.io.File): Long =
    if (f.isDirectory)
      Option(f.listFiles()).toSeq.flatten.sortBy(_.getName)
        .map(sourceStamp)
        .foldLeft(f.lastModified) { (acc, s) => acc * 31 + s }
    else (f.getName.hashCode.toLong * 31 + f.lastModified) * 31 + f.length

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val stamp = sourceStamp(new java.io.File(path))
    val cached = planMemo.synchronized {
      // drop entries of stopped sessions (their cached plans — and the
      // sessions themselves — would otherwise stay referenced until LRU
      // pressure happened to reach them)
      planMemo.entrySet().removeIf(e => e.getKey._1.sparkContext.isStopped)
      Option(planMemo.get((spark, path))).filter(_._1 == stamp).map(_._2)
    }
    cached.getOrElse {
      // listing + footer inference OUTSIDE the lock: concurrent first
      // loads of different paths must not serialize on the memo
      val df = spark.read.parquet(path)
      planMemo.synchronized { planMemo.put((spark, path), (stamp, df)) }
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
