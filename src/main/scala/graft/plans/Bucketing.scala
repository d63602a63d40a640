package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketing: pre-shuffling data ONCE at write time so repeated joins and
  * aggregations on the bucket key run with no exchange at read time — the
  * canonical 100 TB pattern for fact⋈fact joins that are too big to
  * broadcast and too frequent to re-shuffle per query.
  *
  * With both sides bucketed by their join key into the same bucket count,
  * Catalyst plans a sort-merge join whose children read co-located buckets
  * directly (zero Exchange; see the PlanSpec assertion). Sorting within
  * buckets at write time also drops the per-query Sort.
  */
object Bucketing {

  /** Write `df` as a bucketed (and in-bucket sorted) managed parquet table.
    * Safe to re-run across JVMs: the in-memory catalog forgets tables
    * between sessions while the warehouse directory persists, and CTAS
    * refuses a managed-table location that already exists — so drop the
    * catalog entry AND clear any stale location first.
    *
    * The input is repartitioned to exactly `buckets` partitions ON the
    * bucket key — repartition's HashPartitioning and the bucket-id function
    * are the same `pmod(murmur3, n)`, so every task holds exactly one
    * bucket's rows and writes exactly one file (instead of
    * inputPartitions × buckets small files), and the in-bucket sort is a
    * single run per task. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 16): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = tableLocation(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.repartition(buckets, df(key))
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
  }

  private def tableLocation(spark: SparkSession, table: String) = {
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
  }

  /** Fingerprint of a source parquet file/directory — delegates to the one
    * shared staging key helper ([[graft.util.Staging.sourceFingerprint]]:
    * per-file name + length + mtime + parquet-footer CRC), so the bucketed
    * tables carry the same stale-reuse protection as the band/cc/IVF
    * artifacts: a regenerated source matching byte length within mtime
    * granularity still misses the cache. */
  def inputFingerprint(spark: SparkSession, paths: String*): String =
    graft.util.Staging.sourceFingerprint(
      spark.sparkContext.hadoopConfiguration, paths: _*)

  // One lock per staged table: two driver threads racing stageBucketedOnce's
  // miss path would interleave DROP TABLE / location delete / write on the
  // same files. Bench is sequential today, but ml.Par schedules concurrent
  // driver jobs elsewhere in this codebase — serialize per table name.
  private val stageLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Stage `df` as a bucketed table exactly once per input fingerprint —
    * across JVMs. Bucketing's whole premise is that the write-side shuffle
    * is paid once and amortized over every later co-located join; a fresh
    * JVM must not re-pay it when the warehouse already holds the table
    * built from identical input. On a fingerprint hit only the catalog
    * entry is recreated (`CREATE TABLE ... CLUSTERED BY ... LOCATION` —
    * the files outlive the in-memory catalog); on a miss the table is
    * rebuilt and the marker written after the commit, so a crash mid-write
    * re-stages. Returns true iff this call actually (re)built the table. */
  def stageBucketedOnce(df: DataFrame, table: String, key: String,
      fingerprint: String, buckets: Int = 16): Boolean =
    stageLocks.computeIfAbsent(table, _ => new Object).synchronized {
      stageBucketedOnceLocked(df, table, key, fingerprint, buckets)
    }

  private def stageBucketedOnceLocked(df: DataFrame, table: String, key: String,
      fingerprint: String, buckets: Int): Boolean = {
    val spark = df.sparkSession
    val loc = tableLocation(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(loc, "_GRAFT_STAGED")
    val current =
      if (!fs.exists(marker)) None
      else {
        val in = fs.open(marker)
        try Some(new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
        finally in.close()
      }
    if (current.contains(fingerprint)) {
      if (!spark.catalog.tableExists(table)) {
        val ddl = df.schema.toDDL
        spark.sql(
          s"""CREATE TABLE `$table` ($ddl) USING parquet
             |CLUSTERED BY (`$key`) SORTED BY (`$key`) INTO $buckets BUCKETS
             |LOCATION '${loc.toString}'""".stripMargin)
      }
      false
    } else {
      writeBucketed(df, table, key, buckets)
      val out = fs.create(marker, true)
      try out.write(fingerprint.getBytes("UTF-8")) finally out.close()
      graft.util.Staging.builtThisJvm.add(table)
      true
    }
  }

  /** Write `df` partitioned by a low-cardinality column (hive-style
    * directory layout). Reads filtered on that column prune whole
    * partitions at planning time — the scan never opens non-matching files
    * (see PlanSpec's PartitionFilters assertion). The complement to
    * bucketing: partitionBy for selective scans, bucketBy for co-located
    * joins. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Equi-join two bucketed tables on their (same-bucket-count) keys. */
  def bucketedJoin(spark: SparkSession, tableA: String, keyA: String,
      tableB: String, keyB: String): DataFrame = {
    val a = spark.table(tableA)
    val b = spark.table(tableB)
    a.join(b, a(keyA) === b(keyB))
  }
}
