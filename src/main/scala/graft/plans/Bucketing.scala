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
    * Idempotent across JVMs: the in-memory catalog forgets tables between
    * sessions while the warehouse directory persists, and CTAS refuses a
    * managed-table location that already exists — so drop the catalog entry
    * AND clear any stale location first. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 16): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val loc = new org.apache.hadoop.fs.Path(warehouse, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)
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
