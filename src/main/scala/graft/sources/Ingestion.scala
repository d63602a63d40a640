package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Geo

/** Dataset-shaped ingestion paths mirroring the reference's notebook loaders
  * (FIXTURES.md schemas), re-expressed as pure Catalyst plans.
  *
  * The reference ingests via RDD lambdas — `sc.textFile` → `filter(_.nonEmpty)`
  * → `filter(!_.contains("?"))` → `map(_.split(","))` → `Row.fromSeq` +
  * explicit StructType (ref: SemiSupervisedAndBaseClassifiers.scala:276-317)
  * — which serializes every line through Scala closures. Here the same
  * semantics are `spark.read.csv` options + column expressions: codegen'd,
  * pushdown-friendly, no SerDe boundary (SURVEY §2.1 S1-S5, §2.10 U4).
  */
object Ingestion {

  /** Keel/UCI numeric CSV (ref: SemiSupervisedAndBaseClassifiers.scala:53-58):
    * header + inferSchema + na.drop; convention: all columns numeric except
    * the last = class label. Returns (df, featureCols, labelCol). */
  def loadKeelCsv(spark: SparkSession, path: String)
      : (DataFrame, Array[String], String) = {
    val df = Tables.csv(spark, path).na.drop()
    val labelCol = df.columns.last
    (df, df.columns.dropRight(1), labelCol)
  }

  /** JSONL corpus ingestion (schema-on-read over raw lines): parse a line
    * column with `from_json` against an explicit DDL schema — the 100 TB
    * path for the jsonl interchange format every public corpus ships in
    * (the reference's text-ingestion idiom, §2.1 S2/S5, lifted to JSON).
    * Malformed lines parse to a NULL struct (PERMISSIVE semantics) in the
    * `parsed` column, so callers count or divert them instead of killing
    * the job — at corpus scale a reject-rate signal, not an exception.
    * Pure Catalyst (`JsonToStructs` is codegen-adjacent and
    * partition-local): no shuffle, pushdown-friendly surviving columns. */
  def parseJsonl(lines: DataFrame, lineCol: String, ddl: String): DataFrame =
    lines.withColumn("parsed",
      from_json(col(lineCol), StructType.fromDDL(ddl),
        Map.empty[String, String]))

  /** ADULT-style text ingestion (ref:
    * SemiSupervisedAndBaseClassifiers.scala:276-324): drop empty lines and
    * lines containing the "?" missing-value sentinel, split on commas into
    * the given all-string schema, then cast `numericCols` to double.
    * One scan, all-Catalyst: the sentinel filter runs on the raw line
    * BEFORE the split, exactly like the reference's RDD filter. */
  def loadSentinelCsv(spark: SparkSession, path: String,
      columnNames: Seq[String], numericCols: Set[String]): DataFrame = {
    val lines = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0 && !col("value").contains("?"))
    val parts = lines.select(split(col("value"), ",").as("p"))
    val cols = columnNames.zipWithIndex.map { case (name, i) =>
      val c = trim(element_at(col("p"), i + 1))
      (if (numericCols.contains(name)) c.cast(DoubleType) else c).as(name)
    }
    parts.select(cols: _*)
  }

  /** Taxi-style feature engineering (ref:
    * SemiSupervisedAndBaseClassifiers.scala:864-949): datetime parts from
    * the pickup timestamp string, fractional hour, haversine trip distance,
    * band-cleaning filters, duration binarization — the reference does all
    * of this in RDD lambdas with hand-split strings; here it is one
    * expression chain over `to_timestamp`.
    *
    * Expects columns: pickup_datetime (yyyy-MM-dd HH:mm:ss string),
    * pickup/dropoff lat/lon doubles, passenger_count int,
    * trip_duration int (seconds).
    */
  def taxiFeatures(df: DataFrame,
      longTripSeconds: Int = 900,
      maxDistanceKm: Double = 30.0, minDistanceKm: Double = 0.3,
      maxDurationS: Int = 7200, maxPassengers: Int = 6): DataFrame = {
    val ts = to_timestamp(col("pickup_datetime"), "yyyy-MM-dd HH:mm:ss")
    df
      .withColumn("pickup_month", month(ts).cast("double"))
      .withColumn("pickup_day", dayofmonth(ts).cast("double"))
      .withColumn("pickup_time",
        hour(ts) + minute(ts) / lit(60.0) + second(ts) / lit(3600.0))
      .withColumn("diff_distance", Geo.haversineKm(
        col("pickup_latitude"), col("pickup_longitude"),
        col("dropoff_latitude"), col("dropoff_longitude")))
      // cleaning band (ref :931-934): conjunctive range predicates
      .filter(col("diff_distance") <= maxDistanceKm &&
        col("diff_distance") >= minDistanceKm &&
        col("trip_duration") <= maxDurationS &&
        col("passenger_count") <= maxPassengers)
      // binarization (ref :937-938)
      .withColumn("duration_class",
        when(col("trip_duration") > longTripSeconds, "Long").otherwise("Short"))
  }

  /** POKER-style class binarization (ref:
    * SemiSupervisedAndBaseClassifiers.scala:571-573): numeric multiclass →
    * two-band string class, original column dropped. */
  def binarizeClass(df: DataFrame, classCol: String,
      positive: String = "AtleastOnePair", negative: String = "Nothing")
      : DataFrame =
    df.withColumn("clase",
        when(col(classCol) > 0, positive).otherwise(negative))
      .drop(classCol)
}
