package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ml.Featurization
import graft.sources.Ingestion

/** Fixture-driven ingestion tests per FIXTURES.md (seeded synthetic CSVs in
  * the shapes of wisconsin / ADULT / Taxi NY). */
class IngestionSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpFile(name: String, lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft_fixtures")
    val f = dir.resolve(name)
    Files.write(f, String.join("\n", lines: _*).getBytes)
    f.toString
  }

  test("normalizeEventTs handles every ts encoding the datagen has shipped") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    // micros since epoch for 2024-01-02T03:04:05.000006 UTC
    val micros = 1704164645000006L

    // encoding 1: TIMESTAMP(NANOS) read under nanosAsLong → LongType nanos
    val asNanos = Seq((1L, micros * 1000)).toDF("event_id", "ts")
    val n = graft.sources.Tables.normalizeEventTs(asNanos)
    assert(n.schema("ts").dataType === TimestampType)
    assert(n.select(expr("unix_micros(ts)")).head.getLong(0) === micros)

    // encoding 2: TIMESTAMP(MICROS, NTZ) → TimestampNTZType; the UTC
    // session cast must preserve the wall-clock micros exactly (this is
    // 1:1 with DuckDB's naive read of the same parquet)
    val asNtz = Seq((1L, micros)).toDF("event_id", "us")
      .select(col("event_id"),
        expr("convert_timezone('UTC', timestamp_micros(us))").cast(TimestampNTZType).as("ts"))
    assert(asNtz.schema("ts").dataType === TimestampNTZType)
    val z = graft.sources.Tables.normalizeEventTs(asNtz)
    assert(z.schema("ts").dataType === TimestampType)
    assert(z.select(expr("unix_micros(ts)")).head.getLong(0) === micros)

    // already-normalized frames pass through untouched
    val already = n
    assert(graft.sources.Tables.normalizeEventTs(already) eq already)

    // and the REAL testdata round-trips: whatever encoding the driver
    // generated, the normalized scan must yield non-null in-range events
    val ev = graft.sources.Tables.events(spark, sf)
    assert(ev.schema("ts").dataType === TimestampType)
    val r = ev.agg(min(expr("year(ts)")), max(expr("year(ts)")),
      sum(when(col("ts").isNull, 1L).otherwise(0L))).head
    assert(r.getLong(2) === 0L, "normalization must not null any ts")
    assert(r.getInt(0) >= 1970 && r.getInt(1) <= 2100,
      s"implausible event-time range ${r.getInt(0)}..${r.getInt(1)} — " +
        "a mis-scaled (ns-vs-us) conversion lands decades away")
  }

  test("parseJsonl: schema-on-read fields land typed, malformed lines null out") {
    import spark.implicits._
    val lines = Seq(
      """{"id":7,"lang":"en","text":"a b"}""",
      """{"id":8,"lang":"de"}""",          // missing field → null field, row kept
      """{"id":9,"lang":""",               // truncated → NULL struct
      """not json at all""").toDF("line")
    val p = Ingestion.parseJsonl(lines, "line", "id BIGINT, lang STRING, text STRING")
    val rows = p.select(col("parsed.id"), col("parsed.lang"), col("parsed.text"))
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2))))
    assert(rows(0) === ((Some(7L), Some("en"), Some("a b"))))
    assert(rows(1) === ((Some(8L), Some("de"), None)),
      "a missing field must not reject the row")
    assert(rows(2)._1.isEmpty && rows(3)._1.isEmpty,
      "malformed lines must parse to a NULL struct, not throw")
    // q103: the planted truncated line is the ONLY malformed one, and the
    // parsed totals account for every other document exactly
    val out = SparkEntry.queries("q103_jsonl_ingest")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out("_malformed") === ((1L, 0L)))
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .filter(col("doc_id") =!= 0)
      .groupBy(col("lang")).agg(count(lit(1)), sum(col("doc_id"))).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    docs.foreach { case (lang, expect) => assert(out(lang) === expect) }
  }

  test("Keel CSV: header+inferSchema+na.drop, last column is the label") {
    val rnd = new scala.util.Random(7)
    val header = (1 to 5).map(i => s"f$i").mkString(",") + ",diagnosis"
    val rows = (0 until 100).map { i =>
      val cls = if (i % 3 == 0) "M" else "B"
      (1 to 5).map(_ => f"${rnd.nextDouble()}%.4f").mkString(",") + s",$cls"
    }
    // two junk rows with an empty numeric cell → na.drop must remove them
    val junk = Seq(",,,,,M", "0.1,0.2,,0.4,0.5,B")
    val path = tmpFile("keel.csv", header +: (rows ++ junk))

    val (df, features, label) = Ingestion.loadKeelCsv(spark, path)
    assert(label === "diagnosis")
    assert(features.toSeq === (1 to 5).map(i => s"f$i"))
    assert(df.count() === 100) // junk dropped
    assert(df.schema("f1").dataType.typeName === "double") // inferred
  }

  test("sentinel CSV: '?' lines and empty lines dropped before parsing, casts applied") {
    val lines = Seq(
      "39, State-gov, 77516, Bachelors",
      "", // empty → dropped
      "50, ?, 83311, Bachelors", // sentinel → dropped
      "38, Private, 215646, HS-grad")
    val path = tmpFile("adult.data", lines)
    val df = Ingestion.loadSentinelCsv(spark, path,
      Seq("age", "workclass", "fnlwgt", "education"),
      numericCols = Set("age", "fnlwgt"))
    assert(df.count() === 2)
    assert(df.schema("age").dataType.typeName === "double")
    assert(df.schema("workclass").dataType.typeName === "string")
    assert(df.agg(sum("age")).head.getDouble(0) === 77.0)
  }

  test("taxi features: datetime parts, haversine distance, band cleaning, binarization") {
    import spark.implicits._
    val rows = Seq(
      // ~5.4 km Manhattan hop, 1200 s → kept, "Long"
      ("2016-03-14 17:30:30", 40.7128, -74.0060, 40.7614, -73.9776, 1, 1200),
      // same pickup/dropoff → distance 0 → dropped by min-distance band
      ("2016-03-14 09:15:00", 40.7128, -74.0060, 40.7128, -74.0060, 1, 600),
      // 8000 s duration → dropped
      ("2016-03-15 10:00:00", 40.7128, -74.0060, 40.7614, -73.9776, 2, 8000),
      // 7 passengers → dropped
      ("2016-03-16 11:00:00", 40.7128, -74.0060, 40.7614, -73.9776, 7, 700),
      // short valid trip → kept, "Short"
      ("2016-03-17 23:45:10", 40.7306, -73.9866, 40.7417, -73.9893, 3, 450))
      .toDF("pickup_datetime", "pickup_latitude", "pickup_longitude",
        "dropoff_latitude", "dropoff_longitude", "passenger_count",
        "trip_duration")
    val out = Ingestion.taxiFeatures(rows)
    assert(out.count() === 2)
    val first = out.filter(col("trip_duration") === 1200).head()
    assert(first.getAs[String]("duration_class") === "Long")
    assert(first.getAs[Double]("pickup_month") === 3.0)
    assert(first.getAs[Double]("pickup_day") === 14.0)
    assert(math.abs(first.getAs[Double]("pickup_time") - (17 + 30.0/60 + 30.0/3600)) < 1e-9)
    val dist = first.getAs[Double]("diff_distance")
    assert(dist > 5.0 && dist < 6.5, s"haversine out of range: $dist")
    assert(out.filter(col("trip_duration") === 450)
      .head().getAs[String]("duration_class") === "Short")
  }

  test("binarizeClass bands a numeric multiclass column and drops it") {
    import spark.implicits._
    val df = Seq((0, "a"), (1, "b"), (5, "c")).toDF("_c10", "x")
    val out = Ingestion.binarizeClass(df, "_c10")
    assert(!out.columns.contains("_c10"))
    assert(out.filter(col("clase") === "AtleastOnePair").count() === 2)
    assert(out.filter(col("clase") === "Nothing").count() === 1)
  }

  test("featurization pipeline: multi-col StringIndexer + assembler + label indexer") {
    import spark.implicits._
    val df = Seq(
      (1.0, "red", "yes"), (2.0, "blue", "no"), (3.0, "red", "yes"),
      (4.0, "green", "no"), (5.0, "blue", "yes"))
      .toDF("num", "color", "cls")
    val model = Featurization.pipeline(
      numericCols = Seq("num"), categoricalCols = Seq("color"),
      labelInputCol = "cls").fit(df)
    val out = model.transform(df)
    assert(out.columns.contains("features") && out.columns.contains("label"))
    val v = out.select("features").head()
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.size === 2) // num + color-num
    assert(out.select("label").distinct().count() === 2)
  }
}
