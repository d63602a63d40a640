package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // mirror the driver entries: graft's extension rules are active
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("gate wiring: every query has an oracle unless explicitly rows-only") {
    // a typo'd oracleSql key would silently downgrade its query to the
    // weaker rows-only check — the gate must degrade loudly, here
    // every query is oracle-checked since r9 (q35's KMeans quantizer has
    // no SQL twin, but its recall@10 summary is pinned as a golden value)
    val rowsOnly = Set.empty[String]
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries silently rows-only: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracle entries naming no query: $orphaned")
    assert(SparkEntry.oracleSql.values.forall(_.trim.nonEmpty), "empty oracle SQL")
    val badPrewarm = Bench.statefulQueries.filterNot(SparkEntry.queries.contains)
    assert(badPrewarm.isEmpty, s"Bench prewarm names unknown queries: $badPrewarm")
  }

  test("every SparkEntry query runs and returns a readable schema on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.schema.fields.nonEmpty, s"$name: empty schema")
      // force execution — catches analysis and runtime errors per query
      df.count()
    }
  }

  test("every oracle key exists in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q16 union of complementary filters reassembles lineitem (bag semantics)") {
    val total = operators.Relational.q01ScanCount(spark, sf).head().getLong(0)
    val union = operators.Relational.q16UnionPartition(spark, sf).head().getLong(0)
    assert(total === union)
  }

  test("q15 top-k is ordered desc and unique") {
    val rows = operators.Relational.q15TopK(spark, sf).collect()
    assert(rows.length === 100)
    val prices = rows.map(_.getDouble(2))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("q05 NaN sentinel: isnan catches exactly the injected rows") {
    val cnt = operators.Relational.q05IsNanFilter(spark, sf).head().getLong(0)
    val expected = graft.sources.Tables.load(spark, sf, "orders")
      .filter(org.apache.spark.sql.functions.col("o_orderkey") % 10 === 0)
      .count()
    assert(cnt === expected)
  }

  test("dedup keep-first marks resampled docs with multiplicity 2") {
    import org.apache.spark.sql.functions._
    val dups = operators.Dedup.exactKeepFirst(spark, sf)
      .filter(col("cnt") > 1)
    // resample is doc_id % 100 == 0 over sf0.001's 50 docs → ids 0 (and any
    // multiples of 100 present); at least one duplicated group must exist
    assert(dups.count() >= 1)
    assert(dups.filter(col("cnt") =!= 2).count() === 0)
  }

  test("brute-force ANN: self-similarity of a vector with itself is 1") {
    import org.apache.spark.sql.functions._
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("e"))
    val sim = emb.filter(col("vec_id") === 1)
      .select(round(operators.Similarity.cosine(col("e"), col("e")), 6).as("s"))
      .head().getDouble(0)
    assert(sim === 1.0)
  }

  test("driver entry() flagship returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q166 incremental state merge handles state-only and delta-only keys") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val state = Seq(("a", 2L, 10L), ("b", 1L, 5L)).toDF("k", "n", "c")
    val delta = Seq(("b", 3L, 7L), ("c", 4L, 9L)).toDF("k", "n", "c")
    val merged = operators.Relational.mergeAdditiveState(
        state, delta, keys = Seq("k"), measures = Seq("n", "c"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2)))).toMap
    assert(merged === Map("a" -> ((2L, 10L)), "b" -> ((4L, 12L)),
      "c" -> ((4L, 9L))))
    // and the gated query's maintained state equals the from-scratch rollup
    val got = SparkEntry.queries("q166_incremental_agg")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val full = graft.sources.Tables.load(spark, sf, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)), sum(col("n_chars").cast("bigint")),
        sum(size(split(col("text"), " ")).cast("bigint")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === full)
  }

  test("q171 CSV roundtrip preserves hostile strings byte for byte") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val hostile = Seq(
      (1L, "a,\"x\",b"), (2L, "line with, commas"), (3L, "\"\"quoted\"\""),
      (4L, ""), (5L, "trailing space "))
    val out = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q171_spec_" +
      java.util.UUID.randomUUID().toString
    try {
      // ignore*WhiteSpace default to TRUE on read and silently trim
      // unquoted fields — the roundtrip needs them off explicitly
      hostile.toDF("id", "s").write.option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false").csv(out)
      val back = spark.read
        .schema("id BIGINT, s STRING")
        .option("header", "true")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false").csv(out)
        .collect().map(r => r.getLong(0) -> Option(r.getString(1)).getOrElse(""))
        .toMap
      assert(back === hostile.toMap)
    } finally graft.util.Fs.deleteRecursively(out)
    // and the gated aggregate equals the source-of-truth recompute
    val got = SparkEntry.queries("q171_csv_roundtrip")(spark, sf).head()
    val e = graft.sources.Tables.load(spark, sf, "documents")
      .agg(count(lit(1)), sum(col("n_chars").cast("bigint")),
        sum(length(concat(lit("a,\""), col("lang"), lit("\",b")))
          .cast("bigint")),
        countDistinct(col("lang"))).head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      === ((e.getLong(0), e.getLong(1), e.getLong(2), e.getLong(3))))
  }

  test("q172 null semantics: the 3VL identities hold on the fixture") {
    val r = SparkEntry.queries("q172_null_semantics")(spark, sf).head()
    val (rows, nulls, in, notIn, notInNull, distinct, groups) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    assert(nulls > 0 && in > 0, "fixture must exercise both regimes")
    // NULL keys are neither IN nor NOT IN
    assert(in + notIn + nulls === rows)
    // NOT IN against a NULL-bearing list can never be true
    assert(notInNull === 0L)
    // GROUP BY keeps exactly one NULL group that DISTINCT excludes
    assert(groups === distinct + 1)
  }

  test("q174 merged evolution scan backfills the late column with NULLs") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q174_schema_evolution")(spark, sf).head()
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val e = docs.agg(count(lit(1)),
      sum(col("n_chars").cast("bigint")),
      sum(when(col("doc_id") % 2 === 1, 1L).otherwise(0L)),
      sum(when(col("doc_id") % 2 === 0, 1L).otherwise(0L)),
      countDistinct(when(col("doc_id") % 2 === 1, col("lang")))).head()
    assert((0 to 4).forall(i => got.getLong(i) === e.getLong(i)),
      s"merged read $got != source recompute $e")
    assert(got.getLong(2) > 0 && got.getLong(3) > 0,
      "both schema generations must contribute rows")
  }

  test("q62 bin-bucketed interval join equals the direct band join, no nested loop") {
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"), unix_micros(col("ts")).as("tu"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("tu").as("p_tu"))
    val e = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("tu").as("e_tu"))
    // reference: the O(n·m) band join the bin bucketing replaces
    val direct = p.join(e, abs(col("p_tu") - col("e_tu")) <= 60L * 1000000L)
      .agg(count(lit(1)), countDistinct(col("p_id")))
      .head()
    val binned = operators.Relational.q62IntervalJoin(spark, sf).head()
    assert((binned.getLong(0), binned.getLong(1)) ===
      (direct.getLong(0), direct.getLong(1)))
    val plan = operators.Relational.q62IntervalJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"bin bucketing must avoid the nested-loop fallback:\n$plan")
  }
}
