package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Geo
import graft.sources.Tables

/** The relational operator inventory of SURVEY.md §2, expressed as declared
  * queries DQ-1…DQ-21 (§2.12) over the driver's TPC-H-ish testdata, each with
  * a DuckDB oracle (see [[graft.SparkEntry.oracleSql]]).
  *
  * Design rules (100 TB stance):
  *  - every query is a single declarative Catalyst plan — no collect loops,
  *    no RDDs; filters/projections reach the parquet scan (pushdown + pruning);
  *  - aggregates over doubles that must hash-match the oracle go through
  *    DECIMAL (exact, order-independent) and are cast to double at the end;
  *  - small-dimension joins are explicitly `broadcast()` (DQ-11);
  *  - top-k is sort+limit → Catalyst TakeOrderedAndProject, never a full sort.
  */
object Relational {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  /** DQ-1 — scan + count of lineitem.
    * (ref: CSV scan S1, SemiSupervisedAndBaseClassifiers.scala:53-57; global
    * count A1, SelfTraining.scala:133) */
  def q01ScanCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").agg(count(lit(1)).as("cnt"))

  /** DQ-2 — sentinel-substring filter + non-empty filter, count.
    * (ref: manual line parse S3 `!_.contains("?")`,
    * SemiSupervisedAndBaseClassifiers.scala:287-288) */
  def q02FilterSentinel(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(!col("text").contains("?") && length(col("text")) > 0)
      .agg(count(lit(1)).as("cnt"))

  /** DQ-3 — parquet write + read-back round trip of a filtered projection.
    * (ref: vestigial file sink S9, BaseClassifiers.scala:837) */
  def q03ParquetRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    // per-invocation path: a fixed one races concurrent sessions (one
    // session's overwrite deleting part-files under another's read)
    val out = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q03_" +
      java.util.UUID.randomUUID().toString
    t(spark, dir, "orders")
      .filter(col("o_totalprice") > 150000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .write.mode("overwrite").parquet(out)
    // materialize the read-back eagerly so the scratch dir can be deleted
    // NOW instead of leaking one UUID dir per invocation for the session
    // lifetime (the checkpoint blocks are freed by the ContextCleaner once
    // the frame is unreachable)
    val back = spark.read.parquet(out).localCheckpoint()
    graft.util.Fs.deleteRecursively(out)
    back
  }

  /** q154: ORC SINK + SCAN roundtrip (S-surface extension) — source-format
    * breadth for the other columnar format Spark ships natively: write a
    * filtered projection as ORC, read it back, return it. The oracle reads
    * the ORIGINAL parquet with the same filter, so equality pins the full
    * encode/decode round trip (types incl. DATE, row set). Same
    * per-invocation scratch-dir discipline as q03. */
  def q154OrcRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q154_" +
      java.util.UUID.randomUUID().toString
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 48.0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_shipdate"))
      .write.mode("overwrite").orc(out)
    val back = spark.read.orc(out).localCheckpoint()
    graft.util.Fs.deleteRecursively(out)
    back
  }

  /** q191: JSON SINK + SCAN roundtrip under HOSTILE payloads — the format
    * matrix closer (parquet q03, ORC q154, quote-hostile CSV q171): JSONL
    * is every interchange pipeline's lingua franca, and its classic
    * corruption is an unescaped newline/quote/backslash splitting a
    * record. Every document's payload gets the full escape gauntlet
    * appended (newline, tab, double-quote, backslash, JSON structural
    * chars, non-ASCII incl. an astral-plane emoji), is written as JSONL,
    * read back line-framed, and summarized: row count, codepoint length
    * sum, and a content checksum (per-row hex60 of id|lang|payload mod
    * 1e9+7, summed mod 1e9+7 — order-independent, DECIMAL-safe at any
    * scale). The oracle computes the same summary over the ORIGINAL
    * table + the same appended literal, so any row split, truncation, or
    * mojibake in the writer/reader flips the checksum. */
  def q191JsonRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.sketch60
    val out = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q191_" +
      java.util.UUID.randomUUID().toString
    val gauntlet = "\n\"\\\t{}[],:čüé🐦"
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        concat(col("text"), lit(gauntlet)).as("payload"))
      .coalesce(2)
      .write.mode("overwrite").json(out)
    val back = spark.read
      .schema("doc_id BIGINT, lang STRING, payload STRING")
      .json(out)
      .agg(count(lit(1)).as("n_rows"),
        sum(length(col("payload"))).cast("bigint").as("sum_len"),
        pmod(sum(pmod(sketch60(concat_ws("|", col("doc_id"), col("lang"),
            col("payload"))), lit(1000000007L)).cast("decimal(38,0)")),
          lit(1000000007L)).cast("bigint").as("checksum"))
      .localCheckpoint()
    graft.util.Fs.deleteRecursively(out)
    back
  }

  /** q157: SMALL-FILE COMPACTION — the warehouse maintenance pass every
    * long-running ingest pipeline needs (streaming sinks and per-batch
    * writers fragment tables into thousands of tiny files; at 100 TB the
    * file-listing + per-file open overhead dominates scan cost long
    * before I/O does). The op: read the fragmented table, rewrite it at a
    * target file count with rows SORTED WITHIN each output file on
    * (lang, n_chars) — compaction is the free moment to also lay rows out
    * for parquet min/max row-group skipping (the q123 page-index lesson).
    *
    * Gate determinism: the fragmented input is staged at 64 round-robin
    * partitions and compacted to 4 (LEAST(·, row count) — an sf whose
    * table is smaller than the partition count writes one file per row);
    * production sizes the target from totalBytes / targetFileBytes (or
    * AQE rebalance) — same plan, computed counts. Output pins row
    * preservation (count + content sum) AND both file counts, so a
    * compaction that drops or duplicates rows, or silently stops
    * compacting, fails the gate loudly. */
  def q157Compaction(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q157_" +
      java.util.UUID.randomUUID().toString
    def nFiles(p: String): Long =
      new java.io.File(p).listFiles().count(f =>
        f.getName.endsWith(".parquet") && !f.getName.startsWith("."))
    t(spark, dir, "documents")
      .repartition(64)
      .write.parquet(s"$scratch/small")
    val small = spark.read.parquet(s"$scratch/small")
    small.repartition(4)
      .sortWithinPartitions(col("lang"), col("n_chars"))
      .write.parquet(s"$scratch/compacted")
    val nSmall = nFiles(s"$scratch/small")
    val nCompacted = nFiles(s"$scratch/compacted")
    val out = spark.read.parquet(s"$scratch/compacted")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("bigint").as("sum_chars"))
      .withColumn("n_files_small", lit(nSmall))
      .withColumn("n_files_compacted", lit(nCompacted))
      .localCheckpoint()
    graft.util.Fs.deleteRecursively(scratch)
    out
  }

  /** q171: CSV SINK + SCAN roundtrip — the remaining cell of the format
    * matrix (parquet q03, ORC q154, JSONL ingest q103): write a
    * projection as quoted CSV, read it back with an explicit schema, and
    * pin the round trip against the ORIGINAL table. The projection
    * includes a deliberately hostile column (embedded commas and double
    * quotes) so the quote/escape path is what's being gated, not just
    * happy-path tokens — a CSV writer that mis-escapes shifts columns
    * and fails the count/char-sum equality loudly. Same per-invocation
    * scratch-dir discipline as q03/q154. */
  def q171CsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q171_" +
      java.util.UUID.randomUUID().toString
    t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        col("n_chars").cast("bigint").as("n_chars"),
        // coalesce: Spark's concat is NULL-absorbing while DuckDB's
        // concat skips NULL arguments — without it a NULL lang would
        // silently diverge engine and oracle on sum_tricky_len
        concat(lit("a,\""), coalesce(col("lang"), lit("")),
          lit("\",b")).as("tricky"))
      .write.mode("overwrite").option("header", "true")
      // the reader's ignore*WhiteSpace defaults silently TRIM unquoted
      // fields (RelationalSpec pins the trailing-space case) — a CSV
      // pipeline that round-trips must disable them on both ends
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false").csv(out)
    val back = spark.read
      .schema("doc_id BIGINT, source STRING, lang STRING, " +
        "n_chars BIGINT, tricky STRING")
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false").csv(out)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(length(col("tricky")).cast("bigint")).as("sum_tricky_len"),
        countDistinct(col("lang")).as("n_langs"))
      .localCheckpoint()
    graft.util.Fs.deleteRecursively(out)
    back
  }

  /** q172: NULL-SEMANTICS CONTRACT CANARY — the three-valued-logic
    * behaviors every engine swap silently breaks, pinned as integers
    * (the q142 pattern, applied to NULL logic instead of timestamp
    * encodings): a nullable key is injected over orders, then one pass
    * counts (1) IN over a literal list, (2) NOT IN — NULL keys drop out
    * under 3VL, they are neither in nor not-in, (3) NOT IN against a
    * list CONTAINING a NULL — the classic trap, provably zero rows
    * forever, (4) COUNT(DISTINCT) — excludes NULLs, versus (5) GROUP BY
    * — which collates all NULLs into one real group, so the two
    * "distinct" notions differ by exactly one. Engines agree on ANSI
    * semantics here; the canary exists so any future non-ANSI
    * regression (or a port to an engine with different defaults) fails
    * the gate loudly rather than corrupting filters downstream. */
  def q172NullSemantics(spark: SparkSession, dir: String): DataFrame = {
    val v = when(col("o_orderkey") % 7 === 0, lit(null))
      .otherwise(col("o_custkey") % 100)
    val d = t(spark, dir, "orders").select(v.cast("bigint").as("v"))
    val base = d.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
      sum(when(col("v").isin(1, 2, 3), 1L).otherwise(0L)).as("n_in"),
      sum(when(!col("v").isin(1, 2, 3), 1L).otherwise(0L)).as("n_not_in"),
      sum(when(!col("v").isin(lit(1), lit(2), lit(null)), 1L)
        .otherwise(0L)).as("n_not_in_null_list"),
      countDistinct(col("v")).as("n_distinct"))
    base.crossJoin(
      d.groupBy(col("v")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_groups")))
  }

  /** q174: SCHEMA-EVOLUTION SCAN — the schema-drift surface every
    * long-lived ingest hits: an early batch written WITHOUT a column, a
    * later batch written WITH it, one `mergeSchema` read unifying both —
    * old rows surface the new column as NULL, and the aggregate pins
    * exactly which rows carry values. Parquet's per-file self-describing
    * footers are what make this work (the reason columnar lakes tolerate
    * additive drift without a migration); by default Spark does NOT pay
    * the footer-merge cost — `mergeSchema` is an explicit opt-in, and a
    * reader that forgets it silently drops the new column, which is why
    * the n_with_lang/n_null_lang split is gate-pinned. Same scratch
    * discipline as q03/q154/q171. */
  def q174SchemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q174_" +
      java.util.UUID.randomUUID().toString
    val docs = t(spark, dir, "documents")
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("bigint").as("n_chars"))
      .write.parquet(s"$out/b=1")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("source"),
        col("n_chars").cast("bigint").as("n_chars"), col("lang"))
      .write.parquet(s"$out/b=2")
    val back = spark.read.option("mergeSchema", "true").parquet(out)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(when(col("lang").isNotNull, 1L).otherwise(0L))
          .as("n_with_lang"),
        sum(when(col("lang").isNull, 1L).otherwise(0L)).as("n_null_lang"),
        countDistinct(col("lang")).as("n_langs"))
      .localCheckpoint()
    graft.util.Fs.deleteRecursively(out)
    back
  }

  /** DQ-4 — two-column projection (ref: P1 select, SelfTraining.scala:137). */
  def q04Project(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))

  /** DQ-5 — NaN sentinel: inject NaN on a keyed predicate, filter isnan, count.
    * This is the reference's load-bearing unlabeled-row encoding
    * (ref: UnlabeledTransformer.scala:44; SelfTraining.scala:129). */
  def q05IsNanFilter(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("v",
        when(col("o_orderkey") % 10 === 0, lit(Double.NaN))
          .otherwise(col("o_totalprice")))
      .filter(isnan(col("v")))
      .agg(count(lit(1)).as("cnt"))

  /** DQ-6 — numeric comparison filter (ref: P3 confidence gate
    * `probMax > t`, SelfTraining.scala:149). Strict `>` preserved. */
  def q06FilterGt(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") > 45.0)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  /** DQ-7 — string equality filter (ref: P4,
    * SemiSupervisedAndBaseClassifiers.scala:343). */
  def q07FilterEqString(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"))

  /** DQ-8 — conjunctive band predicate + exact aggregate (TPC-H Q6 shape).
    * (ref: P5 trip-cleaning band filters,
    * SemiSupervisedAndBaseClassifiers.scala:931-934.)
    * Sum runs in DECIMAL so the result is order-independent and exact. */
  def q08BandRevenue(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
            col("l_discount").cast("decimal(18,2)"))
          .cast("double").as("revenue"))

  /** DQ-9 — string→numeric cast chain then grouped exact sum
    * (ref: P10 casts, SemiSupervisedAndBaseClassifiers.scala:320-324). */
  def q09CastSum(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .withColumn("yr", year(col("l_shipdate")).cast("long"))
      .withColumn("qty_d",
        col("l_quantity").cast("string").cast("decimal(18,2)"))
      .groupBy(col("yr"))
      .agg(sum(col("qty_d")).cast("double").as("sum_qty"))

  /** DQ-10 — na.drop on injected nulls (ref: P11,
    * SemiSupervisedAndBaseClassifiers.scala:58). */
  def q10NaDrop(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("s",
        when(col("o_orderkey") % 7 === 0, lit(null: String))
          .otherwise(col("o_orderstatus")))
      .na.drop(Seq("s"))
      .agg(count(lit(1)).as("cnt"))

  /** DQ-11 — small-dimension broadcast equi-join (ref: J2 scatter-update
    * replaced by join, FunctionsSemiSupervised.scala:203-253). Region/nation
    * are tiny at any SF — broadcast keeps this shuffle-free at 100 TB. */
  def q11BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val nation = t(spark, dir, "nation")
    val region = t(spark, dir, "region")
    nation.join(broadcast(region),
        nation("n_regionkey") === region("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
  }

  /** DQ-12 — distinct cardinality of a column (ref: A2,
    * SemiSupervisedAndBaseClassifiers.scala:352). */
  def q12DistinctCount(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .agg(countDistinct(col("o_orderpriority")).as("cnt"))

  /** DQ-13 — class-distribution ratio: one shuffle (groupBy + window-total)
    * instead of the reference's 2·k separate count jobs (ref: A3,
    * SemiSupervisedAndBaseClassifiers.scala:83-84,343-344). */
  def q13ClassRatio(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("ratio",
        col("cnt").cast("double") /
          sum(col("cnt")).over(Window.partitionBy()))

  /** DQ-14 — per-group first row via row_number window (the scalable
    * per-key dedup idiom; SURVEY §2.5). */
  def q14WindowRowNumber(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey")).orderBy(col("l_linenumber"))
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_orderkey"), col("l_linenumber"))
  }

  /** DQ-15 — deterministic global top-k (ref: O1 kBest selection
    * `sort.desc.limit(k)`, SelfTraining.scala:177). Ties broken by key so
    * the result set is unique; plans as TakeOrderedAndProject (no full sort
    * materialization — O(k) per partition then driver merge). */
  def q15TopK(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
        col("l_linenumber"))
      .limit(100)

  /** DQ-16 — bag union of complementary selections reassembles the relation
    * (ref: E1/E2 union of labeled+newly-labeled, SelfTraining.scala:154;
    * UnlabeledTransformer.scala:45). */
  def q16UnionPartition(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.filter(col("l_quantity") > 25.0)
      .union(li.filter(col("l_quantity") <= 25.0))
      .agg(count(lit(1)).as("cnt"))
  }

  /** DQ-17 — bag difference with duplicate preservation (ref: E3 exceptAll,
    * SelfTraining.scala:130,178). Grouped afterwards so the output is a
    * small deterministic multiset summary. */
  def q17ExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.select(col("l_returnflag"))
      .exceptAll(li.filter(col("l_quantity") > 10.0).select(col("l_returnflag")))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** DQ-18 — CASE WHEN banding then group count (ref: F1 binarization,
    * SemiSupervisedAndBaseClassifiers.scala:571-573). */
  def q18CaseWhenBand(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("band",
        when(col("o_totalprice") > 100000.0, lit("hi")).otherwise(lit("lo")))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("cnt"))

  /** DQ-19 — datetime part extraction incl. fractional hour (ref: F3 manual
    * string-split date parsing, SemiSupervisedAndBaseClassifiers.scala:881-892
    * — replaced by Catalyst datetime functions). */
  def q19DatetimeParts(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        month(col("ts")).cast("long").as("mo"),
        dayofmonth(col("ts")).cast("long").as("dy"),
        (hour(col("ts")) +
          minute(col("ts")) / lit(60.0) +
          second(col("ts")) / lit(3600.0)).as("frac_hour"))

  /** DQ-20 — haversine distance as a pure Catalyst expression (ref: F4 RDD
    * Scala-math haversine, SemiSupervisedAndBaseClassifiers.scala:899-913).
    * Lat/lon synthesized deterministically from events columns; rounded to
    * 2dp to absorb cross-engine libm ULP differences. */
  def q20Haversine(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("lat1", col("value") % 90.0)
      .withColumn("lon1", (col("user_id") % 180).cast("double") - 90.0)
      .select(
        col("event_id"),
        round(Geo.haversineKm(col("lat1"), col("lon1"),
          lit(40.7128), lit(-74.0060)), 2).as("dist_km"))

  /** DQ-21 — array_max over an array column (ref: U1, the reference's only
    * UDF — max over the probability vector, SelfTraining.scala:128 — replaced
    * by codegen'd built-ins array_max/greatest). */
  def q21ArrayMax(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(
        col("l_orderkey"), col("l_linenumber"),
        array_max(array(col("l_quantity"), col("l_discount"), col("l_tax")))
          .as("mx"))

  /** Analytic window functions over event streams: per-user ordered
    * row_number, lag, and running sum (DECIMAL accumulation so the running
    * values are exact and order-defined). SURVEY §2.5 notes the reference
    * has no windows; these are table stakes for a 100 TB pipeline. */
  def q45WindowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(spark, dir)
      .select(
        col("user_id"), col("event_id"),
        row_number().over(w).cast("long").as("rn"),
        lag(col("value"), 1).over(w).as("prev_value"),
        sum(col("value").cast("decimal(18,2)"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_value"))
  }

  /** Bag intersection (E4 — absent in the reference, completes the set-op
    * family): multiset of return flags present in both halves of lineitem. */
  def q46IntersectAll(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.filter(col("l_quantity") <= 25.0).select(col("l_returnflag"))
      .intersectAll(
        li.filter(col("l_quantity") > 25.0).select(col("l_returnflag")))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Hierarchical subtotals via ROLLUP (flag → flag×status → grand total) —
    * one shuffle produces all levels; exact DECIMAL sums. */
  def q47Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("double").as("sum_qty"))

  /** Fact⋈fact join through bucketed tables: both sides are written
    * bucketed by their join key (one-time shuffle at write), then joined
    * without any exchange and aggregated. Result is oracle-checked against
    * the plain join on the raw tables; the zero-Exchange plan property is
    * asserted in PlanSpec. */
  // One-time bucketed staging per input fingerprint — across JVMs, via an
  // on-disk marker (Bucketing.stageBucketedOnce): the write-side shuffle is
  // the amortized cost of bucketing, so repeated q48 calls (bench loops AND
  // fresh bench JVMs over unchanged testdata) must not re-pay — or
  // re-measure — it. Table names carry the sf-dir basename so the sf0.01
  // verify staging and the sf0.1 bench staging coexist in one warehouse.
  def q48BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    val suffix = dir.replaceAll(".*/", "").replace('.', '_')
    val liTable = s"graft_li_bucketed_$suffix"
    val ordTable = s"graft_ord_bucketed_$suffix"
    graft.plans.Bucketing.stageBucketedOnce(
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice")),
      liTable, "l_orderkey",
      graft.plans.Bucketing.inputFingerprint(spark, s"$dir/lineitem.parquet"))
    graft.plans.Bucketing.stageBucketedOnce(
      t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_orderstatus")),
      ordTable, "o_orderkey",
      graft.plans.Bucketing.inputFingerprint(spark, s"$dir/orders.parquet"))
    graft.plans.Bucketing.bucketedJoin(spark,
        liTable, "l_orderkey", ordTable, "o_orderkey")
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("sum_price"))
  }

  /** Unpivot / melt (q69): a wide per-flag aggregate turned into tidy
    * (id, metric, value) rows with Spark's native `unpivot` — the inverse
    * of q58's pivot. Runs AFTER the aggregation, so the melt triples a
    * handful of rows, never the fact table; decimal sums keep the
    * aggregates order-independent (oracle-exact). */
  def q69Unpivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("price"),
        sum(col("l_discount").cast("decimal(18,4)")).cast("double").as("disc"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("qty"), col("price"), col("disc")),
        "metric", "value")

  /** Full cube (q72): all four grouping combinations of
    * (returnflag, linestatus) in one pass — Spark expands the grouping sets
    * into a single partial-aggregating exchange, not four scans. Completes
    * the multi-dimensional family next to q47's rollup and q58's pivot. */
  def q72Cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))

  /** Ordered conversion funnel (q75): users who viewed, then clicked AFTER
    * their first view, then purchased AFTER that first qualifying click.
    *
    * ONE scan, ONE shuffle: the three stage timestamps are chained
    * conditional window minima over the same user_id partitioning —
    * tv = min(view times), tc = min(click times > tv), tp = min(purchase
    * times > tc) — so Catalyst plans a single exchange feeding three
    * Window nodes (no ORDER BY → whole-partition aggregate frames, one
    * sort), then a per-user distinct (exchange-free: user_id partitioning
    * satisfies the clustering) and a single 3-counter reduce. The previous
    * join-ladder form read the event log FOUR times and planned 9
    * exchanges; interleaved event types give parquet row-group stats no
    * skipping power, so each of those scans was a full pass at 100 TB.
    * NULL chaining gives the funnel predicate for free: a user with no
    * view has tv = NULL, so `tu > tv` is NULL and tc stays NULL (count()
    * skips NULLs). Timestamps compare as integer microseconds.
    *
    * Skew exposure, MEASURED ([[graft.tools.SkewProbe]], 20M events,
    * local[32]): a window partition cannot be salted or AQE-split, so one
    * hot user's events serialize into one task — probe: 1.88 s with no
    * hot key, 1.06 s at 10%, 2.32 s with one user owning 30% of all
    * events, 2.93 s at 60%. The 0% row runs first and carries the window
    * shape's stage warm-up (same first-row effect as the q76 probe), which
    * is why 10% reads BELOW it — the warm no-hot baseline is ~1.1 s and
    * the hot-share trend upward from there is genuine.
    * The tail grows sublinearly (the hot task is a single sequential scan
    * of that user's rows — no sort: the frames are whole-partition
    * aggregates), but at extreme scale a bot owning double-digit corpus
    * percent serializes that percent onto one core; the mitigation is
    * upstream (cap/partition pathological actors), not a different plan —
    * every 2-pass partial-agg alternative re-reads the log and re-joins
    * (the 9-exchange shape this replaced). */
  def q75Funnel(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))
    Tables.events(spark, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("tu"))
      .withColumn("tv",
        min(when(col("event_type") === "view", col("tu"))).over(w))
      .withColumn("tc",
        min(when(col("event_type") === "click" && col("tu") > col("tv"),
          col("tu"))).over(w))
      .withColumn("tp",
        min(when(col("event_type") === "purchase" && col("tu") > col("tc"),
          col("tu"))).over(w))
      .select(col("user_id"), col("tv"), col("tc"), col("tp")).distinct()
      .agg(
        count(col("tv")).as("n_viewed"),
        count(col("tc")).as("n_clicked_after_view"),
        count(col("tp")).as("n_purchased_after_click"))
  }

  /** Cohort retention matrix (q76): users bucketed by first-seen epoch day,
    * activity counted per (cohort day, day offset) — the
    * training-data-freshness twin of product retention. Day arithmetic is
    * integer epoch-day division (no timezone/calendar library in the hot
    * path, engine-exact). The per-user first-seen frame is O(distinct
    * users) — not safe to pin broadcast at scale. The event log is
    * repartitioned ONCE on user_id and that single exchange feeds all
    * three user_id-clustered operators: the (user_id, day) distinct
    * (hash-partitioning on a clustering-key subset satisfies the agg), the
    * first-seen groupBy, and the act⋈first join — without it each would
    * shuffle the act lineage separately.
    *
    * Join strategy vs user cardinality, MEASURED ([[graft.tools
    * .SkewProbe]], 20M events, local[32], 10 MB broadcast threshold): the
    * probe observed SortMergeJoin at EVERY cardinality from 10k through
    * 4M distinct users — no broadcast row was ever recorded — with the
    * hash-exchange count constant at 3 (both join children reuse the
    * single pinned user_id exchange, so the sort-merge adds no shuffle),
    * and wall time moving only 2.35 s at 100k users → 4.80 s at 4M (a 40×
    * spread; the 10k first probe row, 3.61 s, carries stage warm-up and
    * is outside the trend). Broadcast of the first-seen frame is asserted
    * only at gate SF by PlanSpec (BroadcastHashJoin), not observed in the
    * probe; what the probe shows is that losing the broadcast costs no
    * extra exchange at any probed cardinality. */
  def q76CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(
      col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
    val act = ev.repartition(col("user_id")).distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    act.join(first, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Z-order layout cells (q96): the multi-dimensional clustering key the
    * lakehouse formats call Z-ORDER, computed as a pure Catalyst
    * expression — bucketize each dimension to 8 bits against its global
    * range, then bit-interleave the buckets so nearby (user, day) pairs
    * get nearby keys. Writing the log `repartitionByRange(z)
    * .sortWithinPartitions(z)` gives every file/row-group a bounding BOX
    * in BOTH dimensions, so a predicate on EITHER user_id or day prunes
    * row groups by min/max stats — the property a single-column sort only
    * provides for its leading column. The report groups by the top
    * 2+2-bit z prefix (a 4×4 grid) and emits each cell's per-dimension
    * bucket bounds: the quadrant-locality the layout would give files.
    *
    * Everything is integer arithmetic (bucket = (v−min)·256 ÷ span via
    * integer division; interleave = sums of bit shifts), so the oracle
    * hash-matches exactly. Scale shape: one agg for the global bounds
    * (broadcast back as a 1-row frame), one codegen'd projection for z,
    * one partial-agg groupBy over ≤16 cells; the write-path
    * repartitionByRange is the same range exchange any global sort pays —
    * there is no cheaper way to get multi-dim locality.
    *
    * Measured, not narrated ([[graft.tools.SkewProbe]] q96 section: the
    * same 20M-row table written unsorted / user_id-sorted / z-ordered
    * with 1 MB row groups, one 2-D box ≈1/64 per dimension): row-group
    * min/max pruning emits 20M rows from the unsorted layout, 339.6k
    * from the 1-D sort (prunes user_id only, reads every day), 80–120k
    * from the z-order — ~200× less than unsorted, ~3–4× less than the
    * 1-D sort, because only z-cells overlapping BOTH ranges survive. */
  def q96ZOrderCells(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("user_id"),
      expr("unix_micros(ts) DIV 86400000000").as("day"))
    val bounds = ev.agg(
      min(col("user_id")).as("u0"), max(col("user_id")).as("u1"),
      min(col("day")).as("d0"), max(col("day")).as("d1"))
    val z = (0 until 8).map { i =>
      (expr(s"(ub DIV ${1L << i}) % 2") * lit(1L << (2 * i + 1))) +
        (expr(s"(db DIV ${1L << i}) % 2") * lit(1L << (2 * i)))
    }.reduce(_ + _)
    ev.crossJoin(broadcast(bounds))
      .withColumn("ub", expr("((user_id - u0) * 256) DIV (u1 - u0 + 1)"))
      .withColumn("db", expr("((day - d0) * 256) DIV (d1 - d0 + 1)"))
      .withColumn("z", z)
      .withColumn("cell", expr("z DIV 4096"))
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ub")).as("min_ub"), max(col("ub")).as("max_ub"),
        min(col("db")).as("min_db"), max(col("db")).as("max_db"))
  }

  /** Snapshot diff (q82): full-outer reconciliation of two corpus versions
    * on the document key, each row classified added / removed / changed /
    * unchanged by digest comparison — the bookkeeping op an incremental
    * ingest publishes with every refresh. Compares md5 digests, never
    * bodies, so the join carries (id, 16-byte hash); the snapshots here are
    * deterministic doc_id slices with a deterministic mutation so the
    * oracle can restate them. */
  def q82SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val old = docs.filter(col("doc_id") % 10 < 8)
      .select(col("doc_id"), md5(col("text")).as("h_old"))
    val nw = docs.filter(col("doc_id") % 10 > 1)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 7 === 0, upper(col("text")))
          .otherwise(col("text"))).as("h_new"))
    old.join(nw, Seq("doc_id"), "full_outer")
      .select(when(col("h_old").isNull, "added")
        .when(col("h_new").isNull, "removed")
        .when(col("h_old") =!= col("h_new"), "changed")
        .otherwise("unchanged").as("status"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n"))
  }

  /** The plan half of q95, built by the caller inside
    * [[withRuntimeFilterConf]] — exposed unmaterialized so PlanSpec can
    * assert the injected bloom filter on the probe side. */
  private[graft] def runtimeFilteredJoin(spark: SparkSession,
      dir: String): DataFrame = {
    val hot = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderkey"))
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"), col("l_extendedprice"))
      .join(hot, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)"))
          .cast("double").as("revenue"))
  }

  /** Session-scoped runtime-filter settings, restored after `body`: bloom
    * injection on (the application-side size floor dropped so the gate's
    * MB-scale fact table qualifies — at 100 TB the default 10 GB floor is
    * already met) and auto-broadcast off, because `InjectRuntimeFilter`
    * targets shuffle joins — under a broadcast the probe-side filter
    * would be redundant with the build-side HashedRelation. Same
    * single-session caveat as q85's conf flip. */
  private[graft] def withRuntimeFilterConf[T](spark: SparkSession)
      (body: => T): T = {
    val flips = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "64MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = flips.map { case (k, _) => k -> spark.conf.getOption(k) }
    flips.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** Runtime bloom-filter pruned fact join (q95): revenue of line items
    * belonging to high-value orders, with Spark's `InjectRuntimeFilter`
    * building a bloom filter from the SELECTIVE dimension side and
    * applying `might_contain` on the fact side BEFORE its shuffle — at
    * 100 TB this is the difference between shuffling every fact row and
    * shuffling only the ~20% that can possibly join (and with a
    * sorted/clustered fact layout the same predicate prunes row groups at
    * the scan). The rewrite fires at optimization time, so the
    * materialization runs INSIDE the conf window (the summary frame that
    * escapes is checkpointed, counters only); PlanSpec asserts
    * `bloom_filter_might_contain` lands on the probe side.
    *
    * Measured, not narrated ([[graft.tools.SkewProbe]] q95 section, 20M-row
    * parquet fact, selectivity sweep): the injected filter cuts fact-side
    * shuffle records to within bloom-FPR of the true join fraction —
    * 20M → 19.8k at 1/1000 selectivity, 20M → 200k at 1/100, and at 1/2
    * it passes 99.8% (pure overhead — why the rule gates on a selective
    * creation side). On local[32] with an in-page-cache fact the bloom
    * BUILD outweighs the avoided local shuffle, so the win is in shuffled
    * records (= network+disk at cluster scale), not local seconds. */
  def q95RuntimeFilter(spark: SparkSession, dir: String): DataFrame =
    withRuntimeFilterConf(spark) {
      runtimeFilteredJoin(spark, dir).localCheckpoint()
    }

  /** CDC latest-wins corpus merge (q92) — the upsert/delete compaction an
    * incremental corpus refresh runs instead of a full rewrite (the
    * merge-on-read shape of the lakehouse table formats): a versioned
    * change log (updates at v2, new inserts at v2, tombstones at v3) is
    * unioned with the base corpus and resolved per key to the
    * highest-version row, with surviving tombstones dropping the key.
    * The change slices here are deterministic doc_id selections with
    * deterministic mutations (same device as q82) so the oracle can
    * restate them; output carries (key, version, digest) — never bodies.
    *
    * Scale shape: resolution is ONE row_number window over the 8-byte
    * key — a single exchange of the base∪log union. The log is normally
    * ≪ the base, so the exchange is dominated by the base's one pass;
    * with the corpus bucketed on doc_id ([[graft.plans.Bucketing]]) the
    * exchange disappears entirely and the merge is a per-bucket local
    * sort — the compaction plan every table format converges on.
    * Tombstones filter AFTER resolution (a deleted key must win first,
    * or a stale base row resurrects it). */
  def q92CorpusMerge(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    def slice(pred: Column, version: Long, text: Column, deleted: Boolean,
        key: Column = col("doc_id")) =
      docs.filter(pred).select(key.as("doc_id"),
        lit(version).as("version"), text.as("text"),
        lit(deleted).as("deleted"))
    val base = slice(lit(true), 1L, col("text"), deleted = false)
    val upd = slice(col("doc_id") % 5 === 0, 2L, upper(col("text")),
      deleted = false)
    // inserts get NEGATIVE keys — provably disjoint from real doc_ids
    // (always ≥ 0) at ANY corpus size; an additive offset would collide
    // with a real key once the corpus outgrew it, and the resulting
    // version-2 tie would resolve nondeterministically in both engines
    val ins = slice(col("doc_id") % 97 === 0, 2L, col("text"),
      deleted = false, key = -(col("doc_id") + 1L))
    val del = slice(col("doc_id") % 101 === 0, 3L, col("text"),
      deleted = true)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("version").desc)
    base.union(upd).union(ins).union(del)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && !col("deleted"))
      .select(col("doc_id"), col("version"), md5(col("text")).as("h"))
  }

  /** JSON field extraction from the events.props payload column — the
    * schema-on-read idiom a training-data pipeline needs for raw metadata. */
  def q33JsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))

  /** q103: JSONL corpus ingestion through [[graft.sources.Ingestion
    * .parseJsonl]] — full-document schema-on-read (vs q33's single-field
    * extract), with malformed-line accounting. The corpus has no jsonl
    * twin on disk, so the query renders each document as a jsonl line
    * with plain concatenation (the synthetic text is escape-free; the
    * oracle renders the identical bytes), planting one deterministically
    * truncated line — the parse must reject exactly that line into the
    * `_malformed` bucket and land every other field loss-lessly, proven
    * by per-language row/id/char totals over the PARSED columns. */
  def q103JsonlIngest(spark: SparkSession, dir: String): DataFrame = {
    val raw = Tables.load(spark, dir, "documents")
      .select(
        when(col("doc_id") === 0, lit("{\"id\":0,\"lang\":"))
          .otherwise(concat(
            lit("{\"id\":"), col("doc_id"),
            lit(",\"lang\":\""), col("lang"),
            lit("\",\"text\":\""), col("text"), lit("\"}")))
          .as("line"))
    graft.sources.Ingestion
      .parseJsonl(raw, "line", "id BIGINT, lang STRING, text STRING")
      .groupBy(coalesce(col("parsed.lang"), lit("_malformed")).as("lang"))
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(col("parsed.id")), lit(0L)).as("sum_id"),
        coalesce(sum(length(col("parsed.text"))), lit(0L))
          .cast("long").as("sum_chars"))
  }

  /** Per-user session windows (10-minute gap): Spark's session_window
    * merges events whose gap to the previous event is < the timeout; the
    * oracle reproduces that with a lag/cumulative-sum session id. Session
    * identity is compared by (user, first-event time in exact epoch µs). */
  def q50SessionWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("session_start"),
        col("n"))

  /** Salted two-phase aggregation over a skew-prone key (q54): the driver-
    * facing twin of [[graft.plans.Skew.saltedSumCount]]. event_type has few
    * distinct values — exactly the hot-key shape where a direct groupBy
    * pins one reducer per key at scale. Values pre-cast to DECIMAL so the
    * two-phase partial sums are order-independent (oracle-exact); one final
    * cast back to double. */
  def q54SaltedAgg(spark: SparkSession, dir: String): DataFrame =
    graft.plans.Skew.saltedSumCount(
        Tables.events(spark, dir)
          .select(col("event_type"), col("value").cast("decimal(18,2)").as("value")),
        "event_type", "value", salt = 16)
      .select(col("event_type"),
        col("sum_value").cast("double").as("sum_value"), col("cnt"))

  /** Sliding 2-hour windows advancing hourly — every event lands in two
    * buckets; the oracle mirrors that as a UNION ALL of the two shifted
    * hour-truncations. */
  def q51SlidingWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(window(col("ts"), "2 hours", "1 hour"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("start"),
        col("n"), col("sum_value"))

  /** Tumbling 1-hour event-time window aggregation, batch form — identical
    * semantics to the Structured Streaming version in graft.streaming
    * (groupBy window(ts) ≡ date_trunc bucket). Exact sums via DECIMAL. */
  def q32EventWindows(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Pure time-range join via bin bucketing (q62): purchases paired with
    * error events within ±60 s, ACROSS users — no equi key, so Spark's
    * planner would fall back to a broadcast nested loop (O(|p|·|e|)
    * comparisons, driver-broadcast side). Bucketing event time into
    * interval-width bins and exploding one side into its three candidate
    * bins turns it into a plain equi-join on the bin plus a residual band
    * filter: shuffle-partitioned, fan-out exactly 3, the shape that
    * survives 100 TB. Each error lives in ONE bin and every matching
    * purchase covers that bin, so no pair duplicates and no distinct is
    * needed. */
  def q62IntervalJoin(spark: SparkSession, dir: String): DataFrame = {
    val binUs = 60L * 1000000L // 60 s in microseconds = the band width
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("tu").as("p_tu"),
        explode(array(
          expr(s"tu DIV $binUs") - 1,
          expr(s"tu DIV $binUs"),
          expr(s"tu DIV $binUs") + 1)).as("bin"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("tu").as("e_tu"),
        expr(s"tu DIV $binUs").as("bin"))
    purchases.join(errors, Seq("bin"))
      .filter(abs(col("p_tu") - col("e_tu")) <= binUs)
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("p_id")).as("n_purchases_with_error"))
  }

  /** Trailing event-time range window (q63): per event, the 1-hour trailing
    * value sum for its user — a RANGE frame over microsecond event time
    * (q45's frames are ROWS-based; range frames are the feature-engineering
    * workhorse for "activity in the last hour" signals). DECIMAL sum keeps
    * the windowed aggregate order-independent (oracle-exact). */
  def q63TrailingWindow(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("tu"))
      .rangeBetween(-3600L * 1000000L, 0L)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tu"),
        col("value"))
      .select(col("user_id"), col("event_id"),
        sum(col("value").cast("decimal(18,2)")).over(w)
          .cast("double").as("trail_1h"))
  }

  /** Hour-of-day × event-type count matrix via `groupBy().pivot()` with an
    * EXPLICIT value list — one shuffle with map-side partials (an inferred
    * list would cost an extra distinct pass over the fact table, the thing
    * to avoid at 100 TB). Empty cells coalesced to 0 so the matrix is
    * total (Spark pivot-count yields null there; the oracle's FILTER
    * counts yield 0). */
  def q58PivotEventMatrix(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(spark, dir)
      .groupBy(hour(col("ts")).cast("long").as("hr"))
      .pivot("event_type", types)
      .count()
      .select(col("hr") +: types.map(t => coalesce(col(t), lit(0L)).as(t)): _*)
  }

  /** q85 — the reference's bag-difference remainder (O2/J1: a corpus minus
    * a selected subset, `exceptAll` — ref SelfTraining.scala:130,159)
    * run through the engine's extension-point fix: with both sides
    * carrying the [[graft.plans.BagOps.UidCol]] row identity and
    * `spark.graft.rewriteBagDifference=true`, the injected
    * [[graft.plans.BagDifferenceToAntiJoin]] rule rewrites
    * `Except(isAll=true)` into a LEFT ANTI join on the 8-byte uid —
    * instead of Catalyst's RewriteExceptAll expansion, whose
    * sum-of-multiplicities aggregate shuffles ENTIRE rows on all columns
    * (the 100 TB cliff when rows carry feature vectors; SURVEY §7).
    * PlanSpec asserts the physical plan is the anti join (and not the
    * aggregate+generate expansion).
    *
    * Both sides derive from ONE materialized tagging: the corpus is
    * uid-tagged and `localCheckpoint`ed, and the subset is a filter over
    * that checkpointed frame — uid alignment holds by construction (the
    * nondeterministic id is evaluated exactly once), not by hoping the
    * planner never pushes the filter below the tagging or re-plans the
    * scan. This mirrors production, where the uid is a column persisted
    * with the corpus, not re-derived per query. The conf flip is scoped to
    * plan CONSTRUCTION and restored — analysis happens eagerly at
    * `exceptAll`, so the returned frame keeps the rewritten plan. NOTE:
    * the flip writes session-wide conf; a concurrent `exceptAll` on the
    * SAME session during this window would also see the rewrite enabled.
    * The gate and Bench run queries sequentially; concurrent callers
    * should set the conf once for the session instead of toggling. */
  def q85BagDiffRemainder(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.{BagDifferenceToAntiJoin, BagOps}
    val corpus = BagOps.withUid(
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))).localCheckpoint()
    val prev = spark.conf.getOption(BagDifferenceToAntiJoin.ConfKey)
    spark.conf.set(BagDifferenceToAntiJoin.ConfKey, "true")
    val remainder =
      try corpus.exceptAll(corpus.filter(col("l_quantity") > 45.0))
      finally prev match {
        case Some(v) => spark.conf.set(BagDifferenceToAntiJoin.ConfKey, v)
        case None => spark.conf.unset(BagDifferenceToAntiJoin.ConfKey)
      }
    remainder
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("l_quantity").cast("decimal(18,2)"))
          .cast("double").as("sum_qty"))
  }

  /** q118: per-user co-occurrence LIFT of event types — basket-style
    * association mining ("users who view also purchase?"): for each
    * unordered type pair, how many users did both, and the lift
    * c_ab·N / (c_a·c_b) in ppm.
    *
    * The per-user self-join is bounded by each user's DISTINCT type set
    * (≤ |type vocabulary| per user, typically a handful), so pair
    * generation is linear in users — the equi-join key is user_id, never a
    * cross product. Aggregates land on |types|² rows; the count tables
    * broadcast back. Lift is the q99 decimal contract: the quotient stays
    * DECIMAL end to end ((numer − numer % denom)/denom — `div` would force
    * BIGINT and overflow at ~1e13 user-pairs), floor-exact against the
    * oracle's int128 division. */
  def q118CooccurrenceLift(spark: SparkSession, dir: String): DataFrame = {
    val b = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = b.agg(count_distinct(col("user_id")).as("n"))
    val c = b.groupBy(col("event_type")).agg(count(lit(1)).as("c1"))
    b.as("a").join(b.as("x"),
        col("a.user_id") === col("x.user_id") &&
        col("a.event_type") < col("x.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("x.event_type").as("tb"))
      .agg(count(lit(1)).as("cab"))
      .join(broadcast(c.select(col("event_type").as("ta"), col("c1").as("ca"))),
        Seq("ta"))
      .join(broadcast(c.select(col("event_type").as("tb"), col("c1").as("cb"))),
        Seq("tb"))
      .crossJoin(broadcast(n))
      .select(col("ta"), col("tb"), col("cab").as("n_both"),
        expr("cast(((cast(cab as decimal(38,0)) * n * 1000000)" +
          "  - (cast(cab as decimal(38,0)) * n * 1000000)" +
          "    % (cast(ca as decimal(38,0)) * cb))" +
          " / (cast(ca as decimal(38,0)) * cb) as bigint)").as("lift_ppm"))
  }

  /** q119: event-type TRANSITION matrix — first-order Markov statistics of
    * user behavior (the sequence-model feed every funnel/recommendation
    * pipeline derives): for each (from, to) adjacent pair in a user's
    * time-ordered stream, the count and the row-normalized transition
    * probability in ppm.
    *
    * The only corpus-sized operation is one window `lead()` partitioned by
    * user and ordered by (ts, event_id) — the (hash-partition by user, sort
    * within partition) shape that scales with user cardinality; the ts tie
    * breaks on event_id so successor identity is a total order the oracle
    * reproduces. Transition counts are |types|² rows; the probability is an
    * exact integer ppm through the q99 decimal floor-division contract
    * (n·10⁶ would overflow BIGINT past ~9e12 transitions per row — real at
    * corpus scale). */
  def q119TransitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = graft.sources.Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("from_type"))
      .agg(sum(col("n")).as("row_n"))
    trans.join(broadcast(totals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("cast(((cast(n as decimal(38,0)) * 1000000)" +
          "  - (cast(n as decimal(38,0)) * 1000000) % row_n)" +
          " / row_n as bigint)").as("prob_ppm"))
  }

  /** q122: TPC-H Q5 — the canonical 6-table star join (region → nation →
    * supplier/customer, orders date slice, lineitem facts), local-supplier
    * revenue per nation. The headline multi-way-join shape every warehouse
    * engine is judged on, declared fully relationally so Catalyst owns the
    * join order.
    *
    * Scale shape: the date predicate reaches the orders SCAN (pushed to
    * parquet, ~1/6 of orders survive); region+nation collapse to a
    * broadcast before touching anything big; supplier joins WITHOUT a
    * broadcast hint — at this sf the planner broadcasts it from size
    * estimates, at 100 TB (1B suppliers) it flips to shuffle on its own,
    * and pinning a hint would OOM exactly like q61's dim discussion. The
    * two genuinely large joins (lineitem⋈orders on orderkey,
    * ⋈customer on custkey) shuffle on their keys with AQE sizing the
    * partitions. Revenue l_extendedprice·(1−l_discount) runs end-to-end in
    * DECIMAL (exact, order-independent) and becomes a rounded double only
    * in the final projection — the q08 contract. */
  def q122TpchQ5(spark: SparkSession, dir: String): DataFrame = {
    val nat = t(spark, dir, "nation")
      .join(broadcast(t(spark, dir, "region")
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = t(spark, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1997-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = t(spark, dir, "lineitem").select(
      col("l_orderkey"), col("l_suppkey"),
      (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") -
          col("l_discount").cast("decimal(18,2)"))).as("rev"))
    val cust = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("rev")).cast("double"), 2).as("revenue"))
  }

  /** q139: SKYLINE (Pareto front) of documents on two anti-correlated
    * objectives — MAXIMIZE distinct-token count, MINIMIZE character count
    * ("most information per byte"): a document survives iff no other
    * document is at least as good on both axes and strictly better on
    * one. The classic multi-criteria operator relational engines ship as
    * a dedicated node; here it is two windowed sweeps.
    *
    * One sweep computes a skyline exactly: order by (nc ASC), keep a row
    * iff its dt beats the running max over STRICTLY smaller nc (a RANGE
    * frame, so nc ties never see each other) and it is the max dt within
    * its own nc (an equal-nc row with higher dt dominates). That sweep
    * is a global window — so the operator runs TWO-PHASE like q127's
    * prefix scan: phase 1 sweeps each doc_id-hash chunk independently
    * (any dominator eliminates its victims locally, so global skyline
    * points always survive), phase 2 sweeps the union of the chunk
    * skylines — a skyline-sized frame, not the corpus. Phase 2 equals a
    * one-shot global sweep by idempotence; the spec pins both against a
    * brute-force dominance scan. */
  def q139Skyline(spark: SparkSession, dir: String, chunks: Int = 16): DataFrame = {
    def sweep(df: DataFrame, part: Seq[Column]): DataFrame = {
      val prefix = Window.partitionBy(part: _*).orderBy(col("nc"))
        .rangeBetween(Window.unboundedPreceding, -1)
      val same = Window.partitionBy(part :+ col("nc"): _*)
      df.withColumn("best_prev", max(col("dt")).over(prefix))
        .withColumn("best_same", max(col("dt")).over(same))
        .filter(col("dt") === col("best_same") &&
          (col("best_prev").isNull || col("dt") > col("best_prev")))
        .drop("best_prev", "best_same")
    }
    val m = Tables.load(spark, dir, "documents").select(
      col("doc_id"), col("n_chars").as("nc"),
      size(array_distinct(split(col("text"), " "))).cast("bigint").as("dt"))
    val local = sweep(m.withColumn("chunk", pmod(col("doc_id"), lit(chunks))),
      Seq(col("chunk")))
    sweep(local.drop("chunk"), Nil)
      .select(col("doc_id"), col("nc"), col("dt"))
  }

  /** q126: TPC-H Q18 (large-volume customers) — the aggregate-then-join-back
    * shape: a HAVING subquery over the fact table materialized as an
    * aggregate, then joined to its dimensions.
    *
    * Scale shape: the only full-fact work is ONE map-side-combined
    * sum(l_quantity) shuffle keyed on l_orderkey; the >200 cut drops the
    * aggregate to a sliver (~0.1% of orders), and AQE sees the tiny
    * survivor side at runtime and broadcasts it into the orders and
    * customer joins — the join-back costs survivor-sized, not fact-sized,
    * work. Quantities sum in DECIMAL (order-independent, oracle-exact);
    * o_orderdate is projected as a yyyy-MM-dd STRING so the cross-engine
    * compare never depends on timestamp encodings. */
  def q126TpchQ18(spark: SparkSession, dir: String): DataFrame = {
    val big = t(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qsum"))
      .filter(col("qsum") > 200)
    big
      .join(t(spark, dir, "orders").select(col("o_orderkey"),
          col("o_custkey"), col("o_orderdate"), col("o_totalprice")),
        col("l_orderkey") === col("o_orderkey"))
      .join(t(spark, dir, "customer").select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("o_totalprice"),
        col("qsum").cast("double").as("sum_qty"))
  }

  /** q188: SOLE-LATE-SUPPLIER (the TPC-H Q21 SHAPE on this schema — the
    * reference's star joins q122/q126 cover inner-join planning; this one
    * exercises the OTHER half of Catalyst's join arsenal, composed
    * LeftSemi + LeftAnti correlation: suppliers who shipped late into a
    * multi-supplier order where NO other supplier was late — the classic
    * "who alone kept the order waiting" blame query. Lateness is
    * l_shipdate > o_orderdate + 365 days (this synthetic schema has no
    * commit/receipt dates; the join algebra, which is what Q21 tests, is
    * unchanged).
    *
    * Scale shape: all three correlation joins key on l_orderkey — ONE
    * shuffle partitioning serves the orders join, the EXISTS semi and the
    * NOT-EXISTS anti (Spark reuses the exchange); the suppkey inequality
    * rides the join condition, never a post-filter on a fanned-out
    * product; supplier names broadcast; the top-20 is a
    * TakeOrderedAndProject. Output is Q21's: (s_name, numwait), numwait
    * counting LATE LINES, ties broken by name inside the limit. */
  def q188LateSupplier(spark: SparkSession, dir: String,
      lateDays: Int = 365): DataFrame = {
    val lines = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(t(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") +
          expr(s"INTERVAL $lateDays DAYS")).as("is_late"))
    val late = lines.filter(col("is_late"))
    val anyOther = lines
      .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val lateOther = late
      .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
    late
      .join(anyOther, col("l_orderkey") === col("ok2") &&
        col("l_suppkey") =!= col("sk2"), "left_semi")
      .join(lateOther, col("l_orderkey") === col("ok3") &&
        col("l_suppkey") =!= col("sk3"), "left_anti")
      .join(broadcast(t(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name").asc)
      .limit(20)
  }

  /** q142: the events.ts ENCODING CONTRACT as a declared gate query — a
    * canary, not an analytic. The driver's datagen has already flipped the
    * parquet encoding once (TIMESTAMP(NANOS) → TIMESTAMP(MICROS, NTZ));
    * that flip silently broke six r12 bench queries because nothing in the
    * CORRECTNESS gate read a raw timestamp value end-to-end. This pins the
    * whole chain: [[graft.sources.Tables.events]] normalization →
    * session-UTC wall-clock semantics → integer epoch micros, against
    * DuckDB's naive read of the same file. A future encoding flip (or a
    * session-timezone drift, via hour_sum) lands HERE as one red row
    * instead of as a pile of bench errors. All outputs integer-exact:
    * epoch micros, not rendered timestamps — string formatting trivia
    * can't mask a unit shift. */
  def q142TsContract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).agg(
      count(lit(1)).as("n"),
      unix_micros(min(col("ts"))).as("min_us"),
      unix_micros(max(col("ts"))).as("max_us"),
      sum(hour(col("ts")).cast("bigint")).as("hour_sum"))

  /** Stage the documents table re-written as a HIVE-PARTITIONED layout
    * (`…/lang=en/part-*.parquet`) once per corpus fingerprint — the
    * warehouse layout a 100 TB corpus actually lives in (per-language /
    * per-source / per-date directories), built with the same crash-safe
    * publishOnce lifecycle as the band/IVF/ppjoin indexes. */
  def stagePartitionedDocsOnce(spark: SparkSession, dir: String): String = {
    val src = new java.io.File(s"$dir/documents.parquet")
    val slug = graft.util.Staging.pathSlug(dir) + "_" +
      graft.util.Staging.fileFingerprint(src)
    val root = new java.io.File(
      s"${graft.util.Staging.stagingRoot}/graft_partdocs/$slug")
    graft.util.Staging.publishOnce(root, s"partdocs:${root.getName}") { st =>
      Tables.load(spark, dir, "documents")
        .write.mode("overwrite").partitionBy("lang").parquet(st.getPath)
    }
  }

  /** q147: PARTITIONED warehouse layout — sink + pruned scan, end to end.
    * `partitionBy("lang")` writes one directory per language; a reader
    * filtering on the partition column never LISTS — let alone reads —
    * the other partitions (`PartitionFilters` in the scan node,
    * plan-asserted in PlanSpec). At 100 TB this is the first-order I/O
    * lever: a one-language slice of a 5-language corpus touches 1/5 of
    * the files BY CONSTRUCTION, before row groups, pages, or bloom
    * filters say anything. The aggregate is integer-exact (count, char
    * sum, distinct sources) so the DuckDB oracle — reading the ORIGINAL
    * unpartitioned table with an ordinary WHERE — pins both the layout
    * round-trip (no rows lost or retyped by the partition encoding) and
    * the pruned read's answer. */
  def q147PartitionedScan(spark: SparkSession, dir: String): DataFrame = {
    val root = stagePartitionedDocsOnce(spark, dir)
    spark.read.parquet(root)
      .filter(col("lang") === "en")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("bigint")).as("sum_chars"),
        countDistinct(col("source")).as("n_sources"))
  }

  /** q189: DYNAMIC PARTITION PRUNING — q147's static prune needs the
    * literal `lang = 'en'` in the query text; the 100 TB warehouse case
    * is harder: the pruning keys only EXIST after filtering a dimension
    * (here: "romance-family languages", a family attribute the fact table
    * doesn't carry). A naive plan scans every fact partition and throws
    * rows away post-join; DPP instead evaluates the dim filter first,
    * reuses its broadcast as an IN-subquery PARTITION filter on the fact
    * scan, and never lists the non-qualifying language directories —
    * plan-asserted (`dynamicpruning` in PartitionFilters, PlanSpec).
    * The dim is a FIXED five-language (lang, family) fixture staged as
    * its own parquet table (stageLangDimOnce) — it must be file-backed,
    * not derived from the corpus, or constraint propagation rewrites the
    * family predicate into a static partition filter and DPP never
    * fires; if datagen ever grows beyond these langs the fixture (and
    * the DuckDB twin's VALUES dim) must grow with it. The DuckDB twin
    * replays the dim join over the ORIGINAL unpartitioned table, which
    * also pins the partitioned layout's round-trip under a join (vs
    * q147's plain WHERE). */
  def q189DynamicPruning(spark: SparkSession, dir: String): DataFrame = {
    val root = stagePartitionedDocsOnce(spark, dir)
    val fact = spark.read.parquet(root)
    // the family attribute must come from DATA (a file-backed dim), not
    // from an expression over lang: a `CASE ... END = 'romance'` dim is
    // rewritten by constraint propagation into a STATIC partition filter
    // (q147's case, no subquery needed) — the first q189 draft proved
    // that; only a join against opaque dim rows forces the DYNAMIC path
    val dim = spark.read.parquet(stageLangDimOnce(spark, dir))
    fact
      .join(dim.filter(col("family") === "romance"), Seq("lang"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("bigint")).as("sum_chars"))
  }

  /** q190: RUNTIME BLOOM-FILTER JOIN — q189's sibling for the fact table
    * that is NOT partitioned by the join key (the common case): when a
    * selective dim filter survives only as join input, Spark can build a
    * BLOOM FILTER over the dim's join keys at runtime and inject
    * `might_contain` into the fact side BEFORE its shuffle — at 100 TB
    * the difference between shuffling the whole fact table and shuffling
    * the ~survivors. Demonstrated under a SCOPED session (the q123
    * clone-session pattern): broadcast disabled (the 100 TB stance — a
    * dim joined to a 100 TB fact may still broadcast, but the point here
    * is the shuffle-join path) and the application-side size threshold
    * lowered so the gate-scale fact qualifies; production keeps the 10 GB
    * default. Plan-asserted: the fact scan side carries
    * `BloomFilterMightContain` fed by a bloom aggregate subquery.
    * Answer (urgent-order revenue by priority) is engine-invariant —
    * the filter is semantics-preserving — so the DuckDB twin is the
    * plain join. */
  def q190RuntimeFilter(spark: SparkSession, dir: String): DataFrame = {
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    scoped.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "1KB")
    val orders = t(scoped, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val lines = t(scoped, dir, "lineitem")
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1).cast("decimal(18,2)") -
            col("l_discount").cast("decimal(18,2)"))).as("rev"))
    lines.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("rev")).cast("double"), 2).as("revenue"))
  }

  /** q192: AQE SKEW-JOIN SPLIT — the runtime answer to the problem q54's
    * salting solves by hand: a shuffle join keyed on a HOT key puts one
    * partition's worth of work on one task (the canonical straggler at
    * 100 TB — one executor runs for hours while 999 idle). AQE detects
    * the skewed partition from runtime shuffle statistics and SPLITS it
    * into sub-partitions, replicating the matching build side — no
    * salting in the query text. The skew is synthesized (80% of docs
    * collapse onto one join key; the rest keep their source) and the
    * detection thresholds are lowered in a SCOPED clone session so
    * gate-scale shuffle sizes qualify (production keeps the 256 MB
    * default — same plan, bigger numbers). Plan-asserted: the join's
    * AQEShuffleRead shows `isSkew=true` sub-reads. The rollup answer is
    * skew-invariant, so the DuckDB twin is the plain join. */
  def q192SkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    scoped.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100b")
    scoped.conf.set(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "100b")
    scoped.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    scoped.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    // the rollup after the join REUSES the join's hash partitioning, so
    // splitting the hot partition forces a re-shuffle of the join output;
    // by default AQE refuses skew handling that adds an exchange — this
    // opt-in says "a straggler costs more than a shuffle", which is the
    // correct trade at 100 TB where the hot partition is hours, not KBs
    scoped.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    def skewKey = when(col("doc_id") % 10 < 8, lit("hot"))
      .otherwise(col("source"))
    // round-robin repartition BEFORE the keyed shuffle: a skewed reduce
    // partition is split at MAP-OUTPUT-CHUNK granularity, so a
    // single-mapper input (one tiny parquet split at gate scale) is
    // unsplittable no matter how skewed — at 100 TB the mappers number
    // in the thousands and this repartition is the scan itself
    val left = t(scoped, dir, "documents")
      .select(skewKey.as("k"), col("n_chars"))
      .repartition(8)
    // materialized (localCheckpoint) so the JOIN's right child is a fresh
    // shuffle stage: skew handling must re-read the right side's map
    // outputs to replicate them against the split partitions, which it
    // cannot do through the aggregate's own reused exchange
    val right = t(scoped, dir, "documents")
      .select(skewKey.as("k"), col("doc_id"))
      .groupBy(col("k")).agg(count(lit(1)).as("k_docs"))
      .localCheckpoint()
    left.join(right, Seq("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n_chars").cast("bigint")).as("sum_chars"),
        max(col("k_docs")).as("k_docs"))
  }

  /** q193: DATASET FREEZE MANIFEST — the data-versioning primitive every
    * reproducible training run starts from: one row per input table with
    * its row count and an order-independent row-identity checksum (per
    * row, hex60 of the table's natural key rendered canonically, summed
    * mod 1e9+7). Pin the manifest next to a model checkpoint and any
    * later row loss, duplication, or re-keyed regeneration of ANY input
    * is one red row — the "which exact data trained this" answer DVC-style
    * tooling provides, as a query. Value-level drift is deliberately NOT
    * this operator's job (the per-table roundtrips q03/q154/q171/q191 and
    * the q142 ts contract pin content); identity + cardinality is what a
    * freeze manifest promises.
    *
    * Scale shape: ten independent scans (each reads ONLY its key
    * columns — columnar pruning makes the census nearly free), per-scan
    * map-side partial sums, one 10-row rollup. Nothing corpus-sized
    * crosses the exchange. */
  def q193FreezeManifest(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.sketch60
    val m = 1000000007L
    val parts: Seq[(String, DataFrame)] = Seq(
      "region" -> t(spark, dir, "region")
        .select(col("r_regionkey").cast("string").as("k")),
      "nation" -> t(spark, dir, "nation")
        .select(col("n_nationkey").cast("string").as("k")),
      "customer" -> t(spark, dir, "customer")
        .select(col("c_custkey").cast("string").as("k")),
      "supplier" -> t(spark, dir, "supplier")
        .select(col("s_suppkey").cast("string").as("k")),
      "part" -> t(spark, dir, "part")
        .select(col("p_partkey").cast("string").as("k")),
      "orders" -> t(spark, dir, "orders")
        .select(col("o_orderkey").cast("string").as("k")),
      "lineitem" -> t(spark, dir, "lineitem")
        .select(concat_ws("|", col("l_orderkey"), col("l_linenumber")).as("k")),
      "events" -> Tables.events(spark, dir)
        .select(col("event_id").cast("string").as("k")),
      "documents" -> t(spark, dir, "documents")
        .select(concat_ws("|", col("doc_id"), col("n_chars")).as("k")),
      "embeddings" -> t(spark, dir, "embeddings")
        .select(col("vec_id").cast("string").as("k")))
    parts.map { case (name, df) =>
      df.select(lit(name).as("tbl"), pmod(sketch60(col("k")), lit(m)).as("h"))
    }.reduce(_.unionAll(_))
      .groupBy(col("tbl"))
      .agg(count(lit(1)).as("n_rows"),
        pmod(sum(col("h")).cast("decimal(38,0)"), lit(m))
          .cast("bigint").as("id_checksum"))
  }

  /** q195: CORRELATED SCALAR-SUBQUERY DECORRELATION — TPC-H Q17 shape:
    * "lineitems ordered in a quantity below 20% of that part's own
    * average". Written as the user writes it — a correlated scalar
    * subquery in SQL text — because the POINT is the planner transform:
    * Catalyst's RewriteCorrelatedScalarSubquery turns the per-row
    * subquery into ONE aggregate over lineitem (grouped by l_partkey,
    * map-side partial_avg) joined back to the outer scan. Executed
    * naively, the subquery is O(|lineitem|) scans of lineitem — the
    * classic warehouse killer; decorrelated it is two scans total, and
    * the filtered part dim rides in as a broadcast. Plan-asserted in
    * PlanSpec (partial_avg + no re-executed subquery in the physical
    * plan). Numerics: l_quantity is integral (1..50) so avg = exact-sum /
    * exact-count is the same IEEE double in both engines, and the final
    * revenue sum rides DECIMAL(18,2) per the numeric contract.
    * (ref equivalent: filter P3/P5 + aggregate A1 composed per-group;
    * the reference has no planner, so the decorrelation itself is the
    * Spark-first contribution.) */
  def q195AvgYearly(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("graft_q195_lineitem")
    t(spark, dir, "part").createOrReplaceTempView("graft_q195_part")
    spark.sql("""
      SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               / 7.0 AS avg_yearly,
             CAST(count(*) AS BIGINT) AS n_rows
      FROM graft_q195_lineitem l
      JOIN graft_q195_part p ON p.p_partkey = l.l_partkey
      WHERE p.p_brand = 'Brand#9' AND p.p_size < 25
        AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                            FROM graft_q195_lineitem l2
                            WHERE l2.l_partkey = p.p_partkey)
    """)
  }

  /** q198: Z-ORDER LAYOUT — the multi-dimensional data-skipping lever
    * (the OPTIMIZE ZORDER staple): a table sorted on one column can prune
    * files only for predicates on THAT column; interleaving the bits of
    * two normalized dimensions ([[graft.functions.ZOrder]]) clusters rows
    * that are close in BOTH, so per-file min/max stats skip files for 2-D
    * box predicates. The op: scale (l_partkey, l_suppkey) to 16 bits,
    * Morton-interleave, bucket by the top 3 curve bits (8 real parquet
    * directories, rows sorted within files on the full z-value for
    * row-group locality), then answer two box queries FROM THE WRITTEN
    * LAYOUT and simulate file skipping from the written buckets' actual
    * min/max stats against a plain partkey-sorted layout's stats.
    *
    * The gate pins both sides of the trade honestly: the suppkey-narrow
    * box (where a partkey sort prunes nothing — every linear bucket
    * spans all suppkeys) hits 2 of 8 z-buckets vs 8 of 8 linear, and the
    * partkey-narrow box hits 2 linear vs 4 z-buckets — z-order trades
    * the leading column's perfect clustering for usable clustering on
    * every curve dimension. Row counts + DECIMAL-free integer quantity
    * sums are answered from the round-tripped files, so a layout that
    * drops or re-types rows fails the same row. All arithmetic integer
    * (scale16's exact integer division, bit ops), so the DuckDB twin
    * replays it bit for bit. At 100 TB this bucketing is
    * repartitionByRange on z with sampled boundaries; fixed top-bit
    * buckets keep the gate deterministic (the same reasoning as q157's
    * LEAST'd file counts). */
  def q198ZOrderLayout(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.ZOrder
    val scratch = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q198_" +
      java.util.UUID.randomUUID().toString
    val li = t(spark, dir, "lineitem").select(
      col("l_partkey").as("x"), col("l_suppkey").as("y"),
      col("l_quantity").cast("long").as("qty"))
    val mm = li.agg(min(col("x")), max(col("x")),
      min(col("y")), max(col("y"))).head
    val (minx, maxx, miny, maxy) =
      (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
    val scaled = li
      .withColumn("x16", ZOrder.scale16(col("x"), lit(minx), lit(maxx)))
      .withColumn("y16", ZOrder.scale16(col("y"), lit(miny), lit(maxy)))
      .withColumn("zval", ZOrder.interleave16(col("x16"), col("y16")))
      .withColumn("zbucket", shiftright(col("zval"), 29))
      .withColumn("lbucket", shiftright(col("x16"), 13))
    scaled.repartition(col("zbucket"))
      .sortWithinPartitions(col("zbucket"), col("zval"))
      .write.partitionBy("zbucket").parquet(s"$scratch/z")
    val back = spark.read.parquet(s"$scratch/z")
    def bucketMins(df: DataFrame, bucket: String): Array[(Long, Long)] = df
      .groupBy(col(bucket))
      .agg(min(col("x16")).as("mnx"), min(col("y16")).as("mny"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val zStats = bucketMins(back, "zbucket") // from the WRITTEN layout
    val lStats = bucketMins(scaled, "lbucket")
    def boxRow(name: String, onX: Boolean): (String, Long, Long, Long, Long, Long) = {
      val cut = 16383L
      val pred = if (onX) col("x16") <= cut else col("y16") <= cut
      // coalesce: an empty box (possible after a datagen key-range
      // reshape) sums to NULL — report 0, don't NPE on getLong
      val agg = back.filter(pred)
        .agg(count(lit(1)), coalesce(sum(col("qty")), lit(0L))).head
      val hit = (s: Array[(Long, Long)]) =>
        s.count(b => (if (onX) b._1 else b._2) <= cut).toLong
      (name, agg.getLong(0), agg.getLong(1), hit(zStats), hit(lStats),
        zStats.length.toLong)
    }
    val out = Seq(
      boxRow("partkey_narrow", onX = true),
      boxRow("suppkey_narrow", onX = false))
      .toDF("box", "n_rows", "sum_qty", "files_hit_zorder",
        "files_hit_linear", "n_buckets")
      .localCheckpoint()
    graft.util.Fs.deleteRecursively(scratch)
    out
  }

  /** q204: THREE-CLAUSE MERGE (upsert) AGAINST THE PARTITIONED WAREHOUSE —
    * the general maintenance statement q178's CDC latest-wins only
    * approximates: one CDC batch applied as
    *   WHEN MATCHED AND op='del' THEN DELETE
    *   WHEN MATCHED THEN UPDATE (n_chars += 1000, text gets a rev marker)
    *   WHEN NOT MATCHED THEN INSERT
    * in ONE pass, copy-on-write at PARTITION granularity: the CDC batch
    * touches only two language partitions, so the merge (1) derives the
    * touched-partition set from the source keys (bounded by |partitions|),
    * (2) full-outer joins the source against the PRUNED target slice —
    * the pruning is static partition elimination, plan-asserted in
    * PlanSpec, and full-outer (not broadcast-left + anti) because MERGE's
    * matched/unmatched split needs both sides' orphans in one pass —
    * and (3) rewrites ONLY the touched directories via dynamic partition
    * overwrite; untouched partitions' FILES are physically untouched
    * (mtime/size-asserted in the spec). That is the Delta/Iceberg MERGE
    * execution shape re-expressed over plain parquet — a real lakehouse
    * table adds a transaction log, not different dataflow. At 100 TB the
    * lever is (1)+(3): a CDC batch over k of n partitions shuffles and
    * rewrites k/n of the table no matter how big n gets. The gate pins
    * per-clause counts, the touched-partition set (is_touched), and the
    * post-merge per-partition state read back from the rewritten layout;
    * the DuckDB oracle replays the CDC derivation and the clause algebra
    * over the original table. */
  def q204MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q204_" +
      java.util.UUID.randomUUID().toString
    val docs = Tables.load(spark, dir, "documents")
    try {
      docs.write.partitionBy("lang").parquet(s"$scratch/wh")
      mergeCdcInto(spark, s"$scratch/wh", docs).localCheckpoint()
    } finally graft.util.Fs.deleteRecursively(scratch)
  }

  /** q204's merge engine over an existing lang-partitioned warehouse —
    * factored out so the spec can bracket it with file listings. Returns
    * the per-lang report (clause counts + post-merge state). */
  private[graft] def mergeCdcInto(spark: SparkSession, wh: String,
      docs: DataFrame,
      planProbe: DataFrame => Unit = _ => ()): DataFrame =
    mergeApply(spark, wh, cdcSource(docs), planProbe)

  /** The q204/q206 CDC batch, derived deterministically from the corpus
    * so both DuckDB oracles can replay it: updates/deletes on the
    * doc_id%5 keys of the en/de partitions, inserts keyed past the id
    * space. (doc_id, s_lang, op). */
  private[graft] def cdcSource(docs: DataFrame): DataFrame = docs
    .filter(pmod(col("doc_id"), lit(5)) === 0 &&
      col("lang").isin("en", "de"))
    .select(col("doc_id"), col("lang").as("s_lang"),
      when(pmod(col("doc_id"), lit(15)) === 0, lit("del"))
        .otherwise(lit("upd")).as("op"))
    .unionByName(docs
      .filter(pmod(col("doc_id"), lit(17)) === 0 &&
        col("lang").isin("en", "de"))
      .select((col("doc_id") + 1000000L).as("doc_id"),
        col("lang").as("s_lang"), lit("ins").as("op")))

  /** Apply one CDC batch (doc_id, s_lang, op) to the lang-partitioned
    * warehouse at `wh` — q204's three-clause copy-on-write pass, factored
    * so q206 can drive it per micro-batch from foreachBatch. Returns the
    * per-lang report for THIS application (n_before = state this batch
    * saw). */
  private[graft] def mergeApply(spark: SparkSession, wh: String,
      src: DataFrame,
      planProbe: DataFrame => Unit = _ => ()): DataFrame = {
    val before = mergeBeforeState(spark, wh)
    val (touched, tallies) = mergeApplyCore(spark, wh, src, planProbe)
    mergeReport(spark, wh, before, touched, tallies)
  }

  /** Per-lang pre-merge cardinality, MATERIALIZED before any overwrite
    * (the frame and the warehouse files it reads would otherwise be
    * re-resolved over the rewritten layout at action time). */
  private[graft] def mergeBeforeState(spark: SparkSession,
      wh: String): DataFrame =
    spark.read.parquet(wh).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_before")).localCheckpoint()

  /** The three-clause MERGE projection — full-outer over the (already
    * partition-pruned) target slice, then the DELETE/UPDATE/INSERT
    * algebra plus a `clause` tag per row. Shared verbatim by q204/q206's
    * copy-on-write overwrite apply and q219's VERSIONED (file-retaining)
    * commit, so the two write disciplines cannot diverge on what a merge
    * MEANS — only on how the post-image reaches disk. */
  private[graft] def mergeClauseFrame(prunedTarget: DataFrame,
      src: DataFrame): DataFrame =
    prunedTarget
      .join(src, Seq("doc_id"), "full_outer")
      .select(
        col("doc_id"),
        when(col("op") === "ins", concat(lit("inserted:"), col("doc_id")))
          .when(col("op") === "upd", concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"),
        when(col("op") === "ins", lit("cdc")).otherwise(col("source"))
          .as("source"),
        when(col("op") === "ins", lit(42L))
          .when(col("op") === "upd", col("n_chars") + 1000L)
          .otherwise(col("n_chars")).cast("bigint").as("n_chars"),
        coalesce(col("lang"), col("s_lang")).as("lang"),
        when(col("op") === "del", lit("deleted"))
          .when(col("op") === "upd", lit("updated"))
          .when(col("op") === "ins", lit("inserted"))
          .otherwise(lit("unchanged")).as("clause"))

  /** One CDC application's WRITE + TALLY core: derives the touched set,
    * runs the pruned full-outer clause pass, rewrites the touched
    * partitions (dropping fully-emptied ones), and returns the touched
    * langs plus per-lang (updated, deleted, inserted) tallies from ONE
    * aggregation over the checkpointed clause frame. Deliberately scans
    * NO report state — q206 calls this once per micro-batch, and the
    * before/after warehouse scans belong to the one report assembled at
    * the end ([[mergeReport]]), not to every batch. */
  private[graft] def mergeApplyCore(spark: SparkSession, wh: String,
      src: DataFrame, planProbe: DataFrame => Unit = _ => ())
      : (Seq[String], Seq[(String, Long, Long, Long)]) = {
    // touched set: distinct source partition keys — |partitions|-bounded
    val touched = src.select(col("s_lang")).distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    val target = spark.read.parquet(wh)
    val merged0 =
      mergeClauseFrame(target.filter(col("lang").isin(touched: _*)), src)
    // the spec inspects the PRE-materialization plan here (the
    // localCheckpoint below truncates lineage, hiding the pruned scan)
    planProbe(merged0)
    // materialize: the write below overwrites files this plan reads
    val merged = merged0.localCheckpoint()
    val prevMode = spark.conf
      .get("spark.sql.sources.partitionOverwriteMode", "static")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      merged.filter(col("clause") =!= "deleted").drop("clause")
        .write.mode("overwrite").partitionBy("lang").parquet(wh)
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
    // ONE aggregation yields clause tallies AND the survivor counts the
    // emptied-partition drop needs (a separate survivor probe would be a
    // second job over the same checkpointed frame, paid per q206 batch)
    val tallyRows = merged.groupBy(col("lang")).agg(
      sum(when(col("clause") === "updated", 1L).otherwise(0L))
        .as("n_updated"),
      sum(when(col("clause") === "deleted", 1L).otherwise(0L))
        .as("n_deleted"),
      sum(when(col("clause") === "inserted", 1L).otherwise(0L))
        .as("n_inserted"),
      sum(when(col("clause") =!= "deleted", 1L).otherwise(0L))
        .as("n_survivors"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // dynamic overwrite cannot express "partition became EMPTY": a batch
    // whose deletes remove every surviving row of a touched partition
    // writes zero rows there, so the overwrite rewrites nothing and the
    // old files would resurrect every deleted row on the next read.
    // Drop such partitions' directories explicitly — the COW delete a
    // transaction log would have recorded. (Unreachable with q204/q206's
    // committed CDC derivation; real for the general engine.)
    touched
      .filterNot(l => tallyRows.exists(t => t._1 == l && t._5 > 0L))
      .foreach(l => graft.util.Fs.deleteRecursively(s"$wh/lang=$l"))
    (touched, tallyRows.map(t => (t._1, t._2, t._3, t._4)).toSeq)
  }

  /** The per-lang merge report, assembled ONCE from the pre-merge state,
    * the (possibly batch-accumulated) clause tallies, and a single read
    * of the post-merge layout — shared verbatim by q204's one-shot apply
    * and q206's end-of-stream rollup so the report shape (left joins,
    * emptied-partition zero rows) cannot diverge between them. */
  private[graft] def mergeReport(spark: SparkSession, wh: String,
      before: DataFrame, touched: Seq[String],
      tallies: Seq[(String, Long, Long, Long)]): DataFrame = {
    import spark.implicits._
    val clauses = tallies
      .toDF("lang", "n_updated", "n_deleted", "n_inserted")
    val after = spark.read.parquet(wh).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_after"),
        sum(col("n_chars").cast("bigint")).as("sum_chars_after"))
    before
      .join(clauses, Seq("lang"), "left_outer")
      // left: a fully-emptied partition has no `after` rows but still
      // owes its report row (n_after = 0)
      .join(after, Seq("lang"), "left_outer")
      .select(col("lang"),
        col("lang").isin(touched: _*).as("is_touched"),
        col("n_before"),
        coalesce(col("n_updated"), lit(0L)).as("n_updated"),
        coalesce(col("n_deleted"), lit(0L)).as("n_deleted"),
        coalesce(col("n_inserted"), lit(0L)).as("n_inserted"),
        coalesce(col("n_after"), lit(0L)).as("n_after"),
        coalesce(col("sum_chars_after"), lit(0L)).as("sum_chars_after"))
  }

  /** VERSIONED reads over a lang-partitioned parquet warehouse — the
    * time-travel primitive q204's copy-on-write merge lacks (its dynamic
    * partition overwrite physically REPLACES touched files, so history
    * is gone the moment the merge commits). Here a commit is a MANIFEST:
    * the sorted list of data files that constitute version N, written
    * crash-safe (staging + atomic rename, the [[graft.util.Staging]]
    * idiom). A mutating commit writes its post-image as NEW files
    * (append — parquet task files are UUID-named, so nothing collides)
    * and the next manifest references new files for touched partitions,
    * the PRIOR manifest's files for untouched ones; old files stay on
    * disk, referenced only by older manifests. Read-as-of-N is then just
    * "read exactly manifest N's files" (with basePath so the partition
    * column survives an explicit file-list read). That is the
    * Iceberg/Delta snapshot mechanism re-expressed over plain parquet —
    * a real table format adds a transaction log and compaction, not
    * different dataflow; at 100 TB the manifest is itself a table and
    * the file list comes from the commit protocol, not this gate-scale
    * directory walk (the walk is bounded by |files of the scratch
    * store|, never by rows). */
  /** One manifest line of a [[VersionedWarehouse]] version: a file the
    * version references. `kind` "d" = data file, "x" = deletion-vector
    * sidecar (doc_id keys). `seq` = the version that ADDED the file —
    * a DV applies only to data files with strictly smaller seq
    * (Iceberg's data-sequence-number rule for equality deletes).
    * `stats` = optional per-file zone map (minDoc, maxDoc, minChars,
    * maxChars) recorded at commit time for metadata-only file skipping.
    * Serialized as TSV; a bare path parses as a legacy data line. */
  private[graft] final case class ManifestEntry(seq: Int, kind: String,
      path: String, stats: Option[(Long, Long, Long, Long)] = None) {
    def serialize: String =
      s"$seq\t$kind\t$path" + stats.fold("") { s =>
        s"\t${s._1}\t${s._2}\t${s._3}\t${s._4}" }
  }
  private[graft] object ManifestEntry {
    def parse(line: String): ManifestEntry = line.split('\t') match {
      case Array(p) => ManifestEntry(0, "d", p)
      case Array(s, k, p) => ManifestEntry(s.toInt, k, p)
      case Array(s, k, p, a, b, c, d) => ManifestEntry(s.toInt, k, p,
        Some((a.toLong, b.toLong, c.toLong, d.toLong)))
      case _ => throw new IllegalArgumentException(
        s"unparseable manifest line: $line")
    }
  }

  private[graft] final class VersionedWarehouse(
      spark: SparkSession, val wh: String) {
    // the store is DRIVER-LOCAL scratch (listing + manifests go through
    // java.io); every Spark read/write below addresses it with an
    // explicit file:// scheme so a non-local default Hadoop FS cannot
    // split the store across filesystems (the q211 lesson)
    private def whUri = s"file://$wh"
    private def manifestDir = new java.io.File(wh, "_manifests")

    private def walkParquet(dir: java.io.File): Seq[String] = {
      val root = new java.io.File(wh).toPath
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      walk(dir).filter(_.getName.endsWith(".parquet"))
        .map(f => root.relativize(f.toPath).toString)
        .sorted
    }

    /** Relative paths of every data file currently in the store, sorted
      * (partition dirs only — _manifests, _deletes and _SUCCESS are
      * metadata). */
    private[graft] def listDataFiles(): Seq[String] =
      Option(new java.io.File(wh).listFiles()).toSeq.flatten
        .filter(f => f.isDirectory && f.getName.contains("="))
        .flatMap(walkParquet).sorted

    /** Relative paths of every deletion-vector sidecar on disk. */
    private[graft] def listDeleteFiles(): Seq[String] = {
      val d = new java.io.File(wh, "_deletes")
      if (d.isDirectory) walkParquet(d) else Nil
    }

    /** Commit version `v` with exactly `files` as its data files
      * (relative paths, all stamped seq=v): staging + atomic rename so
      * a crash never leaves a torn manifest. */
    private[graft] def commit(v: Int, files: Seq[String]): Unit =
      commitEntries(v, files.map(ManifestEntry(v, "d", _)))

    /** Commit version `v` from full manifest entries (retained files
      * keep their original seq — the Iceberg data-sequence-number rule
      * the deletion-vector read path depends on). */
    private[graft] def commitEntries(v: Int,
        entries: Seq[ManifestEntry]): Unit = {
      manifestDir.mkdirs()
      val tmp = new java.io.File(manifestDir,
        s".staging_${java.util.UUID.randomUUID()}")
      java.nio.file.Files.write(tmp.toPath,
        entries.sortBy(e => (e.kind, e.path)).map(_.serialize)
          .mkString("\n").getBytes("UTF-8"))
      val dst = new java.io.File(manifestDir, s"v$v")
      // Files.move WITHOUT REPLACE_EXISTING: a duplicate commit must
      // FAIL, not clobber — File.renameTo silently replaces an existing
      // target on POSIX, which would let a re-driven job rewrite
      // version history with no error
      try java.nio.file.Files.move(tmp.toPath, dst.toPath)
      catch {
        case e: java.nio.file.FileAlreadyExistsException =>
          java.nio.file.Files.deleteIfExists(tmp.toPath)
          throw new IllegalStateException(
            s"version $v already committed at $dst", e)
      }
    }

    private[graft] def manifestEntries(v: Int): Seq[ManifestEntry] = {
      val f = new java.io.File(manifestDir, s"v$v")
      require(f.isFile, s"no manifest for version $v at $f")
      new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
        .split("\n").toSeq.filter(_.nonEmpty).map(ManifestEntry.parse)
    }

    /** Version `v`'s DATA file paths (the pre-DV manifest surface —
      * q219/q221/q222 reason in these terms). */
    private[graft] def manifest(v: Int): Seq[String] =
      manifestEntries(v).filter(_.kind == "d").map(_.path)

    /** Every path (data + deletion vectors) version `v` references —
      * the reference-counting surface [[expire]] must protect. */
    private def referencedPaths(v: Int): Seq[String] =
      manifestEntries(v).map(_.path)

    /** Read a set of data entries with every applicable deletion vector
      * applied: a DV with sequence number s masks doc_ids ONLY in data
      * files with seq < s (Iceberg's sequence-number rule for equality
      * deletes — without it, the post-image row a MOR update APPENDS
      * for the same doc_id would be masked by its own commit's DV).
      * Data entries group by seq — |versions|-bounded, never |rows| —
      * and each group anti-joins the union of its applicable DV keys. */
    private def readEntries(data: Seq[ManifestEntry],
        dvs: Seq[ManifestEntry]): DataFrame = {
      def read(paths: Seq[String]): DataFrame =
        spark.read.option("basePath", whUri)
          .parquet(paths.map(rel => s"$whUri/$rel"): _*)
      // empty entry set (e.g. asOfWhere pruned every file): an empty
      // frame with the table schema — the reduce/zero-path reads below
      // both throw on empty input. Schema comes from any data file in
      // the store (footer-only, limit 0 reads no rows).
      if (data.isEmpty) {
        val any = listDataFiles()
        require(any.nonEmpty, s"readEntries: empty entry set and no data " +
          s"files in store $wh — cannot derive the table schema")
        return read(Seq(any.head)).limit(0)
      }
      if (dvs.isEmpty) read(data.map(_.path))
      else data.groupBy(_.seq).toSeq.sortBy(_._1).map { case (seq, grp) =>
        val applicable = dvs.filter(_.seq > seq)
        if (applicable.isEmpty) read(grp.map(_.path))
        else read(grp.map(_.path)).join(
          spark.read.parquet(applicable.map(e => s"$whUri/${e.path}"): _*)
            .select(col("doc_id")).distinct(),
          Seq("doc_id"), "left_anti")
      }.reduce(_.unionByName(_))
    }

    /** Read the warehouse AS OF version `v` — exactly that manifest's
      * files (deletion vectors applied at scan time as an anti-join);
      * basePath keeps the lang partition column on an explicit
      * file-list read. */
    def asOf(v: Int): DataFrame = {
      val es = manifestEntries(v)
      readEntries(es.filter(_.kind == "d"), es.filter(_.kind == "x"))
    }

    /** ZONE-MAP-pruned as-of read: drop every data file whose recorded
      * (minDoc, maxDoc) interval cannot intersect [idLo, idHi] BEFORE
      * any row is touched, then apply the row-level predicate to the
      * survivors. Files committed without stats are never skipped.
      * Returns (frame, per-file skip decisions) — the decisions are the
      * |files|-bounded metadata the report and the spec pin. */
    def asOfWhere(v: Int, idLo: Long, idHi: Long)
        : (DataFrame, Seq[(ManifestEntry, Boolean)]) = {
      val es = manifestEntries(v)
      val decisions = es.filter(_.kind == "d").map { e =>
        val skip = e.stats.exists(s => s._1 > idHi || s._2 < idLo)
        (e, skip)
      }
      val df = readEntries(decisions.collect { case (e, false) => e },
        es.filter(_.kind == "x"))
        .filter(col("doc_id").between(idLo, idHi))
      (df, decisions)
    }

    /** The files a write this commit just appended, derived from a
      * before/after listing RESTRICTED to the touched partitions — a
      * concurrent writer's file in an untouched partition can no longer
      * be silently adopted into this commit's manifest. The store is
      * SINGLE-WRITER by design (driver-local scratch; a real table
      * format takes the file list from the write's own task-commit
      * output instead of any directory diff). */
    private def appendedFiles(before: Set[String],
        touched: Seq[String]): Seq[String] =
      listDataFiles().filterNot(before)
        .filter(f => touched.exists(l => f.startsWith(s"lang=$l/")))

    /** Apply one CDC batch as version `v` WITHOUT destroying history:
      * same clause algebra as q204 ([[mergeClauseFrame]], shared code),
      * but the post-image of the touched partitions lands as NEW files
      * and version v-1's files are left untouched on disk. Retained
      * entries keep their original seq and stats. Returns the touched
      * partition set. */
    def commitMerge(v: Int, src: DataFrame): Seq[String] = {
      val touched = src.select(col("s_lang")).distinct().collect()
        .map(_.getString(0)).sorted.toSeq
      val prior = manifestEntries(v - 1)
      val before = listDataFiles().toSet
      val pruned = asOf(v - 1).filter(col("lang").isin(touched: _*))
      mergeClauseFrame(pruned, src)
        .filter(col("clause") =!= "deleted").drop("clause")
        // one file per touched partition per commit (hash-partition by
        // lang: each lang's post-image lands in exactly one task) — the
        // Delta-style delta-commit layout, which also makes the commit's
        // file count a pure function of the CDC batch (q221's expiration
        // accounting reads it). A production store sizes output files by
        // bytes; a CDC batch's per-partition delta is the small side.
        .repartition(math.max(touched.size, 1), col("lang"))
        .write.mode("append").partitionBy("lang").parquet(whUri)
      commitEntries(v, prior.filterNot(e => e.kind == "d" &&
        touched.exists(l => e.path.startsWith(s"lang=$l/"))) ++
        withInheritedStats(v - 1,
          appendedFiles(before, touched).map(ManifestEntry(v, "d", _))))
      touched
    }

    /** Write a deletion-vector sidecar for version `v`: the doc_id keys
      * whose pre-`v` rows are dead. One tiny parquet under _deletes —
      * the whole point of merge-on-read is that the delete writes NO
      * data files and rewrites NOTHING. Returns its relative paths. */
    private def writeDeleteVector(v: Int, keys: DataFrame): Seq[String] = {
      val before = listDeleteFiles().toSet
      keys.select(col("doc_id")).coalesce(1)
        .write.parquet(s"$whUri/_deletes/v$v")
      listDeleteFiles().filterNot(before)
    }

    /** MERGE-ON-READ upsert as version `v` (Delta deletion vectors /
      * Iceberg equality deletes, re-expressed): instead of rewriting
      * touched partitions (COW, [[commitMerge]]), the commit APPENDS
      * only the inserted/updated post-image rows as new data files
      * (seq=v) and writes a DV sidecar masking the replaced/deleted
      * keys' OLD rows — every pre-existing data file is physically
      * untouched. The clause algebra is [[mergeClauseFrame]] VERBATIM,
      * so MOR and COW cannot diverge on what the merge means; the read
      * path ([[asOf]]) applies the DV as an anti-join under the
      * seq-number rule. At 100 TB this is the frequent-small-delete
      * discipline: commit cost scales with the CDC batch, never with
      * partition size. Returns the touched partition set. */
    def commitMorMerge(v: Int, src: DataFrame): Seq[String] = {
      val touched = src.select(col("s_lang")).distinct().collect()
        .map(_.getString(0)).sorted.toSeq
      val prior = manifestEntries(v - 1)
      val before = listDataFiles().toSet
      val pruned = asOf(v - 1).filter(col("lang").isin(touched: _*))
      // materialize ONCE: the append below must not re-run the join,
      // and the DV derives from the same clause pass
      val clause = mergeClauseFrame(pruned, src).localCheckpoint()
      clause.filter(col("clause").isin("inserted", "updated"))
        .drop("clause")
        .repartition(math.max(touched.size, 1), col("lang"))
        .write.mode("append").partitionBy("lang").parquet(whUri)
      val dv = writeDeleteVector(v, clause
        .filter(col("clause").isin("deleted", "updated")))
      commitEntries(v, prior ++
        withInheritedStats(v - 1,
          appendedFiles(before, touched).map(ManifestEntry(v, "d", _))) ++
        dv.map(ManifestEntry(v, "x", _)))
      touched
    }

    /** Pure MOR DELETE as version `v`: writes ONLY a deletion-vector
      * sidecar — zero data files, nothing rewritten (the contract q223
      * pins with a file-count check). `keys` is a doc_id frame. */
    def commitMorDelete(v: Int, keys: DataFrame): Unit =
      commitEntries(v, manifestEntries(v - 1) ++
        writeDeleteVector(v, keys).map(ManifestEntry(v, "x", _)))

    /** OPTIMIZE (small-file compaction) AS A VERSIONED COMMIT: rewrite
      * version v-1's live rows — deletion vectors applied, so
      * compaction also MATERIALIZES pending deletes — into one file per
      * partition, committed as version `v` referencing only the
      * compacted files. Data is bit-identical across the swap; prior
      * versions stay readable until [[expire]]d, at which point exactly
      * the pre-compaction files go (the q224 composition). Partition
      * set comes from the MANIFEST paths — metadata, no data scan.
      * Returns the compacted files' relative paths. */
    def optimize(v: Int): Seq[String] = {
      val langs = manifest(v - 1)
        .map(p => p.substring(0, p.indexOf('/'))).distinct.sorted
      val before = listDataFiles().toSet
      asOf(v - 1)
        .repartition(math.max(langs.size, 1), col("lang"))
        .write.mode("append").partitionBy("lang").parquet(whUri)
      val compacted = listDataFiles().filterNot(before)
      commitEntries(v, withInheritedStats(v - 1,
        compacted.map(ManifestEntry(v, "d", _))))
      compacted
    }

    /** Per-file zone-map stats for `rels`, computed in ONE Spark job
      * (group by input_file_name). Gate-scale convenience — a real
      * format takes these from each write task's commit message, never
      * from a post-hoc scan. */
    private[graft] def fileStats(rels: Seq[String])
        : Map[String, (Long, Long, Long, Long)] =
      spark.read.option("basePath", whUri)
        .parquet(rels.map(r => s"$whUri/$r"): _*)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("doc_id")).as("lo"), max(col("doc_id")).as("hi"),
          min(col("n_chars").cast("bigint")).as("clo"),
          max(col("n_chars").cast("bigint")).as("chi"))
        .collect().map { r =>
          val full = r.getString(0)
          val rel = full.substring(full.indexOf(wh) + wh.length + 1)
          rel -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        }.toMap

    /** Commit version `v` with per-file zone maps recorded in the
      * manifest — the stats [[asOfWhere]] prunes by. */
    private[graft] def commitWithStats(v: Int, files: Seq[String]): Unit = {
      val stats = fileStats(files)
      commitEntries(v, files.map(f => ManifestEntry(v, "d", f, stats.get(f))))
    }

    /** Whether version `v`'s manifest carries zone maps — a
      * stats-enabled store stays stats-enabled through mutating
      * commits ([[commitMerge]]/[[optimize]] stat their NEW files when
      * this is true; retained entries keep theirs verbatim). */
    private def statsEnabled(v: Int): Boolean =
      manifestEntries(v).exists(e => e.kind == "d" && e.stats.isDefined)

    /** Stamp stats onto fresh data entries iff the prior version was
      * stats-enabled (one extra |newFiles|-bounded job per commit —
      * production formats get these free from write-task commit
      * messages). */
    private def withInheritedStats(priorV: Int,
        entries: Seq[ManifestEntry]): Seq[ManifestEntry] =
      if (!statsEnabled(priorV) || entries.isEmpty) entries
      else {
        val stats = fileStats(entries.map(_.path))
        entries.map(e => e.copy(stats = stats.get(e.path)))
      }

    /** Partitions whose DATA FILE LISTS differ between versions `v0`
      * and `v1` — decided on manifest metadata only; identical file
      * sets provably cannot differ. (DV-bearing manifests diff on the
      * DV set too: a delete-only commit changes no data files but its
      * masked partitions still differ.) */
    private[graft] def changedPartitions(v0: Int, v1: Int): Seq[String] = {
      def byLang(v: Int): Map[String, Set[String]] =
        manifestEntries(v).filter(_.kind == "d").map(_.path)
          .groupBy(p => p.substring(p.indexOf('=') + 1, p.indexOf('/')))
          .view.mapValues(_.toSet).toMap
      def dvs(v: Int): Set[String] =
        manifestEntries(v).filter(_.kind == "x").map(_.path).toSet
      val (m0, m1) = (byLang(v0), byLang(v1))
      val dataChanged = (m0.keySet ++ m1.keySet)
        .filter(l => m0.get(l) != m1.get(l))
      // a DV delta can mask rows in any partition its keys touch, so
      // the prune goes conservative (ALL partitions) whenever the DV
      // sets differ — q227's MOR change feed therefore scans both full
      // endpoints (its scaladoc documents this); the k/n-restoring fix
      // is to bind each DV to the partitions its keys touch at commit
      // time and record that in the manifest entry
      val all = if (dvs(v0) != dvs(v1)) m0.keySet ++ m1.keySet
        else dataChanged
      all.toSeq.sorted
    }

    /** ROW-LEVEL CHANGE FEED between two versions — a snapshot diff
      * (the standard fallback when the format records no commit log),
      * manifest-pruned to [[changedPartitions]] first so both sides
      * scan k/n of the table, then ONE doc_id-keyed full-outer join.
      * Emits (doc_id, lang, op ∈ insert/update/delete, c0, c1) — the
      * delta stream q222 aggregates and q225's incremental view refresh
      * consumes. */
    private[graft] def changeFeed(v0: Int, v1: Int): DataFrame = {
      val changed = changedPartitions(v0, v1)
      // identical manifests → provably empty feed, no scan at all
      if (changed.isEmpty)
        return spark.range(0).select(col("id").as("doc_id"),
          lit("").as("lang"), lit("").as("op"),
          col("id").as("c0"), col("id").as("c1"))
      // the prune happens at the MANIFEST, not as a Catalyst partition
      // filter over the full file list: the scan is CONSTRUCTED from
      // only the changed partitions' files, so even the file index
      // never touches an unchanged partition (inputFiles-asserted)
      def side(v: Int): DataFrame = {
        val es = manifestEntries(v)
        readEntries(es.filter(e => e.kind == "d" &&
          changed.exists(l => e.path.startsWith(s"lang=$l/"))),
          es.filter(_.kind == "x"))
      }
      val a = side(v0)
        .select(col("doc_id"), col("n_chars").cast("bigint").as("c0"),
          col("lang").as("l0"))
      val b = side(v1)
        .select(col("doc_id"), col("n_chars").cast("bigint").as("c1"),
          col("lang").as("l1"))
      a.join(b, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), coalesce(col("l1"), col("l0")).as("lang"),
          when(col("l0").isNull, lit("insert"))
            .when(col("l1").isNull, lit("delete"))
            .when(col("c0") =!= col("c1"), lit("update"))
            .otherwise(lit("none")).as("op"),
          col("c0"), col("c1"))
        .filter(col("op") =!= "none")
    }

    /** SNAPSHOT EXPIRATION (vacuum) — the maintenance half of time
      * travel: drop every version NOT in `retain`, then delete the data
      * files no retained manifest references. Reference-counted at FILE
      * granularity, so a file shared by a retained and an expired
      * version survives (untouched partitions' files are exactly that
      * class). Deletion order is manifests-first: a crash mid-expire
      * leaves orphaned DATA files (rewept next expire), never a live
      * manifest pointing at deleted data. Returns the removed data
      * files, sorted. */
    def expire(retain: Seq[Int]): Seq[String] = {
      require(retain.nonEmpty, "expire: must retain at least one version")
      // refcount over EVERYTHING versions reference: data files AND
      // deletion-vector sidecars (an expired version's DV goes with it
      // unless a retained manifest still points at it)
      val referenced = retain.flatMap(referencedPaths).toSet
      val removable =
        (listDataFiles() ++ listDeleteFiles()).filterNot(referenced).sorted
      Option(manifestDir.listFiles()).toSeq.flatten.foreach { f =>
        // only v<digits> names ARE versions — a stray v-prefixed file
        // must not abort the sweep with a NumberFormatException; a
        // crashed commit's leftover .staging_* manifest is the one
        // orphan class nothing else resweeps, so expire collects it —
        // AGE-GATED (r21, ADVICE): an in-flight commitEntries in this
        // process (staging written, rename pending) must not have its
        // staging file swept out from under it; anything minutes old is
        // dead by definition (a commit stages and renames in one call)
        if (f.getName.matches("v\\d+")) {
          if (!retain.contains(f.getName.drop(1).toInt))
            java.nio.file.Files.delete(f.toPath)
        } else if (f.getName.startsWith(".staging_") &&
            System.currentTimeMillis() - f.lastModified() > 300000L)
          java.nio.file.Files.delete(f.toPath)
      }
      removable.foreach { rel =>
        java.nio.file.Files.delete(
          new java.io.File(wh, rel).toPath)
      }
      removable
    }

    /** Whether version `v` is still readable (its manifest survives). */
    def hasVersion(v: Int): Boolean =
      new java.io.File(manifestDir, s"v$v").isFile
  }

  /** q219: WAREHOUSE TIME TRAVEL — the versioned-read primitive a
    * reproducible training pipeline needs on top of q193's freeze
    * manifests: "query the warehouse AS OF manifest N", with N=0 still
    * answering bit-exactly AFTER a merge has changed the table. The
    * gate builds a scratch lang-partitioned store (v0), applies the
    * q204 CDC batch as a VERSIONED commit (v1 — same clause algebra,
    * shared [[mergeClauseFrame]]; history-retaining file-level COW
    * instead of q204's destructive overwrite), then reads BOTH versions
    * through their manifests and aggregates per (version, lang). The
    * DuckDB oracle replays v0 from the original table and v1 from the
    * CDC algebra — so the compare pins that as-of-0 still equals the
    * pre-merge state (time travel) AND that as-of-1 equals the merged
    * post-image (the commit), through real on-disk manifests.
    * Scale shape: one partitioned write per version touching only its
    * changed partitions; reads prune to the manifest's file list before
    * any row is touched — the same k/n-partitions lever as q204, plus
    * history for free because retained files are never rewritten. */
  def q219TimeTravel(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q219_" +
      java.util.UUID.randomUUID().toString
    val docs = Tables.load(spark, dir, "documents")
    try {
      // v0: the initial partitioned store + its manifest
      docs.write.partitionBy("lang").parquet(s"file://$scratch/wh")
      val vw = new VersionedWarehouse(spark, s"$scratch/wh")
      vw.commit(0, vw.listDataFiles())
      vw.commitMerge(1, cdcSource(docs))
      // ≤ 2·|langs| rows by here; materialize before the scratch dies
      Seq(0, 1).map { v =>
        vw.asOf(v).groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars").cast("bigint")).as("sum_chars"))
          .select(lit(v.toLong).as("version"), col("lang"),
            col("n_docs"), col("sum_chars"))
      }.reduce(_.unionByName(_)).localCheckpoint()
    } finally graft.util.Fs.deleteRecursively(scratch)
  }

  /** q221: SNAPSHOT EXPIRATION (vacuum) — time travel's maintenance
    * half: history retention is only viable if old versions can be
    * EXPIRED, deleting exactly the data files no retained manifest
    * references (Iceberg expire_snapshots / Delta VACUUM). The gate
    * builds the q219 store (v0, then a versioned merge as v1 — one file
    * per lang per commit, so every file count below is a pure function
    * of the CDC batch), expires v0, and reports per lang: the LIVE
    * version's aggregates read back AFTER the deletion (expiration must
    * not perturb the retained version — the reference-counted file
    * survival claim), the surviving file count, and how many files the
    * expiration removed. Untouched partitions' v0 files are REFERENCED
    * by v1 and must survive; touched partitions' v0 files are
    * unreferenced and must go. The DuckDB oracle replays the v1
    * aggregates from the CDC algebra and both file counts from the
    * touched-set derivation — nothing golden. Crash-safety: manifests
    * delete before data files, so an interrupted expire leaves orphans
    * (reswept later), never a readable version with missing data. */
  def q221ExpireSnapshots(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q221_" +
      java.util.UUID.randomUUID().toString
    val docs = Tables.load(spark, dir, "documents")
    try {
      val nLangs = docs.select(col("lang")).distinct().count().toInt
      // one file per lang in v0 (each lang's rows land in one task)
      docs.repartition(nLangs, col("lang"))
        .write.partitionBy("lang").parquet(s"file://$scratch/wh")
      val vw = new VersionedWarehouse(spark, s"$scratch/wh")
      vw.commit(0, vw.listDataFiles())
      vw.commitMerge(1, cdcSource(docs))
      val removed = vw.expire(retain = Seq(1))
      def langOf(rel: String): String =
        rel.substring(rel.indexOf('=') + 1, rel.indexOf('/'))
      val removedPerLang = removed.groupBy(langOf).view.mapValues(_.size.toLong)
      val filesPerLang = vw.listDataFiles().groupBy(langOf)
        .view.mapValues(_.size.toLong)
      import spark.implicits._
      // keyed by the UNION of surviving and removed langs: a CDC batch
      // that empties a lang entirely leaves it with removed files but no
      // surviving ones — its n_removed row must not vanish from the
      // report (latent with cdcSource, real for the general mechanism)
      val fileStats =
        (filesPerLang.keySet ++ removedPerLang.keySet).toSeq.sorted
          .map(l => (l, filesPerLang.getOrElse(l, 0L),
            removedPerLang.getOrElse(l, 0L)))
          .toDF("lang", "n_files", "n_removed")
      // left from fileStats for the same reason: an emptied lang has no
      // asOf(1) rows but still owes its report row (n_docs = 0)
      fileStats
        .join(vw.asOf(1).groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars").cast("bigint")).as("sum_chars")),
          Seq("lang"), "left_outer")
        .select(col("lang"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("sum_chars"), lit(0L)).as("sum_chars"),
          col("n_files"), col("n_removed"))
        .localCheckpoint()
    } finally graft.util.Fs.deleteRecursively(scratch)
  }

  /** q222: CHANGE DATA FEED BETWEEN VERSIONS — "what changed from
    * version 0 to version 1", as a query (Delta's table_changes /
    * Iceberg's changelog scan): per (lang, op ∈ insert/update/delete)
    * row counts and the net character delta. Computed as a SNAPSHOT
    * DIFF — the standard fallback when the format records no row-level
    * commit log — but manifest-pruned first: partitions whose FILE
    * LISTS are identical across the two manifests provably cannot
    * differ, so both sides scan only the changed partitions (here 2 of
    * 5; at 100 TB this is the whole game — the diff join touches k/n of
    * the table, and the pruning decision reads metadata only). The
    * remaining work is one doc_id-keyed full-outer join over the
    * changed slice. Oracle: DuckDB replays the per-clause counts and
    * deltas from the CDC algebra over the original table. */
  def q222ChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q222_" +
      java.util.UUID.randomUUID().toString
    val docs = Tables.load(spark, dir, "documents")
    try {
      docs.write.partitionBy("lang").parquet(s"file://$scratch/wh")
      val vw = new VersionedWarehouse(spark, s"$scratch/wh")
      vw.commit(0, vw.listDataFiles())
      vw.commitMerge(1, cdcSource(docs))
      // <= 3·|changed langs| rows out; materialize before the scratch
      // dies. The row-level diff (manifest-pruned to the changed
      // partitions, one doc_id-keyed full-outer join) is
      // [[VersionedWarehouse.changeFeed]] — shared with q225, whose
      // incremental view refresh consumes the same delta stream.
      vw.changeFeed(0, 1)
        .select(col("lang"), col("op"),
          (coalesce(col("c1"), lit(0L)) - coalesce(col("c0"), lit(0L)))
            .as("delta"))
        .groupBy(col("lang"), col("op"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("delta")).cast("bigint").as("delta_chars"))
        .localCheckpoint()
    } finally graft.util.Fs.deleteRecursively(scratch)
  }

  /** q223: MERGE-ON-READ DELETION VECTORS — the other half of every
    * modern table format next to q204/q219's copy-on-write: a mutation
    * that rewrites NOTHING. The gate builds the versioned store (v0,
    * one file per lang), applies the CDC batch's upsert half as a MOR
    * commit (v1: only the inserted/updated post-image rows APPEND as
    * new files; a deletion-vector sidecar masks the replaced keys' old
    * rows), then the delete half as a PURE-DV commit (v2: zero data
    * files written — the contract the n_del_data_files column pins).
    * The read path applies the DVs as anti-joins at scan time under the
    * sequence-number rule, so asOf(2) must be bit-equal to the COW
    * post-image of the same batch — the shared [[mergeClauseFrame]]
    * truth, which the CDC-algebra oracle replays. n_files pins that v2
    * references 2 data files for touched langs (v0's + v1's append) and
    * 1 for untouched; n_dv_files pins one sidecar per mutating commit.
    * At 100 TB: commit cost scales with the CDC batch, never with
    * partition size — the frequent-delete regime COW cannot afford. */
  def q223MorDeletionVectors(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q223_" +
      java.util.UUID.randomUUID().toString
    val docs = Tables.load(spark, dir, "documents")
    try {
      val nLangs = docs.select(col("lang")).distinct().count().toInt
      docs.repartition(nLangs, col("lang"))
        .write.partitionBy("lang").parquet(s"file://$scratch/wh")
      val vw = new VersionedWarehouse(spark, s"$scratch/wh")
      vw.commit(0, vw.listDataFiles())
      val src = cdcSource(docs)
      vw.commitMorMerge(1, src.filter(col("op") =!= "del"))
      val dataBefore = vw.listDataFiles().size
      vw.commitMorDelete(2,
        src.filter(col("op") === "del").select(col("doc_id")))
      val delWrote = vw.listDataFiles().size - dataBefore
      val entries = vw.manifestEntries(2)
      val nDv = entries.count(_.kind == "x").toLong
      import spark.implicits._
      val files = entries.filter(_.kind == "d").map(_.path)
        .groupBy(p => p.substring(p.indexOf('=') + 1, p.indexOf('/')))
        .view.mapValues(_.size.toLong).toSeq
        .toDF("lang", "n_files")
      vw.asOf(2).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("bigint")).as("sum_chars"))
        .join(files, Seq("lang"))
        .select(col("lang"), col("n_docs"), col("sum_chars"),
          col("n_files"), lit(nDv).as("n_dv_files"),
          lit(delWrote.toLong).as("n_del_data_files"))
        .localCheckpoint()
    } finally graft.util.Fs.deleteRecursively(scratch)
  }

  /** q224: OPTIMIZE AS A VERSIONED COMMIT — the maintenance op the
    * q219 wing was missing (q157's compaction exists only for the plain
    * store): compact version v1's small files into one file per
    * partition, committed as v2 through a MANIFEST SWAP — data
    * bit-identical, old versions still readable — then compose with
    * q221's expire so exactly the pre-compaction files go. The gate
    * lays v0 out deliberately small-filed (sorted write rolled every 64
    * rows, so per-lang file counts are ceil(n/64) — a pure function the
    * oracle replays), merges the CDC batch as v1, optimizes as v2, and
    * reports per lang: the post-image aggregates read through v2 AFTER
    * expire(retain=v2), the v1/v2 file counts, and how many files the
    * expire removed (all of v0 + v1's delta files — everything the
    * compacted manifest no longer references). */
  def q224OptimizeCompact(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q224_" +
      java.util.UUID.randomUUID().toString
    val docs = Tables.load(spark, dir, "documents")
    try {
      val nLangs = docs.select(col("lang")).distinct().count().toInt
      // deterministic small-file layout: one task per lang, rows sorted
      // so the 64-row roll yields ceil(n_lang/64) files with consecutive
      // doc_id runs (the same layout q226's zone maps prune)
      docs.repartition(nLangs, col("lang"))
        .sortWithinPartitions(col("lang"), col("doc_id"))
        .write.option("maxRecordsPerFile", 64)
        .partitionBy("lang").parquet(s"file://$scratch/wh")
      val vw = new VersionedWarehouse(spark, s"$scratch/wh")
      vw.commit(0, vw.listDataFiles())
      vw.commitMerge(1, cdcSource(docs))
      vw.optimize(2)
      def perLang(paths: Seq[String]): Map[String, Long] = paths
        .groupBy(p => p.substring(p.indexOf('=') + 1, p.indexOf('/')))
        .view.mapValues(_.size.toLong).toMap
      val v1Files = perLang(vw.manifest(1))
      val v2Files = perLang(vw.manifest(2))
      val removed = perLang(vw.expire(retain = Seq(2)))
      import spark.implicits._
      val fileStats = (v1Files.keySet ++ v2Files.keySet ++ removed.keySet)
        .toSeq.sorted
        .map(l => (l, v1Files.getOrElse(l, 0L), v2Files.getOrElse(l, 0L),
          removed.getOrElse(l, 0L)))
        .toDF("lang", "n_files_v1", "n_files_v2", "n_removed")
      // the aggregates read through the COMPACTED manifest after the
      // vacuum — pinning both the swap's bit-equality and that expire
      // did not perturb the retained version
      fileStats.join(vw.asOf(2).groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars").cast("bigint")).as("sum_chars")),
        Seq("lang"), "left_outer")
        .select(col("lang"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("sum_chars"), lit(0L)).as("sum_chars"),
          col("n_files_v1"), col("n_files_v2"), col("n_removed"))
        .localCheckpoint()
    } finally graft.util.Fs.deleteRecursively(scratch)
  }

  /** q225: CHANGE-FEED-DRIVEN INCREMENTAL REFRESH — the composition
    * q222 (change data feed) and q166/q211 (additive view maintenance)
    * exist to serve: bring a standing per-lang rollup current from v0
    * to v1 by consuming the CDF's row deltas — insert +new, delete
    * -old, update (new-old) — WITHOUT rescanning v1. The CDF is
    * manifest-pruned to the changed partitions (metadata decision), so
    * the refresh touches k/n of the table: at 100 TB the difference
    * between touching the day's commits and recomputing the corpus
    * rollup. The merge is [[mergeAdditiveState]] (shared with q166);
    * the oracle replays the from-scratch v1 rollup from the CDC
    * algebra, pinning maintained-state ≡ recomputed-state — the
    * invariant every incremental-view pipeline must hold. */
  def q225CdfRefresh(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q225_" +
      java.util.UUID.randomUUID().toString
    val docs = Tables.load(spark, dir, "documents")
    try {
      docs.write.partitionBy("lang").parquet(s"file://$scratch/wh")
      val vw = new VersionedWarehouse(spark, s"$scratch/wh")
      vw.commit(0, vw.listDataFiles())
      vw.commitMerge(1, cdcSource(docs))
      // the standing view state (in production: precomputed, on disk)
      val state = vw.asOf(0).groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("bigint")).as("sum_chars"))
      // one |changed-rows| aggregation of the CDF — never a v1 scan
      val delta = vw.changeFeed(0, 1).groupBy(col("lang"))
        .agg(sum(when(col("op") === "insert", 1L)
            .when(col("op") === "delete", -1L).otherwise(0L)).as("n_docs"),
          sum(coalesce(col("c1"), lit(0L)) - coalesce(col("c0"), lit(0L)))
            .cast("bigint").as("sum_chars"))
      mergeAdditiveState(state, delta,
        keys = Seq("lang"), measures = Seq("n_docs", "sum_chars"))
        .localCheckpoint()
    } finally graft.util.Fs.deleteRecursively(scratch)
  }

  /** q226: MANIFEST ZONE MAPS — per-file (min,max) stats recorded at
    * commit time let an as-of read SKIP files inside a partition on
    * metadata alone (Iceberg manifest stats / Delta file stats; the
    * within-partition lever partition pruning doesn't have). The gate
    * writes each lang's rows doc_id-sorted and rolled every 64 rows —
    * so files hold consecutive doc_id runs and the file layout is a
    * pure function of the data (ceil(n_lang/64) files, split at the
    * 64th sorted id) — commits with stats, then answers a doc_id range
    * query through [[VersionedWarehouse.asOfWhere]]. The report pins,
    * per lang, the aggregates of the surviving rows AND the
    * scanned/skipped file counts; the DuckDB oracle replays the roll
    * (row_number \ 64 buckets), the per-bucket min/max, and the same
    * interval-overlap skip decision — nothing golden. */
  def q226ZoneMaps(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q226_" +
      java.util.UUID.randomUUID().toString
    val docs = Tables.load(spark, dir, "documents")
    val (idLo, idHi) = (120L, 260L)
    try {
      val nLangs = docs.select(col("lang")).distinct().count().toInt
      docs.repartition(nLangs, col("lang"))
        .sortWithinPartitions(col("lang"), col("doc_id"))
        .write.option("maxRecordsPerFile", 64)
        .partitionBy("lang").parquet(s"file://$scratch/wh")
      val vw = new VersionedWarehouse(spark, s"$scratch/wh")
      vw.commitWithStats(0, vw.listDataFiles())
      val (pruned, decisions) = vw.asOfWhere(0, idLo, idHi)
      def langOf(e: ManifestEntry): String = e.path
        .substring(e.path.indexOf('=') + 1, e.path.indexOf('/'))
      import spark.implicits._
      val fileCounts = decisions.groupBy { case (e, _) => langOf(e) }
        .view.mapValues(ds => (ds.count(!_._2).toLong,
          ds.count(_._2).toLong)).toSeq
        .map { case (l, (sc, sk)) => (l, sc, sk) }
        .toDF("lang", "n_scanned", "n_skipped")
      // left from the file ledger: a lang whose every row falls outside
      // the range still owes its (scanned, skipped) report row
      fileCounts.join(pruned.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars").cast("bigint")).as("sum_chars")),
        Seq("lang"), "left_outer")
        .select(col("lang"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("sum_chars"), lit(0L)).as("sum_chars"),
          col("n_scanned"), col("n_skipped"))
        .localCheckpoint()
    } finally graft.util.Fs.deleteRecursively(scratch)
  }

  /** q227: CHANGE DATA FEED ACROSS A MERGE-ON-READ CHAIN — the
    * composition pinning that the snapshot diff is DELETION-VECTOR-
    * AWARE: v1 applies the CDC batch's upsert half as a MOR commit
    * (appended post-images + a DV masking the replaced keys), v2 its
    * delete half as a pure-DV commit, and changeFeed(0, 2) must read
    * both endpoints THROUGH their deletion vectors (the seq-rule
    * anti-joins) to emit exactly the per-(lang, op) counts and char
    * deltas of q222's copy-on-write chain — the DuckDB oracle is
    * q222's VERBATIM, because the two-step MOR chain and the one-shot
    * COW batch mean the same mutation. A DV delta makes the partition
    * prune conservative (a key-based DV can mask rows in any
    * partition, so changed = all) — correctness first; a format that
    * binds delete files to data files narrows that back to k/n. */
  def q227MorChangeFeed(spark: SparkSession, dir: String): DataFrame = {
    val scratch = s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_q227_" +
      java.util.UUID.randomUUID().toString
    val docs = Tables.load(spark, dir, "documents")
    try {
      docs.write.partitionBy("lang").parquet(s"file://$scratch/wh")
      val vw = new VersionedWarehouse(spark, s"$scratch/wh")
      vw.commit(0, vw.listDataFiles())
      val src = cdcSource(docs)
      vw.commitMorMerge(1, src.filter(col("op") =!= "del"))
      vw.commitMorDelete(2,
        src.filter(col("op") === "del").select(col("doc_id")))
      vw.changeFeed(0, 2)
        .select(col("lang"), col("op"),
          (coalesce(col("c1"), lit(0L)) - coalesce(col("c0"), lit(0L)))
            .as("delta"))
        .groupBy(col("lang"), col("op"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("delta")).cast("bigint").as("delta_chars"))
        .localCheckpoint()
    } finally graft.util.Fs.deleteRecursively(scratch)
  }

  /** The (lang, family) dimension as a real parquet table — staged once
    * with the same crash-safe lifecycle as the partitioned docs. Tiny by
    * construction; exists so q189's dim filter is a genuine DATA
    * predicate the optimizer cannot fold into the fact scan. */
  private def stageLangDimOnce(spark: SparkSession, dir: String): String = {
    val root = new java.io.File(
      s"${graft.util.Staging.stagingRoot}/graft_langdim/v1")
    graft.util.Staging.publishOnce(root, "langdim:v1") { st =>
      import spark.implicits._
      Seq(("en", "germanic"), ("de", "germanic"),
        ("es", "romance"), ("fr", "romance"), ("zh", "sinitic"))
        .toDF("lang", "family")
        .coalesce(1).write.mode("overwrite").parquet(st.getPath)
    }
  }

  /** q166: INCREMENTAL AGGREGATE MAINTENANCE — the materialized-view
    * delta-merge pattern: a standing per-source rollup (docs, chars,
    * tokens) is brought current by merging the INCREMENT's rollup into
    * the previous state with one full-outer join + coalesced sums,
    * instead of rescanning history. At 100 TB this is the difference
    * between touching the day's partition and touching the corpus: the
    * join is |sources| × |sources| — dimension-sized, broadcastable,
    * independent of fact-table size — and both rollups are map-side
    * combined before anything crosses an exchange. Additive aggregates
    * (sum/count) merge losslessly; the gate pins that the maintained
    * state is EXACTLY the from-scratch rollup — the invariant every
    * incremental-view pipeline must hold. The even/odd doc split stands
    * in for yesterday's corpus vs today's ingest; q92's row-level CDC
    * merge is the upstream sibling (this maintains the AGGREGATE, not
    * the rows). */
  def q166IncrementalAgg(spark: SparkSession, dir: String): DataFrame = {
    def rollup(pred: org.apache.spark.sql.Column): DataFrame =
      t(spark, dir, "documents").filter(pred)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars").cast("bigint")).as("n_chars"),
          sum(size(split(col("text"), " ")).cast("bigint")).as("n_tokens"))
    mergeAdditiveState(rollup(col("doc_id") % 2 === 0),
      rollup(col("doc_id") % 2 === 1),
      keys = Seq("source"), measures = Seq("n_docs", "n_chars", "n_tokens"))
  }

  /** Merge two additive rollups sharing (keys ++ measures) schemas: one
    * full-outer join on the keys, coalesced sums per measure. Keys absent
    * from either side pass through with the other side's totals — the
    * edge a brand-new source (delta-only) or a quiet day (state-only)
    * exercises. */
  private[graft] def mergeAdditiveState(state: DataFrame, delta: DataFrame,
      keys: Seq[String], measures: Seq[String]): DataFrame = {
    val s = state.select((keys.map(col) ++
      measures.map(m => col(m).as(s"s_$m"))): _*)
    val d = delta.select((keys.map(col) ++
      measures.map(m => col(m).as(s"d_$m"))): _*)
    s.join(d, keys, "fullOuter")
      .select((keys.map(col) ++ measures.map(m =>
        (coalesce(col(s"s_$m"), lit(0L)) +
          coalesce(col(s"d_$m"), lit(0L))).as(m))): _*)
  }
}
