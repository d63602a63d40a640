package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** Corpus analysis queries over the documents table — token accounting,
  * quality scoring, language ID, fingerprinting. All single-pass Catalyst
  * expression plans over the scan (SURVEY §7 step 10 extension surface).
  */
object TextAnalysis {

  def qTokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("len_chars"),
        tokenCount(col("text")).cast("long").as("n_tokens"))

  def qQuality(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        stopwordCount(col("text")).cast("long").as("n_stop"),
        stopwordRatio(col("text")).as("stop_ratio"))

  def qLangId(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        col("lang"),
        langIdEn(col("text")).as("lang_pred"))

  /** Tokenizer cost accounting: BPE-ish subword count + punctuation count
    * per document (what a training pipeline budgets sequence lengths with).
    * Oracle note: the subword split regex uses lookarounds (no RE2
    * equivalent), but its piece count equals 1 + #class-transition
    * boundaries, which the DuckDB twin counts with two plain two-char
    * patterns (within each pattern matches cannot overlap, so
    * regexp_extract_all counts them exactly). */
  def qTokenAccounting(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        subwordCount(col("text")).cast("long").as("n_subwords"),
        punctCount(col("text")).cast("long").as("n_punct"))

  def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .select(
        col("doc_id"),
        fpMd5(col("text")).as("fp_md5"),
        fpSha256(col("text")).as("fp_sha"))

  /** Per-language corpus profile: row counts and exact mean document length
    * (decimal sum / count — one deterministic division, oracle-safe). */
  def qCorpusStats(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("cnt"),
        (sum(col("n_chars").cast("decimal(18,0)")).cast("double") /
          count(lit(1))).as("avg_chars"))

  /** Per-language document-length quantile profile (median/p90/p99) — the
    * corpus shape summary a pipeline budgets batch/sequence lengths with.
    * Uses EXACT `percentile` (linear interpolation, matching DuckDB's
    * `quantile_cont`) so the oracle hash-matches; exact percentile buffers
    * each group's values, so at 100 TB swap in `approx_percentile`
    * (mergeable t-digest sketch, same plan shape, map-side partials) —
    * the group-by-lang plan is identical either way. */
  def qLengthQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "documents")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("cnt"),
        round(expr("percentile(n_chars, 0.5)"), 2).as("p50"),
        round(expr("percentile(n_chars, 0.9)"), 2).as("p90"),
        round(expr("percentile(n_chars, 0.99)"), 2).as("p99"))

  /** Corpus-scale winnowed fingerprints. Winnowing is row-local, so the
    * whole computation lives in one codegen'd Catalyst Expression
    * ([[graft.functions.WinnowedFingerprints]]): one linear pass per
    * document, per-doc distinct mins, exploded to (doc_id, fp). The plan is
    * scan → project → generate with ZERO exchanges — no window sort, no
    * global distinct (per-doc dedup already makes (doc_id, fp) unique).
    * Earlier declarative shapes for comparison: per-row higher-order-function
    * form is O(len²) after projection collapse (~625 s at sf0.1); posexplode
    * + window-min was linear but paid a full sort shuffle of ~|text| rows
    * per doc plus a distinct shuffle (~7 s warm); this shape is sub-second.
    * Same fingerprints as
    * [[graft.functions.TextFunctions.rollingFingerprints]]. */
  def rollingFingerprintTable(docs: DataFrame, k: Int = 8,
      window: Int = 4): DataFrame =
    docs.select(col("doc_id"),
      explode(graft.functions.WinnowedFingerprints.winnowed(
        col("text"), k, window)).as("fp"))

  /** Winnowed rolling fingerprints exploded to (doc_id, fp) — the joinable
    * chunk-dedup form; docs sharing any ≥(k+window−1)-char substring share
    * a fingerprint. */
  def qRollingFingerprint(spark: SparkSession, dir: String): DataFrame =
    rollingFingerprintTable(Tables.load(spark, dir, "documents"))
}
