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

  /** Corpus-scale winnowed fingerprints: the k-gram hash array is computed
    * ONCE per document, posexploded to (doc_id, pos, h), and the winnowing
    * min runs as a sliding window frame — linear in document length (the
    * per-row expression form is O(len²) after projection collapse; at sf0.1
    * that was 625s vs ~3s for this shape). Output: (doc_id, fp) distinct;
    * same fingerprints as [[graft.functions.TextFunctions.rollingFingerprints]]. */
  def rollingFingerprintTable(docs: DataFrame, k: Int = 8,
      window: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nGrams = greatest(length(col("text")) - (k - 1), lit(1))
    val hashes = transform(sequence(lit(1), nGrams),
      i => sketch60(col("text").substr(i, lit(k))))
    // k-gram count rides along from the scan — known from the text length,
    // so no second (count) window pass over the exploded rows
    val exploded = docs.select(col("doc_id"), nGrams.as("n"),
      posexplode(hashes).as(Seq("pos", "h")))
    val frame = Window.partitionBy(col("doc_id"))
      .orderBy(col("pos")).rowsBetween(0, window - 1)
    exploded
      .withColumn("fp", min(col("h")).over(frame))
      // window start positions only: 0 .. n-window (or just 0 if n < window)
      .filter(col("pos") <= greatest(col("n") - window, lit(0)))
      .select(col("doc_id"), col("fp"))
      .distinct()
  }

  /** Winnowed rolling fingerprints exploded to (doc_id, fp) — the joinable
    * chunk-dedup form; docs sharing any ≥(k+window−1)-char substring share
    * a fingerprint. */
  def qRollingFingerprint(spark: SparkSession, dir: String): DataFrame =
    rollingFingerprintTable(Tables.load(spark, dir, "documents"))
}
