package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._
import graft.sources.Tables

/** The composite curation verdict — the per-document KEEP/DROP decision a
  * production corpus-curation run actually ships, joining the engine's
  * already-verified quality signals into one reason-coded table
  * (cf. the C4 / Gopher / RefinedWeb filter-stack papers, where a
  * document survives only if it passes every rule and the drop log
  * records which rule fired).
  */
object Curation {

  /** q88: per-document curation verdict with reason codes.
    *
    * One row per corpus document: `keep` iff NO rule fired, `reasons` the
    * comma-joined fired-rule codes in fixed alphabetical order
    * (boilerplate, duplicate, lang, repetition, short) so the string is
    * deterministic and cross-engine restatable:
    *  - `boilerplate`: ≥30% of the doc's distinct 3-word shingles are
    *    corpus boilerplate (document frequency ≥ 4 — q86's rule,
    *    thresholded per document via [[TextAnalysis.boilerplatePerDoc]]);
    *  - `duplicate`: the doc is a non-canonical member of a MinHash-LSH
    *    near-dup cluster (q73's survivorship rule: cluster minimum keeps,
    *    everyone else drops);
    *  - `lang`: the q28 stopword heuristic predicts non-English
    *    (stop-token share ≤ 5%);
    *  - `repetition`: >70% of the doc's unigrams are repeats (q87's
    *    Gopher-style intra-doc ratio at the drop threshold);
    *  - `short`: fewer than 20 whitespace tokens (Gopher's min-length
    *    rule scaled to this corpus's 10-99-token documents).
    * Every threshold is evaluated in INTEGER cross-multiplied form
    * (`n_boiler*10 >= n_sh*3`, `n_stop*100 <= n_tok*5`,
    * `n_dis*10 < n_tok*3`) — no float division anywhere, so the verdict
    * hash-matches the DuckDB oracle exactly and no ulp edge can flip a
    * KEEP into a DROP between engines.
    *
    * Scale shape — one corpus pass per signal FAMILY, counters-only
    * afterwards:
    *  - per-row family (lang, repetition, short): a single codegen'd
    *    projection over the documents scan, zero shuffle;
    *  - boilerplate family: q86's digest pipeline — one shingling into
    *    the checkpoint boundary, every exchange after it carries 16-byte
    *    digests or counter rollups;
    *  - duplicate family: NO corpus scan at all — the cluster labels are
    *    read straight from [[Dedup.stagedComponentLabels]] (persisted
    *    dedup state: staged band table → candidate pairs → one star
    *    contraction, built once per corpus fingerprint and shared with
    *    q67/q73); the dropped-id set is doc_id+flag rows.
    * The assembly joins are doc_id-keyed (8-byte key) over counter-width
    * rows — document text never shuffles. The dropped-id side is tiny
    * relative to the corpus (bounded by the near-dup rate), so Spark
    * broadcasts it at gate SF; at 100 TB it degrades to a shuffle join on
    * the same 8-byte key, not a different plan.
    */
  def qCurationVerdict(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    // per-row signal family: one projection, no shuffle
    val perRow = Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      size(t).cast("long").as("n_tok"),
      size(array_distinct(t)).cast("long").as("n_dis"),
      stopwordCount(col("text")).cast("long").as("n_stop"))
    // boilerplate family: per-doc df pressure from the q86 pipeline
    val boiler = TextAnalysis.boilerplatePerDoc(spark, dir)
      .select(col("doc_id"), col("n_sh"), col("n_boiler"))
    // duplicate family: non-canonical members of near-dup clusters, read
    // from the staged component-labels table (persisted dedup state —
    // zero corpus scans, shared with q67/q73)
    val dropped = Dedup.stagedComponentLabels(spark, dir)
      .filter(col("node") =!= col("label"))
      .select(col("node").as("doc_id"), lit(true).as("is_dup"))
    val reasonArr = array_compact(array(
      when(col("n_boiler") * 10 >= col("n_sh") * 3, lit("boilerplate")),
      when(col("is_dup"), lit("duplicate")),
      when(col("n_stop") * 100 <= col("n_tok") * 5, lit("lang")),
      when(col("n_dis") * 10 < col("n_tok") * 3, lit("repetition")),
      when(col("n_tok") < 20, lit("short"))))
    perRow
      .join(boiler, Seq("doc_id"), "left")
      .join(dropped, Seq("doc_id"), "left")
      .select(col("doc_id"), reasonArr.as("ra"))
      .select(
        col("doc_id"),
        (size(col("ra")) === 0).as("keep"),
        size(col("ra")).cast("long").as("n_reasons"),
        concat_ws(",", col("ra")).as("reasons"))
  }
}
