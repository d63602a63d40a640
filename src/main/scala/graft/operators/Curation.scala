package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** q104: column profiling (ANALYZE-style data-quality pass) — per-column
    * row/null/distinct counts plus a numeric range, the validation summary
    * a pipeline records before a table is allowed into training.
    *
    * ONE scan computes every metric: the multi-distinct aggregate plans as
    * a single pass (Catalyst's Expand rewrite — each row fans out once per
    * distinct-column, partial-aggregated map-side), then `stack` pivots the
    * single metrics row into one row per column. No per-column re-scans:
    * profiling 100 columns of a 100 TB table costs one read either way.
    * Ranges are emitted as DOUBLE (exact for these columns; the date range
    * as integer-exact epoch days) — a uniform string rendering would hang
    * the gate on cross-engine format trivia. */
  def q104ColumnProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("nn_q"),
        countDistinct(col("l_quantity")).as("nd_q"),
        min(col("l_quantity")).as("min_q"),
        max(col("l_quantity")).as("max_q"),
        sum(when(col("l_returnflag").isNull, 1L).otherwise(0L)).as("nn_rf"),
        countDistinct(col("l_returnflag")).as("nd_rf"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L)).as("nn_sd"),
        countDistinct(col("l_shipdate")).as("nd_sd"),
        datediff(min(col("l_shipdate")), lit("1970-01-01"))
          .cast("double").as("min_sd"),
        datediff(max(col("l_shipdate")), lit("1970-01-01"))
          .cast("double").as("max_sd"))
      .select(expr(
        "stack(3, " +
          "'l_quantity',   n, nn_q,  nd_q,  min_q,  max_q, " +
          "'l_returnflag', n, nn_rf, nd_rf, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), " +
          "'l_shipdate',   n, nn_sd, nd_sd, min_sd, max_sd) " +
          "AS (column, n, n_null, n_distinct, min_v, max_v)"))

  /** q105: referential-integrity audit — orphaned-foreign-key counts, the
    * join-safety gate a pipeline runs before enrichment joins (an orphan
    * fact row silently vanishes from every inner join downstream). The
    * synthetic corpus is referentially perfect, so the audit runs against
    * a deterministically damaged dimension (parents with key % 97 = 0
    * treated as deleted — the deleted-parent drill every audit needs to
    * alarm on, same fixture idiom as q100's planted PII).
    *
    * Shape at scale: each check is ONE left-anti join on the key — the
    * fact side shuffles once on its FK, the dim ships key columns only;
    * counts partial-aggregate map-side. No driver-side key sets. */
  def q105FkAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey"), col("o_custkey"))
    val customers = Tables.load(spark, dir, "customer")
      .filter(col("c_custkey") % 97 =!= 0)
      .select(col("c_custkey"))
    val liOrphans = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"))
      .join(orders, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .select(lit("lineitem.l_orderkey->orders").as("fk"), col("n_orphans"))
    val ordOrphans = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"))
      .join(customers, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
      .select(lit("orders.o_custkey->customer").as("fk"), col("n_orphans"))
    liOrphans.unionAll(ordOrphans)
  }

  /** q134: the corpus DATASHEET — the one-row cross-table summary a
    * curation run publishes next to a release (datasheets-for-datasets:
    * how big, how duplicated, how diverse, what time span, what labels).
    * Composes the engine's per-table aggregates across all three domains
    * in three independent single-scan aggregations (documents scan also
    * folds token counting in — no second pass), cross-joined as 1-row
    * frames. Exact-dup rate in integer ppm off the md5 content digest
    * (q22's convention); the event span in whole days via integer
    * microsecond division. Every figure is map-side-combinable: the
    * datasheet of a 100 TB corpus is three scans and twelve numbers. */
  def q134Datasheet(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents").agg(
      count(lit(1)).as("n_docs"),
      sum(tokenCount(col("text")).cast("bigint")).as("n_tokens"),
      sum(col("n_chars")).as("n_chars"),
      countDistinct(md5(col("text"))).as("n_unique_texts"),
      countDistinct(col("lang")).as("n_langs"),
      countDistinct(col("source")).as("n_sources"))
    val ev = Tables.events(spark, dir).agg(
      count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"),
      expr("(unix_micros(max(ts)) - unix_micros(min(ts))) DIV 86400000000")
        .as("span_days"))
    val em = Tables.load(spark, dir, "embeddings").agg(
      count(lit(1)).as("n_vectors"),
      countDistinct(col("label")).as("n_labels"))
    d.crossJoin(ev).crossJoin(em)
      .withColumn("dup_ppm",
        expr("(n_docs - n_unique_texts) * 1000000 DIV n_docs"))
  }

  /** q140: the CURATION PIPELINE end to end, as ONE declarative plan —
    * the flagship composition proving the engine's stages chain the way a
    * real corpus release runs them:
    *   1. NEAR-DUP SURVIVORSHIP — keep each cluster's min-id canonical
    *     member (q73's rule) plus every singleton, off the persisted
    *     component-labels table;
    *   2. QUALITY GATE — survivors with ≥ 20 tokens (the q88 min-length
    *     family);
    *   3. LEAKAGE-FREE SPLIT — the q133 cluster-keyed sketch60 hash
    *     split, so surviving near-relatives of a train doc can never
    *     reach eval;
    *   4. RELEASE STATS — per split, the q134-style doc/token/language
    *     figures.
    * Catalyst sees the whole chain as one plan: the quality predicate and
    * the column pruning reach the scan, the labels table is read once,
    * and nothing corpus-sized shuffles except the final per-split
    * aggregation's partial rows. */
  def q140CurationPipeline(spark: SparkSession, dir: String,
      minTokens: Int = 20): DataFrame = {
    val labels = graft.operators.Dedup.stagedComponentLabels(spark, dir)
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val joined = docs.join(labels, col("doc_id") === col("node"), "left")
    val kept = joined
      .filter(col("label").isNull || col("node") === col("label"))
      .filter(tokenCount(col("text")) >= minTokens)
      .select(col("doc_id"), col("lang"),
        tokenCount(col("text")).cast("bigint").as("n_toks"),
        coalesce(col("label"), col("doc_id")).as("grp"))
    val h = pmod(graft.functions.TextFunctions.sketch60(
      col("grp").cast("string")), lit(100L))
    kept
      .withColumn("split",
        when(h < 80, "train").when(h < 90, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        countDistinct(col("lang")).as("n_langs"))
  }

  /** q124: per-source token-distribution DRIFT — the exact total-variation
    * (TV) distance between each source's unigram distribution and the rest
    * of the corpus. The corpus-mix monitoring signal a training pipeline
    * watches across ingest batches: a source whose TV jumps has changed
    * register/topic/quality and needs re-weighting before it skews the mix
    * (same family as q89's rebalance, but measuring the divergence instead
    * of correcting it).
    *
    * TV = ½·Σ_tok |p_s(tok) − p_rest(tok)| computed EXACTLY in integers:
    * over the common denominator N_s·N_rest each term is
    * |c_s·N_rest − c_rest·N_s|, summed in DECIMAL(38,0) (c·N reaches 1e26
    * at 100 TB). Tokens absent from the source contribute their whole rest
    * mass — accounted in closed form as N_s·(N_rest − Σ_{tok∈s} c_rest) so
    * the aggregation only ever touches (source, token) pairs that EXIST:
    * the big shuffle is one map-side-combined count of the token stream;
    * everything after is vocab-bounded (per-token totals joined back on
    * token — both sides vocab-sized), and the per-source totals broadcast.
    * One floor division to ppm at the end (q99's decimal-div contract).
    *
    * PRECONDITION: ≥ 2 sources. Drift is each source vs THE REST; with a
    * single source n_r = 0 and tv_ppm comes out NULL (0/0) — there is no
    * "rest" to drift from, so no defined value exists (the oracle SQL
    * divides by the same 2·n_s·n_r and agrees). */
  def q124SourceDrift(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g = c.groupBy(col("tok")).agg(sum(col("c")).as("ct"))
    val ns = c.groupBy(col("source")).agg(sum(col("c")).as("n_s"))
    val nt = ns.agg(sum(col("n_s")).as("n_t"))
    val per = c.join(g, Seq("tok"))
      .join(broadcast(ns), Seq("source"))
      .crossJoin(broadcast(nt))
      .groupBy(col("source"))
      .agg(
        sum(abs(col("c").cast("decimal(38,0)") * (col("n_t") - col("n_s"))
          - (col("ct") - col("c")).cast("decimal(38,0)") * col("n_s")))
          .as("num_present"),
        sum(col("ct") - col("c")).cast("decimal(38,0)").as("r_sum"),
        first(col("n_s")).as("n_s"),
        first(col("n_t") - col("n_s")).as("n_r"))
    per.select(
      col("source"), col("n_s").as("n_tokens"),
      expr("cast(((num_present + cast(n_s as decimal(38,0)) * (n_r - r_sum)) * 1000000" +
        " - ((num_present + cast(n_s as decimal(38,0)) * (n_r - r_sum)) * 1000000)" +
        " % (2 * cast(n_s as decimal(38,0)) * n_r))" +
        " / (2 * cast(n_s as decimal(38,0)) * n_r) as bigint)").as("tv_ppm"))
  }

  /** q152: GOPHER-STYLE QUALITY RULE FILTER — the repetition of Rae et
    * al.'s "Scaling Language Models: ... Gopher" (2021, App. A1.1)
    * document-quality rules every web-scale curation pipeline applies
    * before training. Four representative rules, each made INTEGER-EXACT
    * (cross-multiplied comparisons instead of ratio doubles, so the
    * DuckDB twin agrees bit for bit):
    *   r1 word count in [50, 100000];
    *   r2 mean word length in [3, 10]   (3·n ≤ Σlen(tok) ≤ 10·n, where
    *      Σlen(tok) = len(text) − (n−1) under the corpus's single-space
    *      convention);
    *   r3 ≥ 80% of words contain an alphabetic character (5·n_alpha ≥ 4·n);
    *   r4 ≥ 2 DISTINCT English stopwords present.
    * Output: per source, docs failing each rule and docs passing all —
    * the report that tells a curation run which feed loses how much
    * volume to which rule. One codegen'd projection over the scan + a
    * |sources|-row rollup: no shuffle carries anything corpus-sized. */
  def q152GopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRollup(gopherScore(Tables.load(spark, dir, "documents")))

  /** The four rules as a STATELESS per-row scorer over any (source, text)
    * frame — shared by the batch report (q152) and the streaming ingest
    * gate (q156); statelessness is what makes it streaming-safe. */
  private[graft] def gopherScore(docs: DataFrame): DataFrame = {
    val (r1, r2, r3, r4) = gopherRuleCols
    docs.select(col("source"),
      r1.as("r1"), r2.as("r2"), r3.as("r3"), r4.as("r4"))
  }

  /** The four rule predicates over a `text` column — the single source of
    * truth shared by the per-source report (q152), the streaming gate
    * (q156), and the end-to-end pipeline's keep predicate (q167). */
  private def gopherRuleCols: (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column, org.apache.spark.sql.Column,
      org.apache.spark.sql.Column) = {
    val t = split(col("text"), " ")
    val nW = size(t).cast("bigint")
    val sumTok = (length(col("text")) - size(t) + 1).cast("bigint")
    val nAlpha = size(filter(t, x => x.rlike("[a-z]"))).cast("bigint")
    val nStop = size(array_intersect(array_distinct(t),
      array(EnStopwords.map(lit): _*))).cast("bigint")
    ((nW >= 50 && nW <= 100000),
      (lit(3) * nW <= sumTok && sumTok <= lit(10) * nW),
      (lit(5) * nAlpha >= lit(4) * nW),
      (nStop >= 2))
  }

  /** Doc-keyed pass verdict + token count — the quality gate as a
    * pipeline stage (q167): one row per document, everything downstream
    * needs (shard keys, mixture factors, packing offsets) derivable from
    * (source, doc_id, n_toks). */
  private[graft] def gopherPass(docs: DataFrame): DataFrame = {
    val (r1, r2, r3, r4) = gopherRuleCols
    docs.select(col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("bigint").as("n_toks"),
      (r1 && r2 && r3 && r4).as("pass"))
  }

  /** q152's per-source rollup over a scored frame (also the q156 stream
    * aggregation — identical integers either way). */
  private[graft] def gopherRollup(d: DataFrame): DataFrame =
    d.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(!col("r1"), 1L).otherwise(0L)).as("fail_wordcount"),
        sum(when(!col("r2"), 1L).otherwise(0L)).as("fail_meanlen"),
        sum(when(!col("r3"), 1L).otherwise(0L)).as("fail_alpha"),
        sum(when(!col("r4"), 1L).otherwise(0L)).as("fail_stopwords"),
        sum(when(col("r1") && col("r2") && col("r3") && col("r4"), 1L)
          .otherwise(0L)).as("n_pass"))

  /** q161: K-ANONYMITY AUDIT — the privacy-side complement of q100's PII
    * scrub: instead of redacting direct identifiers, measure how
    * RE-IDENTIFIABLE rows are through quasi-identifier combinations
    * (nation × market segment × account-balance band here; ZIP × age ×
    * gender in the classic Sweeney formulation). An equivalence class
    * smaller than k means its members are k-anonymity violations — the
    * released rows a linker could pin to individuals. Emits, per nation:
    * class count, risky-class/row counts under k=5, and the minimum
    * class size (the table's own k).
    *
    * Two stacked aggregations, both map-side combinable: the QI-class
    * census shuffles one row per distinct class (bounded by the QI
    * domain, not the table), the nation rollup one row per nation. No
    * windows, no joins — the shape survives 100 TB unchanged. */
  def q161KAnonymity(spark: SparkSession, dir: String, k: Int = 5): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(col("c_nationkey"),
        col("c_mktsegment"),
        expr("CAST(floor(CAST(c_acctbal AS DOUBLE) / 1000.0D) AS BIGINT)")
          .as("bal_band"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_band"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_classes"),
        sum(col("n")).as("n_rows"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_risky_classes"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_risky_rows"),
        min(col("n")).as("min_class_size"))

  /** q181: WITHIN-DOCUMENT REPETITION RULES — the Gopher repetition
    * family (Rae et al. 2021, App. A1.2–A1.5) that q152's A1.1 bounds
    * deliberately left out, and that q87's duplicate-unigram/bigram
    * RATIOS don't capture (a ratio sees "many repeats somewhere"; these
    * rules see CONCENTRATION — one dominating n-gram — and COVERAGE —
    * how much of the text sits inside duplicated spans):
    * a document whose mass concentrates in one
    * repeated n-gram, or whose text is largely covered by DUPLICATED
    * 5-grams, is machine-generated boilerplate no length/stopword rule
    * catches. Token-based restatement of the paper's character fractions
    * (the corpus is single-space tokenized, so token and character
    * fractions rank identically), each rule INTEGER-EXACT via
    * cross-multiplied bounds (the q152 discipline):
    *   - top-2-gram: fail when 2·occ₂ᵐᵃˣ/n > 0.20  ⇔  10·occ₂ᵐᵃˣ > n;
    *   - top-3-gram: fail when 3·occ₃ᵐᵃˣ/n > 0.18  ⇔  50·occ₃ᵐᵃˣ > 3·n;
    *   - dup-5-gram: fail when covered/n > 0.15    ⇔  20·covered > 3·n,
    *     where `covered` is the EXACT number of token positions inside at
    *     least one occurrence of a 5-gram that appears ≥2× in the doc —
    *     the paper's "fraction of characters inside duplicate n-grams",
    *     computed as a gaps-and-islands interval union (running-max of
    *     span ends over the doc-ordered occurrence list), so overlapping
    *     occurrences are never double-counted.
    *
    * Scale shape: every shuffle is keyed by doc_id (or doc_id+gram) —
    * partition state is bounded by DOCUMENT length, never corpus size;
    * the per-doc verdicts collapse into a |sources|-row rollup. The
    * n-gram tables are transient explode products (no materialization),
    * and the interval union is one doc-partitioned window over only the
    * DUPLICATED occurrences. Composes with q167's gate the way q152
    * does: `pass` is a pure per-doc predicate. */
  def q181RepetitionRules(spark: SparkSession, dir: String): DataFrame =
    repetitionRollup(Tables.load(spark, dir, "documents"))

  /** q181's engine over any (doc_id, source, text) frame — the spec's
    * overlap fixtures drive this directly. */
  private[graft] def repetitionRollup(input: DataFrame): DataFrame = {
    val docs = input
      .select(col("doc_id"), col("source"),
        split(col("text"), " ").as("arr"))
    val base = docs.select(col("doc_id"), col("source"),
      size(col("arr")).cast("bigint").as("n"))
    // max per-doc occurrence count of any k-gram (0 when the doc is
    // shorter than k — restored by the left join's coalesce)
    def topK(k: Int): DataFrame = docs
      .filter(size(col("arr")) >= k)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, size(arr) - ${k - 1}), " +
        s"p -> array_join(slice(arr, p, $k), ' '))")).as("g"))
      .groupBy(col("doc_id"), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(max(col("c")).as(s"occ$k"))
    // exact token positions covered by duplicated 5-grams: occurrences
    // of grams with per-doc count ≥ 2, spans [s, s+4] unioned via a
    // running max of prior span ends
    val occ5 = docs
      .filter(size(col("arr")) >= 5)
      .select(col("doc_id"), posexplode(expr(
        "transform(sequence(1, size(arr) - 4), " +
        "p -> array_join(slice(arr, p, 5), ' '))")).as(Seq("p0", "g")))
      .select(col("doc_id"), (col("p0") + 1).cast("bigint").as("s"), col("g"))
    val dupOcc = occ5
      .withColumn("cnt", count(lit(1)).over(
        Window.partitionBy(col("doc_id"), col("g"))))
      .filter(col("cnt") >= 2)
    val covered = dupOcc
      .withColumn("pe", max(col("s")).over(
        Window.partitionBy(col("doc_id")).orderBy(col("s"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("doc_id"),
        (col("s") + 4 - greatest(coalesce(col("pe") + 4, col("s") - 1),
          col("s") - 1)).as("cov"))
      .groupBy(col("doc_id")).agg(sum(col("cov")).as("covered"))
    val verdicts = base
      .join(topK(2), Seq("doc_id"), "left")
      .join(topK(3), Seq("doc_id"), "left")
      .join(covered, Seq("doc_id"), "left")
      .select(col("source"),
        (lit(10) * coalesce(col("occ2"), lit(0L)) > col("n")).as("f2"),
        (lit(50) * coalesce(col("occ3"), lit(0L)) > lit(3) * col("n")).as("f3"),
        (lit(20) * coalesce(col("covered"), lit(0L)) > lit(3) * col("n")).as("f5"))
    verdicts.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("f2"), 1L).otherwise(0L)).as("fail_top2"),
        sum(when(col("f3"), 1L).otherwise(0L)).as("fail_top3"),
        sum(when(col("f5"), 1L).otherwise(0L)).as("fail_dup5"),
        sum(when(!col("f2") && !col("f3") && !col("f5"), 1L)
          .otherwise(0L)).as("n_pass"))
  }

  /** q185: EQUAL-TOKEN-BUDGET CURRICULUM MANIFEST — the exact-boundary
    * complement of q93 (deliberately distinct: q93 cuts phases at QUALITY-
    * HISTOGRAM values by DOC-count quantiles — every doc sharing a quality
    * value lands in one phase, the no-sort approximation; THIS operator
    * guarantees what a training loader actually schedules against — equal
    * TOKEN budgets with exact PER-DOCUMENT boundaries): rank every
    * document by an integer difficulty key (lexical diversity,
    * distinct-tokens-per-token ppm), then cut the ranked corpus into
    * `phases` consecutive slices of equal token budget — phase k of a
    * 4-phase curriculum owns tokens [k·T/4, (k+1)·T/4) of the ranked
    * stream. Emits the manifest a data loader schedules from: per phase,
    * docs, tokens, and the difficulty band it spans.
    *
    * Scale shape — the global running sum is a DISTRIBUTED two-level
    * prefix sum, not a single-partition window: (1) one map-side-combined
    * shuffle to per-difficulty-value token subtotals (|distinct scores|
    * rows — vocabulary-sized); (2) the running offset over those
    * subtotals is a window over that SMALL frame; (3) each doc's global
    * offset = its score's base offset + an intra-score window partitioned
    * BY score (bounded by the ties at one difficulty value; a degenerate
    * corpus where half the docs tie at one score would need the q54 salt
    * there). The phase id is then pure row-local integer arithmetic
    * ((cum−1)·phases DIV total), and the manifest rollup is |phases| rows.
    * Deterministic total order: (score, doc_id). */
  def q185CurriculumPhases(spark: SparkSession, dir: String,
      phases: Int = 4): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("arr"))
      .select(col("doc_id"),
        size(col("arr")).cast("bigint").as("n_toks"),
        expr("CAST(size(array_distinct(arr)) AS BIGINT) * 1000000" +
          " DIV size(arr)").as("score"))
    // (1) per-score token subtotals; (2) running base offset over them
    val wScore = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bases = docs.groupBy(col("score"))
      .agg(sum(col("n_toks")).as("toks_at"))
      .withColumn("base", coalesce(sum(col("toks_at")).over(wScore), lit(0L)))
      .select(col("score"), col("base"))
    val total = docs.agg(sum(col("n_toks"))).first().getLong(0)
    // (3) intra-score running sum + the score's base = global prefix sum
    val wIntra = Window.partitionBy(col("score")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.join(bases, Seq("score"))
      .withColumn("cum", col("base") + sum(col("n_toks")).over(wIntra))
      .select(col("score"), col("n_toks"),
        expr(s"(cum - 1) * $phases DIV ${total}L").as("phase"))
      .groupBy(col("phase"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        min(col("score")).as("min_score"), max(col("score")).as("max_score"))
  }

  /** q194: TOKEN-BUDGET WATER-FILLING — the recipe-design step before any
    * mixture materializes: given each source's token SUPPLY and a total
    * training budget B (here B = ⌊total/2⌋), allocate per-source budgets
    * that equalize across sources without exceeding anyone's supply — the
    * classic water-fill: small sources are taken whole, large sources are
    * capped at a common level. (q148/q150 materialize a GIVEN recipe;
    * this computes one.) INTEGER-EXACT closed form, no iteration: with
    * sources ascending by supply, source i is fully funded iff
    * prefix_{i−1} + sᵢ·(n−i+1) ≤ B (the fully-funded set is a prefix of
    * that order); the capped rest split the remainder by integer
    * division, with the `rem` leftovers going +1 each to the largest-
    * supply capped sources (name tie-break) — Σ alloc = B exactly, no
    * fractional water level ever exists.
    *
    * Scale shape: ONE map-side-combined corpus shuffle to per-source
    * supplies; every window after that runs over the |sources|-row frame
    * (dimension-scale, the q93 histogram size class) — the corpus is
    * touched exactly once. */
  def q194TokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val supply = Tables.load(spark, dir, "documents")
      .select(col("source"),
        size(split(col("text"), " ")).cast("bigint").as("n_toks"))
      .groupBy(col("source")).agg(sum(col("n_toks")).as("supply"))
    val asc = Window.orderBy(col("supply").asc, col("source").asc)
    val all = Window.orderBy(col("supply").asc, col("source").asc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val ranked = supply
      .withColumn("i", row_number().over(asc))
      .withColumn("prefix", sum(col("supply")).over(
        asc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n", count(lit(1)).over(all))
      .withColumn("budget", expr("sum(supply) OVER () DIV 2"))
      // DECIMAL: supply·(n−i+1) wraps BIGINT once one source nears
      // 10¹⁵ tokens across 10⁴ sources (Spark wraps silently under
      // non-ANSI, DuckDB raises — the q168 divergence class)
      .withColumn("full",
        col("prefix").cast("decimal(38,0)") - col("supply") +
        col("supply").cast("decimal(38,0)") * (col("n") - col("i") + 1) <=
          col("budget").cast("decimal(38,0)"))
    val funded = ranked
      .withColumn("n_full", sum(when(col("full"), 1L).otherwise(0L)).over(all))
      .withColumn("prefix_full",
        sum(when(col("full"), col("supply")).otherwise(0L)).over(all))
      .withColumn("n_capped", col("n") - col("n_full"))
      .withColumn("leftover", col("budget") - col("prefix_full"))
      .withColumn("base", when(col("n_capped") > 0,
        expr("leftover DIV n_capped")).otherwise(lit(0L)))
      .withColumn("rem", when(col("n_capped") > 0,
        col("leftover") % col("n_capped")).otherwise(lit(0L)))
      // +1 bonus to the `rem` largest-supply capped sources (name tie-break)
      .withColumn("capped_rank", when(!col("full"),
        row_number().over(Window.orderBy(
          col("full").asc, col("supply").desc, col("source").asc))))
    // is_capped is derived from the EMITTED allocation (alloc < supply),
    // not from the funding test: when capped sources tie at
    // supply = base+1 the rem bonus can fund them exactly, and the flag
    // must agree with the allocation it describes.
    funded.select(col("source"), col("supply"),
      when(col("full"), col("supply"))
        .otherwise(col("base") +
          when(col("capped_rank") <= col("rem"), 1L).otherwise(0L))
        .as("alloc"))
      .withColumn("is_capped", col("alloc") < col("supply"))
  }

  /** The public-suffix rules q197 resolves registered domains against —
    * longest-match-wins, exactly the PSL contract (a real deployment
    * swaps in the full Mozilla list; the mechanism is identical). */
  private[graft] val publicSuffixes: Seq[String] =
    Seq("co.uk", "com", "org", "net")

  /** host → registered domain under [[publicSuffixes]], compiled to a
    * row-local longest-suffix-first when() chain: this is how production
    * pipelines ship the PSL (a few thousand rules folded into a
    * trie/dispatch evaluated per row), NOT a join — the suffix table is
    * rule metadata, and joining the corpus against it would shuffle 100 TB
    * to answer a per-row question. Codegen-friendly: endswith + substring
    * + one anchored regexp per rule, widest whole-stage span. Hosts
    * matching no rule (or equal to a bare suffix) yield NULL — the PSL
    * "unregistrable" answer. */
  private[graft] def registeredDomain(host: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    publicSuffixes.sortBy(-_.length).foldRight(
      lit(null).cast("string")) { (s, acc) =>
      when(host.endsWith(s".$s"),
        concat(
          // last label of the host with ".suffix" stripped — the
          // registrable label directly left of the public suffix
          regexp_extract(
            host.substr(lit(1), length(host) - lit(s.length + 1)),
            "([^.]+)$", 1),
          lit(s".$s"))).otherwise(acc)
    }

  /** q197: URL → REGISTERED-DOMAIN quality rollup — the Common-Crawl
    * pipeline staple: every page carries a URL; curation decisions and
    * drift monitoring (q124) aggregate per REGISTERED domain (the PSL
    * unit one owner controls), not per raw host — `blog.x.co.uk` and
    * `www.x.co.uk` are one publisher. The corpus tables carry no URL
    * column, so the query first materializes a deterministic URL per
    * document (scheme/subdomain/registrable-domain/port/path/query all
    * derived from doc attributes — both engines build the SAME strings,
    * so the gate tests the PARSERS, not the generator): Spark parses
    * with the native `parse_url` expression, DuckDB string-parses with
    * anchored regexes. Host → registered domain is the compiled-PSL
    * when() chain ([[registeredDomain]]) with multi-label suffixes
    * (co.uk) so "last two labels" shortcuts fail the gate.
    *
    * Rollup = q88's per-row rule family aggregated per domain: doc and
    * distinct-host counts, char mass, short-doc and predicted-non-English
    * ppm (integer cross-multiplied thresholds, integer ppm division —
    * no float anywhere near a comparison), plaintext-http ppm, and mean
    * doc length (exact-integer sum/count division, 4dp per the libm
    * contract). Scale shape: one codegen'd projection over the documents
    * scan (URL build + parse + PSL chain + rule bits are all row-local),
    * then ONE map-side-combined shuffle on the ~|domains| key. */
  def q197DomainRollup(spark: SparkSession, dir: String): DataFrame = {
    val d = domainSignals(Tables.load(spark, dir, "documents"))
    d.groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        sum(col("n_chars").cast("long")).as("sum_chars"),
        expr("sum(CASE WHEN n_tok < 20 THEN 1000000L ELSE 0L END) DIV count(1)")
          .as("short_ppm"),
        expr("sum(CASE WHEN n_stop*100 <= n_tok*5 THEN 1000000L ELSE 0L END) " +
          "DIV count(1)").as("nonenglish_ppm"),
        expr("sum(CASE WHEN scheme = 'http' THEN 1000000L ELSE 0L END) " +
          "DIV count(1)").as("http_ppm"),
        round(sum(col("n_tok")).cast("double") / count(lit(1)), 4)
          .as("mean_words"))
  }

  /** q197's row-local signal projection (URL build + parse + PSL chain +
    * rule counters), factored so the batch rollup and its streaming twin
    * (q201) score with the SAME code — the q152/q156 sharing pattern. */
  private[graft] def domainSignals(docs: DataFrame): DataFrame =
    docs
      .withColumn("url", concat(
        when(pmod(col("doc_id"), lit(3)) === 0, lit("http"))
          .otherwise(lit("https")),
        lit("://"),
        when(pmod(col("doc_id"), lit(4)) === 0, lit(""))
          .when(pmod(col("doc_id"), lit(4)) === 1, lit("www."))
          .when(pmod(col("doc_id"), lit(4)) === 2, lit("blog."))
          .otherwise(concat(lit("s"), pmod(col("doc_id"), lit(7)), lit("."))),
        element_at(
          array(lit("alpha-news.com"), lit("beta-press.co.uk"),
            lit("gamma.org"), lit("delta-mirror.co.uk"), lit("epsilon.net")),
          (pmod(col("doc_id"), lit(5)) + 1).cast("int")),
        when(pmod(col("doc_id"), lit(11)) === 0, lit(":8080"))
          .otherwise(lit("")),
        concat(lit("/"), col("source"), lit("/"), col("lang"),
          lit("/"), col("doc_id")),
        when(pmod(col("doc_id"), lit(2)) === 0,
          concat(lit("?ref="), col("source"))).otherwise(lit(""))))
      .withColumn("host", expr("parse_url(url, 'HOST')"))
      .withColumn("scheme", expr("parse_url(url, 'PROTOCOL')"))
      .withColumn("domain", registeredDomain(col("host")))
      .withColumn("n_tok", size(tokens(col("text"))).cast("long"))
      .withColumn("n_stop", stopwordCount(col("text")).cast("long"))

  /** The per-domain rollup in its STREAMING-legal form: q197's aggregate
    * minus `countDistinct(host)` — an exact distinct count is not an
    * incrementally-mergeable aggregation (the streaming distinct-count
    * job belongs to the q163 HLL-register monitor); everything kept is
    * additive (counts, sums, and projections over them), so a
    * complete-mode drain equals the batch rollup bit for bit regardless
    * of how the stream was micro-batched. */
  private[graft] def domainRollupStreaming(d: DataFrame): DataFrame =
    d.groupBy(col("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("sum_chars"),
        expr("sum(CASE WHEN n_tok < 20 THEN 1000000L ELSE 0L END) DIV count(1)")
          .as("short_ppm"),
        expr("sum(CASE WHEN n_stop*100 <= n_tok*5 THEN 1000000L ELSE 0L END) " +
          "DIV count(1)").as("nonenglish_ppm"),
        expr("sum(CASE WHEN scheme = 'http' THEN 1000000L ELSE 0L END) " +
          "DIV count(1)").as("http_ppm"),
        round(sum(col("n_tok")).cast("double") / count(lit(1)), 4)
          .as("mean_words"))
}
