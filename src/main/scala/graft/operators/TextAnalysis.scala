package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** TF-IDF top-k terms per document (q68) — the signal a training-data
    * pipeline uses for topic tagging and quality filtering. The weight is
    * the log-free variant tf · (N/df): products and quotients of integers
    * are correctly-rounded IEEE ops, so the rank key is bit-identical
    * across engines, which the hash gate needs (log-smoothed idf is a
    * one-line swap but libm `log` is only 1-ulp-accurate and can flip a
    * rank across engines). Ties rank by term, engine-independent.
    *
    * Shape at scale: the token explode feeds ONE partial-aggregating
    * groupBy into `tf`; `df` is a second partial agg over tf's (already
    * distinct) (doc, term) pairs, so document bodies never shuffle twice —
    * tf is persisted to keep the df pass from re-exploding the corpus. The
    * corpus size joins in as a broadcast single row. */
  def qTfIdfTopTerms(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("w").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("term"),
        (col("tf").cast("double") *
          (col("n").cast("double") / col("df").cast("double"))).as("w"))
      .withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("rnk"))
  }

  /** Token-window document chunking (q79): fixed-size chunks on a stride
    * (overlap = size − stride), the split every training pipeline applies
    * before packing sequences. Pure per-row Catalyst (sequence → slice →
    * posexplode): no shuffle at all until a consumer aggregates, and the
    * chunk table carries (doc_id, chunk_idx) so provenance survives
    * packing. Trailing chunks shorter than `size` are kept — dropping them
    * silently loses corpus tail tokens. */
  def qChunkDocuments(spark: SparkSession, dir: String,
      size: Int = 50, stride: Int = 40): DataFrame = {
    val t = split(col("text"), " ")
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), greatest(size_(t), lit(1)), lit(stride)),
          s => concat_ws(" ", slice(t, s, lit(size))))).as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
        col("chunk"),
        size_(split(col("chunk"), " ")).cast("bigint").as("n_tokens"))
  }

  // sql.functions.size under an alias: `size` collides with the chunk size
  // parameter above
  private def size_(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.size(c)

  /** Sequence packing (q81): chunks assigned to fixed token-budget bins by
    * their running start offset — the deterministic, shuffle-light stand-in
    * for greedy bin packing (true greedy is a sequential fold; offset
    * binning parallelizes per document, never reorders chunks, and is the
    * packing layout sequence-training loaders actually replay). One window
    * pass (partitioned by doc — no global sort), integer arithmetic
    * throughout. */
  def qPackChunks(spark: SparkSession, dir: String, budget: Int = 60): DataFrame = {
    val w = Window.partitionBy(col("doc_id")).orderBy(col("chunk_idx"))
    qChunkDocuments(spark, dir)
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", expr(s"(cum - n_tokens) DIV $budget"))
      .groupBy(col("doc_id"), col("bin"))
      .agg(count(lit(1)).as("n_chunks"), sum(col("n_tokens")).as("n_tokens"))
  }

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

  /** q87: intra-document repetition ratios — the Gopher-style quality
    * rule (Rae et al. 2021, "Scaling Language Models: ... Gopher",
    * table A1 repetition filters): the fraction of duplicate unigrams and
    * bigrams WITHIN each document, the signal that catches keyboard-mash,
    * boilerplate padding, and decode-loop degeneration before training.
    * rep_x = 1 − distinct(x)/count(x), 0 = no repetition.
    *
    * Entirely per-row array arithmetic — a single codegen'd projection
    * over the scan, zero shuffle (the right cost for a per-document
    * quality column at 100 TB: it rides the ingest scan for free). The
    * two divisions and subtractions are single correctly-rounded IEEE
    * ops, so the ratios hash-match the DuckDB oracle exactly. */
  def qRepetition(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(col("text"))
    val g2 = Dedup.shingles(col("text"), 2)
    Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      (lit(1.0) - size(array_distinct(t)).cast("double") / size(t))
        .as("rep_unigram"),
      (lit(1.0) - size(array_distinct(g2)).cast("double") / size(g2))
        .as("rep_bigram"))
  }

  /** q86: boilerplate n-gram scrub profile — the document-frequency rule
    * behind C4's repeated-line removal and Gopher's repetition filters,
    * expressed over word w-shingles (this corpus has no line structure):
    * a shingle occurring in ≥ `minDf` documents is boilerplate, and the
    * report gives per-source scrub pressure (how much of each feed a
    * scrubbing pass would cut).
    *
    * Scale design: shingles are digested to 16-byte md5 keys BEFORE any
    * shuffle (md5, not the sketch family — the df counts must not depend
    * on the oracle/production hash switch, and content digests are md5's
    * role here, [[graft.functions.TextFunctions.fpMd5]]). The corpus is
    * scanned and shingled ONCE into a checkpointed digest table feeding
    * both consumers; every exchange after that moves digests or
    * doc-count-sized rollups, never text (PlanSpec pins the 3-exchange
    * shape). Document frequency is a partial-aggregating groupBy — NOT a
    * per-shingle window count, which would serialize each hot shingle
    * into one task, and boilerplate shingles are hot BY DEFINITION
    * (that is what the query finds); map-side partials collapse them.
    * The df join broadcasts while dfreq is small and sort-merges on the
    * digest key at corpus scale — both sides digest-sized either way. */
  def qBoilerplateScrub(spark: SparkSession, dir: String, w: Int = 3,
      minDf: Int = 4): DataFrame =
    boilerplatePerDoc(spark, dir, w, minDf).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_sh")).as("n_shingles"),
        sum(col("n_boiler")).as("n_boiler"),
        // single IEEE division of two exact integer sums — oracle-exact
        (sum(col("n_boiler")).cast("double") / sum(col("n_sh")))
          .as("boiler_ratio"))

  /** The per-document half of [[qBoilerplateScrub]] — (doc_id, source,
    * n_sh, n_boiler) — exposed separately so the curation verdict (q88)
    * can threshold per-document boilerplate pressure without re-running
    * the digest pipeline in a different shape. Same plan as always: one
    * corpus shingling into the checkpoint boundary, digest-only shuffles
    * after it. */
  def boilerplatePerDoc(spark: SparkSession, dir: String, w: Int = 3,
      minDf: Int = 4): DataFrame = {
    // localCheckpoint: the digest table is the single materialization
    // boundary both consumers (df aggregation + join probe) read — same
    // boundary discipline as capBuckets. Digest identity through the
    // sketch60 family (xxhash64 in production — ~5-10× cheaper per
    // shingle than md5 AND an 8-byte key instead of a 32-char string in
    // the checkpoint and both shuffles; hex60 under the oracle gate):
    // only COUNTS leave this pipeline, so the hash is pure identity and
    // 60 bits carries ~4e5 expected collisions at 1e12 distinct shingles
    // — noise for a boilerplate ratio; swap to md5 where exactness of
    // individual df values matters more than the 5-10× scan cost.
    val sh = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        explode(array_distinct(Dedup.shingles(col("text"), w))).as("s"))
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.sketch60(col("s")).as("h"))
      .localCheckpoint()
    val dfreq = sh.groupBy(col("h")).agg(count(lit(1)).as("df"))
    sh.join(dfreq, Seq("h"))
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_sh"),
        sum(when(col("df") >= minDf, 1L).otherwise(0L)).as("n_boiler"))
  }

  /** q93: quality-ordered curriculum phases WITHOUT a global sort — the
    * data-ordering step of curriculum training (feed the cleanest quarter
    * first), sized by exact global quantile position.
    *
    * The naive plan — `ntile(4) over (order by quality)` — collapses the
    * corpus into ONE task (a global window has a single partition): the
    * canonical 100 TB scale-killer. Instead the phase boundary is derived
    * from an exact equi-width HISTOGRAM of the quality key, the same
    * refinement trick as [[graft.plans.Selection]]'s top-k cutoff: the
    * quality key (stopword ratio — one IEEE division, so its value set is
    * identical cross-engine) has far fewer distinct values than the
    * corpus has rows (bounded by the distinct (n_stop, n_tokens) pairs,
    * ~O(maxTokens²) regardless of corpus size), so
    *   1. ONE partial-aggregating groupBy rolls the corpus up to
    *      (ratio, doc count, token sums) — the only full-size pass;
    *   2. a running count over the TINY histogram (sorted quality-
    *      descending; single-partition, but over hundreds of rows, not
    *      the corpus) places each ratio's cumulative start;
    *   3. phase = floor(4·cum/n) in pure integer arithmetic — every doc
    *      with the same quality value lands in the same phase, phases
    *      split the corpus into near-quarters by construction.
    * The per-phase roster then sums the histogram's own partials — the
    * corpus is never re-scanned, re-joined, or globally sorted. At 100 TB
    * only step 1 touches data; steps 2-3 are driver-scale frames. */
  def qCurriculumPhases(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.load(spark, dir, "documents")
      .select(tokenCount(col("text")).cast("long").as("n_tok"),
        stopwordCount(col("text")).cast("long").as("n_stop"))
      .select(col("n_tok"), col("n_stop"),
        (col("n_stop").cast("double") / col("n_tok")).as("ratio"))
      .groupBy(col("ratio"))
      .agg(count(lit(1)).as("c"), sum(col("n_tok")).as("st"),
        sum(col("n_stop")).as("ss"))
    // phase-0 = highest stopword density (the most natural-English text
    // under the q27/q28 heuristic family) — quality-descending order
    val wCum = Window.orderBy(col("ratio").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.orderBy(col("ratio").desc)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    hist
      .withColumn("cum", coalesce(sum(col("c")).over(wCum), lit(0L)))
      .withColumn("n", sum(col("c")).over(wAll))
      .withColumn("phase", least(expr("(4 * cum) div n"), lit(3L)))
      .groupBy(col("phase"))
      .agg(sum(col("c")).as("n_docs"), sum(col("st")).as("n_tokens"),
        sum(col("ss")).as("n_stop"))
  }

  /** q97: per-language top-k documents by token count WITHOUT a per-group
    * corpus sort — the group-wise top-k (vs q15's global top-k) every
    * curation dashboard needs.
    *
    * The naive plan — `row_number() over (partition by lang order by
    * n_tokens desc)` straight over the corpus — sorts each language's
    * entire slice inside one task: with 5 languages over 100 TB that is
    * five ~20 TB sorts for a k=3 answer. Instead the cutoff is refined
    * from a histogram, the same trick as q93/[[graft.plans.Selection]]:
    *   1. ONE partial-aggregating groupBy rolls the corpus up to
    *      (lang, n_tokens, count) — bounded by langs × distinct lengths,
    *      independent of corpus size;
    *   2. a running count over the TINY per-lang histogram finds each
    *      language's rank-k length cutoff;
    *   3. the corpus is re-scanned FILTERED by the broadcast cutoffs
    *      (survivors ≈ k + boundary ties per language), and the exact
    *      rank window runs over that bounded survivor set only.
    * Two projected corpus scans replace the per-group sort; every window
    * in the plan partitions by lang over frames of histogram/survivor
    * size. */
  def qGroupTopK(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    def base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
    val hist = base.groupBy(col("lang"), col("n_tokens"))
      .agg(count(lit(1)).as("c"))
    // rows whose starting rank (cum − c) is still under k contain ranks
    // 1..k; the smallest such length is the rank-k cutoff for the lang
    val wCum = Window.partitionBy(col("lang")).orderBy(col("n_tokens").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cutoffs = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .filter(col("cum") - col("c") < k)
      .groupBy(col("lang")).agg(min(col("n_tokens")).as("cutoff"))
    // null-safe join key: a NULL lang is a real group to the window below
    // (and to the oracle's PARTITION BY), so the cutoff join must not drop it
    val survivors = base
      .join(broadcast(cutoffs.withColumnRenamed("lang", "cutoff_lang")),
        col("lang") <=> col("cutoff_lang"))
      .drop("cutoff_lang")
      .filter(col("n_tokens") >= col("cutoff"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_tokens").desc, col("doc_id").asc)
    survivors
      .withColumn("pick_rank", row_number().over(w).cast("long"))
      .filter(col("pick_rank") <= k)
      .select(col("lang"), col("pick_rank"), col("doc_id"), col("n_tokens"))
  }

  /** q99: top-k collocations (adjacent word pairs) by integer-exact PMI
    * lift — the phrase-mining signal a tokenizer-vocabulary or n-gram
    * quality pass runs over a corpus.
    *
    * Scale shape: ONE corpus scan. Each document's token array is zipped
    * with its own tail (`zip_with` pads the shorter side with null, so
    * the final token pairs with null), exploded, and rolled up by ONE
    * partial-aggregating groupBy on (w1, w2) — the only full-size
    * exchange, carrying two tokens per row, never text. Everything
    * downstream is vocab²-bounded: exact unigram counts fall out of the
    * pair frame itself (sum over the successor axis — the null rows make
    * the margin exact, so no second corpus pass), join back as two
    * broadcasts, and the ranked top-k is a TakeOrderedAndProject over the
    * tiny pair frame. The score is the log-free lift c12·N/(c1·c2) scaled
    * to ppm in pure BIGINT arithmetic (log PMI is rank-monotone with it;
    * libm log's 1-ulp wobble could flip a cross-engine rank, integer
    * division cannot — same reasoning as q68's tf·(N/df)). */
  def qBigramPmi(spark: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val pairs = Tables.load(spark, dir, "documents")
      .select(split(col("text"), " ").as("t"))
      .select(explode(zip_with(col("t"), slice(col("t"), lit(2), size(col("t"))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val uni = pairs.groupBy(col("w1").as("w")).agg(sum(col("c")).as("cu"))
    val n = uni.agg(sum(col("cu")).as("n"))
    val ranked = pairs.filter(col("w2").isNotNull)
      .join(broadcast(uni.select(col("w").as("w1"), col("cu").as("c1"))),
        Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("cu").as("c2"))),
        Seq("w2"))
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c").as("c12"), col("c1"),
        col("c2"),
        // Exact integer floor-division in DECIMAL end to end. `div`
        // (IntegralDivide) always returns BIGINT even over decimal
        // operands, so the QUOTIENT c·N·1e6/(c1·c2) — not just the
        // numerator — must stay decimal: hapax-hapax pairs (c=c1=c2=1)
        // have lift N·1e6, past BIGINT at N > 9.2e12 tokens (reached at
        // 100 TB), and Spark 4's ANSI default turns that into a query-time
        // ArithmeticException. (numer − numer % denom) / denom is an exact
        // integer, so the scale-6 decimal division introduces no rounding
        // (a bare floor(numer/denom) could round x.9999996 up across the
        // floor boundary). The DuckDB oracle's int128 `//` floor-division
        // is matched digit for digit up to 10^32; the final BIGINT cast is
        // the declared column type (the oracle's, too) — it can only
        // overflow when the true lift itself exceeds int64, i.e. hapax
        // pairs at N > 9.2e12 tokens, where a deployment would declare the
        // column DECIMAL(38,0) instead.
        expr("cast(((cast(c as decimal(38,0)) * n * 1000000)" +
          "  - (cast(c as decimal(38,0)) * n * 1000000)" +
          "    % (cast(c1 as decimal(38,0)) * c2))" +
          " / (cast(c1 as decimal(38,0)) * c2) as bigint)"
          ).as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1").asc, col("w2").asc)
      .limit(k)
    ranked
  }

  /** q100: PII scrubbing — the redaction pass every training-data pipeline
    * runs before text ever reaches a tokenizer (emails, IPv4s, phone-ish
    * number runs → typed placeholder tokens).
    *
    * Pure per-row `regexp_replace`/`regexp_count` chains: embarrassingly
    * parallel, no shuffle, stays inside whole-stage codegen (Java regex is
    * compiled once per task by the codegen'd RegExpReplace). Patterns use
    * only the portable class syntax ([0-9], explicit alternation — no \\d,
    * no lookaround) so the DuckDB RE2 oracle computes the identical
    * replacement; both engines are leftmost-first with greedy quantifiers
    * over these anchorless patterns. The synthetic corpus carries no PII,
    * so the gate query first augments each doc with deterministic
    * doc_id-derived PII (same expression in the oracle) — the scrub is
    * verified against text that actually contains what it scrubs, per-doc
    * md5 of the scrubbed text plus per-kind counts. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
  val Ipv4Re = "[0-9][0-9]?[0-9]?\\.[0-9][0-9]?[0-9]?\\.[0-9][0-9]?[0-9]?\\.[0-9][0-9]?[0-9]?"
  val PhoneRe = "\\+[0-9][0-9-]{7,}"

  /** Scrub the three PII kinds from `text` (email → `<EMAIL>`, IPv4 →
    * `<IP>`, phone runs → `<PHONE>`), in that order — IPs are gone before
    * the number-run pattern could chew on them. */
  def scrubPii(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  def qPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val aug = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), concat(
        col("text"),
        lit(" contact user"), col("doc_id"), lit("@example.com"),
        lit(" from 10.0."), col("doc_id") % 256, lit("."), col("doc_id") % 100,
        lit(" call +1-555-"), format_string("%04d", col("doc_id") % 10000)
      ).as("t"))
    // each kind is counted on the text AS THE REPLACE CHAIN SEES IT —
    // emails on raw text, IPs after the email pass, phones after both —
    // so the counts are exactly what scrubPii replaced (an IP-shaped
    // email local part like '1.2.3.4@x.com' is consumed by the email
    // pass and must NOT also report an IP replacement)
    aug.select(
      col("doc_id"),
      md5(scrubPii(col("t"))).as("h"),
      regexp_count(col("t"), lit(EmailRe)).cast("long").as("n_email"),
      regexp_count(regexp_replace(col("t"), EmailRe, "<EMAIL>"),
        lit(Ipv4Re)).cast("long").as("n_ip"),
      regexp_count(
        regexp_replace(regexp_replace(col("t"), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        lit(PhoneRe)).cast("long").as("n_phone"))
  }

  /** q101: unigram log-probability scoring — the cheap perplexity proxy
    * (CCNet-style) that ranks documents by how "ordinary" their token
    * distribution is; filtering tails of this score is a standard
    * pre-training quality gate.
    *
    * Scale shape (the whole point vs a naive per-token join):
    *   1. per-doc term counts first: groupBy(doc_id, w) — one shuffle of
    *      the token stream, output bounded by distinct terms per doc;
    *   2. corpus unigram model: groupBy(w) over THOSE counts (partial
    *      aggregation upstream), output vocab-bounded; N via a 1-row
    *      cross-join broadcast;
    *   3. score join on w joins the two REDUCED frames — the raw token
    *      stream is never joined or shuffled twice;
    *   4. per-doc weighted average of ln(c/N), negated, rounded to 4 dp in
    *      BOTH engines (the q20 precedent: libm's 1-ulp wobble must not
    *      flip a cross-engine hash).
    * The vocabulary is never collected or broadcast — at 100 TB the model
    * frame is itself huge, and step 3's shuffle join on `w` handles that;
    * hot terms (stopwords) are the classic skew key, which AQE's skew-join
    * splitting absorbs. */
  def qUnigramLogprob(spark: SparkSession, dir: String): DataFrame = {
    val docTerms = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
      // persisted for the same reason as q68's tf: the model branch and
      // the scoring join both consume it, and without the persist each
      // consumer re-explodes the corpus (4 Generates in the plan vs 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = docTerms.groupBy(col("w")).agg(sum(col("tf")).as("c"))
    val n = model.agg(sum(col("c")).as("n"))
    docTerms
      .join(model, Seq("w"))
      .crossJoin(broadcast(n))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("tf")).as("n_tokens"),
        round(-sum(col("tf") * log(col("c").cast("double") / col("n"))) /
          sum(col("tf")), 4).as("nll"))
  }

  /** BPE merge-candidate counting (q108) — one step of byte-pair-encoding
    * tokenizer training: count every adjacent character pair, weighted by
    * corpus frequency, and rank the top merge candidates.
    *
    * The scale structure is the whole point: the corpus-sized work is ONE
    * map-side-combining groupBy to the distinct-word vocabulary (the same
    * dedup-before-expensive-work shape as q68's TF-IDF); the quadratic-ish
    * pair explosion then runs over the VOCABULARY — bounded by distinct
    * words, not corpus tokens, so 100 TB of text costs one word-count
    * shuffle plus vocab·avgLen cheap rows. Real BPE trainers iterate this
    * counting step after each merge; the per-iteration plan is this one. */
  /** q112: per-language percentile rank of document length WITHOUT a global
    * (or even per-group) sort of the corpus — the length-normalization
    * feature a quality scorer wants per document.
    *
    * The naive plan (`percent_rank() OVER (PARTITION BY lang ORDER BY
    * n_chars)`) sorts every language's whole corpus slice in one task. This
    * plan never sorts the corpus: one map-side-combining groupBy collapses
    * it to the (lang, n_chars) VALUE HISTOGRAM (bounded by the value domain,
    * not the row count — the q93/q97 trick); the cumulative "how many
    * strictly below" runs over that small histogram; the per-document rank
    * is then a broadcast join back on (lang, n_chars). pct_rank =
    * n_less/n_lang is one exact-integer division, correctly rounded
    * identically in any IEEE engine. */
  def q112PctRank(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val hist = d.groupBy(col("lang"), col("n_chars"))
      .agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy("lang").orderBy("n_chars")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("lang")
    val cum = hist
      .withColumn("n_less", sum(col("c")).over(wOrd) - col("c"))
      .withColumn("n", sum(col("c")).over(wAll))
      .select(col("lang"), col("n_chars"), col("n_less"), col("n"))
    d.join(broadcast(cum), Seq("lang", "n_chars"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        round(col("n_less").cast("double") / col("n"), 4).as("pct_rank"))
  }

  /** q143: CCNet-style PERPLEXITY BUCKETS — the quality-stratification
    * stage of a pre-training corpus pipeline (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl Data",
    * LREC'20): score every document with a bigram language model
    * (interpolated with the unigram model, λ = 0.9), then split each
    * language into head / middle / tail TERCILES of the score — CCNet
    * keeps "head" for LM training.
    *
    * q101 is the unigram proxy; this is the real LM scorer. Scale shape:
    *   1. bigrams are formed PARTITION-LOCALLY (zip_with against the
    *      shifted array — q99's trick; no shuffle, no window);
    *   2. per-doc bigram counts first (one shuffle of the bigram stream,
    *      output bounded by distinct bigrams per doc), then the corpus
    *      bigram and unigram models by partial re-aggregation of THAT;
    *   3. scoring joins the reduced frames on their natural keys — the
    *      model is never collected or broadcast (at 100 TB the bigram
    *      table is itself huge); stopword-headed bigrams are the classic
    *      skew keys, absorbed by AQE skew-join splitting;
    *   4. nll rounded to 4 dp in BOTH engines (q20/q101 libm contract);
    *   5. the tercile cut is SORTLESS: a 2-dp histogram of the score
    *      (≤ ~2000 bins/lang — ln P is bounded by ln(10N)), cumulated by
    *      a window whose state is O(bins), never O(docs) — the same
    *      refusal to sort the corpus as q112/q129. Cut rule: smallest bin
    *      with 3·cum ≥ k·total — integer arithmetic, no double quantiles.
    * Docs with < 2 tokens have no bigrams and are out of scope (both
    * engines agree by construction). Output: per (lang, bucket) doc count
    * and exact-4dp score range. */
  def q143PplBuckets(spark: SparkSession, dir: String): DataFrame = {
    // r22 (guide §2.5): the bigram explode + per-doc partial aggregate
    // below expand the corpus ~190x and ran entirely inside the scan
    // stage — ONE task over the gate's single-file corpus at any core
    // count, and the reason q143's first samples sat 5-6x over its
    // retimes through three rounds (a fresh generated class walks 22M
    // exploded rows cold in one thread; the retime reuses it C2-hot).
    // Spread the doc rows first (Spread.toCores: no-op on a wide scan).
    // Values: every downstream aggregate is keyed (doc_id, lang) or
    // exact-integer; the per-doc float nll sum is order-stable here
    // because tf*log(p) terms reduce per doc over the SAME exchange
    // (verified: q143 oracle-matched at sf0.001/0.01/0.1 post-change).
    val docBigrams = graft.plans.Spread.toCores(
      Tables.load(spark, dir, "documents"))
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("lang"),
        explode(zip_with(col("t"), slice(col("t"), lit(2), size(col("t"))),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
      .select(col("doc_id"), col("lang"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy(col("doc_id"), col("lang"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
      // both the model branch and the scoring join consume this; without
      // the persist each consumer re-explodes the corpus (q101's reason)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bi = docBigrams.groupBy(col("w1"), col("w2"))
      .agg(sum(col("tf")).as("c12"))
    val uni = bi.groupBy(col("w1").as("w")).agg(sum(col("c12")).as("c"))
    val n = uni.agg(sum(col("c")).as("n"))
    val scored = docBigrams
      .join(bi, Seq("w1", "w2"))
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      // left: a token only ever seen doc-final never heads a bigram; the
      // interpolation's c12 ≥ 1 keeps P > 0 regardless
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"), "left")
      .crossJoin(broadcast(n))
      .groupBy(col("doc_id"), col("lang"))
      .agg(round(-sum(col("tf") *
          log(lit(0.9) * col("c12").cast("double") / col("c1") +
            lit(0.1) * coalesce(col("c2"), lit(0L)).cast("double") / col("n"))) /
          sum(col("tf")), 4).as("nll"))
      // bin = hundredths of a unit, recovered from the 4-dp value in ONE
      // integer rounding step: nll*10000 for a 4-dp double is within
      // ~1e-8 of an integer (never near a .5 boundary), so Spark's
      // HALF_UP and DuckDB's libm round agree; DIV 100 is then exact
      // integer floor division (nll ≥ 0). A direct floor(nll*100) would
      // sit ON representation boundaries (12.345*100 = 1234.4999…) and
      // let a cross-engine 1-ulp wobble flip a doc across a tercile cut.
      .withColumn("s2",
        expr("CAST(round(nll * 10000, 0) AS BIGINT) DIV 100"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hist = scored.groupBy(col("lang"), col("s2")).agg(count(lit(1)).as("c"))
    val wOrd = Window.partitionBy("lang").orderBy("s2")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("lang")
    val cuts = hist
      .withColumn("cum", sum(col("c")).over(wOrd))
      .withColumn("tot", sum(col("c")).over(wAll))
      .groupBy(col("lang"))
      .agg(min(when(col("cum") * 3 >= col("tot"), col("s2"))).as("t1"),
        min(when(col("cum") * 3 >= col("tot") * 2, col("s2"))).as("t2"))
    scored
      .join(broadcast(cuts), Seq("lang"))
      .select(col("lang"), col("nll"),
        when(col("s2") <= col("t1"), "head")
          .when(col("s2") <= col("t2"), "middle")
          .otherwise("tail").as("bucket"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("nll")).as("nll_min"), max(col("nll")).as("nll_max"))
  }

  /** q149: BPE CORPUS ENCODING — the tokenization step a pre-training
    * pipeline runs between curation (q140) and sharding (q110): learn a
    * byte-pair-encoding merge table, then encode every document into
    * tokens with it and report the per-source token accounting. q108
    * counts first-round merge CANDIDATES; this trains the full iterative
    * merge list and applies it.
    *
    * Scale shape (the Sennrich dictionary trick, "Neural Machine
    * Translation of Rare Words with Subword Units", ACL'16 §3):
    *   1. TRAIN over the (word, freq) DICTIONARY, never the corpus: one
    *      corpus shuffle builds the dict, a BOUNDED collect takes its top
    *      `vocabCap` rows by (freq DESC, word) — tokenizer training is
    *      driver-scale by industry construction (SentencePiece/HF train
    *      on a capped dict or sample) — and the nMerges rounds of
    *      argmax-and-merge run as pure in-memory Scala. An earlier
    *      draft looped rounds as persisted DataFrames; 20 rounds of
    *      InMemoryRelation nesting made plan DESCRIPTIONS (ExplainUtils
    *      walks innerChildren) super-linear and the loop unrunnable —
    *      the dict collect is the honest architecture, not a concession.
    *   2. APPLY partition-locally: the whole ordered merge list folds
    *      into ONE expression chain — per merge, a greedy left-to-right
    *      single-pass `aggregate` (one pass suffices: a merged symbol
    *      a·b can never equal a or b, so no new occurrence of the SAME
    *      pair appears; overlaps only arise for a = b and the fold takes
    *      them greedily) — evaluated over the DISTINCT-word frame, so
    *      the encode is memoized by construction (the production
    *      tokenizer cache). The corpus pass is then one explode + one
    *      equi-join on the word (broadcast at gate scale, shuffle-keyed
    *      at 100 TB) + the per-source rollup. Words outside the training
    *      cap still encode — the fold applies to any word.
    * All-integer output; oracle = golden VALUES pinned from an
    * independent pure-Scala recompute (ScaleOpsSpec parity at sf0.001).
    * MEASURED at 20M tokens / ~50k-word dict / 50 merges
    * ([[graft.tools.SkewProbe]] section q149): 31 s end-to-end on
    * local[16] — train+encode, with the corpus touched exactly twice
    * (dict shuffle, encode join). */
  def q149BpeEncode(spark: SparkSession, dir: String,
      nMerges: Int = 20): DataFrame =
    bpeEncode(Tables.load(spark, dir, "documents"), nMerges)

  /** q220: q149's accounting with the CAP-FREE distributed trainer —
    * see [[bpeEncodeDistributed]]; shares q149's golden oracle verbatim
    * (bit-identical output is the parity claim). */
  def q220BpeDistTrain(spark: SparkSession, dir: String,
      nMerges: Int = 20): DataFrame =
    bpeEncodeDistributed(Tables.load(spark, dir, "documents"), nMerges)

  /** q149's engine over any (source, text) frame — the spec's parity and
    * greedy-overlap fixtures drive this directly. Training uses the
    * capped-dict driver fold (the small-corpus fast path); see
    * [[bpeEncodeDistributed]] for the cap-free trainer. */
  def bpeEncode(docs: DataFrame, nMerges: Int,
      vocabCap: Int = 1 << 20): DataFrame =
    bpeEncodeWith(docs, wordFreq => {
      val dict = wordFreq.orderBy(col("f").desc, col("w").asc)
        .limit(vocabCap)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      trainMerges(dict, nMerges)
    })

  /** q220: [[bpeEncode]] with VOCABULARY-SCALE training — the driver
    * fold's 2²⁰-row dict cap is the one design boundary the capped path
    * keeps on the books (at 100 TB multilingual scale the distinct-word
    * set exceeds ANY driver cap), so the trainer here runs each merge
    * round as a DISTRIBUTED pair count over the full word-frequency
    * frame (the q108 machinery iterated): fold the merges learned so
    * far into the symbol arrays, explode adjacent pairs, one map-side-
    * combined |pairs|-key aggregation, and take the argmax under the
    * SAME total order as the driver trainer (count DESC, pair ASC).
    * Exactly ONE row crosses the driver per round — no vocabulary-sized
    * structure ever does, which is the scale contract the capped path
    * cannot make. When the cap is not binding the two trainers are
    * bit-identical (same argmax order ⇒ same merge list ⇒ same encode;
    * parity-asserted in ScaleOpsSpec, and q220 shares q149's golden
    * oracle verbatim), and when it IS binding only this path is
    * correct (pinned by the spec's tiny-cap divergence fixture). */
  def bpeEncodeDistributed(docs: DataFrame, nMerges: Int): DataFrame =
    bpeEncodeWith(docs, trainMergesDistributed(_, nMerges))

  /** The shared encode/rollup body: one corpus shuffle builds the
    * (word, freq) frame, `trainer` learns the merge list from it, and
    * the encode applies the folded merge chain over DISTINCT words
    * (memoized by construction) before the per-source rollup join. */
  private def bpeEncodeWith(docs: DataFrame,
      trainer: DataFrame => Seq[(String, String)]): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val words = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
    // one corpus shuffle; persisted because the trainer and the
    // distinct-word encode both read it. Materialized EAGERLY so its
    // cached RDD registers before the distributed trainer's checkpoint
    // sweep starts diffing getPersistentRDDs — a lazily-registered cache
    // id would land in the sweep set and be dropped mid-query
    val wordFreq = words.groupBy(col("w")).agg(count(lit(1)).as("f"))
      .persist(MEMORY_AND_DISK)
    wordFreq.count()
    val merges = trainer(wordFreq)
    val encoded = wordFreq.select(col("w"),
      length(col("w")).cast("bigint").as("n_chr"),
      size(foldedSyms(merges)).cast("bigint").as("n_tok"))
    val out = words.join(encoded, Seq("w"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("n_chr")).as("n_chars"),
        sum(col("n_tok")).as("n_tokens"))
      .withColumn("chars_per_token_ppm",
        expr("n_chars * 1000000 DIV n_tokens"))
      .localCheckpoint()
    wordFreq.unpersist(false)
    out
  }

  /** q155: TOKEN-ID SEQUENCE EMISSION — the tokenizer's actual output
    * contract, closing the q108 → q149 chain: assign every final BPE
    * symbol a TOKEN ID (rank by corpus frequency DESC, symbol ASC — the
    * standard frequency-ordered vocab file) and emit each document's id
    * sequence, accounted per source with an order-SENSITIVE checksum
    * (Σ position·id mod 2³⁰ per doc, the q110 bound, then summed — a
    * reordering or off-by-one anywhere in the pipeline flips it).
    *
    * Scale shape: training + encode are q149's (bounded dict collect, one
    * folded apply over DISTINCT words); the id table is SYMBOL-vocab
    * bounded (its ranking window is over the vocab, never the corpus —
    * the IVF-centroid size class) and broadcasts into the token stream;
    * per-doc token positions come from one doc-partitioned window over
    * word positions (state O(doc), no global sort). The corpus pass is
    * one posexplode + explode + broadcast join + rollup. */
  def q155TokenIds(spark: SparkSession, dir: String,
      nMerges: Int = 20): DataFrame =
    tokenIdAccounting(Tables.load(spark, dir, "documents"), nMerges)

  /** q155's engine over any (source, doc_id, text) frame. */
  def tokenIdAccounting(docs: DataFrame, nMerges: Int,
      vocabCap: Int = 1 << 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val wordsPos = docs.select(col("source"), col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("wpos", "w")))
      .filter(length(col("w")) >= 1)
    val wordFreq = wordsPos.groupBy(col("w")).agg(count(lit(1)).as("f"))
      .persist(MEMORY_AND_DISK)
    val dict = wordFreq.orderBy(col("f").desc, col("w").asc)
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val merges = trainMerges(dict, nMerges)
    // encoded distinct-word table: both the id ranking and the corpus
    // join read it
    val encoded = wordFreq
      .select(col("w"), col("f"), foldedSyms(merges).as("syms"))
      .persist(MEMORY_AND_DISK)
    val idTable = encoded
      .select(col("f"), explode(col("syms")).as("sym"))
      .groupBy(col("sym")).agg(sum(col("f")).as("sf"))
      .withColumn("id",
        (row_number().over(Window.orderBy(col("sf").desc, col("sym").asc))
          - 1).cast("bigint"))
      .select(col("sym"), col("id"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("wpos"))
    val out = wordsPos
      .join(encoded.select(col("w"), col("syms")), Seq("w"))
      .withColumn("base",
        (sum(size(col("syms"))).over(wDoc) - size(col("syms"))).cast("bigint"))
      .select(col("source"), col("doc_id"), col("base"),
        posexplode(col("syms")).as(Seq("j", "sym")))
      .join(broadcast(idTable), Seq("sym"))
      .groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        pmod(sum((col("base") + col("j") + 1) * col("id")),
          lit(1073741824L)).as("ck"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        sum(col("ck")).as("id_checksum"))
      .localCheckpoint()
    encoded.unpersist(false); wordFreq.unpersist(false)
    out
  }

  /** The q202 pretokenizer: GPT-2-style (radford2019 §2.2 / the tiktoken
    * family) minus the `\s+(?!\S)` lookahead RE2 can't run — leftmost-
    * first alternation over contraction suffixes, space-prefixed letter
    * runs, space-prefixed digit runs, space-prefixed punctuation runs,
    * and whitespace runs. The SAME literal drives the engine (Java regex)
    * and the DuckDB oracle (RE2): both are leftmost-first here, and the
    * q202 oracle replays the extraction so a semantic gap between the two
    * engines fails the gate rather than hiding. */
  private[graft] val Gpt2StylePretokenRegex: String =
    "'s|'t|'re|'ve|'m|'ll|'d| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** q202: BYTE-LEVEL BPE WITH REGEX PRETOKENIZATION — the real tokenizer
    * contract (GPT-2/Llama): q108→q149→q155 train and apply merges over
    * whitespace-split words with a per-CHARACTER alphabet, which breaks
    * the moment the corpus carries punctuation, contractions, or
    * multi-byte UTF-8 (a "café"/"€5" has no char-level spelling a
    * byte-level vocab file would produce). This closes the gap:
    *   1. PRETOKENIZE with [[Gpt2StylePretokenRegex]] — contractions
    *      split ("it's" → "it", "'s"), digits separate from letters,
    *      punctuation runs group, spaces attach to the following word.
    *   2. BYTE-LEVEL ALPHABET: each pretoken's initial symbols are its
    *      UTF-8 BYTES (spelled as hex pairs — "café" starts as
    *      63·61·66·C3·A9), so any string encodes with zero OOV and the
    *      trained vocab is ≤256 base symbols + merges, exactly the
    *      byte-level contract.
    *   3. Train merges on the pretokenized dict (bounded collect, the
    *      q149 Sennrich discipline), apply as ONE folded expression chain
    *      over DISTINCT pretokens (memoized), emit frequency-ranked token
    *      ids and the q155 order-sensitive checksum per doc.
    * The corpus text is pure-ASCII single-spaced by construction, so the
    * query decorates each doc with a deterministic doc_id-keyed suffix
    * (contractions, digits, punctuation, 2- and 3-byte UTF-8) that the
    * DuckDB oracle replays in SQL — the byte/regex machinery is exercised
    * on every row, not on a fixture. Scale shape: one corpus shuffle for
    * the dict, one for the token rollup; everything else is vocab-bounded.
    * Output per source: docs, pretokens, bytes, tokens, id checksum —
    * n_pretokens/n_bytes replayed EXACTLY by the oracle's own
    * regexp_extract_all, n_tokens/id_checksum golden-pinned (trained-merge
    * replay has no tractable SQL twin; ScaleOpsSpec holds the independent
    * driver-side parity recompute, incl. the ASCII-reduction proof that
    * this engine degenerates to q149's on a single-word ASCII corpus). */
  def q202ByteBpe(spark: SparkSession, dir: String,
      nMerges: Int = 20): DataFrame =
    byteBpeTokenIds(decoratedDocs(spark, dir), nMerges)

  /** The q202/q207 corpus: documents decorated with a deterministic
    * doc_id-keyed suffix (contractions, digits, punctuation, 2- and
    * 3-byte UTF-8) that the DuckDB oracles replay in SQL \u2014 the byte/regex
    * machinery is exercised on every row, not on a fixture. */
  private[graft] def decoratedDocs(spark: SparkSession,
      dir: String): DataFrame =
    Tables.load(spark, dir, "documents").select(
      col("source"), col("doc_id"),
      // \u escapes, not literal chars: scalac runs with an ASCII
      // default charset here (empty LANG) and a literal multibyte char
      // in a string would decode into mojibake that silently diverges
      // from the oracle's UTF-8 reading of the same SQL
      concat(col("text"),
        when(pmod(col("doc_id"), lit(4)) === 0, lit(" caf\u00e9 9"))
          .when(pmod(col("doc_id"), lit(4)) === 1, lit(" it's ok!"))
          .when(pmod(col("doc_id"), lit(4)) === 2, lit(" we'll win 42"))
          .otherwise(lit(" na\u00efve, \u20ac5..."))).as("text"))

  /** The shared q202/q207 trained-tokenizer frames: pretoken stream,
    * byte-encoded distinct pretokens, and the frequency-ranked id table
    * (the vocab file — its inversion is q207's decode). `release()`
    * drops the two persists once the caller's plan is materialized. */
  private case class BytePipe(wordsPos: DataFrame, encoded: DataFrame,
      idTable: DataFrame, release: () => Unit)

  private def byteBpePipe(docs: DataFrame, nMerges: Int,
      vocabCap: Int): BytePipe = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val wordsPos = docs.select(col("source"), col("doc_id"),
        posexplode(regexp_extract_all(col("text"),
          lit(Gpt2StylePretokenRegex), lit(0))).as(Seq("wpos", "w")))
    val wordFreq = wordsPos.groupBy(col("w")).agg(count(lit(1)).as("f"))
      .persist(MEMORY_AND_DISK)
    val dict = wordFreq.orderBy(col("f").desc, col("w").asc)
      .limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val merges = trainMergesSyms(
      dict.map { case (w, f) => (utf8HexSyms(w), f) }, nMerges)
    val encoded = wordFreq
      .select(col("w"), col("f"), foldedBytes(merges).as("syms"))
      .persist(MEMORY_AND_DISK)
    val idTable = encoded
      .select(col("f"), explode(col("syms")).as("sym"))
      .groupBy(col("sym")).agg(sum(col("f")).as("sf"))
      .withColumn("id",
        (row_number().over(Window.orderBy(col("sf").desc, col("sym").asc))
          - 1).cast("bigint"))
      .select(col("sym"), col("id"))
    BytePipe(wordsPos, encoded, idTable,
      () => { encoded.unpersist(false); wordFreq.unpersist(false) })
  }

  /** The per-doc token-id stream (source, doc_id, tpos, id) — ONE
    * definition of the position convention (tpos = running symbol offset
    * within the doc), consumed by both q202's accounting and q207's
    * decode so the two can never silently diverge. */
  private def tokenIdStream(pipe: BytePipe): DataFrame = {
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("wpos"))
    pipe.wordsPos
      .join(pipe.encoded.select(col("w"), col("syms")), Seq("w"))
      .withColumn("base",
        (sum(size(col("syms"))).over(wDoc) - size(col("syms"))).cast("bigint"))
      .select(col("source"), col("doc_id"), col("base"),
        posexplode(col("syms")).as(Seq("j", "sym")))
      .join(broadcast(pipe.idTable), Seq("sym"))
      .select(col("source"), col("doc_id"),
        (col("base") + col("j")).as("tpos"), col("id"))
  }

  /** q202's engine over any (source, doc_id, text) frame. */
  private[graft] def byteBpeTokenIds(docs: DataFrame, nMerges: Int,
      vocabCap: Int = 1 << 20): DataFrame = {
    val pipe = byteBpePipe(docs, nMerges, vocabCap)
    val preAgg = pipe.wordsPos.groupBy(col("source"))
      .agg(count(lit(1)).as("n_pretokens"),
        sum(octet_length(col("w"))).cast("bigint").as("n_bytes"))
    val out = tokenIdStream(pipe)
      .groupBy(col("source"), col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        pmod(sum((col("tpos") + 1) * col("id")),
          lit(1073741824L)).as("ck"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"),
        sum(col("ck")).as("id_checksum"))
      .join(preAgg, Seq("source"))
      .select(col("source"), col("n_docs"), col("n_pretokens"),
        col("n_bytes"), col("n_tokens"), col("id_checksum"))
      .localCheckpoint()
    pipe.release()
    out
  }

  /** q207: BYTE-LEVEL BPE DECODE ROUNDTRIP — the losslessness contract a
    * byte-level tokenizer owes its training corpus, proven end to end:
    * every document's id sequence (q202's output) is decoded BACK through
    * the frequency-ranked vocab table (the id→symbol inversion a real
    * vocab file ships for), the symbols re-expand to bytes, and the
    * reassembled byte stream must equal the original document byte for
    * byte. This pins three claims at once: the pretokenization regex
    * PARTITIONS the string (a dropped character would shift every later
    * byte), the merge fold loses nothing (merged symbols concatenate
    * exactly their constituent bytes), and the id table is a bijection on
    * the emitted vocabulary. Equality is by an order-sensitive byte
    * checksum Σ(byte+1)·pos mod 2^30 plus a byte-count match per doc —
    * the comparison the oracle can replay (it recomputes the ORIGINAL
    * side from the decorated text and asserts n_roundtrip_exact ==
    * n_docs). Scale: the decode is the same broadcast-join shape as the
    * encode; per-doc state is one running-offset window (q155's class);
    * nothing new materializes. */
  def q207BpeRoundtrip(spark: SparkSession, dir: String,
      nMerges: Int = 20): DataFrame = {
    val docs = decoratedDocs(spark, dir)
    val pipe = byteBpePipe(docs, nMerges, 1 << 20)
    // ENCODE to ids (exactly q202's token stream — shared definition),
    // then DECODE each id back through the inverted vocab. The byte-level
    // checksum Σ(byte+1)·i decomposes per token as s1 + b0·s0 with
    // s0 = Σ_j (byte_j+1) and s1 = Σ_j (byte_j+1)·j computed ONCE PER
    // SYMBOL on the vocab table (vocab-bounded, broadcast) — so the
    // corpus-scale pass never explodes to per-byte rows and the per-doc
    // aggregation shuffles |tokens| partial sums instead of |bytes| rows
    // (r21: the per-byte Generate + its corpus-byte-scale HashAggregate
    // were the query's dominant exchange; identical integer arithmetic,
    // Σ_j (byte_j+1)(b0+j) = b0·s0 + s1 exactly).
    val symStats = pipe.idTable
      .withColumn("nb", expr("CAST(length(sym) DIV 2 AS BIGINT)"))
      .withColumn("s0", expr(
        "aggregate(sequence(1, CAST(length(sym) DIV 2 AS INT)), 0L, " +
          "(acc, j) -> acc + CAST(conv(substr(sym, 2*j-1, 2), 16, 10) " +
          "AS BIGINT) + 1L)"))
      .withColumn("s1", expr(
        "aggregate(sequence(1, CAST(length(sym) DIV 2 AS INT)), 0L, " +
          "(acc, j) -> acc + (CAST(conv(substr(sym, 2*j-1, 2), 16, 10) " +
          "AS BIGINT) + 1L) * j)"))
      .select(col("id"), col("nb"), col("s0"), col("s1"))
    val wTok = Window.partitionBy(col("doc_id")).orderBy(col("tpos"))
    val decBytes = tokenIdStream(pipe)
      .join(broadcast(symStats), Seq("id"))
      .withColumn("b0", sum(col("nb")).over(wTok) - col("nb"))
      .groupBy(col("source"), col("doc_id"))
      .agg(pmod(sum(col("s1") + col("b0") * col("s0")), lit(1073741824L))
        .as("dck"), sum(col("nb")).as("dnb"))
    // the ORIGINAL side, straight off the decorated text's UTF-8 bytes:
    // ONE codegen'd loop per doc ([[graft.functions.ByteWeightedCk]] —
    // byte k carries weight k, exactly the old posexplode+groupBy
    // arithmetic) — no hex expansion, no per-byte row explosion, no
    // corpus-byte-scale exchange at all
    graft.functions.ByteWeightedCk.register(spark)
    val origBytes = docs
      .select(col("source"), col("doc_id"),
        pmod(expr("byte_weighted_ck(text, 0L)"), lit(1073741824L)).as("ock"),
        octet_length(col("text")).cast("bigint").as("onb"))
    val out = origBytes
      .join(decBytes, Seq("source", "doc_id"), "left_outer")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("dck") === col("ock") && col("dnb") === col("onb"),
          1L).otherwise(0L)).as("n_roundtrip_exact"),
        sum(col("onb")).as("n_bytes"),
        pmod(sum(col("ock")), lit(1073741824L)).as("byte_ck"))
      .localCheckpoint()
    pipe.release()
    out
  }

  /** A string's UTF-8 bytes as uppercase hex-pair symbols — the driver
    * twin of [[foldedBytes]]'s initial alphabet. */
  private[graft] def utf8HexSyms(w: String): Array[String] =
    w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X")

  /** q182: TOKENIZER COVERAGE / OOV AUDIT — the number that decides
    * whether a trained BPE table TRANSFERS to a new corpus slice: train
    * the merge table on one slice (the English documents — the q153
    * target-domain convention), export its vocabulary (every symbol
    * present in the trained dictionary's final encoding — characters that
    * training always merged away are NOT in the vocab file, exactly like
    * a real tokenizer export), then encode the ENTIRE corpus and report,
    * per source, how many emitted symbols fall outside that vocabulary.
    * A source with a high OOV ppm needs tokenizer retraining before its
    * data can join the mixture — the go/no-go a data-acquisition review
    * reads.
    *
    * Scale shape: training is q149's bounded-dict collect; the corpus
    * pass encodes the DISTINCT-word frame once (memoized by
    * construction), marks OOV symbols via a broadcast join against the
    * vocab table (vocab-bounded — never a per-row literal scan), and the
    * per-source rollup rides (source, word, count) — occurrence counts
    * cross the exchange, never occurrences. */
  def q182TokenizerCoverage(spark: SparkSession, dir: String,
      nMerges: Int = 20, vocabCap: Int = 12): DataFrame =
    tokenizerCoverage(Tables.load(spark, dir, "documents"),
      col("lang") === "en", nMerges, vocabCap)

  /** q182's engine over any (source, lang, text) frame. */
  private[graft] def tokenizerCoverage(docs: DataFrame,
      trainPred: org.apache.spark.sql.Column, nMerges: Int,
      vocabCap: Int = 1 << 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val spark = docs.sparkSession
    import spark.implicits._
    // per-(source, word) occurrence counts: the encode join and the
    // rollup carry counts, never the token stream
    val srcWords = docs
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("f"))
      .persist(MEMORY_AND_DISK)
    val trainDict = docs.filter(trainPred)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("w").asc).limit(vocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val merges = trainMerges(trainDict, nMerges)
    // the exported vocab file: symbols of the trained dict's FINAL
    // encoding (driver-scale — bounded by the dict, like the training)
    val vocab = trainDict.iterator
      .flatMap { case (w, _) => encodeDriver(w, merges) }.toSet
    val vocabDf = vocab.toSeq.sorted.toDF("sym").withColumn("known", lit(true))
    val perWord = srcWords.select(col("w")).distinct()
      .select(col("w"), explode(foldedSyms(merges)).as("sym"))
      .join(broadcast(vocabDf), Seq("sym"), "left")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_sym"),
        sum(when(col("known").isNull, 1L).otherwise(0L)).as("n_oov_sym"))
    val out = srcWords.join(perWord, Seq("w"))
      .groupBy(col("source"))
      .agg(sum(col("f")).as("n_words"),
        sum(col("f") * col("n_sym")).as("n_tokens"),
        sum(col("f") * col("n_oov_sym")).as("n_oov_tokens"),
        sum(when(col("n_oov_sym") >= 1, col("f")).otherwise(0L))
          .as("n_oov_words"))
      .withColumn("oov_ppm", expr("n_oov_tokens * 1000000 DIV n_tokens"))
      .localCheckpoint()
    srcWords.unpersist(false)
    out
  }

  /** Driver-side twin of [[foldedSyms]] — one greedy left-to-right
    * non-overlapping pass per merge, same semantics bit for bit (parity
    * pinned by the q149/q182 specs). Used where the input is already a
    * bounded driver-side dictionary. */
  /** A word's symbols as CODE POINTS (one String per code point) — the
    * alphabet Spark's `substr(w, i, 1)` in [[foldedSyms]] actually
    * produces. A UTF-16 `w.map(_.toString)` split would shear astral
    * characters into surrogate halves and silently diverge the driver
    * trainer from the distributed one on non-BMP text. */
  private def codePointSyms(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Unsigned UTF-8 byte order — Spark's UTF8String binary comparison,
    * used for the argmax tie-break so [[trainMergesSyms]] and the
    * distributed trainer agree on ties even outside ASCII (Scala's
    * String order is UTF-16 code-unit order, which disagrees for
    * [U+E000, U+FFFF] vs supplementary symbols). Identical to Scala
    * order on ASCII, so the pinned goldens are unchanged. */
  private def utf8Lt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes("UTF-8"), b.getBytes("UTF-8")) < 0

  private[graft] def encodeDriver(w: String,
      merges: Seq[(String, String)]): Vector[String] = {
    var syms = codePointSyms(w).toVector
    for ((a, b) <- merges) {
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      for (s <- syms) {
        if (out.nonEmpty && out.last == a && s == b)
          out(out.length - 1) = a + b
        else out += s
      }
      syms = out.toVector
    }
    syms
  }

  /** Classic BPE merge learning over a (word, freq) dict: nMerges rounds
    * of freq-weighted pair counting + argmax (count DESC, pair ASC — a
    * total order, so the table is engine-deterministic) + greedy merge. */
  private[graft] def trainMerges(dict: Array[(String, Long)],
      nMerges: Int): Seq[(String, String)] =
    trainMergesSyms(
      dict.map { case (w, f) => (codePointSyms(w), f) }, nMerges)

  /** [[trainMerges]] over PRE-SPLIT symbol arrays — the alphabet is the
    * caller's choice (per-char for q149/q155, per-UTF-8-byte hex pairs
    * for q202's byte-level tokenizer). Same argmax total order. */
  private[graft] def trainMergesSyms(dict: Array[(Array[String], Long)],
      nMerges: Int): Seq[(String, String)] = {
    import scala.collection.mutable
    var vocab = dict
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val counts = mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) exhausted = true
      else {
        // argmax under (count DESC, a ASC, b ASC) with the UTF-8 byte
        // order Spark sorts strings by — the exact total order the
        // distributed trainer's orderBy uses, so the two are
        // bit-identical round for round
        val (a, b) = counts.toSeq.reduceLeft[((String, String), Long)] {
          case (best @ ((bx, by), bc), cur @ ((cx, cy), cc)) =>
            if (cc > bc) cur
            else if (cc == bc &&
              (utf8Lt(cx, bx) || (cx == bx && utf8Lt(cy, by)))) cur
            else best
        }._1
        merges += ((a, b))
        vocab = vocab.map { case (syms, f) =>
          val out = mutable.ArrayBuffer.empty[String]
          for (s <- syms) {
            if (out.nonEmpty && out.last == a && s == b)
              out(out.length - 1) = a + b
            else out += s
          }
          (out.toArray, f)
        }
      }
      round += 1
    }
    merges.toSeq
  }

  /** Cap-free DISTRIBUTED BPE merge learning over the full (w, f)
    * word-frequency frame — [[trainMerges]]' scale twin (q220). The
    * symbol arrays live as a MATERIALIZED column (localCheckpoint every
    * few rounds — lineage truncated, so no InMemoryRelation nesting
    * accumulates, the failure mode that killed the looped-DataFrame
    * draft); each round explodes adjacent pairs with their word
    * frequencies, takes the argmax of one map-side-combined aggregation
    * under the driver trainer's exact total order (count DESC, a ASC,
    * b ASC), and applies ONLY the merges since the last checkpoint as a
    * shallow expression fold (the r21 fix: refolding all R−1 merges
    * from raw text made round R pay R nested lambda passes, O(nMerges²)
    * total, with an nMerges-deep expression tree near the Janino
    * method-size bound; the checkpointed column bounds both at any
    * vocab scale). Exactly
    * one (a, b, count) row crosses the driver per round; the plan never
    * holds a vocabulary-sized structure anywhere but the executors.
    * Cost: nMerges argmax jobs + nMerges vocab-bounded checkpoint
    * materializations — the honest price of training where no driver
    * cap is sound. */
  private[graft] def trainMergesDistributed(wordFreq: DataFrame,
      nMerges: Int): Seq[(String, String)] = {
    val spark = wordFreq.sparkSession
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    // INCREMENTAL symbol state (r21): the original loop re-derived round
    // R's symbol arrays by folding all R−1 learned merges over the raw
    // word column — O(R·|words|) lambda passes per round, O(nMerges²)
    // total, and an nMerges-deep nested expression tree near the Janino
    // method-size bound. Materializing the symbol column once and
    // applying only THE round's single new merge makes each round one
    // shallow pass (O(nMerges) total). localCheckpoint (not persist)
    // truncates lineage each round, so no InMemoryRelation nesting
    // accumulates (the failure mode that killed the looped-DataFrame
    // draft); the previous round's checkpoint blocks are released by the
    // same getPersistentRDDs-diff discipline as q146's rank loop. Words
    // merged down to ONE symbol can never pair again (merging only
    // shrinks arrays), so dropping them is exact. Pair counts — and
    // therefore every argmax under (count DESC, a ASC, b ASC) — are
    // bit-identical to the refolding loop's; parity with the driver
    // trainer stays pinned by ScaleOpsSpec and q220's shared q149 oracle.
    var prevIds: Set[Int] = Set.empty
    def checkpointSweeping(df: DataFrame): DataFrame = {
      val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
      // Reliability.cut (r22): reliable checkpoint when the session has
      // a checkpoint dir (executor-loss-safe mid-train at cluster scale
      // — VERDICT r21 #3), localCheckpoint otherwise (single-node path)
      val out = graft.util.Reliability.cut(df)
      val fresh = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
      for (id <- prevIds; rdd <- spark.sparkContext.getPersistentRDDs.get(id))
        rdd.unpersist(false)
      prevIds = fresh
      out
    }
    // symbol-frame partitioning derived from ROW COUNT (the
    // cvSlicePartitions rule), never from core count: the trainer runs
    // 2·nMerges tiny driver-coordinated jobs, and dragging each through
    // shuffle.partitions-many near-empty tasks is pure scheduler latency
    // (wordFreq is cached by the caller, so the count is a cache read)
    val symParts = math.max(1L,
      math.min(2000L, (wordFreq.count() + 65535) / 65536)).toInt
    var syms = checkpointSweeping(wordFreq
      .coalesce(symParts)
      .select(col("f"), foldedSyms(Nil).as("syms"))
      .filter(size(col("syms")) >= 2))
    // merges applied since the last checkpoint ride the EXPRESSION (one
    // shallow fold each); every checkpointEvery rounds they materialize
    // into the column and the fold resets — bounded expression depth at
    // any vocab scale. Every round (measured): letting folds accumulate
    // traded one vocab-bounded checkpoint job for analyzer/optimizer
    // passes over an ever-deeper lambda tree in EVERY argmax plan, a
    // net loss — the argmax plan staying constant-shape also keeps its
    // generated code cache-hot across rounds
    val checkpointEvery = 1
    var pendingDepth = 0
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val top = syms
        .select(col("f"), explode(expr(
          "transform(sequence(0, size(syms) - 2), " +
            "i -> struct(syms[i] AS a, syms[i + 1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("f")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += ((a, b))
        if (round < nMerges - 1) {
          val applied = syms
            .select(col("f"),
              applyMerge(col("syms"), a, b, size(col("syms"))).as("syms"))
            .filter(size(col("syms")) >= 2)
          pendingDepth += 1
          syms =
            if (pendingDepth < checkpointEvery) applied
            else { pendingDepth = 0; checkpointSweeping(applied) }
        }
      }
      round += 1
    }
    for (id <- prevIds; rdd <- spark.sparkContext.getPersistentRDDs.get(id))
      rdd.unpersist(false)
    merges.toSeq
  }

  /** The whole ordered merge list folded into one expression chain over
    * a word column `w` — the partition-local BPE APPLY (shared by q149's
    * token accounting and q155's id emission). */
  private[graft] def foldedSyms(merges: Seq[(String, String)])
      : org.apache.spark.sql.Column = {
    val symsInit: org.apache.spark.sql.Column =
      expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))")
    merges.foldLeft(symsInit) { case (syms, (a, b)) =>
      applyMerge(syms, a, b, length(col("w"))) }
  }

  /** [[foldedSyms]]'s BYTE-LEVEL twin (q202): the initial symbol array is
    * the word's UTF-8 bytes as hex pairs ("63","61","66","C3","A9" for
    * "café") — merged symbols concatenate pairs, so every symbol is an
    * unambiguous byte-string spelling and the char-level fold machinery
    * applies unchanged. Token-count upper bound = octet_length. */
  private[graft] def foldedBytes(merges: Seq[(String, String)])
      : org.apache.spark.sql.Column = {
    val symsInit: org.apache.spark.sql.Column = expr(
      "transform(sequence(1, octet_length(w)), " +
        "i -> substr(hex(encode(w, 'UTF-8')), 2*i-1, 2))")
    merges.foldLeft(symsInit) { case (syms, (a, b)) =>
      applyMerge(syms, a, b, octet_length(col("w"))) }
  }

  /** One greedy left-to-right non-overlapping merge of (a, b) as a single
    * fold pass. Seeded with a space sentinel so the accumulator is never
    * empty (ANSI element_at on [] throws); symbols come from space-split
    * words, so no symbol — or merged symbol — can equal " ". The result
    * slice takes an UPPER BOUND of length(w) elements (slice truncates at
    * the end of the array) so the chained expression references its input
    * exactly once — a size(fold) recomputation would duplicate the whole
    * nested chain and blow up exponentially over nMerges nests. */
  private def applyMerge(syms: org.apache.spark.sql.Column,
      a: String, b: String,
      lenUpperBound: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    slice(
      aggregate(syms, array(lit(" ")), (acc, s) =>
        when(element_at(acc, size(acc)) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s)))),
      lit(2), greatest(lenUpperBound, lit(1)))

  /** q153: DSIR-STYLE IMPORTANCE WEIGHTS — data selection for language
    * models via importance resampling (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS'23): score
    * every document by how much more likely its tokens are under a
    * TARGET distribution (here the English slice — the q147 axis) than
    * under the BACKGROUND (every other language),
    *   w(d) = (1/|d|) Σ_t c_{d,t} · [ln p_tgt(t) − ln p_bg(t)],
    * add-one smoothed over the shared vocabulary. Positive weight =
    * "looks like target data" — the signal DSIR resamples by.
    *
    * One token-stream shuffle builds per-doc term counts; both unigram
    * models are partial RE-aggregations of that frame (vocab-bounded,
    * joined on their natural key, never collected or broadcast — the
    * q143 discipline, correct at 100 TB where the vocab is itself huge);
    * scoring is one equi-join on the token + a per-doc rollup. Per-doc
    * weights round to 4 dp (the q20/q101 libm contract) BEFORE the
    * positive-count and mean so every downstream comparison is on the
    * rounded value. Output: per language, doc count, docs with positive
    * weight, 4-dp mean weight. */
  def q153DsirWeights(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("lang"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = c.groupBy(col("tok")).agg(
      sum(when(col("lang") === "en", col("c")).otherwise(0L)).as("ct"),
      sum(when(col("lang") =!= "en", col("c")).otherwise(0L)).as("cb"))
    val totals = model.agg(sum(col("ct")).as("nt"), sum(col("cb")).as("nb"),
      count(lit(1)).as("v"))
    val perDoc = c
      .join(model, Seq("tok"))
      .crossJoin(broadcast(totals))
      .groupBy(col("doc_id"), col("lang"))
      .agg(round(
        sum(col("c") * (log((col("ct") + 1.0) / (col("nt") + col("v"))) -
          log((col("cb") + 1.0) / (col("nb") + col("v"))))) /
          sum(col("c")), 4).as("w"))
    val out = perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("w") > 0, 1L).otherwise(0L)).as("n_positive"),
        round(avg(col("w")), 4).as("mean_w"))
      .localCheckpoint()
    c.unpersist(false)
    out
  }

  def q108BpeMerges(spark: SparkSession, dir: String, k: Int = 30): DataFrame = {
    val vocab = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
    vocab
      .select(col("f"), explode(transform(
        sequence(lit(1), length(col("w")) - 1),
        i => col("w").substr(i, lit(2)))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("f")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair").asc)
      .limit(k)
  }

  /** q169: WORD-ENTROPY QUALITY SIGNAL — per-document Shannon entropy of
    * the word distribution, the repetition/gibberish detector the
    * surface ratios (q27) and the Gopher rules (q152) can't see: a page
    * of one phrase repeated has healthy length, alphabet and stopword
    * ratios but collapsed entropy. Computed via the sum decomposition
    * H = log2(n) − (Σ c·log2 c)/n so the per-doc aggregation is one
    * map-side-combinable Σ c·log2 c over the (doc, word) counts — the
    * same two-shuffle shape as every token rollup here, nothing
    * corpus-wide. Per-doc H is rounded to 4dp BEFORE the low-entropy
    * cut and the per-source mean, so the threshold compare and the
    * rollup are engine-stable (the q143 ULP lesson). */
  def q169WordEntropy(spark: SparkSession, dir: String,
      lowBits: Double = 3.0): DataFrame = {
    val perDoc = Tables.load(spark, dir, "documents")
      .select(col("source"), col("doc_id"),
        explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"), col("doc_id"), col("w"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"), col("doc_id"))
      .agg(sum(col("c")).as("n"),
        sum(col("c").cast("double") * log2(col("c").cast("double")))
          .as("clc"))
      .select(col("source"),
        round(log2(col("n").cast("double")) -
          col("clc") / col("n").cast("double"), 4).as("h"))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(sum(col("h").cast("decimal(18,4)")).cast("double") /
          count(lit(1)), 4).as("mean_entropy"),
        min(col("h")).as("min_entropy"),
        sum(when(col("h") < lowBits, 1L).otherwise(0L))
          .as("n_low_entropy"))
  }

  /** q180: ZIPF-SLOPE lexical-health fit — the corpus-linguistics check a
    * curation pass runs per source: natural text follows freq ∝ rank^s
    * with s ≈ −1; a slope near 0 flags templated/boilerplate sources
    * (flat head) and a steep slope flags degenerate repetition. Closed-form
    * least squares of y = ln(freq) on x = ln(rank) over each source's top
    * `topR` vocabulary ranks (frequency-desc, token tie-break — fully
    * deterministic ranking in any engine).
    *
    * Numeric contract: ln is libm → each coordinate is 4dp-rounded FIRST
    * (the q20/q101 precedent), making x and y the same doubles in both
    * engines; every Σ (x, y, xy, x²) then rides DECIMAL so partial-agg
    * order can't move a bit; the final slope is one fixed double tree over
    * those exact sums, rounded 4dp. Scale shape: the ranking input is the
    * per-source VOCABULARY (map-side-combined counts — sublinear in corpus
    * tokens), the per-source window sorts vocab not corpus, and everything
    * after rank ≤ topR is a |sources|-row rollup. */
  def q180ZipfSlope(spark: SparkSession, dir: String,
      topR: Int = 50): DataFrame = {
    val freq = Tables.load(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
    val pts = freq
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("source"))
          .orderBy(col("c").desc, col("tok"))))
      .filter(col("rank") <= topR)
      .select(col("source"), col("c"),
        round(log(col("rank").cast("double")), 4).as("x"),
        round(log(col("c").cast("double")), 4).as("y"))
    pts.groupBy(col("source"))
      .agg(count(lit(1)).as("n_ranks"),
        max(col("c")).as("top_freq"),
        sum(col("x").cast("decimal(18,4)")).as("sx"),
        sum(col("y").cast("decimal(18,4)")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(24,10)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(24,10)")).as("sxx"))
      .select(col("source"), col("n_ranks"), col("top_freq"),
        round((col("n_ranks") * col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double")) /
          (col("n_ranks") * col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double")), 4)
          .as("zipf_slope"))
  }

  /** q216: UNICODE HYGIENE AUDIT — the normalization-and-mojibake census
    * a multilingual corpus needs before ANY digest-keyed operator runs:
    * an NFD "é" (e + U+0301) and an NFC "é" (U+00E9) are different byte
    * strings, so exact dedup, MinHash shingles, and fingerprints all
    * silently treat canonically-equal texts as distinct; control bytes
    * and U+FFFD replacement characters are the standard mojibake tells.
    * Per source: docs whose text is not NFC (via
    * [[graft.functions.NfcNormalize]], the engine's codegen'd Catalyst
    * expression — no UDF barrier in a full-corpus projection), docs
    * carrying C0 control bytes (tab/newline/CR excluded), docs carrying
    * U+FFFD, and the total byte shrinkage NFC composition would buy.
    * The fixture corpus is ASCII, so (the q207 gauntlet discipline) each
    * doc is suffixed with a deterministic doc_id-keyed probe — an NFD
    * sequence, a clean tail, a BEL byte, a replacement char — making
    * every counter exercise real cases while both engines see the same
    * bytes; DuckDB replays with its native nfc_normalize. One scan, one
    * |sources|-row rollup; the NFC fast path (isNormalized) allocates
    * nothing on already-clean text, which is what makes the audit
    * affordable as a standing ingest gate at 100 TB. */
  def q216UnicodeAudit(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.NfcNormalize.register(spark)
    val probe = when(col("doc_id") % 4 === 0, lit(" cafe\u0301 27"))
      .when(col("doc_id") % 4 === 1, lit(" ok"))
      .when(col("doc_id") % 4 === 2, lit(" bad\u0007ctl"))
      .otherwise(lit(" \ufffdlost"))
    Tables.load(spark, dir, "documents")
      .select(col("source"), concat(col("text"), probe).as("t"))
      .withColumn("nfc", expr("nfc_normalize(t)"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("t") =!= col("nfc"), 1L).otherwise(0L))
          .as("n_non_nfc"),
        sum(when(col("t").rlike("[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"), 1L)
          .otherwise(0L)).as("n_ctrl"),
        sum(when(col("t").contains("\ufffd"), 1L).otherwise(0L))
          .as("n_repl"),
        sum((octet_length(col("t")) - octet_length(col("nfc")))
          .cast("long")).as("nfc_delta_bytes"))
  }
}
