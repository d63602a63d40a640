package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Approximate sketches for corpus profiling — the operators that replace
  * exact passes when 100 TB makes exactness a luxury: HyperLogLog++ distinct
  * counts (`approx_count_distinct`, mergeable map-side partials, O(kB) per
  * group) and quantile sketches (`approx_percentile`, Greenwald-Khanna
  * variant, bounded rank error). The reference profiles its datasets with
  * exact count/distinct/ratio passes (SURVEY §2.4); these are the
  * scale-path twins.
  */
object Sketches {

  /** Driver query (q60): one aggregation computing BOTH the exact and the
    * sketched statistic, emitting the exact value plus a boolean "sketch
    * within tolerance" per pair. The booleans make approximation quality a
    * DETERMINISTIC, oracle-checkable contract (the DuckDB twin emits the
    * exact values and literal trues) — the sketches themselves are
    * engine-specific and could never hash-match an oracle directly.
    *
    * Tolerances are loose multiples of the configured sketch error (HLL
    * rsd=0.01 vs 5% tolerance; percentile rank error n/10000 vs 5%-of-value
    * + 0.01 absolute), so the gate pins "sketch machinery works", not a
    * lucky hash seed. */
  /** Driver query (q65): content-hash sampling — `hash(key) % k == 0`
    * instead of RNG sampling. The sample is a pure function of the data:
    * reproducible across runs, engines, repartitioning, and executor
    * failure/retry (an RNG sample is none of these without carefully pinned
    * seeds AND partitioning), and consistent across tables sharing the key
    * — the contract a training-data holdout needs so no eval row ever
    * leaks into training. Hashes through the pluggable sketch60 family
    * (portable hex60 under the oracle gate, xxhash64 in production). */
  def q65HashSample(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .filter(graft.functions.TextFunctions.sketch60(
        col("event_id").cast("string")) % 10 === 0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_sampled"))

  /** Stratified content-hash sampling (q70): per-stratum 1-in-k rates —
    * hot event types downsampled hard, rare types kept whole, the
    * class-rebalancing shape of training-data curation. Same deterministic
    * contract as q65 (sample is a pure function of the data via the
    * sketch60 family), with the modulus looked up per row from a literal
    * map — still one codegen'd filter ahead of the aggregation, no join.
    * Unknown strata fall back to keep-all (coalesce to 1) rather than
    * silently dropping a class. */
  def q70StratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val rate = typedLit(Map(
      "view" -> 20L, "click" -> 10L, "signup" -> 5L,
      "error" -> 2L, "purchase" -> 1L))
    val k = coalesce(element_at(rate, col("event_type")), lit(1L))
    Tables.events(spark, dir)
      .filter(graft.functions.TextFunctions.sketch60(
        col("event_id").cast("string")) % k === 0)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_sampled"))
  }

  /** q89: sqrt-smoothed corpus rebalancing — the domain/language mixing
    * step of a training-data pipeline (cf. the multilingual-corpus
    * temperature-sampling rule of Conneau & Lample's XLM and the domain
    * reweighting DoReMi tunes): per-language weights ∝ √n flatten the
    * head (en holds 44% of this corpus but only ~30% of the mix) without
    * starving the tail, then each language is sampled AT its computed
    * rate with the same deterministic content-hash contract as q65/q70 —
    * the realized sample is a pure function of the data, reproducible
    * across runs, engines, and repartitioning.
    *
    * Every derived quantity is integer-exact cross-engine: √n is one
    * correctly-rounded IEEE op floored to BIGINT, the take and the ppm
    * rate are integer multiply-divides, and the sample predicate compares
    * the 60-bit content hash mod 10⁶ against the ppm rate — no float
    * accumulates across rows anywhere, so the oracle hash-matches.
    *
    * Scale shape: counts are ONE partial-agg groupBy; the per-language
    * rate table is O(languages) rows and broadcasts back onto the corpus
    * scan (tiny dim by construction); the sample pass is a codegen'd
    * filter + partial-agg count. Two corpus passes total (count + sample
    * — irreducible: rates depend on global counts), zero wide shuffles. */
  def q89MixRebalance(spark: SparkSession, dir: String,
      budget: Long = 200L): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val counts = docs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val weighted = counts
      .withColumn("wt", floor(sqrt(col("n_docs"))).cast("long"))
    val totals = weighted.agg(sum(col("wt")).as("total_wt"))
    val rates = weighted.crossJoin(broadcast(totals))
      .withColumn("take_target",
        least(col("n_docs"), expr(s"$budget * wt DIV total_wt")))
      .withColumn("rate_ppm", expr("take_target * 1000000 DIV n_docs"))
      .select(col("lang"), col("n_docs"), col("wt"),
        col("take_target"), col("rate_ppm"))
    val sampled = docs
      .join(broadcast(rates.select(col("lang"), col("rate_ppm"))), Seq("lang"))
      .filter(pmod(graft.functions.TextFunctions.sketch60(
        col("doc_id").cast("string")), lit(1000000L)) < col("rate_ppm"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n_sampled"))
    rates.join(sampled, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("wt"), col("take_target"),
        col("rate_ppm"), coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
  }

  /** q91: deterministic stratified train/val/test split — the holdout
    * assignment step every training run starts from. A document's split is
    * a pure function of its key (content hash mod 100 → 80/10/10), which
    * gives the three guarantees an RNG split cannot without carefully
    * pinned seeds AND partitioning: reproducible across runs/engines/
    * executor retries, stable under repartitioning, and consistent across
    * every table keyed by doc_id (a doc's features, embeddings, and
    * labels all land in the same split — no eval leakage into training).
    * The per-(lang, split) roster makes stratification auditable: each
    * language splits ~80/10/10 independently because the hash is
    * independent of lang.
    *
    * Scale shape: the split column is one codegen'd projection on the
    * scan; the audit roster is a single partial-agg groupBy over
    * (language × 3) groups. No shuffle carries text. */
  def q91SplitAssign(spark: SparkSession, dir: String): DataFrame = {
    val h = pmod(graft.functions.TextFunctions.sketch60(
      col("doc_id").cast("string")), lit(100L))
    Tables.load(spark, dir, "documents")
      .withColumn("split",
        when(h < 80, "train").when(h < 90, "val").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))
  }

  /** q133: LEAKAGE-FREE train/val/test split — q91's deterministic
    * hash-split with one crucial change: the hash key is the near-dup
    * CLUSTER (the persisted component root, the doc itself for
    * singletons), so near-duplicates can never straddle a split boundary.
    * Splitting by document hash (q91) leaks: a train document's
    * near-duplicate lands in test and the eval measures memorization —
    * the classic contamination bug in LLM data pipelines. The output
    * carries `n_split_violations` (clusters spanning >1 split), which the
    * construction forces to 0 — computed, not asserted, so the oracle
    * proves the property rather than trusting it.
    *
    * Plan: one left join against the read-only component-labels table,
    * the same pure-function sketch60 split as q91/q65 (reproducible, no
    * seed state), two bounded aggregations. */
  def q133LeakFreeSplit(spark: SparkSession, dir: String): DataFrame = {
    val labels = graft.operators.Dedup.stagedComponentLabels(spark, dir)
    val keyed = Tables.load(spark, dir, "documents")
      .select(col("doc_id"))
      .join(labels, col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("grp"))
    val h = pmod(graft.functions.TextFunctions.sketch60(
      col("grp").cast("string")), lit(100L))
    val assigned = keyed.withColumn("split",
      when(h < 80, "train").when(h < 90, "val").otherwise("test"))
      .persist()
    val per = assigned.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("grp")).as("n_groups"))
    val viol = assigned.groupBy(col("grp"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1)
      .agg(count(lit(1)).as("n_split_violations"))
    per.crossJoin(broadcast(viol))
  }

  /** q135: JOIN-CARDINALITY estimation from COUNT-MIN sketches, checked
    * against the exact answer — the optimizer-statistics primitive: a
    * planner deciding broadcast vs shuffle vs skew-mitigation for
    * A ⋈_k B wants |A ⋈ B| = Σ_k c_A(k)·c_B(k) WITHOUT computing the
    * join. The CMS inner-product estimate needs only two w·d-cell
    * sketches, each built in one map-side-combined pass.
    *
    * Here both sides are the event log keyed on user_id (the self-join
    * a sessionization or co-visit analysis pays), so the truth is
    * Σ c_u² — one groupBy. The sketch: d=4 rows of w=1024 counters,
    * counter (i, h_i(k) mod w) summing the key's multiplicity; the
    * estimate is min_i Σ_j cms[i][j]² and is a PROVABLE OVER-ESTIMATE of
    * the true inner product (hash collisions only add cross terms) — the
    * output carries that bound as a computed boolean plus the
    * over-estimation ratio in exact ppm. Deterministic: the row hashes
    * are the portable sketch60 family over "i:key", so the DuckDB oracle
    * rebuilds the identical sketch. All arithmetic integer; squares sum
    * in DECIMAL(38,0) (c² at 1e12-event keys overflows BIGINT).
    *
    * OUTPUT BOUND: exact_pairs/est_pairs are emitted as BIGINT — valid
    * while the join cardinality itself is < 2^63 (~9.2e18 pairs, i.e.
    * key multiplicities up to ~3e9 even at the 100 TB regime the
    * internal DECIMAL accumulation protects). Past that, widen the two
    * output casts to DECIMAL(38,0); the internal math already is. */
  def q135JoinSizeSketch(spark: SparkSession, dir: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    import graft.functions.TextFunctions.sketch60
    val keys = Tables.events(spark, dir).select(col("user_id"))
    val exact = keys.groupBy(col("user_id")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c").cast("decimal(38,0)") * col("c")).as("exact"))
    val cms = keys
      .select(col("user_id"),
        explode(array((0 until depth).map(lit(_)): _*)).as("i"))
      .groupBy(col("i"),
        pmod(sketch60(concat_ws(":", col("i"), col("user_id"))),
          lit(width.toLong)).as("j"))
      .agg(count(lit(1)).as("c"))
    val est = cms.groupBy(col("i"))
      .agg(sum(col("c").cast("decimal(38,0)") * col("c")).as("ip"))
      .agg(min(col("ip")).as("est"))
    exact.crossJoin(est).select(
      col("exact").cast("bigint").as("exact_pairs"),
      col("est").cast("bigint").as("est_pairs"),
      (col("est") >= col("exact")).as("upper_bound_ok"),
      expr("cast((est * 1000000 - (est * 1000000) % exact) / exact as bigint)")
        .as("ratio_ppm"))
  }

  /** q110: training-shard manifest — the dataloader-facing summary a shard
    * writer emits next to the data: per shard, how many documents, how many
    * characters, and an ORDER-INDEPENDENT membership checksum a consumer can
    * recompute to verify it read exactly the intended rows. Shard identity
    * is the same deterministic content-hash contract as q65/q91 (a pure
    * function of doc_id via the sketch60 family — reshardable, reproducible,
    * no seed state).
    *
    * The checksum is Σ(h(doc_id) mod 2³⁰) — commutative integer addition, so
    * it needs no per-shard ordering and aggregates map-side; a
    * collect_list/string_agg digest would haul every id through the shuffle
    * in one list per shard and force a sort. mod 2³⁰ keeps the sum far from
    * int64 overflow even at 2³³ docs per shard. One codegen'd projection +
    * one tiny (nShards-row) partial-agg groupBy: nothing corpus-sized moves. */
  def q110ShardManifest(spark: SparkSession, dir: String,
      nShards: Int = 64): DataFrame = {
    val h = graft.functions.TextFunctions.sketch60(col("doc_id").cast("string"))
    Tables.load(spark, dir, "documents")
      .select(pmod(h, lit(nShards.toLong)).as("shard"), col("n_chars"),
        pmod(h, lit(1073741824L)).as("idh"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        sum(col("idh")).as("id_checksum"))
  }

  /** q113: per-group TRIMMED MEAN (drop the top and bottom `trimPct`% by
    * value, average the rest) — the robust aggregate a metrics pipeline
    * uses when a handful of pathological rows would otherwise own the
    * mean.
    *
    * The naive plan ranks every group with `row_number() OVER (PARTITION BY
    * grp ORDER BY value)` — a full sort of each group's corpus slice in one
    * task. Instead the trim boundaries come from
    * [[graft.plans.Selection.topKPredicate]]: the exact t-th order
    * statistic by iterative histogram refinement (driver sees ≤8k-row
    * histograms, rows never leave their executor), once per tail per group
    * (the lower tail is the top-t of the NEGATED value), and the kept set
    * becomes one codegen'd disjunction filtered in a single
    * partition-parallel pass — no sort anywhere. Ties at a boundary follow
    * Selection's (value, event_id) contract, which the oracle's
    * row_number tie-break mirrors exactly.
    *
    * All groups refine TOGETHER through
    * [[graft.plans.Selection.groupedKthLargestDouble]] /
    * [[graft.plans.Selection.groupedKthSmallestLong]]: each round is ONE
    * bounds-broadcast aggregation covering every unfinished group and both
    * tails share the machinery, so total driver-synchronized jobs are
    * O(rounds), independent of G — the many-groups regime (a per-group
    * loop pays G × rounds of scheduler latency; measured 8 s → ~2 s warm
    * at sf0.1 with G=5, and the job count would not move at G=5000). The
    * kept pass is one broadcast join against the G-row cutoff table plus a
    * codegen'd filter. Sums cross engines through DECIMAL(18,2) (the
    * q51/q85 contract). */
  def q113TrimmedMean(spark: SparkSession, dir: String,
      trimPct: Int = 10): DataFrame = {
    import graft.plans.Selection
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        col("value").cast("double").as("value"))
      .withColumn("negv", -col("value"))
      .persist()
    // one job for every group size (not one count() per group)
    val sizes = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ts = sizes.map { case (g, n) => g -> n * trimPct / 100 }
      .filter(_._2 > 0)
    def tailCuts(valueCol: String): Map[String, (Double, Long)] = {
      val cuts = Selection.groupedKthLargestDouble(ev, "event_type", valueCol, ts)
      val mTargets = cuts.map { case (g, (_, nAbove)) => g -> (ts(g) - nAbove) }
      import spark.implicits._
      val cutDf = cuts.toSeq.map { case (g, (c, _)) => (g, c) }.toDF("__g", "__c")
      val ties = ev.join(broadcast(cutDf),
        col("event_type") === col("__g") && col(valueCol) === col("__c"))
        .drop("__g", "__c") // the grouped refinement reuses these aliases
      val idCuts = Selection.groupedKthSmallestLong(ties, "event_type",
        "event_id", mTargets)
      cuts.map { case (g, (c, _)) => g -> ((c, idCuts(g))) }
    }
    // the hi- and lo-tail refinements are independent multi-job chains
    // over the same cached frame — overlapped (guide §2.6); each is a
    // deterministic pure function of `ev`, so values are unchanged
    val Seq(hi, lo) =
      graft.ml.Par.mapAll(Seq("value", "negv"))(tailCuts)
    import spark.implicits._
    val cutoffs = ts.keys.toSeq.map { g =>
      (g, hi(g)._1, hi(g)._2, lo(g)._1, lo(g)._2)
    }.toDF("event_type", "hiC", "hiId", "loC", "loId")
    val hiTail = col("value") > col("hiC") ||
      (col("value") === col("hiC") && col("event_id") <= col("hiId"))
    val loTail = col("negv") > col("loC") ||
      (col("negv") === col("loC") && col("event_id") <= col("loId"))
    ev.join(broadcast(cutoffs), Seq("event_type"), "left")
      // groups below the trim threshold (t = 0) have no cutoff row: keep all
      .filter(coalesce(!hiTail && !loTail, lit(true)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_kept"))
      .select(col("event_type"), col("n_kept"), col("sum_kept"),
        round(col("sum_kept") / col("n_kept"), 4).as("trimmed_mean"))
  }

  /** q102: EXACT fixed-k-per-stratum sample — "give me exactly k docs per
    * language, deterministically" (eval-set construction, per-class probe
    * sets), the fixed-COUNT complement of q70's fixed-RATE strata. The
    * sample is the k smallest content-hash keys per stratum, so it
    * inherits the q65/q91 contract: a pure function of the data,
    * reproducible across runs/engines/partitioning, no seed plumbing.
    *
    * Scale shape — the naive `row_number() OVER (PARTITION BY lang ORDER
    * BY h)` sorts each stratum's entire corpus slice in one task; instead
    * the q97 histogram-cutoff refinement, adapted to a near-unique key by
    * BUCKETING the 60-bit hash into its top-16-bit prefix:
    *   1. one partial-agg groupBy rolls the corpus to (lang, bucket,
    *      count) — ≤ langs × 65536 rows regardless of corpus size;
    *   2. a running count over that tiny histogram finds each stratum's
    *      rank-k bucket cutoff;
    *   3. the corpus re-scans filtered by the broadcast cutoffs
    *      (survivors ≈ k + one bucket's tail per stratum) and the exact
    *      rank window runs over the survivor set only.
    * No shuffle carries text; every window frame is histogram- or
    * survivor-sized. */
  def q102StratifiedK(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    def base = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        graft.functions.TextFunctions.sketch60(
          col("doc_id").cast("string")).as("h"))
    // 60-bit non-negative hash → 16-bit bucket prefix
    val bucketed = base.withColumn("hb", expr("h DIV 17592186044416"))
    val hist = bucketed.groupBy(col("lang"), col("hb"))
      .agg(count(lit(1)).as("c"))
    val wCum = Window.partitionBy(col("lang")).orderBy(col("hb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // buckets whose starting rank (cum − c) is below k hold ranks 1..k;
    // the LARGEST such bucket bounds the survivor set from above
    val cutoffs = hist
      .withColumn("cum", sum(col("c")).over(wCum))
      .filter(col("cum") - col("c") < k)
      .groupBy(col("lang")).agg(max(col("hb")).as("hb_cut"))
    val survivors = bucketed
      .join(broadcast(cutoffs.withColumnRenamed("lang", "cutoff_lang")),
        col("lang") <=> col("cutoff_lang"))
      .drop("cutoff_lang")
      .filter(col("hb") <= col("hb_cut"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("h").asc, col("doc_id").asc)
    survivors
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("lang"), col("rnk"), col("doc_id"), col("h"))
  }

  /** q127: exact SYSTEMATIC weighted sampling (size-proportional, without
    * replacement) — the deterministic subsample a pipeline draws when it
    * wants "10 documents, long ones proportionally more likely, same
    * answer on every run and every engine". Classic PPS systematic
    * sampling: lay every document's weight (n_chars) end to end on a
    * line of total length W, drop k evenly spaced points (2j+1)·W/(2k),
    * and take the document whose interval each point lands in. A doc of
    * weight w is picked with probability k·w/W (multiply-picked if
    * w > W/k), and Σ n_picks = k EXACTLY — asserted in the spec.
    *
    * The only non-trivial distributed piece is the exact GLOBAL prefix sum
    * of weights in doc_id order, built as a TWO-LEVEL scan instead of a
    * single-partition window over the corpus:
    *  1. within-chunk running sums — window partitioned by
    *     chunk = doc_id div 64, parallel in #chunks;
    *  2. chunk totals (one row per chunk, corpus/64 rows) get their own
    *     cumulative offsets in one bounded window and broadcast back.
    * At 10^12 docs a 2^20 chunk width gives ~10^6 single-task rows at
    * level 2 and ~10^6-row level-1 partitions — both fine; the 64 here
    * just exercises many chunks at test scale. Every pick test is pure
    * integer arithmetic: count(x) = ⌊(2kx + W − 1)/(2W)⌋ points fall
    * strictly below x, n_picks = count(cum) − count(cum − w); products run
    * in DECIMAL(38,0) (2k·W overflows BIGINT at ~1e15 chars × large k)
    * and IntegralDivide returns BIGINT. */
  def q127SystematicSample(spark: SparkSession, dir: String, k: Int = 12,
      chunk: Long = 64L): DataFrame = {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars").as("w"))
      .withColumn("chunk", expr(s"doc_id DIV $chunk"))
    val within = Window.partitionBy(col("chunk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = d.withColumn("local_cum", sum(col("w")).over(within))
    val totals = d.groupBy(col("chunk")).agg(sum(col("w")).as("ct"))
    val offW = Window.orderBy(col("chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = totals.withColumn("off",
      coalesce(sum(col("ct")).over(offW), lit(0L)))
    val wtot = totals.agg(sum(col("ct")).as("wt"))
    local.join(broadcast(offsets.select(col("chunk"), col("off"))),
        Seq("chunk"))
      .withColumn("cum", col("local_cum") + col("off"))
      .crossJoin(broadcast(wtot))
      .withColumn("c_hi", expr(
        s"greatest(0L, cast(2 * $k as decimal(38,0)) * cum + wt - 1) DIV (2 * wt)"))
      .withColumn("c_lo", expr(
        s"greatest(0L, cast(2 * $k as decimal(38,0)) * (cum - w) + wt - 1) DIV (2 * wt)"))
      .withColumn("n_picks", col("c_hi") - col("c_lo"))
      .filter(col("n_picks") >= 1)
      .select(col("doc_id"), col("w"), col("n_picks"))
  }

  /** q129: grouped MEDIAN + MAD (median absolute deviation) — the robust
    * location/scale pair an outlier-resistant quality monitor runs per
    * segment, where mean/stddev (q104) get dragged by heavy tails.
    *
    * Both statistics are ORDER STATISTICS, so both reuse the grouped
    * selection engine ([[graft.plans.Selection.groupedKthLargestDouble]]):
    * every histogram round is one bounds-broadcast aggregation shared by
    * all groups — O(rounds) jobs at any group count, never a per-group
    * corpus sort. Median is the rank-(n div 2 + 1) value (the upper median
    * for even n — a DATA value, no interpolation, so it crosses engines
    * bit-exactly); MAD re-runs the same selection over |x − median|,
    * whose IEEE subtraction is deterministic on both engines. Two
    * selection passes + one broadcast join; the corpus shuffles zero
    * times. */
  def q129GroupedMad(spark: SparkSession, dir: String): DataFrame = {
    import graft.plans.Selection
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        col("value").cast("double").as("value"))
      .persist()
    val sizes = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // rank n div 2 + 1 from the smallest = rank (n - n div 2) from the top
    val ks = sizes.map { case (g, n) => g -> (n - n / 2) }
    val med = Selection.groupedKthLargestDouble(ev, "event_type", "value", ks)
      .map { case (g, (v, _)) => g -> v }
    import spark.implicits._
    val medDf = med.toSeq.toDF("event_type", "median")
    val dev = ev.join(broadcast(medDf), Seq("event_type"))
      .withColumn("dev", abs(col("value") - col("median")))
    val mad = Selection.groupedKthLargestDouble(dev, "event_type", "dev", ks)
      .map { case (g, (v, _)) => g -> v }
    sizes.toSeq.map { case (g, n) => (g, n, med(g), mad(g)) }
      .toDF("event_type", "n", "median", "mad")
  }

  def q60ApproxProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .agg(
        countDistinct(col("user_id")).as("exact_users"),
        approx_count_distinct(col("user_id"), rsd = 0.01).as("hll_users"),
        expr("percentile(value, 0.5)").as("exact_p50"),
        expr("approx_percentile(value, 0.5, 10000)").as("approx_p50"))
      .select(
        col("exact_users"),
        (abs(col("hll_users") - col("exact_users")) <=
          col("exact_users") * 0.05).as("hll_ok"),
        round(col("exact_p50"), 2).as("p50"),
        (abs(col("approx_p50") - col("exact_p50")) <=
          greatest(abs(col("exact_p50")) * 0.05, lit(0.01))).as("pctl_ok"))

  /** q148: EPOCH-WEIGHTED MIXTURE MATERIALIZATION — the "web ×0.7,
    * books ×3.2" step of a pre-training data recipe, made exact: every
    * document gets a deterministic integer REPEAT COUNT whose per-source
    * mean hits the fractional epoch factor without any sampling variance
    * bookkeeping. q89 decides the proportions; this materializes them.
    *
    * The fractional part is rounded doc-by-doc with the engine's own
    * hash — copies(d) = ⌊f⌋ + [sketch60("source:doc") mod 10⁶ < frac·10⁶]
    * — so the assignment is (a) reproducible row-locally on any executor
    * with no coordination, (b) exact in expectation per source, and
    * (c) integer end to end, which is what lets the DuckDB oracle (hex60
    * family) rebuild the identical per-source copy and token totals.
    * The per-source factor itself is derived deterministically here
    * (0.5–3.5 epochs from the source-name hash) so the gate needs no
    * config fixture; production passes real factors the same shape.
    *
    * Scale shape: one projection over the scan (no shuffle until the
    * per-source rollup, whose key space is |sources|); the materializer
    * downstream would `explode(sequence(1, copies))` — also shuffle-free. */
  /** q150: MIXTURE MATERIALIZATION → SHARD MANIFEST — the step after
    * q148: actually emit one row per (document, epoch copy) of the
    * recipe and account for it shard by shard, closing the
    * recipe → shards chain (q148 → q110) end to end. A consumer holding
    * only the manifest can verify it read exactly the intended mixture:
    * per shard, row count, token total, and the q110 order-independent
    * membership checksum — now keyed by (source, doc, COPY), so every
    * repeat of a document is individually accounted.
    *
    * Scale shape: the copy counts are the q148 projection (row-local,
    * no coordination); `explode(sequence(1, copies))` fans out
    * shuffle-free (docs with 0 copies are filtered BEFORE the explode —
    * Spark's sequence(1, 0) would generate a DESCENDING [1, 0]); the
    * copy-aware shard hash spreads a document's repeats across shards
    * (what a real epoch-aware shard writer does, so no shard replays the
    * same doc twice in one pass); the only shuffle is the nShards-row
    * manifest rollup, map-side-combined. Integer end to end — the DuckDB
    * twin rebuilds the identical copies, shard keys and checksums from
    * the hex60 family. */
  def q150MixtureShards(spark: SparkSession, dir: String,
      nShards: Int = 16): DataFrame =
    mixtureShardRollup(Tables.load(spark, dir, "documents"), nShards)

  /** q150's engine over any (source, doc_id, text) frame. Every step
    * before the nShards-row rollup is a STATELESS row-local projection
    * (copies, fan-out, shard hash), which is what makes the identical
    * code the streaming ingest twin (q183): a streaming frame flows
    * through unchanged and the only state is the shard rollup. */
  private[graft] def mixtureShardRollup(docs: DataFrame,
      nShards: Int): DataFrame = {
    import graft.functions.TextFunctions.sketch60
    val d = docs.select(
      col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("bigint").as("n_toks"),
      (lit(500000L) + pmod(sketch60(col("source")), lit(3000000L)))
        .as("factor_ppm"))
    val copies = d.select(col("source"), col("doc_id"), col("n_toks"),
        (expr("factor_ppm DIV 1000000") +
          when(pmod(sketch60(concat_ws(":", col("source"), col("doc_id"))),
            lit(1000000L)) < col("factor_ppm") % 1000000, 1L)
            .otherwise(0L)).as("copies"))
      .filter(col("copies") >= 1)
    val rows = copies
      .select(col("source"), col("doc_id"), col("n_toks"),
        explode(sequence(lit(1L), col("copies"))).as("copy"))
    val h = sketch60(concat_ws(":",
      col("source"), col("doc_id"), col("copy")))
    rows
      .select(pmod(h, lit(nShards.toLong)).as("shard"), col("n_toks"),
        pmod(h, lit(1073741824L)).as("idh"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"), sum(col("n_toks")).as("n_tokens"),
        sum(col("idh")).as("id_checksum"))
  }

  def q148EpochMix(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.sketch60
    val d = Tables.load(spark, dir, "documents").select(
      col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("bigint").as("n_toks"),
      (lit(500000L) + pmod(sketch60(col("source")), lit(3000000L)))
        .as("factor_ppm"))
    d.select(col("source"), col("factor_ppm"), col("n_toks"),
        (expr("factor_ppm DIV 1000000") +
          when(pmod(sketch60(concat_ws(":", col("source"), col("doc_id"))),
            lit(1000000L)) < col("factor_ppm") % 1000000, 1L)
            .otherwise(0L)).as("copies"))
      .groupBy(col("source"))
      .agg(max(col("factor_ppm")).as("factor_ppm"),
        count(lit(1)).as("n_docs"),
        sum(col("copies")).as("n_copies"),
        sum(col("copies") * col("n_toks")).as("n_tokens_out"))
  }

  /** q179: DEDUP-DISCOUNTED EPOCH MIXTURE — the D4-style recipe (dedup
    * then diversify) that closes the gap between the dedup family and the
    * mixture family: a document's epoch weight is its source's mixture
    * factor (q148's 0.5–3.5-epoch base) DIVIDED by its near-dup CLUSTER
    * SIZE, so a 40-way-duplicated boilerplate cluster contributes ~one
    * document's worth of tokens to the epoch no matter how many copies
    * crawled in — instead of drop-all-but-one (q73's survivors) or
    * keep-everything (q148). Cluster structure is the SHARED staged
    * component labels ([[graft.operators.Dedup.stagedComponentLabels]],
    * same table q67/q73/q88 read; singletons absent from the label table
    * count 1). Copies stay integer end to end: eff_ppm = factor_ppm DIV
    * csize, whole part + hash-rounded fractional part exactly as q148, so
    * the per-source expectation hits factor/csize exactly and the DuckDB
    * twin (recursive-CTE components + identical integer arithmetic) is
    * bit-exact.
    *
    * Scale shape: two equi-joins on doc_id/root (co-partitionable; the
    * label table is |clustered docs| ≤ corpus), zero new shuffles beyond
    * them, and the |sources|-row rollup is map-side combined. The cluster
    * sizes never require document text — the discount plan touches only
    * (doc_id, source, n_toks) plus the 2-column label table. */
  def q179DedupDiscountMix(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.sketch60
    val labels = graft.operators.Dedup.stagedComponentLabels(spark, dir)
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("csize"))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("bigint").as("n_toks"))
      .join(labels.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left")
      .join(sizes, Seq("label"), "left")
      .withColumn("csize", coalesce(col("csize"), lit(1L)))
      .withColumn("factor_ppm",
        lit(500000L) + pmod(sketch60(col("source")), lit(3000000L)))
      .withColumn("eff_ppm", expr("factor_ppm DIV csize"))
      .withColumn("copies",
        expr("eff_ppm DIV 1000000") +
          when(pmod(sketch60(concat_ws(":", lit("d4"), col("doc_id"))),
            lit(1000000L)) < col("eff_ppm") % 1000000, 1L).otherwise(0L))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("csize") > 1, 1L).otherwise(0L)).as("n_clustered"),
        max(col("csize")).as("max_csize"),
        sum(col("copies")).as("n_copies"),
        sum(col("copies") * col("n_toks")).as("n_tokens_out"))
  }

  /** q159: SEQUENCE-PACKING BOUNDARY AUDIT — the concat-and-chunk step a
    * pre-training loader runs between tokenization (q155) and shard
    * emission (q110/q150): each source's documents are concatenated in
    * doc_id order and cut into fixed `seqLen`-token training sequences.
    * Emits, per source, the exact packing accounting: sequences produced,
    * pad tokens in the final chunk, documents split across a chunk
    * boundary, and total boundary crossings (= attention-mask
    * discontinuities a boundary-aware loader must handle). Distinct from
    * q81 ([[graft.operators.TextAnalysis.qPackChunks]]), which bins
    * chunks WITHIN one document; here the stream concatenates ACROSS
    * documents and the deliverable is the cross-document boundary audit.
    *
    * One window pass (running token offset per source, explicit ROWS
    * frame) + one rollup — the crossing count for a doc spanning
    * [s, s+nt) is `(s+nt-1) DIV L − s DIV L`, pure integer arithmetic, so
    * the DuckDB twin is bit-exact. At 100 TB the window partitions by
    * shard stream (here: source), which is exactly the axis a real packer
    * is sequential over — no global order, no skew beyond the largest
    * single stream, and the rollup is map-side combined. */
  def q159SeqPacking(spark: SparkSession, dir: String,
      seqLen: Long = 256L): DataFrame = {
    val d = Tables.load(spark, dir, "documents").select(
      col("source"), col("doc_id"),
      size(split(col("text"), " ")).cast("bigint").as("nt"))
    val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    d.withColumn("s", sum(col("nt")).over(w) - col("nt"))
      .withColumn("k",
        expr(s"(s + nt - 1) DIV $seqLen - s DIV $seqLen"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("nt")).as("n_tokens"),
        expr(s"(sum(nt) + ${seqLen - 1}) DIV $seqLen").as("n_sequences"),
        expr(s"(sum(nt) + ${seqLen - 1}) DIV $seqLen * $seqLen - sum(nt)")
          .as("pad_tokens"),
        sum(when(col("k") > 0, 1L).otherwise(0L)).as("n_split_docs"),
        sum(col("k")).as("n_crossings"))
  }

  /** q160: MERGEABLE HLL REGISTER SKETCH — a from-scratch HyperLogLog
    * built on the portable md5-hex hash family so the sketch STATE (not
    * just a tolerance boolean like q60) is oracle-checkable: bucket = the
    * hash's first byte mod 64, rho = leading-zero count of the next 52
    * bits + 1, computed with string arithmetic (leading-'0' run length +
    * a 16-way nibble case) that is engine-deterministic — no libm, no
    * log2. Registers are `max(rho)` per (group, bucket): Spark's max agg
    * makes them map-side-combinable partials, which is the whole point of
    * HLL at 100 TB — a 64-byte sketch per group crosses the exchange
    * instead of the key set, and sketches from different days/shards
    * merge by element-wise max. The raw estimate αm²/Σ2^−r is emitted via
    * an integer scaled sum S = Σ2^(53−r) (exact in BIGINT) with one
    * double division at the end, 4dp both sides. Exact distincts ride
    * along per bucket (buckets partition the key space, so per-bucket
    * COUNT DISTINCT sums to the true total) for an error-audit view.
    * `hll_est` applies the standard small-range correction (linear
    * counting m·ln(m/V) when the raw estimate ≤ 2.5m and V = empty
    * buckets > 0 — Flajolet et al. §4); `hll_raw` keeps the uncorrected
    * value so the correction itself is auditable. */
  def q160HllSketch(spark: SparkSession, dir: String): DataFrame =
    hllBucketRho(
        Tables.events(spark, dir).select(col("event_type"), col("user_id")),
        col("user_id"))
      .groupBy(col("event_type"), col("b"))
      .agg(max(col("rho")).as("r"),
        countDistinct(col("user_id")).as("nd"))
      .groupBy(col("event_type"))
      .agg(sum(col("nd")).as("n_distinct"),
        count(lit(1)).as("n_buckets"),
        sum(col("r")).as("register_sum"),
        sum(col("r") * (col("b") + 1)).as("register_ck"),
        expr("sum(shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT)))")
          .as("sp"))
      .transform(hllEstimates(_, keep = Seq("n_distinct")))

  /** q175: WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis–Spirakis
    * A-ES) — the member the sampling family still lacked: q65 samples
    * uniformly by hash, q70/q102 per stratum, q127 proportional WITH the
    * systematic grid; A-ES draws k items with inclusion odds
    * proportional to weight and WITHOUT replacement, via one pure
    * projection: key_i = −ln(u_i)/w_i with u_i a hash-derived uniform,
    * and the sample = global bottom-k keys. That reduction to top-k is
    * the whole scale story — no sequential pass, no coordination, a
    * TakeOrderedAndProject over a scan, mergeable across partitions and
    * days (the reason A-ES is THE distributed weighted sampler). The
    * hash-derived u keeps the engine's reproducible-sampling contract
    * (q65): the sample is a pure function of the data, stable across
    * retries and repartitioning. Keys are 4dp-rounded with a doc_id
    * tie-break on BOTH sides so the cut is engine-deterministic (q31's
    * ranking contract). */
  def q175WeightedSample(spark: SparkSession, dir: String,
      k: Int = 20): DataFrame =
    aesKeys(Tables.load(spark, dir, "documents"))
      .orderBy(col("key_micro").asc, col("doc_id").asc)
      .limit(k)

  /** The A-ES key projection (doc_id, key_micro) over any (doc_id,
    * n_chars) frame — factored so the q218 STREAMING twin computes its
    * standing bottom-k state through the IDENTICAL expression tree as
    * batch q175's TakeOrderedAndProject (bit-identity is the twin's
    * contract; the key is a pure hash function of the row, so replays
    * carry identical pairs). */
  private[graft] def aesKeys(docs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.sketch60
    docs
      .select(col("doc_id"), col("n_chars").cast("double").as("w"),
        ((pmod(sketch60(concat(lit("aes:"), col("doc_id"))),
          lit(1152921504606846976L)).cast("double") + 1.0) /
          1.152921504606846976e18).as("u"))
      .select(col("doc_id"),
        round(-log(col("u")) / col("w") * 1000000.0, 4).as("key_micro"))
  }

  /** q167: THE PRE-TRAINING DATA PATH, END TO END, AS ONE PLAN — quality
    * gate (q152's Gopher rules) → epoch-weighted mixture (q148's
    * hash-rounded integer copies) → copy materialization + copy-aware
    * shard assignment (q150) → concat-and-chunk sequence packing with
    * boundary accounting (q159), composed as a single declarative chain
    * so Catalyst sees the whole pipeline: the quality predicate prunes
    * before the mixture arithmetic runs, nothing materializes between
    * stages, and the only exchanges are the per-shard packing window and
    * the |shards|-row rollup. Per shard: rows packed, tokens, sequences,
    * pad tokens, and boundary-split accounting — the numbers a training
    * job's data loader reconciles against. Every stage is integer/hash
    * exact, so the DuckDB oracle replays the full chain (the composed
    * CTEs of q152+q148+q150+q159) and the gate pins the whole path, not
    * just its stages. */
  def q167PretrainE2e(spark: SparkSession, dir: String,
      seqLen: Long = 256L, nShards: Int = 8): DataFrame = {
    import graft.functions.TextFunctions.sketch60
    val kept = graft.operators.Curation
      .gopherPass(Tables.load(spark, dir, "documents"))
      .filter(col("pass"))
      .select(col("source"), col("doc_id"), col("n_toks"))
    val copies = kept
      .withColumn("factor_ppm",
        lit(500000L) + pmod(sketch60(col("source")), lit(3000000L)))
      .withColumn("copies",
        expr("factor_ppm DIV 1000000") +
          when(pmod(sketch60(concat_ws(":", col("source"), col("doc_id"))),
            lit(1000000L)) < col("factor_ppm") % 1000000, 1L)
            .otherwise(0L))
      .filter(col("copies") >= 1)
    val rows = copies
      .select(col("source"), col("doc_id"), col("n_toks"),
        explode(sequence(lit(1L), col("copies"))).as("copy"))
      .withColumn("shard", pmod(sketch60(concat_ws(":",
        col("source"), col("doc_id"), col("copy"))), lit(nShards.toLong)))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("doc_id"), col("copy"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows
      .withColumn("s", sum(col("n_toks")).over(w) - col("n_toks"))
      .withColumn("k",
        expr(s"(s + n_toks - 1) DIV $seqLen - s DIV $seqLen"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("n_toks")).as("n_tokens"),
        expr(s"(sum(n_toks) + ${seqLen - 1}) DIV $seqLen")
          .as("n_sequences"),
        expr(s"(sum(n_toks) + ${seqLen - 1}) DIV $seqLen * $seqLen " +
          "- sum(n_toks)").as("pad_tokens"),
        sum(when(col("k") > 0, 1L).otherwise(0L)).as("n_split_rows"),
        sum(col("k")).as("n_crossings"))
  }

  /** q168: BLOOM-FILTER FALSE-POSITIVE CALIBRATION — the sketch-family
    * member q95's runtime filter uses opaquely, rebuilt on the portable
    * md5-hex hash family so its STATE and its ERROR are both
    * oracle-checkable (the q116/q135 calibration pattern): k=3 bit
    * positions per key from disjoint md5 nibble triples, the filter = the
    * distinct positions of the inserted half (even doc_ids), probes = the
    * disjoint odd half. A probe is a false positive iff all k of its
    * positions are set — measured EXACTLY by a positions⋈filter join, and
    * checked against the saturation bound fpr ≤ 2·(bits_set/m)^k in pure
    * cross-multiplied integers (no doubles anywhere). Everything is
    * partial-aggregated sets of ≤ m = 4096 bit positions: the filter that
    * crosses the exchange is the bitmap, never the key set — the property
    * that makes Bloom the join-pruning workhorse at 100 TB. */
  def q168BloomCalibration(spark: SparkSession, dir: String): DataFrame = {
    val m = 4096
    val k = 3
    def positions(df: DataFrame): DataFrame =
      df.withColumn("h", md5(concat_ws(":", lit("bf"), col("doc_id"))))
        .select(col("doc_id"), explode(array((0 until k).map(j =>
          expr(s"CAST(conv(substr(h, ${1 + 3 * j}, 3), 16, 10) AS BIGINT) " +
            s"% $m")): _*)).as("pos"))
    val docs = Tables.load(spark, dir, "documents").select(col("doc_id"))
    val filterBits = positions(docs.filter(col("doc_id") % 2 === 0))
      .select(col("pos")).distinct()
    val probeHits = positions(docs.filter(col("doc_id") % 2 === 1))
      .join(filterBits, Seq("pos"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("nhit"))
      .filter(col("nhit") === k)
    docs.filter(col("doc_id") % 2 === 0).agg(count(lit(1)).as("n_inserted"))
      .crossJoin(filterBits.agg(count(lit(1)).as("n_bits_set")))
      .crossJoin(docs.filter(col("doc_id") % 2 === 1)
        .agg(count(lit(1)).as("n_probes")))
      .crossJoin(probeHits.agg(
        coalesce(count(lit(1)), lit(0L)).as("n_false_positives")))
      // DECIMAL cross-multiply, not BIGINT: with a near-full filter
      // (n_bits_set → m = 4096) the right side is 2·n_probes·6.9e10,
      // which wraps silently past n_probes ≈ 7e7 under Spark's non-ANSI
      // BIGINT while DuckDB raises — at 100 TB the engine and oracle
      // would diverge instead of failing loudly. Staged widths keep every
      // product ≤ DECIMAL(38): 18+6+6+6 = 36 left, 2+18+6+6+6 = 38 right
      // (n_bits_set ≤ m by construction, so DECIMAL(6,0) holds it).
      .withColumn("within_bound",
        col("n_false_positives").cast("decimal(18,0)") *
          lit(m).cast("decimal(6,0)") * lit(m).cast("decimal(6,0)") *
          lit(m).cast("decimal(6,0)") <=
          lit(2).cast("decimal(2,0)") *
            col("n_probes").cast("decimal(18,0)") *
            col("n_bits_set").cast("decimal(6,0)") *
            col("n_bits_set").cast("decimal(6,0)") *
            col("n_bits_set").cast("decimal(6,0)"))
  }

  /** q203: MERGEABLE QUANTILE SKETCH — percentile monitoring at ingest,
    * the sketch-family member q57's exact quantiles and q112's sortless
    * ranks could not give a stream or a shard-merge: the
    * [[graft.functions.QuantileSketch]] deterministic hash-leveled
    * cascade (KLL with the compaction coin replaced by a portable-hash
    * bit — see its scaladoc for why that makes the state a pure function
    * of the multiset), aggregated per event type over the integer cent
    * scaling of `value`. The gate pins the sketch REGISTERS (level,
    * survivor count, value·count checksum, scaled total), the integer
    * estimator read off them (est_p50/est_p90), and the EXACT p50/p90
    * alongside as the error audit (q160's n_distinct discipline) — the
    * DuckDB oracle replays the whole cascade: same hex60 hash, same
    * min-level pick, same cross-multiplied ceil ranks. Scale: what
    * crosses the exchange is a ≤cap-entry buffer per group, never the
    * value census; the exact columns are the gate's audit luxury, not
    * part of the sketch path (drop them and the plan is one
    * partial-aggregated pass). */
  def q203QuantileSketch(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).select(col("event_type"),
      expr("CAST(round(value * 100) AS BIGINT)").as("v"))
    val sketch = ev.groupBy(col("event_type"))
      .agg(graft.functions.QuantileSketch.sketch(col("v")).as("sk"))
      .select(col("event_type"), col("sk.level").as("level"),
        col("sk.n_sample").as("n_sample"),
        col("sk.sample_vck").as("sample_vck"),
        col("sk.n_scaled").as("n_scaled"),
        col("sk.est_p50").as("est_p50"), col("sk.est_p90").as("est_p90"))
    val census = ev.groupBy(col("event_type"), col("v"))
      .agg(count(lit(1)).as("c"))
    val run = Window.partitionBy(col("event_type")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("event_type"))
    val exact = census
      .select(col("event_type"), col("v"),
        sum(col("c")).over(run).as("cum"),
        sum(col("c")).over(all).as("n"))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n_total"),
        min(when(col("cum") * 100 >= col("n") * 50, col("v")))
          .as("exact_p50"),
        min(when(col("cum") * 100 >= col("n") * 90, col("v")))
          .as("exact_p90"))
    exact.join(sketch, Seq("event_type"))
      .select(col("event_type"), col("n_total"), col("level"),
        col("n_sample"), col("sample_vck"), col("n_scaled"),
        col("est_p50"), col("est_p90"), col("exact_p50"), col("exact_p90"))
  }

  /** (b, rho) columns for the portable md5-hex HLL family: bucket = first
    * hash byte mod 64, rho = leading-zero count of the next 52 bits + 1,
    * all string/integer arithmetic (engine-deterministic — no libm, no
    * log2). Shared by q160 and the streaming register monitor (q163). */
  private[graft] def hllBucketRho(df: DataFrame,
      key: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("h", md5(key.cast("string")))
      .withColumn("b",
        expr("CAST(conv(substr(h, 1, 2), 16, 10) AS BIGINT) % 64"))
      .withColumn("t", expr("substr(h, 3, 13)"))
      .withColumn("z", lit(13) - length(ltrim(col("t"), "0")))
      .withColumn("c", expr("substr(t, z + 1, 1)"))
      .withColumn("rho", (lit(4) * col("z") +
        when(col("c") === "1", 3).when(col("c").isin("2", "3"), 2)
          .when(col("c").isin("4", "5", "6", "7"), 1).otherwise(0) +
        lit(1)).cast("bigint"))
      .drop("h", "t", "z", "c")

  /** Final HLL estimate columns over a per-group rollup carrying
    * (n_buckets, register_sum, register_ck, sp = Σ2^(53−r)): raw αm²/Σ2^−r
    * via the integer-scaled sum, plus the linear-counting small-range
    * correction. `keep` forwards extra audit columns (q160's exact
    * distinct). */
  private[graft] def hllEstimates(agg: DataFrame,
      keep: Seq[String] = Seq.empty): DataFrame = {
    val m = 64
    val head = Seq(col("event_type")) ++ keep.map(col) ++ Seq(
      col("n_buckets"), col("register_sum"), col("register_ck"))
    agg.select(head :+
        (lit(0.7213) / (lit(1.0) + lit(1.079) / m.toDouble) *
          (m.toDouble * m) * 9007199254740992.0 /
          (col("sp") + (lit(m.toLong) - col("n_buckets")) *
            lit(9007199254740992L)).cast("double")).as("raw"): _*)
      .select(head :+
        round(col("raw"), 4).as("hll_raw") :+
        round(when(col("raw") <= 2.5 * m && col("n_buckets") < m,
          lit(m.toDouble) * log(lit(m.toDouble) /
            (lit(m.toLong) - col("n_buckets")).cast("double")))
          .otherwise(col("raw")), 4).as("hll_est"): _*)
  }

  /** q184: TWO-SAMPLE KOLMOGOROV–SMIRNOV DRIFT — the continuous-
    * distribution complement of q124's token TV-distance: per event type,
    * has the VALUE distribution shifted between the early and late halves
    * of the window? (Feature drift between a training snapshot and live
    * traffic is the canonical "retrain or don't" monitor.) The KS statistic
    * D = max_v |F_early(v) − F_late(v)| is made INTEGER-EXACT by cross-
    * multiplication: at each distinct value, |c1·n2 − c2·n1| over the
    * merged ECDF support, so both engines compare integers and the 4dp/ppm
    * wobble of a double ECDF never exists. Emitted as ppm
    * (⌊10⁶·max|c1·n2 − c2·n1| / (n1·n2)⌋, DECIMAL(38,0) products — BIGINT
    * would wrap once per-type counts pass ~3·10⁹) plus a drift flag at
    * D > 0.05 (50 000 ppm — the α-threshold is a consumer constant, kept
    * integer instead of the libm critical-value formula).
    *
    * Scale shape: one shuffle to the (type, value) census (map-side
    * combined — ties collapse BEFORE the window), then a per-type window
    * over DISTINCT values for the running ECDFs. The per-type sort is the
    * honest cost of an exact KS; at 100 TB the drop-in approximation is
    * binning values first (the same plan over `floor(value·k)`), which
    * tightens the partition to k rows per type with bounded D error. */
  def q184KsDrift(spark: SparkSession, dir: String,
      cut: String = "2024-01-16 00:00:00"): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("value"),
        (col("ts") < lit(cut).cast("timestamp")).as("early"))
    val census = ev.groupBy(col("event_type"), col("value"))
      .agg(sum(when(col("early"), 1L).otherwise(0L)).as("a1"),
        sum(when(!col("early"), 1L).otherwise(0L)).as("a2"))
    val run = Window.partitionBy(col("event_type")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("event_type"))
    val ecdf = census.select(col("event_type"),
        sum(col("a1")).over(run).as("c1"),
        sum(col("a2")).over(run).as("c2"))
      .select(col("event_type"), col("c1"), col("c2"),
        max(col("c1")).over(all).as("n1"),
        max(col("c2")).over(all).as("n2"))
    ecdf
      .groupBy(col("event_type"))
      .agg(max(col("n1")).as("n_early"), max(col("n2")).as("n_late"),
        max(abs(col("c1").cast("decimal(38,0)") * col("n2") -
          col("c2").cast("decimal(38,0)") * col("n1"))).as("num"))
      .filter(col("n_early") > 0 && col("n_late") > 0)
      .select(col("event_type"), col("n_early"), col("n_late"),
        expr("CAST((num * 1000000) DIV (CAST(n_early AS DECIMAL(38,0)) * " +
          "CAST(n_late AS DECIMAL(38,0))) AS BIGINT)").as("ks_ppm"))
      .withColumn("is_drift", col("ks_ppm") > 50000L)
  }

  /** The portable 52-bit hash the KMV family sketches over: the first 13
    * hex digits of md5(key-as-string) read as a BIGINT in [0, 2⁵²) —
    * q160's md5 discipline, exact in BIGINT on both engines (DuckDB:
    * `CAST(concat('0x', substr(md5(x), 1, 13)) AS BIGINT)`). 52 bits keep
    * every downstream product/sum inside BIGINT (k·2⁵² « 2⁶³) and the
    * normalized estimate exact in a double's 53-bit mantissa. */
  private[graft] def hash52(key: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    conv(substring(md5(key.cast("string")), 1, 13), 16, 10).cast("long")

  private val Kmv = 64
  private val Pow52 = 4503599627370496L // 2^52

  /** θ of one sketch: the whole hash space when part-full (a part-full
    * sketch IS its set — it saw everything), else its kth-smallest hash. */
  private[graft] def thetaOwn(sk: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column =
    when(size(sk) < k, lit(Pow52)).otherwise(element_at(sk, -1))

  /** Theta-sketch estimate: candidates-below-θ over the normalized θ —
    * ONE double division, 4dp, the exact expression every oracle
    * replays. Shared by q209/q217 so an estimator change cannot diverge
    * the family. */
  private[graft] def kmvEst(n: org.apache.spark.sql.Column,
      theta: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    round(n.cast("double") * Pow52.toDouble / theta.cast("double"), 4)

  /** (y, k_filled, kth, state_ck, kmv_est) off a (y, sk) sketch frame —
    * shared by batch q208 and the q212 streaming twin: bit-identity is
    * the twin's whole contract, so both MUST read the state through the
    * same expressions. */
  private[graft] def kmvStateColumns(df: DataFrame): DataFrame =
    df.select(col("y").cast("long").as("y"),
        size(col("sk")).cast("long").as("k_filled"),
        element_at(col("sk"), -1).as("kth"),
        expr("aggregate(sk, CAST(0 AS BIGINT), (a, x) -> a + x)")
          .as("state_ck"))
      .withColumn("kmv_est",
        round(when(col("k_filled") < Kmv, col("k_filled").cast("double"))
          .otherwise(lit((Kmv - 1).toDouble) * Pow52.toDouble /
            col("kth").cast("double")), 4))

  /** Input-count typed aggregator: rides next to another typed aggregate
    * in the SAME groupByKey job (q210/q215 use it to carry the corpus
    * total through the summary pass instead of paying a separate scan). */
  private[graft] class CountAggregator[T]
      extends org.apache.spark.sql.expressions.Aggregator[T, Long, Long]
      with Serializable {
    def zero: Long = 0L
    def reduce(b: Long, a: T): Long = b + 1
    def merge(a: Long, b: Long): Long = a + b
    def finish(r: Long): Long = r
    def bufferEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    def outputEncoder: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
  }

  /** The exact-recount half of the two-pass heavy-hitter algorithm:
    * broadcast the ≤c candidates, recount them exactly over one corpus
    * scan, keep the ones clearing n/(c+1). Shared verbatim by batch q210
    * and the q215 streaming twin (one oracle, one contract). */
  private[graft] def heavyHitterRecount(spark: SparkSession, dir: String,
      cands: Seq[String], nTotal: Long, c: Int): DataFrame = {
    import spark.implicits._
    val words = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    words.join(broadcast(spark.createDataset(cands).toDF("w")), Seq("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * (c + 1) > nTotal)
      .select(col("w"), col("cnt"), lit(nTotal).as("n_total"))
      .withColumn("ppm", expr("cnt * 1000000 DIV n_total"))
  }

  /** Per-year KMV sketches over the active-customer population: (year,
    * sorted ≤k array of smallest hashes) via the mergeable typed
    * aggregator. Shared by q208/q209; q212 re-derives the same state on a
    * stream. */
  private[graft] def kmvYearSketches(spark: SparkSession, dir: String)
      : DataFrame = {
    import spark.implicits._
    Tables.load(spark, dir, "orders")
      .select(year(col("o_orderdate")).as("y"),
        hash52(col("o_custkey")).as("h"))
      .as[(Int, Long)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new graft.functions.KmvAggregator(Kmv).toColumn.name("sk"))
      .toDF("y", "sk")
  }

  /** q208: K-MINIMUM-VALUES DISTINCT SKETCH with oracle-checked STATE —
    * the set-operation-capable member of the sketch family (HLL q160
    * merges only by union; KMV sketches additionally intersect, q209).
    * Domain: customers active per order year — the cross-period audience
    * question every warehouse asks. The sketch is the k=64 smallest
    * 52-bit hashes of the year's distinct custkeys, built by
    * [[graft.functions.KmvAggregator]] (bounded sorted-array state,
    * map-side combinable, duplicate- and order-blind). The gate pins the
    * REGISTER STATE (fill count, kth hash, hash-sum checksum — all
    * integer-exact) plus the estimator n̂ = (k−1)·2⁵²/kth (one double
    * division, 4dp both sides; a part-full sketch IS the distinct set,
    * so n̂ = fill), with the exact per-year distinct count riding along
    * as the error audit (q160's discipline). DuckDB replays the state
    * with a row_number window over the same md5-derived hashes.
    * Scale: the exchange carries 64×8 bytes per year, never the custkey
    * set; the exact column is the gate's audit luxury, not the sketch
    * path. */
  def q208KmvSketch(spark: SparkSession, dir: String): DataFrame = {
    val sk = kmvStateColumns(kmvYearSketches(spark, dir))
    val exact = Tables.load(spark, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("y"))
      .agg(countDistinct(col("o_custkey")).as("n_exact"))
    exact.join(sk, Seq("y"))
      .select(col("y"), col("n_exact"), col("k_filled"), col("kth"),
        col("state_ck"), col("kmv_est"))
  }

  /** q209: THETA-SKETCH SET OPERATIONS — the reason KMV earns its place
    * next to HLL: intersection, union, and difference (A\B) CARDINALITY
    * ESTIMATES between every pair of yearly audience sketches, without
    * touching the key sets — the full set algebra HLL registers cannot
    * answer. The theta method: θ = min of the two sketches' kth hashes
    * (a part-full sketch's θ is the whole hash space 2⁵² — it saw
    * everything), candidates = sketch entries strictly below θ, and
    * n̂∩ = |S_A ∩ S_B ∩ {h<θ}|·2⁵²/θ, n̂∪ likewise over the deduped
    * union. Everything up to the final division is integer-exact
    * (array_intersect/array_union + a `filter` lambda over sorted
    * ≤64-long arrays — codegen-friendly, no shuffle: 7 sketch rows
    * self-joined). Exact |A∩B| and |A∪B| ride along as the error audit
    * (a distinct-pair self-join — the O(n²-ish) pass the sketch path
    * exists to avoid at 100 TB). */
  def q209KmvSetops(spark: SparkSession, dir: String): DataFrame = {
    val sk = kmvYearSketches(spark, dir)
      .withColumn("theta_own", thetaOwn(col("sk"), Kmv))
    val pairs = sk.as("a")
      .join(sk.as("b"), col("a.y") < col("b.y"))
      .select(col("a.y").as("ya"), col("b.y").as("yb"),
        least(col("a.theta_own"), col("b.theta_own")).as("theta"),
        col("a.sk").as("ska"), col("b.sk").as("skb"))
      .select(col("ya"), col("yb"), col("theta"),
        expr("CAST(size(filter(array_intersect(ska, skb), " +
          "x -> x < theta)) AS BIGINT)").as("n_inter"),
        expr("CAST(size(filter(array_union(ska, skb), " +
          "x -> x < theta)) AS BIGINT)").as("n_union"),
        expr("CAST(size(filter(array_except(ska, skb), " +
          "x -> x < theta)) AS BIGINT)").as("n_diff"))
      .withColumn("inter_est", kmvEst(col("n_inter"), col("theta")))
      .withColumn("union_est", kmvEst(col("n_union"), col("theta")))
      .withColumn("diff_est", kmvEst(col("n_diff"), col("theta")))
    val d = Tables.load(spark, dir, "orders")
      .select(year(col("o_orderdate")).as("y"), col("o_custkey").as("c"))
      .distinct()
    val nd = d.groupBy(col("y")).agg(count(lit(1)).as("nd"))
    val exactInter = d.as("a").join(d.as("b"),
        col("a.c") === col("b.c") && col("a.y") < col("b.y"))
      .groupBy(col("a.y").as("ya"), col("b.y").as("yb"))
      .agg(count(lit(1)).as("exact_inter"))
    pairs.join(exactInter, Seq("ya", "yb"), "left")
      .join(nd.select(col("y").as("ya"), col("nd").as("nda")), Seq("ya"))
      .join(nd.select(col("y").as("yb"), col("nd").as("ndb")), Seq("yb"))
      .withColumn("exact_inter", coalesce(col("exact_inter"), lit(0L)))
      .select(col("ya").cast("long").as("ya"),
        col("yb").cast("long").as("yb"), col("theta"), col("n_inter"),
        col("n_union"), col("n_diff"), col("inter_est"), col("union_est"),
        col("diff_est"), col("exact_inter"),
        (col("nda") + col("ndb") - col("exact_inter")).as("exact_union"),
        (col("nda") - col("exact_inter")).as("exact_diff"))
  }

  /** q210: DISTRIBUTED HEAVY HITTERS — the two-pass Misra–Gries
    * algorithm, the frequent-items member the sketch family still
    * lacked (HLL counts distincts, KLL ranks, CMS point-queries; MG
    * answers "which items are frequent" with bounded state). Pass 1
    * folds the token stream into ONE ≤c-entry summary via
    * [[graft.functions.FrequentItemsAggregator]] (map-side combinable;
    * the constant group key is deliberate — partials are merged once,
    * and nothing in the plan is vocabulary-sized). Theory guarantees
    * the summary's keys ⊇ every token with count > n/(c+1) for ANY
    * merge order (the SketchSetOpsSpec scalacheck pin), so pass 2 exactly
    * recounts just those ≤c candidates with a broadcast semi-join and
    * keeps the ones that clear the threshold — making the OUTPUT a
    * deterministic pure function of the corpus even though the summary
    * itself is merge-order-dependent. DuckDB's oracle is the plain
    * census GROUP BY + HAVING the sketch path avoids shuffling at
    * 100 TB. Share emitted as integer ppm (cross-multiplied, no double
    * wobble). Tokenization = q26's split-on-space contract, empties
    * dropped on both sides. */
  def q210HeavyHitters(spark: SparkSession, dir: String,
      c: Int = 64): DataFrame = {
    import spark.implicits._
    val words = Tables.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    // pass 1: the corpus total rides the summary job as a second typed
    // aggregate — genuinely TWO corpus scans end to end, not three
    val pass1 = words.as[String]
      .groupByKey(_ => 0)
      .agg(new graft.functions.FrequentItemsAggregator(c).toColumn
          .name("mg"),
        new CountAggregator[String].toColumn.name("n"))
      .collect().headOption
    // bounded by construction: ≤c candidate tokens cross the driver
    val cands = pass1.map(_._2.keys.toSeq).getOrElse(Seq.empty)
    val nTotal = pass1.map(_._3).getOrElse(0L)
    heavyHitterRecount(spark, dir, cands, nTotal, c)
  }

  /** q211: INCREMENTAL MATERIALIZED-VIEW REFRESH with mergeable distinct
    * state — the maintenance pass that makes a 100 TB daily rollup
    * affordable: the stored MV carries, per event type, the additive
    * aggregates (count, exact cent sum) AND q160's 64 HLL registers as
    * its distinct-user state, so a refresh folds ONLY the delta batch
    * into the view — counts add, sums add, registers merge by
    * elementwise max — and never rescans the base corpus. COUNT DISTINCT
    * is precisely the aggregate naive IVM cannot maintain (it is not
    * self-maintainable: deletes/re-arrivals need the key set); storing
    * the sketch registers AS the view state is the standard resolution,
    * and because register-max is order/batching-blind, the refreshed
    * view is BIT-IDENTICAL to a from-scratch rebuild — which is exactly
    * what the gate pins: the engine runs base-materialize (a real
    * parquet round-trip) → delta partials → merge, the DuckDB oracle
    * computes the full recompute, and every register/checksum/estimate
    * must agree. Value sums ride as integer cents (double addition
    * reorders; BIGINT doesn't). Delta = event_id ≡ 0 (mod 16), ~6% — the
    * arriving batch. */
  def q211MvRefresh(spark: SparkSession, dir: String,
      deltaMod: Int = 16): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val isDelta = col("event_id") % deltaMod === 0
    def counts(df: DataFrame): DataFrame =
      df.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
    def regs(df: DataFrame): DataFrame =
      hllBucketRho(df.select(col("event_type"), col("user_id")),
          col("user_id"))
        .groupBy(col("event_type"), col("b")).agg(max(col("rho")).as("r"))
    val tmp = java.nio.file.Files.createTempDirectory("graft_q211")
    // explicit file: scheme — the staging dir is DRIVER-LOCAL (java.nio),
    // so on a deployment whose default Hadoop FS is not the local disk a
    // schemeless path would write the parquet to the default FS while the
    // finally-block deletes the local dir: a silent leak and a broken
    // roundtrip. Addressing reads and writes through file:// pins both
    // sides of the roundtrip to the filesystem the cleanup sweeps.
    val tmpUri = s"file://$tmp"
    try {
      // materialize the base view: a genuine parquet round-trip, so the
      // refresh below provably starts from stored state, not lineage
      counts(ev.filter(!isDelta)).write
        .parquet(s"$tmpUri/mv_counts")
      regs(ev.filter(!isDelta)).write.parquet(s"$tmpUri/mv_regs")
      val delta = ev.filter(isDelta)
      val mergedCounts = spark.read.parquet(s"$tmpUri/mv_counts")
        .unionByName(counts(delta))
        .groupBy(col("event_type"))
        .agg(sum(col("n_events")).as("n_events"),
          sum(col("sum_cents")).as("sum_cents"))
      val mergedRegs = spark.read.parquet(s"$tmpUri/mv_regs")
        .unionByName(regs(delta))
        .groupBy(col("event_type"), col("b")).agg(max(col("r")).as("r"))
      val est = hllEstimates(mergedRegs.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(col("r")).as("register_sum"),
          sum(col("r") * (col("b") + 1)).as("register_ck"),
          expr("sum(shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT)))")
            .as("sp")))
      // ≤ |event_type|×64 rows by here — materialize (localCheckpoint,
      // the repo's roundtrip discipline) before the tmp dir vanishes
      mergedCounts.join(est, Seq("event_type"))
        .select(col("event_type"), col("n_events"), col("sum_cents"),
          col("n_buckets"), col("register_sum"), col("register_ck"),
          col("hll_raw"), col("hll_est"))
        .localCheckpoint()
    } finally graft.util.Fs.deleteRecursively(tmp.toString)
  }

  /** q213: SLIDING-WINDOW DISTINCT via HLL REGISTER ALGEBRA — the rolling
    * 28-day-MAU shape: distinct users per event type over every trailing
    * 3-day window, computed WITHOUT ever holding a window's key set. The
    * trick is that q160's registers are max-combinable across any
    * dimension, including TIME: one bounded register table per (type,
    * day, bucket) — |types|·|days|·64 rows regardless of corpus size —
    * and a window's registers are the elementwise max of its days',
    * materialized here as a range join of the register table against the
    * day grid (both bounded by the calendar, so the fan-out is windowDays
    * × the register table, never the event stream; the daily registers
    * are built once and EVERY window reads them — the standing monitoring
    * layout, where the naive per-window COUNT DISTINCT rescans the raw
    * stream |window| times and shuffles user_id sets). Registers, their
    * checksums, and the estimate are pinned by the replaying oracle;
    * exact sliding distincts ride along as the error audit (q160's
    * discipline — the exact column is the luxury the register path
    * exists to avoid at 100 TB). */
  def q213SlidingHll(spark: SparkSession, dir: String,
      windowDays: Int = 3): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("d"))
    val regs = hllBucketRho(ev, col("user_id"))
      .groupBy(col("event_type"), col("d"), col("b"))
      .agg(max(col("rho")).as("r"))
    val days = ev.select(col("d")).distinct().select(col("d").as("wd"))
    val inWindow = col("d") <= col("wd") &&
      col("d") >= date_sub(col("wd"), windowDays - 1)
    val agg = regs.join(broadcast(days), inWindow)
      .groupBy(col("event_type"), col("wd"), col("b"))
      .agg(max(col("r")).as("r"))
      .groupBy(col("event_type"), col("wd"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("r")).as("register_sum"),
        sum(col("r") * (col("b") + 1)).as("register_ck"),
        expr("sum(shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT)))")
          .as("sp"))
      .withColumn("day", date_format(col("wd"), "yyyy-MM-dd"))
    val exact = ev.distinct()
      .join(broadcast(days), inWindow)
      .groupBy(col("event_type"),
        date_format(col("wd"), "yyyy-MM-dd").as("day"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    hllEstimates(agg, keep = Seq("day"))
      .join(exact, Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("n_exact"),
        col("n_buckets"), col("register_sum"), col("register_ck"),
        col("hll_raw"), col("hll_est"))
  }

  /** q217: AUDIENCE CHURN VIA THETA-SKETCH DIFFERENCES — the rolling
    * retention question (who stayed / churned / arrived between
    * consecutive days, per event type) answered entirely from per-day
    * KMV sketches: one bounded (type, day) sketch table — |types|·|days|
    * rows of ≤k hashes, built in one pass, the standing layout — and
    * every day-over-day transition reads three theta-sketch set
    * operations off it (retained = A∩B, churned = A\B, new = B\A, all
    * strictly below θ = min of the two sketches' own θs; a part-full
    * sketch IS its set, so small days degrade to exact — the sf0.001
    * fixture pins that regime, sf0.01 pins the estimator regime).
    * Exact counts ride along from the distinct-pair self-join the
    * sketch path avoids at 100 TB (q160's audit discipline). k=16 keeps
    * the per-day sketch genuinely smaller than the ~53-user fixture
    * audiences so the gate exercises estimation, not exactness. */
  def q217ChurnKmv(spark: SparkSession, dir: String, k: Int = 16): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), to_date(col("ts")).as("d"),
        col("user_id"))
    val sk = ev.select(col("event_type"), col("d").cast("string").as("ds"),
        hash52(col("user_id")).as("h"))
      .as[(String, String, Long)]
      .groupByKey(r => (r._1, r._2)).mapValues(_._3)
      .agg(new graft.functions.KmvAggregator(k).toColumn.name("sk"))
      .map { case ((t, d), s) => (t, d, s) }
      .toDF("event_type", "ds", "sk")
      .withColumn("d", col("ds").cast("date"))
      .withColumn("theta_own", thetaOwn(col("sk"), k))
    val pairs = sk.as("a")
      .join(sk.as("b"), col("a.event_type") === col("b.event_type") &&
        col("b.d") === date_add(col("a.d"), 1))
      .select(col("a.event_type").as("event_type"),
        date_format(col("a.d"), "yyyy-MM-dd").as("day"),
        least(col("a.theta_own"), col("b.theta_own")).as("theta"),
        col("a.sk").as("ska"), col("b.sk").as("skb"))
      .select(col("event_type"), col("day"), col("theta"),
        expr("CAST(size(filter(array_intersect(ska, skb), " +
          "x -> x < theta)) AS BIGINT)").as("n_ret"),
        expr("CAST(size(filter(array_except(ska, skb), " +
          "x -> x < theta)) AS BIGINT)").as("n_churn"),
        expr("CAST(size(filter(array_except(skb, ska), " +
          "x -> x < theta)) AS BIGINT)").as("n_new"))
      .withColumn("ret_est", kmvEst(col("n_ret"), col("theta")))
      .withColumn("churn_est", kmvEst(col("n_churn"), col("theta")))
      .withColumn("new_est", kmvEst(col("n_new"), col("theta")))
    val du = ev.distinct()
    val nd = du.groupBy(col("event_type"), col("d"))
      .agg(count(lit(1)).as("nd"))
    val ret = du.as("a").join(du.as("b"),
        col("a.event_type") === col("b.event_type") &&
        col("a.user_id") === col("b.user_id") &&
        col("b.d") === date_add(col("a.d"), 1))
      .groupBy(col("a.event_type").as("event_type"),
        date_format(col("a.d"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("exact_ret"))
    pairs
      .join(ret, Seq("event_type", "day"), "left")
      .withColumn("exact_ret", coalesce(col("exact_ret"), lit(0L)))
      .join(nd.select(col("event_type"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("nd").as("nda")), Seq("event_type", "day"))
      .join(nd.select(col("event_type"),
        date_format(date_sub(col("d"), 1), "yyyy-MM-dd").as("day"),
        col("nd").as("ndb")), Seq("event_type", "day"))
      .select(col("event_type"), col("day"), col("theta"),
        col("n_ret"), col("n_churn"), col("n_new"),
        col("ret_est"), col("churn_est"), col("new_est"),
        col("exact_ret"),
        (col("nda") - col("exact_ret")).as("exact_churn"),
        (col("ndb") - col("exact_ret")).as("exact_new"))
  }

  /** q214: GROUPED HEAVY HITTERS — q210's two-pass Misra–Gries run PER
    * SOURCE (the per-domain hot-token profile boilerplate detection
    * feeds on): one typed aggregation keyed by source carries a ≤c-entry
    * summary per group across the exchange — state O(|sources|·c), never
    * vocabulary-sized — then the ≤|sources|·c candidates are exactly
    * recounted through one broadcast semi-join on (source, word) and
    * thresholded per source. Same determinism argument as q210 (the MG
    * guarantee is per-stream, so it holds per group under any
    * partitioning); same census oracle, now grouped. */
  def q214GroupHeavyHitters(spark: SparkSession, dir: String,
      c: Int = 32): DataFrame = {
    import spark.implicits._
    val words = Tables.load(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val summaries = words.as[(String, String)]
      .groupByKey(_._1).mapValues(_._2)
      .agg(new graft.functions.FrequentItemsAggregator(c).toColumn
        .name("mg"))
      .toDF("source", "mg")
      .select(col("source"), explode(map_keys(col("mg"))).as("w"))
    // bounded by construction: ≤ |sources|·c candidate rows
    val totals = words.groupBy(col("source")).agg(count(lit(1)).as("n"))
    words.join(broadcast(summaries), Seq("source", "w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("cnt"))
      .join(broadcast(totals), Seq("source"))
      .filter(col("cnt") * (c + 1) > col("n"))
      .select(col("source"), col("w"), col("cnt"), col("n").as("n_total"),
        expr("cnt * 1000000 DIV n").as("ppm"))
  }
}
