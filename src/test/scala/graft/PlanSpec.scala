package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the plans that make the 100 TB story
  * true must not silently degrade (SURVEY §4). */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def formatted(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)

  test("filters are pushed into the parquet scan (q06, q08)") {
    val p6 = formatted("q06_filter_gt")
    assert(p6.contains("PushedFilters") && p6.contains("GreaterThan(l_quantity,45.0)"),
      s"q06 lost filter pushdown:\n$p6")
    val p8 = formatted("q08_band_revenue")
    assert(p8.contains("GreaterThanOrEqual(l_discount,0.05)") &&
      p8.contains("LessThan(l_quantity,24.0)"),
      s"q08 lost band pushdown:\n$p8")
  }

  test("column pruning reaches the scan (q04 reads exactly 2 columns)") {
    val p = formatted("q04_project")
    assert(p.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"q04 reads more than the projection:\n$p")
  }

  test("dimension join broadcasts (q11)") {
    val p = formatted("q11_broadcast_join")
    assert(p.contains("BroadcastHashJoin"), s"q11 not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q11 fell back to sort-merge:\n$p")
  }

  test("bag-difference remainder plans as an anti join, not the exceptAll expansion (q85)") {
    // the extension rule must rewrite Except(isAll=true) on the uid-tagged
    // sides into a LEFT ANTI join on the 8-byte uid; Catalyst's own
    // RewriteExceptAll would instead expand into a sum-of-multiplicities
    // Aggregate + Generate(ReplicateRows) shuffling whole rows
    val df = SparkEntry.queries("q85_bagdiff_remainder")(spark, sf)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("LeftAnti"), s"q85 rewrite did not fire:\n$opt")
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("Generate"),
      s"q85 fell back to the replicate-rows expansion:\n$p")
    // and the conf flip is restored after plan construction
    assert(spark.conf.getOption(
      graft.plans.BagDifferenceToAntiJoin.ConfKey).isEmpty)
  }

  test("boilerplate scrub: one corpus materialization, digest-only shuffles (q86)") {
    // the corpus is shingled once into the checkpoint boundary (no
    // FileScan survives into the final plan — both consumers read the
    // materialized digest RDD); after it exactly 3 hash exchanges remain:
    // df agg on the digest, per-doc rollup, per-source rollup
    val p = SparkEntry.queries("q86_boilerplate_scrub")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!p.contains("FileScan"),
      s"q86 re-scans the corpus outside the checkpoint boundary:\n$p")
    assert("Scan ExistingRDD".r.findAllIn(p).size === 2,
      s"q86 consumers do not both read the materialized digest table:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx === 3,
      s"q86 shuffles $hashEx times (want 3: df agg + per-doc rollup + " +
        s"per-source rollup):\n$p")
  }

  test("curation verdict: one corpus scan per signal family, text never joins (q88)") {
    // per-row family = the ONE corpus FileScan; the boilerplate family
    // arrives as the q86 checkpoint RDD, the dedup family as a scan of
    // the staged component-labels parquet — the final plan must not
    // re-scan the corpus for either, and the assembly joins carry
    // doc_id + counters only
    val p = SparkEntry.queries("q88_curation_verdict")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    val corpusScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("documents.parquet")).size
    assert(corpusScans === 1,
      s"q88 scans the corpus $corpusScans times (want 1):\n$p")
    val labelScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("graft_cc")).size
    assert(labelScans === 1,
      s"q88 must read the staged component labels (want 1 scan):\n$p")
    assert("Scan ExistingRDD".r.findAllIn(p).size >= 2,
      s"q88 must read the boilerplate digest table as an RDD:\n$p")
    // text is read by the per-row scan but must die at the projection:
    // no exchange may carry the text column
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty && !exchanges.exists(_.contains("text#")),
      s"q88 shuffles document text through the assembly:\n$p")
  }

  test("funnel is join-free: one event-log scan, one user_id exchange (q75)") {
    // the funnel's three stage timestamps are chained window minima over
    // one user_id partitioning — no join ladder, no repeated log scans
    // SimpleMode: single executed-plan representation (formatted mode
    // prints each node twice — tree + details; sparkPlan predates
    // EnsureRequirements so it shows no exchanges at all)
    val p75 = SparkEntry.queries("q75_funnel")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(!p75.contains("Join"), s"q75 grew a join back:\n$p75")
    val scans = "FileScan".r.findAllIn(p75).size
    assert(scans === 1, s"q75 scans the event log $scans times:\n$p75")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p75).size
    assert(hashEx === 1, s"q75 shuffles $hashEx times (want 1):\n$p75")
  }

  test("split assignment is one scan, one partial-agg exchange, no text shuffle (q91)") {
    val p = SparkEntry.queries("q91_split_assign")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert("FileScan".r.findAllIn(p).size === 1, s"q91 re-scans the corpus:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx === 1, s"q91 shuffles $hashEx times (want 1: final agg):\n$p")
    assert(p.contains("partial_count") || p.contains("partial"),
      s"q91 aggregation lost its map-side partials:\n$p")
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(!exchanges.exists(_.contains("text#")),
      s"q91 shuffles document text:\n$p")
  }

  test("CDC merge resolves with one key exchange; output never shuffles bodies (q92)") {
    val p = SparkEntry.queries("q92_corpus_merge")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    // the union's slices prune to (doc_id, text) scans; resolution is the
    // single row_number window exchange on the key — no join anywhere
    assert(!p.contains("Join"), s"q92 grew a join:\n$p")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx === 1, s"q92 shuffles $hashEx times (want 1: the window):\n$p")
  }

  test("curriculum phases never sort or window the corpus (q93)") {
    val p = SparkEntry.queries("q93_curriculum_phases")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert("FileScan".r.findAllIn(p).size === 1, s"q93 re-scans the corpus:\n$p")
    // the single-partition exchange (the global-window scale-killer this
    // query exists to avoid) may only appear DOWNSTREAM of the histogram
    // aggregation: everything under the first hash exchange is the
    // full-size corpus side, and it must contain no window, no sort, no
    // SinglePartition exchange
    val lines = p.linesIterator.toSeq
    val firstHashEx = lines.indexWhere(_.contains("Exchange hashpartitioning"))
    assert(firstHashEx >= 0, s"q93 lost its histogram aggregation exchange:\n$p")
    val corpusSide = lines.drop(firstHashEx)
    assert(!corpusSide.exists(_.contains("Window")),
      s"q93 windows the corpus side:\n$p")
    assert(!corpusSide.exists(_.contains("SinglePartition")),
      s"q93 collapses the corpus to one partition:\n$p")
    // text dies at the token-count projection — no exchange carries it
    assert(!lines.exists(l => l.contains("Exchange") && l.contains("text#")),
      s"q93 shuffles document text:\n$p")
  }

  test("canonical pick reads persisted labels, windows per cluster only (q94)") {
    val p = SparkEntry.queries("q94_canonical_pick")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    val labelScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("graft_cc")).size
    assert(labelScans === 1,
      s"q94 must read the staged component labels once:\n$p")
    val corpusScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("documents.parquet")).size
    assert(corpusScans === 1, s"q94 scans the corpus $corpusScans times:\n$p")
    // the argmax window partitions by cluster_id — a global (empty
    // partition-by) window would serialize the corpus into one task
    assert(!p.contains("SinglePartition"),
      s"q94 collapsed to a single partition:\n$p")
    assert(!p.linesIterator.exists(l => l.contains("Exchange") && l.contains("text#")),
      s"q94 shuffles document text:\n$p")
  }

  test("runtime bloom filter prunes the fact side before its shuffle (q95)") {
    import graft.operators.Relational
    Relational.withRuntimeFilterConf(spark) {
      val qe = Relational.runtimeFilteredJoin(spark, sf).queryExecution
      val opt = qe.optimizedPlan.toString
      assert(opt.contains("bloom_filter_agg") && opt.contains("might_contain"),
        s"InjectRuntimeFilter did not fire:\n$opt")
      val p = qe.explainString(org.apache.spark.sql.execution.SimpleMode)
      // the might_contain predicate must sit on the PROBE (lineitem) side,
      // i.e. in a Filter over the probe join key
      assert(p.linesIterator.exists(l =>
        l.contains("might_contain") && l.contains("l_orderkey")),
        s"bloom filter not applied to the fact side:\n$p")
    }
    // and the conf window restores session state
    assert(spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold") != "0")
  }

  test("cohort per-user frame broadcasts back onto the event log (q76)") {
    val p76 = formatted("q76_cohort_retention")
    assert(p76.contains("BroadcastHashJoin"), s"q76 first-seen join not broadcast:\n$p76")
    assert(!p76.contains("SortMergeJoin"), s"q76 fell back to sort-merge:\n$p76")
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort (q15)") {
    val p = formatted("q15_topk")
    assert(p.contains("TakeOrderedAndProject"), s"q15 lost top-k plan:\n$p")
    assert(!p.contains("\n(4) Sort"), s"q15 materializes a full sort:\n$p")
  }

  test("bucketed join reads co-located buckets with zero Exchange") {
    // write the bucketed tables, then force sort-merge (broadcast would
    // hide the bucketing) and check the join plan has no shuffle
    graft.plans.Bucketing.writeBucketed(
      graft.sources.Tables.load(spark, sf, "lineitem")
        .select(org.apache.spark.sql.functions.col("l_orderkey"),
          org.apache.spark.sql.functions.col("l_extendedprice")),
      "graft_li_bucketed_t", "l_orderkey")
    graft.plans.Bucketing.writeBucketed(
      graft.sources.Tables.load(spark, sf, "orders")
        .select(org.apache.spark.sql.functions.col("o_orderkey"),
          org.apache.spark.sql.functions.col("o_orderstatus")),
      "graft_ord_bucketed_t", "o_orderkey")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = graft.plans.Bucketing.bucketedJoin(spark,
        "graft_li_bucketed_t", "l_orderkey", "graft_ord_bucketed_t", "o_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
      assert(!p.contains("Exchange"), s"bucketed join still shuffles:\n$p")
      // bucket-sorted data: no per-side Sort either
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("stageBucketedOnce fingerprint hit re-registers the table with an intact bucket spec") {
    import org.apache.spark.sql.functions.col
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice"))
    val fp = graft.plans.Bucketing.inputFingerprint(spark, s"$sf/lineitem.parquet")
    graft.plans.Bucketing.stageBucketedOnce(li, "graft_li_staged_t", "l_orderkey", fp)
    val written = spark.table("graft_li_staged_t").count()
    // a fresh JVM forgets the in-memory catalog but keeps the warehouse:
    // dropping the catalog entry and re-staging with the same fingerprint
    // must take the registration-only path (no rewrite) AND the registered
    // table must still carry the bucket spec — a bucketed self-join plans
    // with zero Exchange
    spark.sql("DROP TABLE IF EXISTS graft_li_staged_t")
    graft.plans.Bucketing.stageBucketedOnce(li, "graft_li_staged_t", "l_orderkey", fp)
    val t = spark.table("graft_li_staged_t")
    assert(t.count() === written)
    graft.plans.Bucketing.stageBucketedOnce(
      graft.sources.Tables.load(spark, sf, "orders")
        .select(col("o_orderkey"), col("o_orderstatus")),
      "graft_ord_staged_t", "o_orderkey",
      graft.plans.Bucketing.inputFingerprint(spark, s"$sf/orders.parquet"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = graft.plans.Bucketing.bucketedJoin(spark,
        "graft_li_staged_t", "l_orderkey", "graft_ord_staged_t", "o_orderkey")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected sort-merge join:\n$p")
      assert(!p.contains("Exchange"), s"re-registered bucket spec lost:\n$p")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
    // a CHANGED fingerprint must rebuild, not reuse
    graft.plans.Bucketing.stageBucketedOnce(li, "graft_li_staged_t", "l_orderkey",
      fp + "changed")
    assert(spark.table("graft_li_staged_t").count() === written)
  }

  test("partitioned write enables partition pruning at the scan") {
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    graft.plans.Bucketing.writePartitioned(
      graft.sources.Tables.load(spark, sf, "orders"), out, "o_orderstatus")
    val filtered = spark.read.parquet(out).filter(col("o_orderstatus") === "F")
    val p = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters") && p.contains("o_orderstatus"),
      s"no partition pruning:\n$p")
    // pruned read returns exactly the F slice
    val expected = graft.sources.Tables.load(spark, sf, "orders")
      .filter(col("o_orderstatus") === "F").count()
    assert(filtered.count() === expected)
  }

  test("IVF probe is partition-pruned and fits no quantizer at query time") {
    import org.apache.spark.sql.functions.col
    val root = graft.operators.Similarity.ivfIndexFor(spark, sf, nCells = 8)
    val q = graft.sources.Tables.load(spark, sf, "embeddings")
      .filter(col("vec_id") === 0L)
      .select(org.apache.spark.sql.functions.transform(
        col("embedding"), _.cast("double")))
      .head.getSeq[Double](0).toArray
    val probe = graft.operators.Similarity.ivfProbe(spark, root, q,
      k = 10, nProbe = 2, excludeId = 0L)
    val p = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters: [cell") && p.contains(" IN ("),
      s"IVF probe not partition-pruned:\n$p")
    // probe reads only the index — no KMeans stage, no embeddings scan
    assert(!p.contains("embeddings.parquet"), s"probe re-reads the corpus:\n$p")
    assert(probe.count() === 10)
  }

  test("seeded IVF probe (q83) is partition-pruned and reads only the index") {
    val probe = graft.operators.Similarity.q83AnnIvfSeeded(spark, sf)
    val p = probe.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters: [cell") && p.contains(" IN ("),
      s"seeded IVF probe not partition-pruned:\n$p")
    // the returned probe plan touches the index only (the query-vector
    // point read and the index build are eager, outside this plan)
    assert(!p.contains("embeddings.parquet"), s"probe re-reads the corpus:\n$p")
  }

  test("q122 TPC-H Q5: date slice pushed to the orders scan, dims broadcast, no cartesian") {
    val p = formatted("q122_tpch_q5")
    // the orders scan must carry the date band as a pushed filter — at
    // 100 TB this is the difference between reading 1/6 of orders and all
    val scan = p.linesIterator.filter(_.contains("o_orderdate")).mkString("\n")
    assert(p.contains("PushedFilters") &&
      (scan.contains("GreaterThanOrEqual(o_orderdate") ||
        p.contains("GreaterThanOrEqual(o_orderdate")),
      s"q122 lost the orders date pushdown:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"q122 must broadcast the region/nation (and size-estimated supplier) dims:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"q122 must stay equi-join end to end:\n$p")
  }

  test("q126 TPC-H Q18: partial agg before the shuffle; AQE broadcasts the survivor side") {
    val q = SparkEntry.queries("q126_tpch_q18")(spark, sf)
    q.collect() // let AQE finalize the runtime plan
    val p = q.queryExecution.executedPlan.toString
    // the only fact-sized work is the map-side-combined quantity sum
    assert(p.contains("partial_sum"),
      s"q126 must partial-aggregate lineitem before its shuffle:\n$p")
    // the >200 survivor aggregate is tiny at runtime — AQE must broadcast
    // it into the join-back instead of shuffling orders/customer
    assert(p.contains("BroadcastHashJoin"),
      s"q126 join-back should run broadcast under AQE:\n$p")
    assert(!p.contains("CartesianProduct"), s"q126 must stay equi-join:\n$p")
  }

  test("q188 Q21 shape: LeftSemi + LeftAnti correlation, broadcast names, top-k cut") {
    val q = SparkEntry.queries("q188_late_supplier")(spark, sf)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"),
      s"q188's EXISTS must plan as a semi join:\n$p")
    assert(p.contains("LeftAnti"),
      s"q188's NOT EXISTS must plan as an anti join:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"q188's top-20 must be a TakeOrderedAndProject, not a global sort:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"q188 must stay equi-join (suppkey inequality rides the condition):\n$p")
  }

  test("q189 fact scan carries a dynamicpruning partition filter") {
    val q = SparkEntry.queries("q189_dynamic_pruning")(spark, sf)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"q189's fact scan must be DPP-filtered, not post-join filtered:\n$p")
    assert(p.contains("PartitionFilters"),
      s"q189 must prune at the partition level:\n$p")
  }

  test("q190 fact side carries a runtime bloom filter before its shuffle") {
    val q = SparkEntry.queries("q190_runtime_filter")(spark, sf)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("bloomfilter") ||
      p.contains("might_contain"),
      s"q190's fact scan must be runtime-bloom-filtered:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"q190 runs the 100 TB shuffle-join stance (broadcast disabled):\n$p")
  }

  test("q192 AQE splits the skewed join partition (isSkew sub-reads)") {
    val q = SparkEntry.queries("q192_skew_join")(spark, sf)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("skew=true") && p.contains("AQEShuffleRead skewed"),
      s"q192's hot partition must be split by AQE skew handling:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"q192 must exercise the shuffle-join path:\n$p")
  }

  test("q195 Q17 shape: correlated scalar subquery decorrelates to one aggregate + join") {
    val q = SparkEntry.queries("q195_avg_yearly")(spark, sf)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    // the per-part avg must be ONE grouped aggregate (map-side combined),
    // joined back — never a per-outer-row re-execution of the subquery
    assert(p.contains("partial_avg"),
      s"q195's per-part avg must be a decorrelated grouped aggregate:\n$p")
    assert(!p.contains("Subquery"),
      s"q195 must not re-execute the scalar subquery per row:\n$p")
    // the avg side and the filtered part dim are both dimension-sized —
    // they must broadcast into the fact scan, and the quantity inequality
    // rides the join condition (no cartesian fallback)
    assert(p.contains("BroadcastHashJoin"),
      s"q195's dim/avg sides must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"q195 must stay equi-join with the inequality as a condition:\n$p")
  }

  test("q195 decorrelation survives without broadcast (the 100x fallback plan)") {
    // at 100x the per-partkey avg is part-cardinality-sized and exceeds
    // any broadcast threshold — the plan that must survive is the
    // decorrelated aggregate feeding a shuffle join (AQE's SMJ/shuffled-
    // hash), never a per-row subquery re-execution or a cartesian
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val q = SparkEntry.queries("q195_avg_yearly")(spark, sf)
      val rows = q.collect()
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("partial_avg"),
        s"q195 fallback lost the decorrelated grouped aggregate:\n$p")
      assert(!p.contains("Subquery"),
        s"q195 fallback re-executes the scalar subquery per row:\n$p")
      assert(!p.contains("BroadcastHashJoin"),
        s"threshold=-1 but a broadcast join survived (conf not applied):\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"q195 fallback must be a shuffled equi-join:\n$p")
      assert(!p.contains("CartesianProduct"),
        s"q195 fallback went cartesian:\n$p")
      assert(rows.length === 1 && !rows.head.isNullAt(0))
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("winnowed fingerprints plan has zero Exchange (q36 is shuffle-free)") {
    // winnowing is row-local: the WinnowedFingerprints Expression makes the
    // plan scan → project → generate with no window sort and no distinct
    val p = formatted("q36_fingerprint_rolling")
    assert(!p.contains("Exchange"), s"q36 reintroduced a shuffle:\n$p")
    assert(!p.contains("Window"), s"q36 reintroduced a window sort:\n$p")
  }

  test("LSH candidate self-joins read the materialized bucket table only (q24, q37)") {
    // capBuckets is the single materialization boundary: the final candidate
    // plan must join two scans of the checkpointed bucket frame — if the
    // shingle/projection pipeline (Generate) or the source parquet scan
    // reappears here, the upstream is being recomputed per join side again
    for (q <- Seq("q24_dedup_minhash", "q37_embedding_neardup")) {
      val p = formatted(q)
      assert(!p.contains("Generate"), s"$q re-runs its explode pipeline:\n$p")
      assert(!p.contains("Scan parquet"), s"$q re-scans source parquet:\n$p")
    }
  }

  test("group top-k refines a histogram cutoff, never sorts the corpus per group (q97)") {
    val p = SparkEntry.queries("q97_group_topk")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    // the refinement signature: the naive per-group window plan has no join
    // at all — the cutoff frame must broadcast back onto the corpus, and
    // the histogram rollup must keep its map-side partials
    assert(p.contains("BroadcastHashJoin"), s"q97 cutoffs not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q97 cutoff join fell to sort-merge:\n$p")
    assert(p.contains("partial_count"), s"q97 histogram lost its partials:\n$p")
    assert(!p.contains("SinglePartition"), s"q97 collapsed to one partition:\n$p")
    // the final rank window's exchange carries survivors only — the filter
    // against the broadcast cutoff must sit BELOW it, and no exchange may
    // carry document text
    assert(!p.linesIterator.exists(l => l.contains("Exchange") && l.contains("text#")),
      s"q97 shuffles document text:\n$p")
  }

  test("stratified fixed-k sample refines a bucket cutoff, never sorts a stratum (q102)") {
    val q = SparkEntry.queries("q102_stratified_k")(spark, sf)
    val p = q.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    // same refinement signature as q97: cutoffs broadcast back onto the
    // corpus, histogram keeps map-side partials, nothing collapses to one
    // partition, and no exchange carries document text
    assert(p.contains("BroadcastHashJoin"), s"q102 cutoffs not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q102 cutoff join fell to sort-merge:\n$p")
    assert(p.contains("partial_count"), s"q102 histogram lost its partials:\n$p")
    assert(!p.contains("SinglePartition"), s"q102 collapsed to one partition:\n$p")
    assert(!p.linesIterator.exists(l => l.contains("Exchange") && l.contains("text#")),
      s"q102 shuffles document text:\n$p")
    // exactness vs the naive full-stratum rank (the oracle's plan)
    val got = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    import org.apache.spark.sql.functions.{col => c}
    val naive = graft.sources.Tables.load(spark, sf, "documents")
      .select(c("doc_id"), c("lang"),
        graft.functions.TextFunctions.sketch60(
          c("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2).toSeq.flatMap {
        case (lang: String, rows: Array[(Long, String, Long)]) =>
          rows.sortBy(r => (r._3, r._1)).take(5).zipWithIndex.map {
            case ((id, _, h), i) => (lang, (i + 1).toLong, id, h)
          }
      }.toSet
    assert(got === naive)
  }

  test("column profile runs in one table scan; FK audit anti-joins and alarms (q104/q105)") {
    val prof = SparkEntry.queries("q104_column_profile")(spark, sf)
    val pp = prof.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    // the multi-distinct aggregate must plan as ONE scan (Expand rewrite),
    // not one scan per profiled column
    val scans = pp.linesIterator.count(l =>
      l.contains("FileScan") && l.contains("lineitem.parquet"))
    assert(scans === 1, s"q104 scans lineitem $scans times:\n$pp")
    assert(pp.contains("Expand"), s"q104 lost the multi-distinct single-pass plan:\n$pp")
    assert(prof.count() === 3)

    val audit = SparkEntry.queries("q105_fk_audit")(spark, sf)
    val ap = audit.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    assert(ap.contains("LeftAnti"), s"q105 must plan anti-joins:\n$ap")
    // the damaged dimension MUST produce orphans — a zero row would mean
    // the audit is vacuous and would pass against any join logic
    val rows = audit.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size === 2)
    assert(rows.values.forall(_ > 0L), s"q105 audit found no orphans: $rows")
  }

  test("soft near-dedup reads persisted labels, windows per cluster only (q98)") {
    val p = SparkEntry.queries("q98_soft_neardup")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    val labelScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("graft_cc")).size
    assert(labelScans === 1,
      s"q98 must read the staged component labels once:\n$p")
    val corpusScans = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("documents.parquet")).size
    assert(corpusScans === 1, s"q98 scans the corpus $corpusScans times:\n$p")
    assert(!p.contains("SinglePartition"),
      s"q98 collapsed to a single partition:\n$p")
    assert(!p.linesIterator.exists(l => l.contains("Exchange") && l.contains("text#")),
      s"q98 shuffles document text:\n$p")
  }

  test("bigram PMI: one full-size exchange, vocab-side broadcasts, top-k plan (q99)") {
    val p = SparkEntry.queries("q99_bigram_pmi")(spark, sf)
      .queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    // the unigram margins must join back as broadcasts (vocab-bounded) and
    // the ranked head must plan as TakeOrderedAndProject, not a global sort
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"q99 unigram margins not broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"), s"q99 lost its top-k plan:\n$p")
    assert(!p.contains("SortMergeJoin"), s"q99 fell back to sort-merge:\n$p")
    assert(!p.linesIterator.exists(l => l.contains("Exchange") && l.contains("text#")),
      s"q99 shuffles document text:\n$p")
  }

  test("scan-side queries stay inside whole-stage codegen (q20 haversine)") {
    val p = formatted("q20_haversine")
    // FormattedMode marks codegen'd operators with "[codegen id : N]"
    assert(p.contains("[codegen id :"), s"q20 outside codegen:\n$p")
    assert(!p.toLowerCase.contains("batchevalpython") && !p.contains("ScalaUDF"),
      s"q20 contains a UDF barrier:\n$p")
  }

  test("q204 merge rewrites ONLY touched partitions; merge scan is partition-pruned") {
    import org.apache.spark.sql.functions._
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_q204_spec").toString
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    docs.write.partitionBy("lang").parquet(s"$scratch/wh")
    def listing(lang: String): Map[String, (Long, Long)] =
      Option(new java.io.File(s"$scratch/wh/lang=$lang").listFiles())
        .toSeq.flatten.filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> ((f.lastModified(), f.length()))).toMap
    val untouchedBefore = Seq("fr", "es", "zh").map(l => l -> listing(l))
    val touchedBefore = Seq("en", "de").map(l => l -> listing(l)).toMap
    // the pruned merge scan: the full-outer join's target side must carry
    // a static partition filter on lang, not a full-table scan (probed
    // BEFORE the localCheckpoint truncates the lineage)
    var mergePlan = ""
    val out = graft.operators.Relational
      .mergeCdcInto(spark, s"$scratch/wh", docs,
        planProbe = df => mergePlan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    assert(mergePlan.contains("PartitionFilters") &&
      mergePlan.contains("lang"),
      s"q204 merge scan not partition-pruned:\n$mergePlan")
    val rows = out.collect().map(r => r.getString(0) -> r).toMap
    // untouched partitions: byte-for-byte same files (name, mtime, size)
    untouchedBefore.foreach { case (l, before) =>
      assert(listing(l) === before, s"untouched partition lang=$l was rewritten")
      assert(!rows(l).getBoolean(1), s"lang=$l flagged touched")
      assert(rows(l).getLong(2) === rows(l).getLong(6),
        s"untouched lang=$l changed cardinality: ${rows(l)}")
    }
    // touched partitions: physically rewritten, clause algebra holds
    Seq("en", "de").foreach { l =>
      assert(listing(l) !== touchedBefore(l),
        s"touched partition lang=$l kept its old files")
      val r = rows(l)
      assert(r.getBoolean(1))
      assert(r.getLong(2) - r.getLong(4) + r.getLong(5) === r.getLong(6),
        s"n_before - n_deleted + n_inserted != n_after: $r")
      assert(r.getLong(3) > 0 && r.getLong(4) > 0 && r.getLong(5) > 0,
        s"a clause fired zero times at spec scale: $r")
    }
    graft.util.Fs.deleteRecursively(scratch)
  }

  test("q219 time travel: post-merge as-of-0 equals the frozen pre-merge state") {
    import org.apache.spark.sql.functions._
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_q219_spec").toString
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    docs.write.partitionBy("lang").parquet(s"file://$scratch/wh")
    val vw = new graft.operators.Relational.VersionedWarehouse(
      spark, s"$scratch/wh")
    vw.commit(0, vw.listDataFiles())
    val cols = Seq("doc_id", "source", "n_chars", "lang").map(col)
    def snap(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.select(cols: _*).collect().map(_.toSeq).toSeq
        .sortBy(_.head.asInstanceOf[Long])
    val preMerge = snap(docs)
    val v0Listing = vw.listDataFiles().map { rel =>
      val f = new java.io.File(s"$scratch/wh", rel)
      rel -> ((f.lastModified(), f.length()))
    }.toMap
    val touched = vw.commitMerge(1, graft.operators.Relational
      .cdcSource(docs))
    assert(touched === Seq("de", "en"))
    // v0's files are PHYSICALLY untouched (name, mtime, size) — history
    // retention is what distinguishes the versioned commit from q204's
    // destructive dynamic-partition overwrite
    v0Listing.foreach { case (rel, sig) =>
      val f = new java.io.File(s"$scratch/wh", rel)
      assert(f.isFile && (f.lastModified(), f.length()) === sig,
        s"v0 file $rel was rewritten or removed by the merge commit")
    }
    // the time-travel contract: an as-of-0 read AFTER the merge equals
    // the pre-merge table bit for bit
    assert(snap(vw.asOf(0)) === preMerge)
    // and as-of-1 reflects the merge: a deleted key is gone, an
    // inserted key is present, an updated key carries +1000 chars
    val v1 = vw.asOf(1).select(cols: _*).collect()
      .map(r => r.getLong(0) -> r).toMap
    val delKey = preMerge.collectFirst { case s
      if s.head.asInstanceOf[Long] % 15 == 0 &&
        Seq("en", "de").contains(s(3)) => s.head.asInstanceOf[Long] }.get
    assert(!v1.contains(delKey), s"deleted doc $delKey survives in v1")
    val updSeq = preMerge.find { s =>
      val id = s.head.asInstanceOf[Long]
      id % 5 == 0 && id % 15 != 0 && Seq("en", "de").contains(s(3))
    }.get
    val updKey = updSeq.head.asInstanceOf[Long]
    assert(v1(updKey).getLong(2) ===
      updSeq(2).asInstanceOf[Number].longValue() + 1000L)
    val insKey = preMerge.collectFirst { case s
      if s.head.asInstanceOf[Long] % 17 == 0 &&
        Seq("en", "de").contains(s(3)) =>
        s.head.asInstanceOf[Long] + 1000000L }.get
    assert(v1.contains(insKey) && v1(insKey).getLong(2) === 42L)
    graft.util.Fs.deleteRecursively(scratch)
  }

  test("q221 expire: retained version intact, shared files survive, unreferenced files go") {
    import org.apache.spark.sql.functions._
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_q221_spec").toString
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    docs.repartition(5, col("lang"))
      .write.partitionBy("lang").parquet(s"file://$scratch/wh")
    val vw = new graft.operators.Relational.VersionedWarehouse(
      spark, s"$scratch/wh")
    vw.commit(0, vw.listDataFiles())
    val touched = vw.commitMerge(1, graft.operators.Relational
      .cdcSource(docs))
    val v0Files = vw.manifest(0)
    val v1Files = vw.manifest(1).toSet
    val preExpire = vw.asOf(1).select(col("doc_id"), col("n_chars"),
        col("lang")).collect().map(_.toSeq).toSeq
      .sortBy(_.head.asInstanceOf[Long])
    val removed = vw.expire(retain = Seq(1))
    // exactly the v0 files v1 no longer references were removed —
    // reference-counted survival, not wholesale version deletion
    assert(removed.toSet === v0Files.filterNot(v1Files).toSet)
    assert(removed.nonEmpty &&
      removed.forall(f => touched.exists(l => f.startsWith(s"lang=$l/"))))
    removed.foreach(f =>
      assert(!new java.io.File(s"$scratch/wh", f).exists(), s"$f survives"))
    // shared (untouched-partition) files survive on disk and in v1
    v1Files.foreach(f =>
      assert(new java.io.File(s"$scratch/wh", f).isFile, s"$f deleted"))
    // the retained version reads bit-identically after the vacuum
    val postExpire = vw.asOf(1).select(col("doc_id"), col("n_chars"),
        col("lang")).collect().map(_.toSeq).toSeq
      .sortBy(_.head.asInstanceOf[Long])
    assert(postExpire === preExpire)
    // the expired version is gone as a VERSION, not just as files
    assert(!vw.hasVersion(0) && vw.hasVersion(1))
    intercept[IllegalArgumentException](vw.asOf(0))
    graft.util.Fs.deleteRecursively(scratch)
  }

  test("mergeApply drops a fully-emptied partition's directory (COW delete)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // dynamic partition overwrite writes NOTHING for a partition whose
    // merged output is empty — without the explicit directory drop, the
    // old files would resurrect every deleted row on the next read
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_merge_empty").toString
    Seq((1L, "a", "s", 10L, "xx"), (2L, "b", "s", 20L, "xx"),
        (3L, "c", "s", 30L, "yy"))
      .toDF("doc_id", "text", "source", "n_chars", "lang")
      .write.partitionBy("lang").parquet(s"$scratch/wh")
    val src = Seq((1L, "xx", "del"), (2L, "xx", "del"))
      .toDF("doc_id", "s_lang", "op")
    val out = graft.operators.Relational
      .mergeApply(spark, s"$scratch/wh", src)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!new java.io.File(s"$scratch/wh/lang=xx").exists(),
      "emptied partition directory survived the merge")
    assert(out("xx").getBoolean(1) && out("xx").getLong(4) === 2L &&
      out("xx").getLong(6) === 0L, s"xx report: ${out("xx")}")
    assert(!out("yy").getBoolean(1) && out("yy").getLong(6) === 1L,
      s"yy report: ${out("yy")}")
    val back = spark.read.parquet(s"$scratch/wh").collect()
    assert(back.length === 1 && back.head.getAs[Long]("doc_id") === 3L,
      "deleted rows resurrected from the emptied partition")
    graft.util.Fs.deleteRecursively(scratch)
  }

  test("q147 staged partitioned layout prunes to the lang=en directory") {
    import org.apache.spark.sql.functions._
    val q = SparkEntry.queries("q147_partitioned_scan")(spark, sf)
    val p = q.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("PartitionFilters") && p.contains("lang"),
      s"q147 scan not partition-pruned:\n$p")
    // pruned read's answer equals the unpartitioned filter's
    val e = graft.sources.Tables.load(spark, sf, "documents")
      .filter(col("lang") === "en")
      .agg(count(lit(1)), sum(col("n_chars").cast("bigint")),
        countDistinct(col("source"))).head
    val g = q.head
    assert(g.getLong(0) === e.getLong(0) && g.getLong(1) === e.getLong(1) &&
      g.getLong(2) === e.getLong(2),
      s"q147 pruned answer $g != unpartitioned $e")
  }

  test("q159 packing: one window exchange on source, rollup map-side combined") {
    val p = formatted("q159_seq_packing")
    // exactly one full-size exchange (the source-partitioned window);
    // the per-source rollup rides partial aggregation
    assert(p.contains("Window"), s"q159 lost its window:\n$p")
    assert(p.contains("partial"), s"q159 rollup not partial-aggregated:\n$p")
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"q159 has $exchanges exchanges:\n$p")
  }

  test("q161 census: both aggregation levels partial, no join, no window") {
    val p = formatted("q161_k_anonymity")
    assert(p.contains("partial"), s"q161 not partial-aggregated:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"),
      s"q161 grew a join or window:\n$p")
  }

  test("q162 triangles: hash equi-joins only, never a nested loop") {
    val p = formatted("q162_triangle_count")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"q162 wedge join degraded to a nested loop:\n$p")
  }

  test("q208 KMV: typed aggregator partial-aggregates map-side") {
    // the whole point of the mergeable sketch is that the exchange
    // carries one <=k-long array per group, not the custkey set — the
    // plan must show a partial (map-side) aggregation below the shuffle
    val p = formatted("q208_kmv_sketch")
    assert(p.toLowerCase.contains("partial"),
      s"q208 sketch aggregation lost its map-side partial:\n$p")
    assert(p.contains("ObjectHashAggregate") || p.contains("SortAggregate"),
      s"q208 typed aggregation missing from the plan:\n$p")
  }

  test("q213 sliding HLL: the day-grid range join broadcasts; registers partial-agg") {
    // the window fan-out must ride a broadcast of the ~30-row day grid —
    // a shuffled join here would exchange the register table per window —
    // and the register build itself must partial-aggregate map-side
    val p = formatted("q213_sliding_hll")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"q213 day-grid join not broadcast:\n$p")
    assert(p.toLowerCase.contains("partial_max") ||
      p.toLowerCase.contains("partial"),
      s"q213 register rollup lost its map-side partial:\n$p")
  }

  test("q210 heavy hitters: the exact recount broadcasts the candidate set") {
    // pass 2 must semi-join the <=c candidates as a broadcast — a
    // shuffled join here would move the full token stream by key
    val p = formatted("q210_heavy_hitters")
    assert(p.contains("BroadcastHashJoin"),
      s"q210 recount join not broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"q210 recount fell back to sort-merge:\n$p")
  }

  // --- q223 merge-on-read deletion vectors ---------------------------------

  private def fileSigs(wh: String,
      vw: graft.operators.Relational.VersionedWarehouse)
      : Map[String, (Long, Long)] =
    vw.listDataFiles().map { rel =>
      val f = new java.io.File(wh, rel)
      rel -> ((f.lastModified(), f.length()))
    }.toMap

  test("q223 MOR: delete commit writes zero data files, nothing is ever rewritten, read equals COW") {
    import org.apache.spark.sql.functions._
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_q223_spec").toString
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    // two identical stores: one mutated MOR, one COW — same CDC batch
    docs.write.partitionBy("lang").parquet(s"file://$scratch/mor")
    docs.write.partitionBy("lang").parquet(s"file://$scratch/cow")
    val vw = new graft.operators.Relational.VersionedWarehouse(
      spark, s"$scratch/mor")
    vw.commit(0, vw.listDataFiles())
    val v0Sigs = fileSigs(s"$scratch/mor", vw)
    val src = graft.operators.Relational.cdcSource(docs)
    vw.commitMorMerge(1, src.filter(col("op") =!= "del"))
    val v1Sigs = fileSigs(s"$scratch/mor", vw)
    val dataBeforeDelete = vw.listDataFiles()
    vw.commitMorDelete(2, src.filter(col("op") === "del")
      .select(col("doc_id")))
    // the MOR contract, file layer: the delete commit wrote ZERO data
    // files, and NO pre-existing file (v0's or v1's appends) was ever
    // rewritten — mutation cost is the CDC batch, never partition size
    assert(vw.listDataFiles() === dataBeforeDelete,
      "MOR delete commit wrote or removed data files")
    (v0Sigs ++ v1Sigs).foreach { case (rel, sig) =>
      val f = new java.io.File(s"$scratch/mor", rel)
      assert(f.isFile && (f.lastModified(), f.length()) === sig,
        s"MOR rewrote pre-existing file $rel")
    }
    // one DV sidecar per mutating commit, applied as an anti-join
    assert(vw.manifestEntries(2).count(_.kind == "x") === 2)
    val p = vw.asOf(2).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("LeftAnti"),
      s"q223 read path lost its DV anti-join:\n$p")
    // the read layer: asOf(2) bit-equals the COW post-image of the SAME
    // batch (shared mergeClauseFrame truth)
    graft.operators.Relational.mergeApply(spark, s"$scratch/cow", src)
      .collect()
    val cols = Seq("doc_id", "text", "source", "n_chars", "lang").map(col)
    def snap(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
      df.select(cols: _*).collect().map(_.toSeq).toSeq
        .sortBy(_.head.asInstanceOf[Long])
    assert(snap(vw.asOf(2)) ===
      snap(spark.read.parquet(s"file://$scratch/cow")),
      "MOR read diverged from the COW post-image")
    // time travel still works under MOR: asOf(0) is the pre-merge table
    assert(snap(vw.asOf(0)) === snap(docs))
    graft.util.Fs.deleteRecursively(scratch)
  }

  test("q224 optimize: manifest swap is bit-identical, expire removes exactly the pre-compaction files") {
    import org.apache.spark.sql.functions._
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_q224_spec").toString
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val nLangs = docs.select(col("lang")).distinct().count().toInt
    docs.repartition(nLangs, col("lang"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .write.option("maxRecordsPerFile", 64)
      .partitionBy("lang").parquet(s"file://$scratch/wh")
    val vw = new graft.operators.Relational.VersionedWarehouse(
      spark, s"$scratch/wh")
    vw.commit(0, vw.listDataFiles())
    vw.commitMerge(1, graft.operators.Relational.cdcSource(docs))
    def snap(v: Int): Seq[Seq[Any]] =
      vw.asOf(v).select(col("doc_id"), col("n_chars"), col("lang"))
        .collect().map(_.toSeq).toSeq.sortBy(_.head.asInstanceOf[Long])
    val v1 = snap(1)
    val compacted = vw.optimize(2)
    // one compacted file per partition, data bit-identical across the swap
    assert(vw.manifest(2).toSet === compacted.toSet)
    assert(compacted.groupBy(_.takeWhile(_ != '/')).values
      .forall(_.size == 1), s"optimize left >1 file in a partition: $compacted")
    assert(snap(2) === v1, "OPTIMIZE changed the data")
    // pre-compaction versions stay readable until expired
    assert(snap(1) === v1 && vw.hasVersion(0))
    val preFiles = vw.listDataFiles().toSet
    val removed = vw.expire(retain = Seq(2))
    // exactly the files the compacted manifest no longer references go
    assert(removed.toSet === (preFiles -- compacted))
    assert(vw.listDataFiles().toSet === compacted.toSet)
    assert(snap(2) === v1, "expire perturbed the retained compacted version")
    graft.util.Fs.deleteRecursively(scratch)
  }

  test("q225 refresh: change feed scans only the changed partitions' files") {
    import org.apache.spark.sql.functions._
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_q225_spec").toString
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    docs.write.partitionBy("lang").parquet(s"file://$scratch/wh")
    val vw = new graft.operators.Relational.VersionedWarehouse(
      spark, s"$scratch/wh")
    vw.commit(0, vw.listDataFiles())
    vw.commitMerge(1, graft.operators.Relational.cdcSource(docs))
    assert(vw.changedPartitions(0, 1) === Seq("de", "en"))
    val cf = vw.changeFeed(0, 1)
    // the manifest prune is physical: the diff's scan set contains NO
    // file of an unchanged partition — the k/n lever the 100 TB refresh
    // story rests on
    val scanned = cf.inputFiles.toSeq
    assert(scanned.nonEmpty)
    scanned.foreach(f => assert(
      f.contains("lang=de/") || f.contains("lang=en/"),
      s"change feed scanned an unchanged partition's file: $f"))
    // maintained state == from-scratch v1 rollup (the IVM invariant),
    // via the gate query itself against a recompute
    val refreshed = SparkEntry.queries("q225_cdf_refresh")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val scratch2 = vw.asOf(1).groupBy(col("lang"))
      .agg(count(lit(1)), sum(col("n_chars").cast("bigint")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(refreshed === scratch2,
      s"refresh diverged from recompute: $refreshed vs $scratch2")
    graft.util.Fs.deleteRecursively(scratch)
  }

  test("q226 zone maps: a selective as-of read lists fewer files than the manifest") {
    import org.apache.spark.sql.functions._
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_q226_spec").toString
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val nLangs = docs.select(col("lang")).distinct().count().toInt
    docs.repartition(nLangs, col("lang"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .write.option("maxRecordsPerFile", 64)
      .partitionBy("lang").parquet(s"file://$scratch/wh")
    val vw = new graft.operators.Relational.VersionedWarehouse(
      spark, s"$scratch/wh")
    vw.commitWithStats(0, vw.listDataFiles())
    val total = vw.manifest(0).size
    val (pruned, decisions) = vw.asOfWhere(0, 120L, 260L)
    val skipped = decisions.count(_._2)
    val scannedN = decisions.count(!_._2)
    assert(skipped > 0, "zone maps skipped nothing on a selective range")
    assert(scannedN < total && scannedN + skipped === total)
    // the physical scan set is exactly the non-skipped files
    assert(pruned.inputFiles.length === scannedN,
      s"scan lists ${pruned.inputFiles.length} files, expected $scannedN")
    // pruning is sound: the zone-mapped read equals the full-scan filter
    val expect = vw.asOf(0).filter(col("doc_id").between(120L, 260L))
      .agg(count(lit(1)), sum(col("n_chars").cast("bigint"))).head
    val got = pruned
      .agg(count(lit(1)), sum(col("n_chars").cast("bigint"))).head
    assert(got === expect, s"zone-map prune dropped rows: $got vs $expect")
    // a file committed WITHOUT stats is never skipped
    vw.commit(1, vw.listDataFiles())
    val (_, d1) = vw.asOfWhere(1, 120L, 260L)
    assert(d1.forall(!_._2), "a stats-less file was skipped")
    graft.util.Fs.deleteRecursively(scratch)
  }

  test("expire survives stray manifest names and sweeps stale staging files") {
    import org.apache.spark.sql.functions._
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_expire_spec").toString
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .limit(20).localCheckpoint()
    docs.write.partitionBy("lang").parquet(s"file://$scratch/wh")
    val vw = new graft.operators.Relational.VersionedWarehouse(
      spark, s"$scratch/wh")
    vw.commit(0, vw.listDataFiles())
    val mdir = new java.io.File(s"$scratch/wh", "_manifests")
    // a stray v-prefixed non-version file (vNOTES) and a crashed
    // commit's leftover staging manifest — neither may abort the sweep.
    // The dead staging file is BACKDATED past the sweep's age gate; a
    // fresh one (an in-flight commit's staging, r21 ADVICE fix) must
    // survive the sweep untouched.
    java.nio.file.Files.writeString(
      new java.io.File(mdir, "vNOTES").toPath, "not a version")
    val dead = new java.io.File(mdir, ".staging_dead")
    java.nio.file.Files.writeString(dead.toPath, "torn")
    dead.setLastModified(System.currentTimeMillis() - 3600000L)
    java.nio.file.Files.writeString(
      new java.io.File(mdir, ".staging_inflight").toPath, "mid-commit")
    val removed = vw.expire(retain = Seq(0))
    assert(removed.isEmpty)
    assert(new java.io.File(mdir, "vNOTES").isFile,
      "expire deleted a non-version file it does not own")
    assert(!dead.exists(),
      "expire left a stale staging manifest (the unsweepable orphan class)")
    assert(new java.io.File(mdir, ".staging_inflight").isFile,
      "expire swept an in-flight commit's fresh staging manifest")
    assert(vw.hasVersion(0))
    graft.util.Fs.deleteRecursively(scratch)
  }

  test("zone-map stats propagate through commitMerge and optimize") {
    import org.apache.spark.sql.functions._
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_stats_spec").toString
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val nLangs = docs.select(col("lang")).distinct().count().toInt
    docs.repartition(nLangs, col("lang"))
      .sortWithinPartitions(col("lang"), col("doc_id"))
      .write.option("maxRecordsPerFile", 64)
      .partitionBy("lang").parquet(s"file://$scratch/wh")
    val vw = new graft.operators.Relational.VersionedWarehouse(
      spark, s"$scratch/wh")
    vw.commitWithStats(0, vw.listDataFiles())
    vw.commitMerge(1, graft.operators.Relational.cdcSource(docs))
    // a stats-enabled store stays stats-enabled: the merge's NEW files
    // carry stats, retained files keep theirs verbatim
    def dataEntries(v: Int) =
      vw.manifestEntries(v).filter(_.kind == "d")
    assert(dataEntries(1).forall(_.stats.isDefined),
      s"commitMerge dropped zone maps: ${dataEntries(1).filter(_.stats.isEmpty)}")
    val retained0 = dataEntries(0).map(e => e.path -> e.stats).toMap
    dataEntries(1).filter(e => retained0.contains(e.path)).foreach(e =>
      assert(e.stats === retained0(e.path),
        s"retained entry ${e.path} changed stats"))
    vw.optimize(2)
    assert(dataEntries(2).forall(_.stats.isDefined),
      "optimize dropped zone maps")
    // and the post-merge version still prunes on them
    val (_, decisions) = vw.asOfWhere(1, 120L, 260L)
    assert(decisions.exists(_._2),
      "post-merge zone maps skipped nothing on a selective range")
    graft.util.Fs.deleteRecursively(scratch)
  }

  test("manifest entries: legacy bare paths parse, stats roundtrip") {
    import graft.operators.Relational.ManifestEntry
    val legacy = ManifestEntry.parse("lang=en/part-0.parquet")
    assert(legacy === ManifestEntry(0, "d", "lang=en/part-0.parquet"))
    val full = ManifestEntry(3, "x", "_deletes/v3/k.parquet",
      Some((1L, 9L, 10L, 99L)))
    assert(ManifestEntry.parse(full.serialize) === full)
    assert(ManifestEntry.parse(ManifestEntry(2, "d", "p").serialize) ===
      ManifestEntry(2, "d", "p"))
  }
}
