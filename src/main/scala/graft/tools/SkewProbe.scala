package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Probe: put NUMBERS on the "scale-safe by AQE" claims of the
  * user_id-clustered queries (q75 funnel, q76 cohort) by running their
  * plan shapes over synthetic event logs with controlled user cardinality
  * and a controlled hot-key fraction.
  *
  * Two questions, answered empirically (results recorded in the q75/q76
  * scaladocs in [[graft.operators.Relational]]):
  *  1. q76's act⋈first join: at what per-user-frame size does AQE stop
  *     broadcasting the first-seen side and flip to sort-merge — and does
  *     the act side's single pinned exchange survive the flip?
  *  2. q75's chained window minima partition by user_id, and a window
  *     partition cannot be salted or AQE-split — how does one hot user
  *     owning a large share of all events stretch the stage?
  *
  * Measured 2026-08 (20M events, local[32], 10 MB broadcast threshold):
  * {{{
  * PROBE q76 users=   10000  join=SortMergeJoin  hashExchanges=3   3.61 s
  * PROBE q76 users=  100000  join=SortMergeJoin  hashExchanges=3   2.35 s
  * PROBE q76 users=  400000  join=SortMergeJoin  hashExchanges=3   3.57 s
  * PROBE q76 users= 1000000  join=SortMergeJoin  hashExchanges=3   3.97 s
  * PROBE q76 users= 4000000  join=SortMergeJoin  hashExchanges=3   4.80 s
  * PROBE q75 hotPct= 0%   1.88 s
  * PROBE q75 hotPct=10%   1.06 s
  * PROBE q75 hotPct=30%   2.32 s
  * PROBE q75 hotPct=60%   2.93 s
  * PROBE q61 users=   10000  join=BroadcastHashJoin  build=BuildRight(dim)     8.29 s
  * PROBE q61 users=  100000  join=BroadcastHashJoin  build=BuildRight(dim)     7.82 s
  * PROBE q61 users= 1000000  join=BroadcastHashJoin  build=BuildLeft(stream)   8.69 s
  * PROBE q61 users= 4000000  join=BroadcastHashJoin  build=BuildLeft(stream)   8.78 s
  * PROBE q95 dim=1/1000  bloom=true  injected=true  factShuffledRows=    19773   3.86 s
  * PROBE q95 dim=1/1000  bloom=false injected=false factShuffledRows= 20000000   1.85 s
  * PROBE q95 dim=1/100   bloom=true  injected=true  factShuffledRows=   200443   2.23 s
  * PROBE q95 dim=1/100   bloom=false injected=false factShuffledRows= 20000000   1.56 s
  * PROBE q95 dim=1/10    bloom=true  injected=true  factShuffledRows=  5492412   1.92 s
  * PROBE q95 dim=1/10    bloom=false injected=false factShuffledRows= 20000000   1.55 s
  * PROBE q95 dim=1/2     bloom=true  injected=true  factShuffledRows= 19953381   3.36 s
  * PROBE q95 dim=1/2     bloom=false injected=false factShuffledRows= 20000000   1.64 s
  * PROBE q96 layout=unsorted     scanEmittedRows= 20000000 of 20000000    0.96 s
  * PROBE q96 layout=user-sorted  scanEmittedRows=   339586 of 20000000    0.12 s
  * PROBE q96 layout=z-ordered    scanEmittedRows=    80000 of 20000000    0.13 s
  * PROBE q123 layout=flat-parquet    selectedBuckets=-  scanEmittedRows=20000000   2.34 s /  0.64 s
  * PROBE q123 layout=bucketed-auto   selectedBuckets=-  scanEmittedRows=  137496   0.45 s /  0.29 s
  * PROBE q123 layout=bucketed-pinned selectedBuckets=3  scanEmittedRows=  137496   0.24 s /  0.27 s
  * PROBE q144 docs=200000 tokens=20000000 wall= 28.28 s  pairWorkKept=264000 pairWorkRefusedByCap=120000000000
  * }}}
  * Reading: there is no broadcast→SMJ CLIFF in q76's shape — both join
  * children reuse the one pinned user_id exchange, so the sort-merge is
  * exchange-free at every cardinality and wall time moves only ~2×
  * (2.35 s → 4.80 s) from 100k to 4M users, a 40× spread (the 10k first
  * row, 3.61 s, carries stage warm-up and is not part of the trend).
  * q75's single-task hot-user tail grows sublinearly with the hot share
  * (the 0% row runs first and carries the window shape's stage warm-up,
  * which is why 10% reads below it); see the q75 scaladoc for the
  * operational stance.
  * q61 (2M-event stream, 4 micro-batches, parquet-backed dim): while the
  * dim's size estimate fits the broadcast threshold the batch planner
  * broadcasts the DIM (BuildRight — it is small, so that is fine); past
  * the threshold (1M+ users) it flips to building from the BOUNDED
  * micro-batch side (BuildLeft) — never to a per-batch sort-merge — and
  * drain time stays flat (~8 s, stream machinery dominated). The
  * scaladoc's wide-dim-never-pinned guarantee is the BuildLeft regime;
  * the probe shows the flip happens exactly where it should and costs
  * nothing.
  * q95 (20M-row parquet fact ⋈ selective parquet dim, broadcasts off,
  * AQE off): the injected bloom cuts the FACT-SIDE SHUFFLE to within a
  * false-positive hair of the true join fraction — 20M → 19.8k records
  * at 1/1000 selectivity, 20M → 200k at 1/100 — which is the metric
  * that matters at cluster scale, where the shuffle is network+disk. At
  * 1/2 the filter passes 99.8% of rows: pure overhead, exactly why
  * Spark gates the rule on a selective creation side. local[32]
  * wall-clock is the honest caveat: with a 160 MB in-page-cache fact,
  * the dim scan that builds the bloom costs more than the avoided
  * shuffle, so the time column FAVORS bloom=false here — the records
  * column, not the seconds column, is the 100 TB story.
  * q96 (same 20M-row table written unsorted / user_id-sorted /
  * z-ordered, 1 MB row groups, one 2-D box predicate ≈1/64 per dim):
  * row-group min/max pruning emits ALL 20M rows from the unsorted
  * layout, 339.6k from the 1-D sort (prunes on user_id, reads every
  * day), and 80–120k across runs from the z-order (repartitionByRange
  * samples, so file boundaries wobble) — ~200× less than unsorted and
  * ~3–4× less than the 1-D sort, because only z-cells overlapping BOTH ranges
  * survive. That is the multi-dim pruning claim, measured.
  * q123 (20M-row postings, 100k-term vocab, 3-term conjunctive query,
  * second number = warm rerun): the flat layout decodes ALL 20M rows (the
  * In() filter runs above the scan — hash-distributed terms defeat
  * row-group stats); the bucketed table's per-bucket SORT on tok gives
  * parquet page-index pruning (20M → 137k rows decoded, 145×) even when
  * the planner un-buckets the scan; pinning the bucketed scan
  * additionally opens only 3 of 16 bucket files (SelectedBucketsCount) —
  * invisible in local wall-clock behind the page cache, but at cluster
  * scale that is 13/16 of the index I/O never issued. Both effects stack:
  * the q123/q125 index promise is the bucket cut × the page cut.
  * q144 (200k docs × 100 tokens, every doc opening with the same
  * 10-token boilerplate, 2,000 planted 40-token span pairs): the full
  * detector runs 20M tokens end-to-end in 28 s and recovers EXACTLY the
  * 2,000 planted pairs at max_span=40; the df≤16 cap refuses 1.2·10¹¹
  * candidate-pair work from the boilerplate grams (3 header grams ×
  * 200k² each) while keeping 264k — a ~450,000× pair-work cut with zero
  * loss of the planted spans (boilerplate can never form a ≥12-token
  * NOVEL shared span; it is shared by construction).
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).agg(sum("id")).head // warm
    // run only the named sections (q76/q75/q61/q95/q96); no args = all
    val sections = args.toSet
    def enabled(s: String) = sections.isEmpty || sections.contains(s)

    def timed(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    /** Synthetic event log: `hotPct`% of events on user 0, the rest
      * hash-uniform over `nUsers`; 60 distinct days. Deterministic. */
    def events(nEvents: Long, nUsers: Long, hotPct: Int): DataFrame =
      spark.range(nEvents).select(
        when(col("id") % 100 < hotPct, 0L)
          .otherwise(pmod(xxhash64(col("id")), lit(nUsers))).as("user_id"),
        pmod(col("id"), lit(60L)).as("day"),
        col("id").as("tu"),
        element_at(
          array(lit("view"), lit("click"), lit("purchase")),
          (pmod(xxhash64(col("id") + 7), lit(3L)) + 1).cast("int"))
          .as("event_type"))

    // ---- 1. q76 cohort shape: broadcast→SMJ flip vs distinct users ----
    println("== q76 cohort shape: join strategy vs user cardinality ==")
    println("   (autoBroadcastJoinThreshold = " +
      spark.conf.get("spark.sql.autoBroadcastJoinThreshold") + ")")
    for (nUsers <- Seq(10000L, 100000L, 400000L, 1000000L, 4000000L)
        if enabled("q76")) {
      val ev = events(20000000L, nUsers, hotPct = 1)
      val act = ev.select(col("user_id"), col("day"))
        .repartition(col("user_id")).distinct()
      val first = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val q = act.join(first, Seq("user_id"))
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
      val secs = timed(q.count())
      val plan = q.queryExecution.executedPlan.toString
      val join =
        if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
        else if (plan.contains("SortMergeJoin")) "SortMergeJoin"
        else "ShuffledHashJoin"
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      println(f"PROBE q76 users=$nUsers%8d  join=$join%-18s " +
        f"hashExchanges=$exchanges%d  ${secs}%6.2f s")
    }

    // ---- 2. q75 funnel shape: hot-user window partition ----
    println("== q75 funnel shape: hot user share vs stage time ==")
    import org.apache.spark.sql.expressions.Window
    for (hotPct <- Seq(0, 10, 30, 60) if enabled("q75")) {
      val ev = events(20000000L, 1000000L, hotPct)
      val w = Window.partitionBy(col("user_id"))
      // chained conditional minima via successive columns, q75's shape:
      // same partitioning → one exchange feeds both Window passes
      val q = ev
        .withColumn("tv",
          min(when(col("event_type") === "view", col("tu"))).over(w))
        .withColumn("tc",
          min(when(col("event_type") === "click" && col("tu") > col("tv"),
            col("tu"))).over(w))
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      val secs = timed(q.count())
      println(f"PROBE q75 hotPct=$hotPct%2d%%  ${secs}%6.2f s")
    }

    // ---- 3. q61 stream-static shape: dim cardinality vs join strategy ----
    // the q61 scaladoc claims the micro-batch planner builds the broadcast
    // from the BOUNDED micro-batch side (BuildLeft) so a wide dim is never
    // pinned into memory. Measure: fixed 2M-event stream (4 files → 4
    // micro-batches) joined against a parquet-backed dim at growing user
    // cardinality — record join node, build side, drain time.
    println("== q61 stream-static shape: join strategy vs dim cardinality ==")
    val tmp = java.nio.file.Files.createTempDirectory("graft_probe_q61")
    val evDir = tmp.resolve("events").toString
    if (enabled("q61"))
      events(2000000L, 1000000L, hotPct = 1)
        .select(col("tu").as("event_id"), (col("tu") * 1000000000L).as("ts"),
          col("user_id"), col("event_type"),
          (col("tu") % 97).cast("double").as("value"),
          lit("{}").as("props"))
        .repartition(4).write.mode("overwrite").parquet(evDir)
    for (nUsers <- Seq(10000L, 100000L, 1000000L, 4000000L)
        if enabled("q61")) {
      val dimPath = tmp.resolve(s"dim_$nUsers").toString
      spark.range(nUsers).select(col("id").as("user_id"))
        .write.mode("overwrite").parquet(dimPath)
      // same derivation as q61: parquet-backed distinct users + cohort,
      // so the batch planner sees file-size-based estimates, not range stats
      val dim = spark.read.parquet(dimPath)
        .select(col("user_id")).distinct()
        .withColumn("cohort", pmod(col("user_id"), lit(7L)).cast("int"))
      val joined = graft.streaming.EventStreams.readEvents(spark, evDir)
        .join(dim, Seq("user_id"))
        .groupBy(col("cohort")).agg(count(lit(1)).as("n"))
      val name = s"q61_probe_$nUsers"
      val t0 = System.nanoTime()
      val q = joined.writeStream
        .outputMode("complete").format("memory").queryName(name)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      val secs = (System.nanoTime() - t0) / 1e9
      val buf = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) { q.explain() }
      spark.catalog.dropTempView(name)
      val plan = buf.toString("UTF-8")
      val join =
        if (plan.contains("BroadcastHashJoin")) "BroadcastHashJoin"
        else if (plan.contains("SortMergeJoin")) "SortMergeJoin"
        else "ShuffledHashJoin"
      val build =
        if (plan.contains("BuildLeft")) "BuildLeft(stream)"
        else if (plan.contains("BuildRight")) "BuildRight(dim)"
        else "-"
      println(f"PROBE q61 users=$nUsers%8d  join=$join%-18s " +
        f"build=$build%-17s ${secs}%6.2f s")
    }
    // ---- 4. q95 runtime-filter shape: bloom benefit vs dim selectivity ----
    // the q95 scaladoc claims the injected probe-side bloom filter is "the
    // difference between shuffling every fact row and shuffling only the
    // rows that can possibly join". Measure exactly that: a 20M-row
    // parquet fact joined (shuffle join, broadcasts off) against a dim
    // keeping a controlled fraction of keys — record the fact-side
    // SHUFFLED ROW COUNT and wall time with the filter on vs off. AQE off
    // for this section so Exchange metrics are directly collectible.
    if (enabled("q95")) {
      println("== q95 runtime-filter shape: bloom benefit vs selectivity ==")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val factPath = tmp.resolve("fact95").toString
      spark.range(20000000L).select(col("id").as("key"),
        pmod(xxhash64(col("id")), lit(1000L)).as("payload"))
        .write.mode("overwrite").parquet(factPath)
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val dimPath = tmp.resolve("dim95").toString
      spark.range(20000000L)
        .select(col("id").as("key"),
          pmod(xxhash64(col("id") + 3), lit(1000000L)).as("price"))
        .write.mode("overwrite").parquet(dimPath)
      for (oneIn <- Seq(1000L, 100L, 10L, 2L); bloom <- Seq(true, false)) {
        val fact = spark.read.parquet(factPath)
        // q95's exact creation-side shape: a selective predicate on a
        // NON-key column over a parquet scan (price > X, like orders'
        // o_totalprice) — InjectRuntimeFilter wants a selective filter,
        // and a predicate on the join key itself does not qualify;
        // threshold raised above the 1/2 dim's size so the SWEEP
        // measures benefit vs selectivity, not the rule's own size gate
        val dim = spark.read.parquet(dimPath)
          .filter(col("price") < lit(1000000L / oneIn))
          .select(col("key"))
        val flips = Seq(
          "spark.sql.optimizer.runtime.bloomFilter.enabled" -> bloom.toString,
          "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
          "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "512MB",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1")
        val prev = flips.map { case (k, _) => k -> spark.conf.getOption(k) }
        flips.foreach { case (k, v) => spark.conf.set(k, v) }
        try {
          val q = fact.join(dim, Seq("key"))
            .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
          // collect(), not head(): head wraps a NEW limited
          // QueryExecution, leaving THIS plan un-executed and its
          // metrics zeroed
          val secs = timed(q.collect())
          val plan = q.queryExecution.executedPlan
          val hasBloom = plan.toString.contains("might_contain")
          // the fact-side exchange: the LEAF-MOST exchange (no exchange
          // below it) whose subtree scans the fact parquet — the agg
          // exchange above the join also "contains" the fact scan
          val factShuffled = plan.collect {
            case e: ShuffleExchangeExec
                if e.child.collect { case x: ShuffleExchangeExec => x }
                  .isEmpty && e.child.toString.contains("fact95") =>
              e.metrics("shuffleRecordsWritten").value
          }.headOption.getOrElse(-1L)
          println(f"PROBE q95 dim=1/$oneIn%-5d bloom=$bloom%-5s " +
            f"injected=$hasBloom%-5s factShuffledRows=$factShuffled%9d " +
            f"${secs}%6.2f s")
        } finally prev.foreach {
          case (k, Some(v)) => spark.conf.set(k, v)
          case (k, None) => spark.conf.unset(k)
        }
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    // ---- 5. q96 z-order shape: row-group pruning vs physical layout ----
    // the q96 scaladoc claims the z-cell layout is "the multi-dim
    // row-group-pruning story for the lakehouse write path". Measure the
    // story itself: write the SAME 20M-row (user_id, day, payload) table
    // three ways — unsorted, linearly sorted on user_id, z-ordered on
    // (user_id, day) with q96's exact bit-interleave — with small row
    // groups, then run one 2-D box query (≈1/64 of each dimension) on each
    // layout and record the rows the scan actually emitted (= rows in row
    // groups whose min/max stats overlap the box; pushed filters prune the
    // rest unread) plus wall time. AQE off so FileSourceScan metrics are
    // directly collectible.
    if (enabled("q96")) {
      println("== q96 z-order shape: row-group pruning vs layout ==")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      import org.apache.spark.sql.execution.FileSourceScanExec
      val n = 20000000L
      val base = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(65536L)).as("user_id"),
        pmod(xxhash64(col("id") + 11), lit(256L)).as("day"),
        (col("id") % 1000).as("payload"))
      // q96's exact z-derivation: 8-bit bucketized dims, bit-interleaved
      val zed = base
        .withColumn("ub", expr("(user_id * 256) DIV 65536"))
        .withColumn("db", col("day"))
        .withColumn("z", (0 until 8).map { i =>
          (expr(s"(ub DIV ${1L << i}) % 2") * lit(1L << (2 * i + 1))) +
            (expr(s"(db DIV ${1L << i}) % 2") * lit(1L << (2 * i)))
        }.reduce(_ + _))
      val layouts = Seq(
        "unsorted" -> base,
        "user-sorted" -> base.repartitionByRange(32, col("user_id"))
          .sortWithinPartitions(col("user_id")),
        "z-ordered" -> zed.repartitionByRange(32, col("z"))
          .sortWithinPartitions(col("z"))
          .select(col("user_id"), col("day"), col("payload")))
      for ((name, df) <- layouts) {
        val path = tmp.resolve(s"layout_$name").toString
        df.write.mode("overwrite")
          .option("parquet.block.size", (1L << 20).toString)
          .parquet(path)
        val q = spark.read.parquet(path)
          .filter(col("user_id").between(30000, 31023) &&
            col("day").between(100, 103))
          .agg(count(lit(1)).as("n"), sum(col("payload")).as("s"))
        val secs = timed(q.collect())
        val scanned = q.queryExecution.executedPlan.collect {
          case s: FileSourceScanExec => s.metrics("numOutputRows").value
        }.headOption.getOrElse(-1L)
        println(f"PROBE q96 layout=$name%-12s scanEmittedRows=$scanned%9d " +
          f"of $n%d  ${secs}%6.2f s")
      }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    // ---- 6. q123/q125 inverted-index shape: bucket pruning vs full scan --
    // 20M-row postings over a 100k-term vocab (each posting list ~200
    // rows), staged three ways; the SAME 3-term conjunctive count runs
    // against each. The pruning claim is the numFiles column: the bucketed
    // probe opens ~3/16 of the index files at plan time. (Row-group
    // min/max stats cannot help here — hash-distributed terms appear in
    // every row group, which is exactly the regime real postings live in.)
    if (enabled("q123")) {
      println("== q123 postings shape: bucket pruning vs full scan ==")
      // AQE off as in the q95/q96 sections: scan metrics are read off the
      // executed plan directly, and AdaptiveSparkPlanExec hides its final
      // children from collect()
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val postings = spark.range(20000000L).select(
        concat(lit("t"), pmod(xxhash64(col("id")), lit(100000L)))
          .as("tok"),
        pmod(xxhash64(col("id") + 7), lit(5000000L)).as("doc_id"),
        (pmod(xxhash64(col("id") + 13), lit(9L)) + 1).as("tf"))
      val flatPath = tmp.resolve("postings_flat").toString
      postings.write.mode("overwrite").parquet(flatPath)
      graft.plans.Bucketing.writeBucketed(postings, "graft_probe_postings",
        "tok", buckets = 16)
      val terms = Seq("t17", "t4242", "t99991")
      def conj(df: DataFrame) = df.filter(col("tok").isin(terms: _*))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("nt"), sum(col("tf")).as("s"))
        .filter(col("nt") === terms.size)
        .agg(count(lit(1)).as("n"), sum(col("s")).as("ss"))
      val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
      val variants = Seq(
        ("flat-parquet   ", spark.read.parquet(flatPath), None),
        ("bucketed-auto  ", spark.table("graft_probe_postings"), None),
        ("bucketed-pinned", spark.table("graft_probe_postings"), Some("false")))
      for ((name, df, pin) <- variants) {
        val prev = spark.conf.get(key)
        pin.foreach(v => spark.conf.set(key, v))
        try {
          val q = conj(df)
          val secs = timed(q.collect())
          val secs2 = timed(conj(df).collect())
          val rows = q.queryExecution.executedPlan.collect {
            case s: org.apache.spark.sql.execution.FileSourceScanExec =>
              s.metrics("numOutputRows").value
          }.headOption.getOrElse(-1L)
          val buckets = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
            .findFirstMatchIn(q.queryExecution.executedPlan.toString)
            .map(_.group(1)).getOrElse("-")
          println(f"PROBE q123 layout=$name selectedBuckets=$buckets%-2s " +
            f"scanEmittedRows=$rows%8d ${secs}%6.2f s / ${secs2}%5.2f s")
        } finally spark.conf.set(key, prev)
      }
      spark.sql("DROP TABLE IF EXISTS graft_probe_postings")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    // ---- 7. q144 dup-span shape: the df cap vs the quadratic key ------
    // 200k docs × 100 tokens = 20M tokens. Every doc opens with the SAME
    // 10-token boilerplate header (the quadratic key: its grams appear in
    // all 200k docs), and 1% of doc pairs share a planted 40-token span.
    // The probe measures the capped detector end-to-end and reports the
    // pair work the cap REFUSED: Σ dfd² over capped-out grams (the pairs
    // an uncapped join would have generated) vs Σ dfd² over kept grams.
    if (enabled("q144")) {
      println("== q144 dup-span shape: df cap vs boilerplate quadratic key ==")
      val nDocs = 200000L
      val docs = spark.range(nDocs).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          // boilerplate header, identical everywhere
          concat_ws(" ", (0 until 10).map(j => lit(s"b$j")): _*),
          // unique filler
          concat_ws(" ", transform(sequence(lit(0), lit(19)),
            j => concat(lit("u"), col("id"), lit("_"), j))),
          // 40-token span, shared by docs 2p/2p+1 when p % 50 == 0
          // (integral DIV — `/` on longs is DOUBLE division in Spark SQL
          // and would give odd ids a fractional, never-matching key)
          concat_ws(" ", transform(sequence(lit(0), lit(39)),
            j => concat(lit("s"),
              when(expr("id DIV 2") % 50 === 0, expr("id DIV 2"))
                .otherwise(col("id") + lit(10000000L)), lit("_"), j))),
          concat_ws(" ", transform(sequence(lit(0), lit(27)),
            j => concat(lit("v"), col("id"), lit("_"), j)))).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      val secs = timed {
        val r = graft.operators.Dedup.dupSpans(docs).agg(
          count(lit(1)), max(col("max_span"))).head
        println(s"   pairs=${r.getLong(0)} maxSpan=${r.getLong(1)}")
      }
      val work = graft.operators.Dedup.gramTable(docs, 8)
        .groupBy(col("h")).agg(countDistinct(col("doc_id")).as("dfd"))
        .agg(
          sum(when(col("dfd") > 16, col("dfd") * col("dfd"))
            .otherwise(0L)).as("refused"),
          sum(when(col("dfd").between(2, 16), col("dfd") * col("dfd"))
            .otherwise(0L)).as("kept")).head
      println(f"PROBE q144 docs=$nDocs%d tokens=${nDocs * 100}%d " +
        f"wall=${secs}%6.2f s  pairWorkKept=${work.getLong(1)}%d " +
        f"pairWorkRefusedByCap=${work.getLong(0)}%d")
      docs.unpersist()
    }

    // ---- 8. q149 BPE shape: dict-bounded training, memoized encode ----
    // 200k docs × 100 tokens = 20M tokens over a ~50k-word vocabulary
    // (20% of positions drawn from a 100-word hot head so merges have
    // high-frequency structure to learn). The probe exercises the two
    // costs the scaladoc claims separately: TRAIN is dict-bounded (one
    // corpus shuffle + a vocab-sized collect + driver rounds — never a
    // corpus pass per round), ENCODE is one fold over DISTINCT words +
    // one corpus join (never a per-occurrence fold), at 50 merges — a
    // 50-deep folded apply chain, 2.5× the gated depth.
    if (enabled("q149")) {
      println("== q149 BPE shape: dict-bounded train, memoized encode ==")
      val nDocs = 200000L
      val docs = spark.range(nDocs).select(
        lit("s").as("source"),
        concat_ws(" ", transform(sequence(lit(0L), lit(99L)), j => {
          val h = xxhash64(col("id") * 100 + j)
          concat(lit("w"), when(pmod(h, lit(5L)) === 0, pmod(h, lit(100L)))
            .otherwise(pmod(h, lit(50000L))))
        })).as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      val secs = timed {
        val r = graft.operators.TextAnalysis.bpeEncode(docs, nMerges = 50)
          .agg(sum(col("n_tokens")), sum(col("n_chars"))).head
        println(s"   tokensOut=${r.getLong(0)} charsIn=${r.getLong(1)}")
      }
      println(f"PROBE q149 docs=$nDocs%d tokens=${nDocs * 100}%d merges=50 " +
        f"wall=${secs}%6.2f s (train+encode end-to-end, ~50k-word dict)")
      docs.unpersist()
    }

    graft.util.Fs.deleteRecursively(tmp.toFile)
    spark.stop()
  }
}
