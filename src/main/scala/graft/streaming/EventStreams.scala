package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming surface (SURVEY §2.9: absent in the reference —
  * extension required by the large-pipeline mandate).
  *
  * Design: the streaming plans are the SAME logical aggregations as their
  * batch twins in [[graft.operators.Relational.q32EventWindows]] — watermark +
  * tumbling window groupBy — so correctness is testable by equivalence with
  * the batch result on a static directory. State is bounded by the watermark
  * (late data beyond 10 minutes is dropped), which is what keeps executor
  * state finite on an unbounded 100 TB/day feed.
  */
object EventStreams {

  /** File-source stream over a directory of events parquet.
    *
    * The stream schema is inferred from the directory's parquet footers (one
    * driver-side footer read — the file source requires an explicit schema)
    * rather than hardcoded: the driver's datagen has shipped `ts` as both
    * TIMESTAMP(NANOS) (→ LongType under nanosAsLong) and TIMESTAMP(MICROS,
    * NTZ) (→ TimestampNTZType), and a hardcoded LongType schema silently
    * misreads the micros encoding (values 1000× off after the nanos
    * conversion). [[graft.sources.Tables.normalizeEventTs]] is the single
    * shared normalization for both batch and streaming paths. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    // CONTRACT: the directory must hold at least one parquet file at
    // stream-definition time — the schema comes from its footers (a
    // hardcoded schema silently misreads when the datagen changes
    // encodings, which is worse than this loud requirement). A deployment
    // whose directory starts empty seeds it with one schema-bearing file.
    val fileSchema =
      try spark.read.parquet(dir).schema
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"readEvents: cannot infer the stream schema from '$dir' — the " +
            "directory must contain at least one parquet file when the " +
            "stream is defined (seed it with a schema-bearing file)", e)
      }
    graft.sources.Tables.normalizeEventTs(
      spark.readStream
        .schema(fileSchema)
        .option("maxFilesPerTrigger", "1")
        .parquet(dir))
  }

  /** Tumbling 1-hour windowed aggregation with a 10-minute watermark —
    * the streaming twin of the batch q32. */
  def hourlyWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(
        unix_timestamp(col("window.start")).as("bucket"),
        col("event_type"), col("n"), col("sum_value"))

  /** Per-user session state: running event count + last-seen time, emitted
    * on each update (mapGroupsWithState; SURVEY §2.9 stateful surface).
    * State per key is O(1) — two longs — so 10⁹ users fit in executor state
    * stores. NoTimeout here: with a processing-time timeout the
    * AvailableNow drain keeps scheduling no-data batches to service pending
    * timeouts and never terminates; a production continuous deployment
    * would reap idle keys with an event-time timeout + watermark instead.
    */
  case class UserState(count: Long, lastTsMicros: Long)
  case class UserUpdate(user_id: Long, count: Long, lastTsMicros: Long)

  def userRunningCounts(spark: SparkSession, events: DataFrame): Dataset[UserUpdate] = {
    import spark.implicits._
    events
      .selectExpr("user_id", "unix_micros(ts) AS tsm")
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long)], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0L))
          var c = prev.count; var last = prev.lastTsMicros
          rows.foreach { case (_, t) => c += 1; if (t > last) last = t }
          state.update(UserState(c, last))
          UserUpdate(uid, c, last)
      }
  }

  /** Stage copies of `src` under a fresh temp directory (one copy per name
    * in `names`), run `body` against the directory, and ALWAYS delete the
    * staged copies — in a finally, because a drain that throws (including a
    * Bench retime pass) must not leak a corpus-sized copy per call. Every
    * `body` below fully drains its stream (runToMemory awaits termination
    * and detaches the result via localCheckpoint), so the returned frame
    * never re-reads the deleted staging dir. */
  private def withStagedDir[A](src: java.nio.file.Path, names: String*)
      (body: String => A): A = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream")
    try {
      names.foreach(n => java.nio.file.Files.copy(src, tmp.resolve(n)))
      body(tmp.toString)
    } finally {
      names.foreach(n => java.nio.file.Files.deleteIfExists(tmp.resolve(n)))
      java.nio.file.Files.deleteIfExists(tmp)
    }
  }

  /** Stage one filtered slice of `df` as a single mtime-stamped parquet
    * FILE in `dir` — the micro-batch staging idiom every file-stream
    * query here shares (mtime orders the batches; one file = one batch
    * under maxFilesPerTrigger = 1). */
  /** Stage several independent filtered slices CONCURRENTLY (r21, guide
    * §2.6): each slice is its own filter+coalesce(1) write job over the
    * same frame, and batch order is defined by the EXPLICIT mtimes, not
    * by staging order — so overlapping the writes changes nothing but
    * the wall-clock the sequential loop paid per job. */
  private def stageFiles(df: DataFrame, dir: java.nio.file.Path,
      specs: (String, org.apache.spark.sql.Column, Long)*): Unit =
    // bounded to 4 in flight (r22 fan-out audit; specs is 2-3 today, the
    // bound keeps a future wider caller inside guide §2.6's discipline)
    graft.ml.Par.mapBounded(specs.toSeq, 4) { case (n, p, m) =>
      stageSingleFile(df, dir, n, p, m)
    }

  private def stageSingleFile(df: DataFrame, dir: java.nio.file.Path,
      name: String, pred: org.apache.spark.sql.Column,
      mtime: Long): Unit = {
    val scratch = dir.resolve(name + "_w").toString
    df.filter(pred).coalesce(1).write.parquet(scratch)
    val part = new java.io.File(scratch).listFiles()
      .find(f => f.getName.endsWith(".parquet") &&
        !f.getName.startsWith(".")).get
    val dst = dir.resolve(name)
    java.nio.file.Files.move(part.toPath, dst)
    dst.toFile.setLastModified(mtime)
    graft.util.Fs.deleteRecursively(scratch)
  }

  /** Driver-contract query: stage the events table into a temp dir, run the
    * hourly-window stream to completion in COMPLETE mode, return every
    * window. Complete-mode emission over a drained static source equals the
    * batch aggregation exactly — which is what gives this query a real SQL
    * oracle (same GROUP BY as q32 plus event_type) instead of the round-1
    * rows-only check, whose append-mode output depended on the final
    * watermark position. */
  def qStreamHourly(spark: SparkSession, dir: String): DataFrame =
    withStagedDir(java.nio.file.Paths.get(s"$dir/events.parquet"),
        "events.parquet") { tmp =>
      runToMemory(spark, hourlyWindows(readEvents(spark, tmp)),
        s"q34_stream_${System.nanoTime()}", OutputMode.Complete())
    }

  /** Driver query (q114): streaming TRENDING top-k — the "what's hot right
    * now" board every event pipeline ends up serving. The STREAMING side is
    * the watermarked hourly (window × event_type) count — the same bounded
    * state as q34; the per-window rank cut runs on the drained emission, a
    * |windows|·|event types| frame, not the event stream (rank inside the
    * streaming agg is unsupported and unnecessary: a production deployment
    * ranks per emitted window in foreachBatch the same way). Complete-mode
    * emission over a drained static source equals the batch aggregation,
    * so the (n DESC, event_type ASC) row_number cut is oracle-exact — the
    * tie-break makes the top-k a total order. */
  def qStreamTrending(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    withStagedDir(java.nio.file.Paths.get(s"$dir/events.parquet"),
        "events.parquet") { tmp =>
      val counts = readEvents(spark, tmp)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(unix_timestamp(col("window.start")).as("bucket"),
          col("event_type"), col("n"))
      val mat = runToMemory(spark, counts,
        s"q114_stream_${System.nanoTime()}", OutputMode.Complete())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("bucket"))
        .orderBy(col("n").desc, col("event_type").asc)
      mat.withColumn("rnk", row_number().over(w).cast("bigint"))
        .filter(col("rnk") <= k)
    }

  /** Driver query (q106): STREAMING session windows — the stateful
    * merging-session surface (q50's batch twin). Unlike tumbling/sliding
    * windows, session state MERGES: a new event can bridge two open
    * sessions into one, which exercises the session-window state store's
    * merge path rather than simple key accumulation. Complete-mode
    * emission over a drained static source equals the batch
    * `session_window` aggregation — and therefore q50's lag/cumulative-sum
    * SQL oracle — exactly (append mode would instead couple emission to
    * the final watermark position: sessions ending within the last gap of
    * stream time never close, an implementation-sensitive boundary no
    * cross-engine oracle should stand on). A production unbounded feed
    * uses append + watermark; the state-per-key is O(open sessions),
    * bounded by the gap. */
  def qStreamSessions(spark: SparkSession, dir: String): DataFrame =
    withStagedDir(java.nio.file.Paths.get(s"$dir/events.parquet"),
        "events.parquet") { tmp =>
      val sess = readEvents(spark, tmp)
        .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start"),
          col("n"))
      runToMemory(spark, sess,
        s"q106_stream_${System.nanoTime()}", OutputMode.Complete())
    }

  /** Driver query (q53): drain the events stream through the
    * mapGroupsWithState per-user counter in UPDATE mode, then take each
    * user's final state (counts and last-seen are monotone, so max over
    * emitted updates = final state regardless of batch count). The final
    * state of a drained stream equals the batch aggregation — the SQL
    * oracle — which is what makes the stateful surface oracle-checked. */
  def qStreamUserState(spark: SparkSession, dir: String): DataFrame =
    withStagedDir(java.nio.file.Paths.get(s"$dir/events.parquet"),
        "events.parquet") { tmp =>
      val updates = userRunningCounts(spark, readEvents(spark, tmp))
      val emitted = runToMemory(spark, updates.toDF(),
        s"q53_stream_${System.nanoTime()}", OutputMode.Update())
      emitted.groupBy(col("user_id"))
        .agg(max(col("count")).as("n_events"),
          max(col("lastTsMicros")).as("last_ts_us"))
    }

  /** Driver query (q55): cross-batch stateful streaming dedup. The staged
    * source directory holds the SAME events file twice; with
    * maxFilesPerTrigger=1 the two copies arrive in separate micro-batches,
    * so every event is a cross-batch duplicate and only the dedup state
    * store can suppress the second copy. The drained emission therefore
    * equals the distinct batch count — the SQL oracle. State here is exact
    * (one key per event_id, never expired); an unbounded production feed
    * would use dropDuplicatesWithinWatermark to expire state past the
    * late-data horizon at the cost of bounded-window semantics. */
  def qStreamDedup(spark: SparkSession, dir: String): DataFrame =
    withStagedDir(java.nio.file.Paths.get(s"$dir/events.parquet"),
        "events_a.parquet", "events_b.parquet") { tmp =>
      val deduped = readEvents(spark, tmp).dropDuplicates("event_id")
      val emitted = runToMemory(spark, deduped,
        s"q55_stream_${System.nanoTime()}")
      emitted.agg(
        count(lit(1)).as("n"),
        countDistinct(col("event_id")).as("n_ids"))
    }

  /** Driver query (q61): stream-static enrichment join — the standing-query
    * shape of a feature pipeline (events stream ⋈ slowly-changing profile
    * dim). The static side carries NO broadcast hint: the dim is O(distinct
    * users), and pinning it broadcast would OOM the driver at 10⁹ users.
    * Join strategy is chosen by the BATCH planner per micro-batch from
    * static size estimates — AQE does not replan micro-batch plans — and
    * here it builds the broadcast from the MICRO-BATCH side (verified:
    * BroadcastHashJoin BuildLeft in the executed micro-batch plan, asserted
    * in StreamingMultimodalSpec), which maxFilesPerTrigger keeps bounded; a
    * wide-estimate dim never gets pinned into executor memory. MEASURED
    * across dim cardinality ([[graft.tools.SkewProbe]] section q61, 2M-event
    * stream, 10k→4M-user parquet dims): below the broadcast threshold the
    * planner broadcasts the (then-small) dim BuildRight; at 1M+ users it
    * flips to BuildLeft from the bounded micro-batch side — never to a
    * per-batch sort-merge — with flat drain time, so there is no
    * cardinality at which the dim gets pinned OR the join degrades. The dim is
    * re-read per batch by contract (static-side updates between batches are
    * visible), which at scale argues for a compact, file-backed dim. The
    * drained COMPLETE-mode aggregate equals the batch join+group — the SQL
    * oracle (cohort below ≡ user_id % 7 since the dim covers every user). */
  def qStreamEnriched(spark: SparkSession, dir: String): DataFrame =
    withStagedDir(java.nio.file.Paths.get(s"$dir/events.parquet"),
        "events.parquet") { tmp =>
      val dim = graft.sources.Tables.events(spark, dir)
        .select(col("user_id")).distinct()
        .withColumn("cohort", pmod(col("user_id"), lit(7L)).cast("int"))
      val joined = readEvents(spark, tmp)
        .join(dim, Seq("user_id"))
        .groupBy(col("cohort"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      runToMemory(spark, joined,
        s"q61_stream_${System.nanoTime()}", OutputMode.Complete())
    }

  /** documents stream schema, inferred from the staged directory's parquet
    * footers like [[readEvents]] — a hardcoded schema breaks (or silently
    * misreads) when the driver's datagen changes a physical type, which is
    * exactly what happened to the events `ts` column. */
  private def inferredSchema(spark: SparkSession, dir: String): StructType =
    spark.read.parquet(dir).schema

  /** Driver query (q90): STREAMING incremental near-dup — the online-ingest
    * twin of q74. An incoming document stream (odd doc_ids) is MinHash-
    * banded per micro-batch with the per-row signature expression
    * ([[graft.operators.Dedup.minhashSignature]] — zero aggregation, so
    * banding needs no streaming state at all) and stream-static joined
    * against the PERSISTED corpus band table
    * ([[graft.operators.Dedup.stagedBandTable]], even doc_ids) — sketch
    * state on disk probed by every arriving batch, which is exactly how a
    * 100 TB ingest pipeline flags near-dups before a document ever lands
    * in the corpus. The only stateful operator is the complete-mode
    * (batch_doc, corpus_doc) pair aggregation (state = O(flagged pairs),
    * bounded by the near-dup rate); the drained pair set is summarized
    * batch-side into q74's exact (n_batch, n_flagged, n_pairs) shape —
    * the oracle IS q74's oracle, so stream and batch paths are pinned to
    * the same answer. */
  def qStreamNearDup(spark: SparkSession, dir: String): DataFrame =
    withStagedDir(java.nio.file.Paths.get(s"$dir/documents.parquet"),
        "documents.parquet") { tmp =>
    import graft.operators.Dedup
    val batch = spark.readStream
      .schema(inferredSchema(spark, tmp))
      .option("maxFilesPerTrigger", "1")
      .parquet(tmp)
      .filter(col("doc_id") % 2 === 1)
    // split the EXPENSIVE half (shingling + hashing, computed once per
    // row) from the seed fan-out across a repartition barrier: without
    // the barrier CollapseProject folds everything into the 8-band
    // explode and the 32-seed tree re-expands the string hashing per
    // consumer while its size knocks the stage out of codegen (measured
    // 25 s at sf0.1; with the split, ~2 s). Behind the exchange the
    // seed mins and band buckets are integer arithmetic over the
    // materialized bases array — safe to re-expand, no hashing inside.
    val bases = batch
      .select(col("doc_id"), Dedup.shingleBases(col("text")).as("bases"))
      .repartition(col("doc_id"))
    val batchBands = Dedup.bandTable(bases.select(col("doc_id"),
        Dedup.minhashSignatureFromBases(col("bases")).as("sig")))
      .withColumnRenamed("doc_id", "batch_doc")
    val corpusBands = Dedup.stagedBandTable(spark, dir)
      .filter(col("doc_id") % 2 === 0)
      .withColumnRenamed("doc_id", "corpus_doc")
    val pairs = batchBands
      .join(corpusBands, Seq("band", "bucket"))
      .groupBy(col("batch_doc"), col("corpus_doc"))
      .agg(count(lit(1)).as("band_hits"))
    val drained = runToMemory(spark, pairs,
      s"q90_stream_${System.nanoTime()}", OutputMode.Complete())
    graft.sources.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 2 === 1)
      .agg(count(lit(1)).as("n_batch"))
      .crossJoin(drained.agg(
        countDistinct(col("batch_doc")).as("n_flagged"),
        count(lit(1)).as("n_pairs")))
  }

  /** Driver query (q64): stream-STREAM join — click→purchase attribution
    * (purchases joined to a prior click by the same user within 10 minutes).
    * Both sides are independent file streams with watermarks, and the join
    * carries BOTH an equi key (user_id — the shuffle partitioning) and a
    * two-sided event-time band (the state bound: each side's join state is
    * evicted once the other side's watermark passes the band, so executor
    * state stays finite on unbounded feeds — the Structured Streaming
    * symmetric-hash-join contract). The drained append-mode pair stream is
    * aggregated batch-side; equality with the batch join SQL is the oracle. */
  def qStreamStreamJoin(spark: SparkSession, dir: String): DataFrame = {
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    withStagedDir(src, "events.parquet") { tmpC =>
      withStagedDir(src, "events.parquet") { tmpP =>
        val clicks = readEvents(spark, tmpC)
          .filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("c_id"), col("ts").as("c_ts"))
          .withWatermark("c_ts", "10 minutes")
        val purchases = readEvents(spark, tmpP)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"), col("ts").as("p_ts"))
          .withWatermark("p_ts", "10 minutes")
        val joined = purchases.join(clicks,
          purchases("user_id") === clicks("user_id") &&
            col("c_ts") <= col("p_ts") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES"))
        val emitted = runToMemory(spark,
          joined.select(col("p_id"), col("c_id")),
          s"q64_stream_${System.nanoTime()}")
        emitted.agg(
          count(lit(1)).as("n_pairs"),
          countDistinct(col("p_id")).as("n_attributed"))
      }
    }
  }

  /** Driver query (q128): STREAMING FILE SINK + CHECKPOINT idempotence —
    * the durable half of the streaming surface (every other stream query
    * drains to the memory sink; production pipelines land parquet).
    *
    * The stream filters purchases into a parquet sink with a checkpoint,
    * drained with AvailableNow — then drains a SECOND time against the
    * same checkpoint. The file-source log in the checkpoint marks every
    * input processed and the sink's `_spark_metadata` commit log records
    * exactly the files batch 0 wrote, so the second drain commits NOTHING
    * — the retry/restart contract that makes a streaming ingest
    * exactly-once end to end. The read-back goes through the sink's
    * metadata log (skipping any uncommitted stragglers), and the
    * aggregate equaling the plain batch aggregation — the SQL oracle — is
    * the proof: a duplicated batch would double n against n_ids.
    * Scratch sink/checkpoint dirs are deleted in a finally (the
    * withStagedDir contract); the result detaches via localCheckpoint
    * first. */
  def qStreamFileSink(spark: SparkSession, dir: String): DataFrame =
    withStagedDir(java.nio.file.Paths.get(s"$dir/events.parquet"),
        "events.parquet") { tmp =>
      val out = java.nio.file.Files.createTempDirectory("graft_sink")
      val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt")
      try {
        def drain(): Unit = {
          val q = readEvents(spark, tmp)
            .filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("value"))
            .writeStream.format("parquet")
            .option("path", out.toString)
            .option("checkpointLocation", ckpt.toString)
            .trigger(Trigger.AvailableNow())
            .start()
          q.awaitTermination()
        }
        drain()
        drain() // restart against the same checkpoint: must commit nothing
        spark.read.parquet(out.toString)
          .agg(count(lit(1)).as("n"),
            countDistinct(col("event_id")).as("n_ids"),
            sum(col("value").cast("decimal(18,2)")).cast("double")
              .as("sum_value"))
          .localCheckpoint()
      } finally {
        org.apache.commons.io.FileUtils.deleteDirectory(out.toFile)
        org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
      }
    }

  /** Run a streaming frame to completion against a static directory via the
    * memory sink; returns the materialized result table. Local smoke path —
    * production would use a real sink + checkpointLocation.
    *
    * `statePartitions` sizes the stream's shuffle — and therefore its STATE
    * STORE count, which is fixed per stateful operator at first start and
    * paid per micro-batch. A drained local test stream carries thousands of
    * keys, not billions; 8 stores beat 32 here, and a production deployment
    * sizes this to sustained rate (it cannot be changed after the first
    * checkpoint without rebuilding state). Scoped set-and-restore: the
    * session value is read at plan time inside `start()`. */
  def runToMemory(spark: SparkSession, streamed: DataFrame, name: String,
      mode: OutputMode = OutputMode.Append,
      statePartitions: Int = 8): DataFrame = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    // restore only after the drain: micro-batches plan asynchronously after
    // start(), each reading the session value
    try {
      spark.conf.set("spark.sql.shuffle.partitions", statePartitions)
      val q: StreamingQuery = streamed.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    // detach the result from the memory sink: checkpoint the rows, then drop
    // the temp view so the sink (which pins the full result set in driver
    // memory) is collectable instead of accumulating one table per call
    val out = spark.table(name).localCheckpoint()
    spark.catalog.dropTempView(name)
    out
  }

  /** Driver query (q145): STREAMING span-level decontamination — q144's
    * online-ingest twin, and the span-grained sibling of q90's MinHash
    * probe: "is this arriving document a PARTIAL COPY of the frozen
    * corpus?" — the check an ingest pipeline runs before a document ever
    * lands in training data (whole-doc MinHash misses a lifted paragraph
    * inside an otherwise-novel page).
    *
    * Shape: the corpus side (even doc_ids) builds its df-capped gram
    * table ONCE batch-side (the cap is computed from corpus frequencies
    * only — an online batch can never know global df); each arriving
    * micro-batch (odd doc_ids) grams partition-locally (stateless
    * expressions) and STREAM-STATIC joins the corpus grams. The only
    * stateful operator is the complete-mode (batch_doc, corpus_doc,
    * diagonal) hit count — state O(co-gram diagonals), bounded by the
    * rare-gram hit rate, never O(corpus). Contiguity (q144's
    * pos − row_number run) needs ordered positions, which a streaming agg
    * can't see, so the online statistic is the NECESSARY condition: ≥ 5
    * hits on one diagonal is what a ≥ 12-token contiguous span must
    * produce — flagged pairs go to q144 for exact span confirmation.
    * Drained rows are rolled up per pair batch-side; the DuckDB oracle
    * rebuilds the identical integers. */
  def qStreamSpanContamination(spark: SparkSession, dir: String,
      g: Int = 8, dfCap: Int = 16, minDiagHits: Int = 5): DataFrame =
    withStagedDir(java.nio.file.Paths.get(s"$dir/documents.parquet"),
        "documents.parquet") { tmp =>
      import graft.operators.Dedup
      val corpusGrams = Dedup.gramTable(
        graft.sources.Tables.load(spark, dir, "documents")
          .filter(col("doc_id") % 2 === 0), g)
        .select(col("doc_id").as("corpus_doc"), col("pos").as("pc"), col("h"))
      val rare = corpusGrams.groupBy(col("h"))
        .agg(countDistinct(col("corpus_doc")).as("dfd"))
        .filter(col("dfd") <= dfCap).select(col("h"))
      // the static probe side materializes once; every micro-batch joins it
      val corpus = corpusGrams.join(rare, Seq("h"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      corpus.count()
      val batch = spark.readStream
        .schema(inferredSchema(spark, tmp))
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp)
        .filter(col("doc_id") % 2 === 1)
      val hits = Dedup.gramTable(batch, g)
        .select(col("doc_id").as("batch_doc"), col("pos").as("pb"), col("h"))
        .join(corpus, Seq("h"))
        .groupBy(col("batch_doc"), col("corpus_doc"),
          (col("pb") - col("pc")).as("diag"))
        .agg(count(lit(1)).as("hits"))
      // GUARD (gate-harness plumbing, not the production sink): the
      // complete-mode memory sink materializes every (batch_doc,
      // corpus_doc, diag) row in driver memory. That bound is the
      // rare-gram hit rate — fine for the gated corpora, but
      // DATA-DEPENDENT: an adversarial batch sharing many df≤cap grams
      // with the corpus inflates it toward |batch grams| · dfCap. A
      // production deployment keeps this aggregation in update mode
      // feeding a keyed store/sink (the q128 idempotent-sink shape), so
      // no corpus-shaped state ever lands on the driver.
      val drained = runToMemory(spark, hits,
        s"q145_stream_${System.nanoTime()}", OutputMode.Complete())
      corpus.unpersist()
      drained.groupBy(col("batch_doc"), col("corpus_doc"))
        .agg(max(col("hits")).as("max_diag_hits"),
          count(lit(1)).as("n_diags"),
          sum(col("hits")).as("n_hits"))
        .filter(col("max_diag_hits") >= minDiagHits)
    }

  /** q156: STREAMING QUALITY GATE — q152's Gopher rules applied at
    * INGEST time: every arriving micro-batch of documents (odd doc_ids;
    * the even half is the already-curated corpus) is scored by the
    * stateless per-row rule projection and rolled up per source, the
    * accept/reject dashboard an online ingest pipeline keeps. The
    * span-decontamination twin is q145; this is the quality half of the
    * same ingest gate.
    *
    * Scale shape: scoring is STATELESS (pure row-local Catalyst — the
    * exact projection the batch report runs, shared code), so the only
    * stateful operator is the |sources|-row complete-mode rollup —
    * state O(sources), never O(stream). The identical integers come out
    * of the batch oracle restricted to the odd half. */
  def qStreamQualityGate(spark: SparkSession, dir: String): DataFrame =
    withStagedDir(java.nio.file.Paths.get(s"$dir/documents.parquet"),
        "documents.parquet") { tmp =>
      val batch = spark.readStream
        .schema(inferredSchema(spark, tmp))
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp)
        .filter(col("doc_id") % 2 === 1)
      val agg = graft.operators.Curation.gopherRollup(
        graft.operators.Curation.gopherScore(batch))
      runToMemory(spark, agg,
        s"q156_stream_${System.nanoTime()}", OutputMode.Complete())
    }

  /** q201: STREAMING DOMAIN-QUALITY MONITOR — q197's registered-domain
    * rollup at INGEST time, the per-publisher dashboard a Common-Crawl
    * pipeline watches as batches land (q156 is the per-source quality
    * half; this is the per-DOMAIN half, after URL parse + PSL
    * resolution). Scoring is the SAME row-local projection the batch
    * report runs ([[graft.operators.Curation.domainSignals]] — shared
    * code, the q152/q156 pattern), so the only stateful operator is the
    * |domains|-row complete-mode rollup: state O(domains), never
    * O(stream). The rollup is the streaming-legal variant (no exact
    * countDistinct — not incrementally mergeable; the streaming
    * distinct-count job is q163's HLL monitor), all kept aggregates
    * additive, so the drain is batching-insensitive and the DuckDB
    * oracle is the batch q197 SQL restricted to the arriving (odd
    * doc_id) half, minus n_hosts. */
  def qStreamDomainRollup(spark: SparkSession, dir: String): DataFrame =
    withStagedDir(java.nio.file.Paths.get(s"$dir/documents.parquet"),
        "documents.parquet") { tmp =>
      val batch = spark.readStream
        .schema(inferredSchema(spark, tmp))
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp)
        .filter(col("doc_id") % 2 === 1)
      val agg = graft.operators.Curation.domainRollupStreaming(
        graft.operators.Curation.domainSignals(batch))
      runToMemory(spark, agg,
        s"q201_stream_${System.nanoTime()}", OutputMode.Complete())
    }

  /** q163: STREAMING CARDINALITY MONITOR — q160's mergeable HLL registers
    * maintained as standing streaming state. This is the sketch/streaming
    * bridge that makes HLL the production distinct-count monitor: the
    * register update is `max(rho)` per (group, bucket), and max is
    * exactly the aggregation Structured Streaming merges incrementally
    * across micro-batches — state is O(groups × 64) registers, never
    * O(keys), and no exact-distinct shuffle ever happens on the stream
    * (COUNT DISTINCT is unsupported in streaming aggregation for
    * precisely the reason sketches exist). Two staged files force the
    * register state to merge across micro-batches; the drained
    * complete-mode register table then rolls up through the SAME
    * estimate arithmetic as q160 — and because max is order- and
    * batching-insensitive, the final registers are bit-identical to the
    * batch sketch, which is what the shared-contract oracle pins. */
  def qStreamHll(spark: SparkSession, dir: String): DataFrame =
    withStagedDir(java.nio.file.Paths.get(s"$dir/events.parquet"),
        "events_a.parquet", "events_b.parquet") { tmp =>
      val regs = graft.operators.Sketches.hllBucketRho(
          readEvents(spark, tmp).select(col("event_type"), col("user_id")),
          col("user_id"))
        .groupBy(col("event_type"), col("b"))
        .agg(max(col("rho")).as("r"))
      val emitted = runToMemory(spark, regs,
        s"q163_stream_${System.nanoTime()}", OutputMode.Complete())
      graft.operators.Sketches.hllEstimates(
        emitted.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_buckets"),
            sum(col("r")).as("register_sum"),
            sum(col("r") * (col("b") + 1)).as("register_ck"),
            expr("sum(shiftleft(CAST(1 AS BIGINT), CAST(53 - r AS INT)))")
              .as("sp")))
    }

  /** q205: STREAMING QUANTILE MONITOR — q203's deterministic hash-leveled
    * quantile sketch maintained as standing streaming state, the q163≡q160
    * bridge for percentiles: exact per-group quantiles are not
    * incrementally computable (the rank of every value moves with each
    * arrival — the order-statistic analog of streaming COUNT DISTINCT),
    * but the sketch BUFFER is a bona fide mergeable aggregate, so
    * Structured Streaming carries it as O(groups × cap) state and merges
    * micro-batch partials through the same `merge` the batch plan uses.
    * Because that merge is a pure function of the data multiset (hash
    * coins, not random coins — see [[graft.functions.QuantileSketch]]),
    * the drained registers and estimator are BIT-IDENTICAL to batch
    * q203, pinned by the shared-contract oracle (q203's SQL minus the
    * exact p50/p90 audit columns streaming legally cannot produce — the
    * q201 countDistinct discipline). n_total rides along as an additive
    * count. Two staged files force a genuine cross-batch state merge. */
  def qStreamQuantiles(spark: SparkSession, dir: String): DataFrame = {
    // DISJOINT mtime-ordered halves (the q183 staging, not q163's
    // duplicated file: HLL registers are max-idempotent so a replayed
    // row is invisible there, but sketch counts are ADDITIVE — the
    // staging must model ingest, where each event arrives once)
    val tmp = java.nio.file.Files.createTempDirectory("graft_q205")
    try {
      val ev = graft.sources.Tables.events(spark, dir)
        .select(col("event_id"), col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("v"))
      val t0 = System.currentTimeMillis() - 120000L
      stageFiles(ev, tmp,
        ("a.parquet", col("event_id") % 2 === 0, t0),
        ("b.parquet", col("event_id") % 2 === 1, t0 + 60000L))
      val batch = spark.readStream
        .schema(inferredSchema(spark, tmp.toString))
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp.toString)
      val sk = batch.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_total"),
          graft.functions.QuantileSketch.sketch(col("v")).as("sk"))
      runToMemory(spark, sk,
        s"q205_stream_${System.nanoTime()}", OutputMode.Complete())
        .select(col("event_type"), col("n_total"),
          col("sk.level").as("level"), col("sk.n_sample").as("n_sample"),
          col("sk.sample_vck").as("sample_vck"),
          col("sk.n_scaled").as("n_scaled"),
          col("sk.est_p50").as("est_p50"), col("sk.est_p90").as("est_p90"))
    } finally graft.util.Fs.deleteRecursively(tmp.toString)
  }

  /** q206: STREAMING CDC MERGE — q204's three-clause merge driven from a
    * CDC STREAM, the way a lakehouse actually ingests change data: each
    * micro-batch is applied to the partitioned warehouse inside
    * foreachBatch through the SAME [[graft.operators.Relational
    * .mergeApply]] copy-on-write pass the batch query uses (partition-
    * pruned full-outer, dynamic partition overwrite — foreachBatch exists
    * precisely because MERGE is not an incremental aggregation; the
    * sink-side apply is the standard pattern). The CDC set is staged as
    * two KEY-DISJOINT mtime-ordered halves, so sequential application is
    * algebraically equal to the single-shot batch merge (clause
    * application is key-local; an earlier batch's inserts ride through a
    * later batch's rewrite as unchanged rows) — which is what lets the
    * drained end-state share q204's oracle VERBATIM: same per-lang
    * clause totals (summed across batches), same n_after /
    * sum_chars_after read back from the final rewritten layout, same
    * is_touched set. */
  def qStreamCdcMerge(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_q206")
    try {
      val docs = graft.sources.Tables.load(spark, dir, "documents")
      val wh = s"$tmp/wh"
      docs.write.partitionBy("lang").parquet(wh)
      val src = graft.operators.Relational.cdcSource(docs)
      val cdcDir = tmp.resolve("cdc")
      java.nio.file.Files.createDirectory(cdcDir)
      val t0 = System.currentTimeMillis() - 120000L
      stageFiles(src, cdcDir,
        ("a.parquet", pmod(col("doc_id"), lit(2)) === 0, t0),
        ("b.parquet", pmod(col("doc_id"), lit(2)) === 1, t0 + 60000L))
      // pre-ingest state, materialized before any batch rewrites files
      val before = graft.operators.Relational.mergeBeforeState(spark, wh)
      val batches = spark.readStream
        .schema(inferredSchema(spark, cdcDir.toString))
        .option("maxFilesPerTrigger", "1")
        .parquet(cdcDir.toString)
      // cumulative clause ledger + touched-set union, filled by the sink
      // as batches apply. Each batch runs ONLY the write+tally core —
      // the before/after warehouse scans belong to the single report at
      // the end, not to every micro-batch.
      val ledger = scala.collection.mutable.ArrayBuffer
        .empty[(String, Long, Long, Long)]
      val touchedAll = scala.collection.mutable.SortedSet.empty[String]
      val q = batches.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[
            org.apache.spark.sql.Row], _: Long) =>
          val (touched, tallies) = graft.operators.Relational
            .mergeApplyCore(spark, wh, batch.select(col("doc_id"),
              col("s_lang"), col("op")))
          ledger.synchronized {
            touchedAll ++= touched
            ledger ++= tallies
          }
          ()
        }
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val summed = ledger.groupBy(_._1).map { case (lang, ts) =>
        (lang, ts.map(_._2).sum, ts.map(_._3).sum, ts.map(_._4).sum)
      }.toSeq
      graft.operators.Relational
        .mergeReport(spark, wh, before, touchedAll.toSeq, summed)
        .localCheckpoint()
    } finally graft.util.Fs.deleteRecursively(tmp.toString)
  }

  /** q183: STREAMING MIXTURE MATERIALIZATION — q150's epoch-weighted
    * shard manifest maintained under INCREMENTAL ingest, the q163≡q160
    * bridge for the mixture path: a pre-training data loader that shards
    * as documents ARRIVE must converge on exactly the manifest a batch
    * rebuild would produce, or its recipe accounting is unauditable.
    * Everything before the rollup is the SHARED stateless projection
    * ([[graft.operators.Sketches.mixtureShardRollup]] — copies, fan-out,
    * copy-aware shard hash are all row-local, so they stream unchanged);
    * the only state is the |shards|-row complete-mode rollup, and because
    * count/sum are order- and batching-insensitive the drained manifest is
    * BIT-IDENTICAL to batch q150 — the shared-contract oracle pins it.
    * The corpus is staged as two DISJOINT mtime-ordered halves so the
    * shard state genuinely merges across micro-batches (one staged file
    * would prove only single-batch equivalence). */
  def qStreamMixtureShards(spark: SparkSession, dir: String,
      nShards: Int = 16): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_mix")
    try {
      val docs = graft.sources.Tables.load(spark, dir, "documents")
        .select(col("source"), col("doc_id"), col("text"))
      val t0 = System.currentTimeMillis() - 120000L
      stageFiles(docs, tmp,
        ("a.parquet", col("doc_id") % 2 === 0, t0),
        ("b.parquet", col("doc_id") % 2 === 1, t0 + 60000L))
      val batch = spark.readStream
        .schema(inferredSchema(spark, tmp.toString))
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp.toString)
      val agg = graft.operators.Sketches.mixtureShardRollup(batch, nShards)
      runToMemory(spark, agg,
        s"q183_stream_${System.nanoTime()}", OutputMode.Complete())
    } finally graft.util.Fs.deleteRecursively(tmp.toString)
  }

  /** q187: STREAMING DRIFT MONITOR — q184's standing-state sibling: the
    * exact KS needs the full merged ECDF (unbounded state), so the
    * production stream monitor keeps BINNED counts instead — state
    * O(types × bins), never O(stream) — and reports the binned
    * total-variation distance of live traffic against a frozen reference
    * histogram. The reference (the early half) is computed batch-side
    * once; the live half arrives as two mtime-ordered micro-batches whose
    * (type, bin) counts merge incrementally in complete mode; the drained
    * histogram reconciles against the reference with the integer
    * cross-multiplied TV: tv_ppm = ⌊10⁶·Σ|c_ref·n_live − c_live·n_ref| /
    * (2·n_ref·n_live)⌋ — count/sum are batching-insensitive, so the
    * drained counts (and hence the ppm) equal a batch rebuild exactly,
    * which is what gives this stream a plain SQL oracle. */
  def qStreamDrift(spark: SparkSession, dir: String,
      cut: String = "2024-01-16 00:00:00",
      cut2: String = "2024-01-24 00:00:00"): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_drift")
    try {
      def bin(v: org.apache.spark.sql.Column) =
        least(floor(v / 10.0), lit(31.0)).cast("bigint")
      val ev = graft.sources.Tables.events(spark, dir)
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      val t0 = System.currentTimeMillis() - 120000L
      stageFiles(ev, tmp,
        ("a.parquet", col("ts") >= cut && col("ts") < cut2, t0),
        ("b.parquet", col("ts") >= cut2, t0 + 60000L))
      val live = readEvents(spark, tmp.toString)
        .select(col("event_type"), bin(col("value")).as("bin"))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("c2"))
      val drained = runToMemory(spark, live,
        s"q187_stream_${System.nanoTime()}", OutputMode.Complete())
      val ref = ev.filter(col("ts") < cut)
        .select(col("event_type"), bin(col("value")).as("bin"))
        .groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("c1"))
      val joined = ref.join(drained, Seq("event_type", "bin"), "full")
        .select(col("event_type"),
          coalesce(col("c1"), lit(0L)).as("c1"),
          coalesce(col("c2"), lit(0L)).as("c2"))
      val tot = Window.partitionBy(col("event_type"))
      joined
        .select(col("event_type"), col("c1"), col("c2"),
          sum(col("c1")).over(tot).as("n1"),
          sum(col("c2")).over(tot).as("n2"))
        .groupBy(col("event_type"))
        .agg(max(col("n1")).as("n_ref"), max(col("n2")).as("n_live"),
          sum(abs(col("c1").cast("decimal(38,0)") * col("n2") -
            col("c2").cast("decimal(38,0)") * col("n1"))).as("num"))
        .filter(col("n_ref") > 0 && col("n_live") > 0)
        .select(col("event_type"), col("n_ref"), col("n_live"),
          expr("CAST((num * 1000000) DIV (2 * CAST(n_ref AS DECIMAL(38,0))" +
            " * CAST(n_live AS DECIMAL(38,0))) AS BIGINT)").as("tv_ppm"))
        .withColumn("is_drift", col("tv_ppm") > 100000L)
    } finally graft.util.Fs.deleteRecursively(tmp.toString)
  }

  /** q164: WATERMARK LATE-DATA ACCOUNTING — the semantics every streaming
    * aggregation at scale lives or dies by, pinned end to end: which late
    * rows are DROPPED, which windows EMIT, and with what counts. The
    * stream is staged as three files with explicitly ordered modification
    * times (FileStreamSource consumes oldest-first, one per trigger;
    * unlike q55/q163 this operator is ORDER-SENSITIVE, so the ordering is
    * forced, not assumed): A = the bulk history minus a held-back late
    * pack, B = the newest tail (advances the watermark and finalizes the
    * history's hourly windows with A-only counts), C = the late pack
    * arriving AFTER finalization.
    *
    * The batch sequence exercises Spark's TWO-watermark contract,
    * probe-verified on this exact staging (tools/LateProbe): the late-data
    * filter of batch N uses the watermark that was current during batch
    * N−1, while state eviction at the end of batch N uses batch N's own —
    * so B is never late (its filter watermark is still 0), C rows into
    * windows finalized by wm_A = max(ts_A) − delay are dropped
    * (numRowsDroppedByWatermark = their exact count), C rows into the
    * still-open boundary window merge and emit, and windows past
    * wm_final = max(ts) − delay never emit (append mode). Every
    * threshold is a pure function of the data (per-file max event
    * times), so the DuckDB oracle reconstructs the exact emitted set —
    * no golden pinning, and no threshold ever lands on a whole-hour
    * window edge (the maxima carry random microseconds). */
  def qStreamLateness(spark: SparkSession, dir: String): DataFrame = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_late")
    try {
      val ev = graft.sources.Tables.events(spark, dir)
        .select(col("event_id"), col("ts"))
      val cut = "2024-01-30 12:00:00"
      val t0 = System.currentTimeMillis() - 180000L
      stageFiles(ev, tmp,
        ("a.parquet", col("ts") < cut && col("event_id") % 11 =!= 0, t0),
        ("b.parquet", col("ts") >= cut, t0 + 60000L),
        ("c.parquet", col("ts") < cut && col("event_id") % 11 === 0,
          t0 + 120000L))
      val agg = readEvents(spark, tmp.toString)
        .withWatermark("ts", "30 minutes")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(unix_micros(col("window.start")).as("w_start"), col("n"))
      runToMemory(spark, agg, s"q164_stream_${System.nanoTime()}")
    } finally graft.util.Fs.deleteRecursively(tmp.toString)
  }

  case class TimeoutState(count: Long, lastUs: Long)
  case class TimedOutUser(user_id: Long, n_events: Long, last_us: Long)

  /** q173: EVENT-TIME-TIMEOUT STATE REAPING — the corner q53's scaladoc
    * defers: a custom flatMapGroupsWithState machine whose per-user
    * state is closed by the WATERMARK, not by new data. Each data call
    * updates (count, last event time) and arms an event-time timeout at
    * last + gap, emitting nothing; the timeout callback emits the user's
    * final summary exactly once and removes the state — the
    * sessionize-by-inactivity pattern that keeps executor state bounded
    * by ACTIVE keys on an unbounded feed (idle keys are reaped, which
    * NoTimeout q53 never does). Two mtime-ordered files (bulk, then the
    * tail that advances the watermark) drive the machine through both
    * firing regimes — users reaped mid-stream after the first watermark
    * advance, and users reaped by the final watermark — while users
    * still active near stream end hold their state and never emit. Since
    * data calls precede timeout processing within a batch, an emitted
    * summary always carries the user's COMPLETE count, so the oracle is
    * the per-user aggregate filtered by last + gap < final watermark
    * (millisecond arithmetic, matching GroupState's timeout clock). */
  def qStreamTimeout(spark: SparkSession, dir: String,
      gapMs: Long = 7200000L): DataFrame = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_timeout")
    try {
      val ev = graft.sources.Tables.events(spark, dir)
        .select(col("user_id"), col("ts"))
      val cut = "2024-01-30 12:00:00"
      val t0 = System.currentTimeMillis() - 120000L
      stageFiles(ev, tmp,
        ("a.parquet", col("ts") < cut, t0),
        ("b.parquet", col("ts") >= cut, t0 + 60000L))
      val reaped = readEvents(spark, tmp.toString)
        .withWatermark("ts", "30 minutes")
        .selectExpr("user_id", "ts", "unix_micros(ts) AS tsm")
        .as[(Long, java.sql.Timestamp, Long)]
        .groupByKey(_._1)
        .flatMapGroupsWithState(OutputMode.Append(),
          GroupStateTimeout.EventTimeTimeout) {
          (uid: Long, rows: Iterator[(Long, java.sql.Timestamp, Long)],
           state: GroupState[TimeoutState]) =>
            if (state.hasTimedOut) {
              val s = state.get
              state.remove()
              Iterator(TimedOutUser(uid, s.count, s.lastUs))
            } else {
              val prev = state.getOption.getOrElse(TimeoutState(0L, 0L))
              var c = prev.count; var last = prev.lastUs
              rows.foreach { r => c += 1; if (r._3 > last) last = r._3 }
              state.update(TimeoutState(c, last))
              state.setTimeoutTimestamp(last / 1000L + gapMs)
              Iterator.empty
            }
        }
      runToMemory(spark, reaped.toDF(),
        s"q173_stream_${System.nanoTime()}")
    } finally graft.util.Fs.deleteRecursively(tmp.toString)
  }

  /** q165: stream-stream LEFT OUTER attribution — q64's join with the
    * semantics production attribution actually needs: purchases WITHOUT a
    * qualifying prior click must surface too (the unconverted-spend
    * signal), and in a stream they can only surface once no future click
    * could still match. Structured Streaming emits the null-padded row
    * when the left row's state expires — gated by the GLOBAL watermark,
    * the minimum of both sides' (max event time − delay), measured
    * against the drained stream at both gated sfs: a future click must
    * satisfy p_ts − 10min ≤ c_ts ≤ p_ts, but eviction waits for the
    * joint watermark to pass p_ts, so "unmatched" is a definitive
    * verdict, not a still-waiting row. Matched pairs emit immediately
    * (inner results are never watermark-gated). Purchases newer than the
    * final global watermark stay in state and never emit — the honest
    * answer for rows whose attribution window is still open. All
    * thresholds are data-derived (per-side max event times), so the
    * DuckDB oracle reconstructs the exact matched/expired-unmatched
    * split with no golden pinning. */
  def qStreamOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    withStagedDir(src, "events.parquet") { tmpC =>
      withStagedDir(src, "events.parquet") { tmpP =>
        val clicks = readEvents(spark, tmpC)
          .filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id").as("c_id"),
            col("ts").as("c_ts"))
          .withWatermark("c_ts", "10 minutes")
        val purchases = readEvents(spark, tmpP)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("p_id"),
            col("ts").as("p_ts"))
          .withWatermark("p_ts", "10 minutes")
        val joined = purchases.join(clicks,
          purchases("user_id") === clicks("user_id") &&
            col("c_ts") <= col("p_ts") &&
            col("c_ts") >= col("p_ts") - expr("INTERVAL 10 MINUTES"),
          "leftOuter")
        val emitted = runToMemory(spark,
          joined.select(col("p_id"), col("c_id")),
          s"q165_stream_${System.nanoTime()}")
        emitted.agg(
          sum(when(col("c_id").isNotNull, 1L).otherwise(0L)).as("n_pairs"),
          countDistinct(when(col("c_id").isNotNull, col("p_id")))
            .as("n_attributed"),
          sum(when(col("c_id").isNull, 1L).otherwise(0L))
            .as("n_expired_unmatched"))
      }
    }
  }

  /** q212: STREAMING KMV AUDIENCE MONITOR — q208's bottom-k distinct
    * sketch maintained as standing streaming state, the third member of
    * the q163≡q160 / q205≡q203 bridge family: exact COUNT DISTINCT is
    * unsupported in streaming aggregation (state would be the key set),
    * but the KMV buffer is a bona fide mergeable typed aggregate —
    * Structured Streaming carries one ≤k-long sorted array per year and
    * folds each micro-batch through the SAME
    * [[graft.functions.KmvAggregator]] merge the batch plan uses.
    * Because the state is "the k smallest distinct hashes" — a
    * set-function of the multiset — replayed rows and batch boundaries
    * are invisible, so the drained registers are BIT-IDENTICAL to batch
    * q208's, pinned by the shared-contract oracle (q208's SQL minus the
    * exact-distinct audit column streaming legally cannot produce — the
    * q201/q205 discipline). Staging: the orders file twice (q163's
    * duplicated-file staging — KMV, like register-max, must shrug off
    * at-least-once delivery). */
  def qStreamKmv(spark: SparkSession, dir: String): DataFrame =
    withStagedDir(java.nio.file.Paths.get(s"$dir/orders.parquet"),
        "orders_a.parquet", "orders_b.parquet") { tmp =>
      import spark.implicits._
      val k = 64
      val batch = spark.readStream
        .schema(inferredSchema(spark, tmp))
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp)
        .select(year(col("o_orderdate")).as("y"),
          graft.operators.Sketches.hash52(col("o_custkey")).as("h"))
      val sk = batch.as[(Int, Long)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(new graft.functions.KmvAggregator(k).toColumn.name("sk"))
        .toDF("y", "sk")
      // state read through the SAME expressions as batch q208 —
      // bit-identity is the twin's contract
      graft.operators.Sketches.kmvStateColumns(
        runToMemory(spark, sk,
          s"q212_stream_${System.nanoTime()}", OutputMode.Complete()))
    }

  /** q215: STREAMING HEAVY HITTERS — q210's two-pass Misra–Gries with
    * the CANDIDATE phase run as standing streaming state: the ≤c-entry
    * summary is a mergeable typed aggregate, so Structured Streaming
    * folds each arriving micro-batch through the same Agarwal-et-al
    * merge the batch plan uses, with state O(c) on an unbounded token
    * feed (the frequent-items analog of the q163/q205/q212 bridge —
    * exact streaming top-k would need the vocabulary as state). The
    * drained summary is merge-order-dependent, but the MG coverage
    * guarantee (candidates ⊇ every item above n/(c+1)) holds for ANY
    * merge tree INCLUDING micro-batch sequencing — so the post-drain
    * exact recount over the settled corpus lands on exactly the batch
    * q210 output, and the query shares q210's census oracle VERBATIM
    * (the q206 discipline: the stream drives, the end state answers to
    * the batch contract). Staged as two doc-disjoint mtime-ordered
    * halves — MG counters are ADDITIVE, so the staging must model
    * ingest (q205's rationale), not q163's duplicated file. */
  def qStreamHeavyHitters(spark: SparkSession, dir: String,
      c: Int = 64): DataFrame = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_q215")
    try {
      val docs = graft.sources.Tables.load(spark, dir, "documents")
        .select(col("doc_id"), col("text"))
      val t0 = System.currentTimeMillis() - 120000L
      stageFiles(docs, tmp,
        ("a.parquet", col("doc_id") % 2 === 0, t0),
        ("b.parquet", col("doc_id") % 2 === 1, t0 + 60000L))
      val words = spark.readStream
        .schema(inferredSchema(spark, tmp.toString))
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp.toString)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      // the corpus total rides the streaming summary as a second typed
      // aggregate (additive, so the drained value is the full-feed count)
      val mg = words.as[String].groupByKey(_ => 0)
        .agg(new graft.functions.FrequentItemsAggregator(c).toColumn
            .name("mg"),
          new graft.operators.Sketches.CountAggregator[String].toColumn
            .name("n"))
        .toDF("k", "mg", "n")
      val drained = runToMemory(spark, mg,
          s"q215_stream_${System.nanoTime()}", OutputMode.Complete())
        .collect().headOption
      val cands = drained.map(_.getMap[String, Long](1).keys.toSeq)
        .getOrElse(Seq.empty)
      val nTotal = drained.map(_.getLong(2)).getOrElse(0L)
      // exact recount over the settled corpus — q210's pass 2, shared code
      graft.operators.Sketches.heavyHitterRecount(spark, dir, cands,
        nTotal, c)
    } finally graft.util.Fs.deleteRecursively(tmp.toString)
  }

  /** q218: STREAMING WEIGHTED SAMPLING — batch q175's Efraimidis–
    * Spirakis A-ES sample maintained as standing streaming state, the
    * fourth member of the q163≡q160 / q205≡q203 / q212≡q208 bridge
    * family: a length-weighted without-replacement sample over an
    * unbounded document feed, with state = the k smallest (key_micro,
    * doc_id) pairs — exactly a KMV-shaped bottom-k, because A-ES's
    * whole reduction IS "weighted sampling = bottom-k of −ln(u)/w".
    * Each micro-batch folds through [[graft.functions
    * .AesBottomKAggregator]]; keys come from [[graft.operators.Sketches
    * .aesKeys]], the IDENTICAL expression tree batch q175 sorts by, and
    * the state is a set-function of the multiset (the key is a pure
    * hash of the row), so replayed rows and batch boundaries are
    * invisible — the drained sample is BIT-IDENTICAL to batch q175's
    * TakeOrderedAndProject (parity-asserted in SketchSetOpsSpec) and
    * the query shares q175's oracle VERBATIM. Staging: the documents
    * file twice (q163's duplicated-file staging — a bottom-k of pure
    * row functions must shrug off at-least-once delivery). */
  def qStreamWeightedSample(spark: SparkSession, dir: String,
      k: Int = 20): DataFrame =
    withStagedDir(java.nio.file.Paths.get(s"$dir/documents.parquet"),
        "docs_a.parquet", "docs_b.parquet") { tmp =>
      import spark.implicits._
      val keys = graft.operators.Sketches.aesKeys(
        spark.readStream
          .schema(inferredSchema(spark, tmp))
          .option("maxFilesPerTrigger", "1")
          .parquet(tmp))
      val sk = keys.select(col("key_micro"), col("doc_id"))
        .as[(Double, Long)]
        .groupByKey(_ => 0)
        .agg(new graft.functions.AesBottomKAggregator(k).toColumn
          .name("sample"))
        .toDF("g", "sample")
      runToMemory(spark, sk, s"q218_stream_${System.nanoTime()}",
          OutputMode.Complete())
        .select(explode(col("sample")).as("p"))
        .select(col("p._2").as("doc_id"), col("p._1").as("key_micro"))
        .orderBy(col("key_micro").asc, col("doc_id").asc)
    }
}
