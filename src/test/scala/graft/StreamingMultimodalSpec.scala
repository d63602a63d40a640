package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.streaming.EventStreams

class StreamingMultimodalSpec extends AnyFunSuite {
  import TestSpark._

  /** File-source streams need a directory; testdata tables are single
    * files — stage events.parquet into a temp dir once. */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming hourly windows equal the batch q32 aggregation") {
    val streamed = EventStreams.hourlyWindows(
      EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.runToMemory(spark, streamed, "hourly_test")
      .groupBy("bucket").agg(sum("n").as("n"),
        sum("sum_value").as("sum_value"))
    val expected = operators.Relational.q32EventWindows(spark, sf)
    // append mode emits only windows finalized by the watermark — the last
    // open window(s) are withheld, everything emitted must match the batch
    // twin exactly
    val nGot = got.count(); val nExpected = expected.count()
    assert(nGot >= nExpected - 2 && nGot <= nExpected,
      s"emitted $nGot buckets, batch has $nExpected")
    val joined = got.as("g").join(expected.as("e"), Seq("bucket"))
      .filter(col("g.n") =!= col("e.n") ||
        // re-summing per-type doubles loses the batch's exact decimal
        // associativity — compare within float tolerance
        abs(col("g.sum_value") - col("e.sum_value")) > 1e-6)
    assert(joined.count() === 0, "per-bucket aggregates diverge from batch twin")
    assert(got.join(expected, Seq("bucket"), "left_anti").count() === 0,
      "stream emitted a bucket the batch twin does not have")
  }

  test("q114 streaming trending top-k equals the batch rank over hourly counts") {
    val got = SparkEntry.queries("q114_stream_trending")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // batch twin from the raw table: count per (hour, type), rank, cut at 3
    val counts = graft.sources.Tables.events(spark, sf)
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("bucket"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = counts.groupBy(_._1).toSeq.flatMap { case (b, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex.map {
        case ((_, t, n), i) => (b, t, n, (i + 1).toLong)
      }
    }.toSet
    assert(got.toSet === expected)
    assert(got.length === expected.size)
    got.groupBy(_._1).values.foreach(ws =>
      assert(ws.map(_._4).sorted.toSeq === (1L to ws.length).toSeq,
        "ranks within a window must be 1..k dense"))
  }

  test("q61 stream-static micro-batch plan joins by broadcast, not sort-merge") {
    // AQE does not replan micro-batch plans: strategy comes from the batch
    // planner's static size estimates. Assert the executed micro-batch
    // plan broadcasts (the bounded micro-batch side) — the failure mode
    // this pins down is a silent per-batch sort-merge join that would
    // re-shuffle the O(users) dim on every trigger.
    val dim = graft.sources.Tables.events(spark, sf)
      .select(col("user_id")).distinct()
      .withColumn("cohort", pmod(col("user_id"), lit(7L)).cast("int"))
    val joined = EventStreams.readEvents(spark, eventsDir)
      .join(dim, Seq("user_id"))
      .groupBy(col("cohort")).agg(count(lit(1)).as("n"))
    val q = joined.writeStream
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .format("memory").queryName("q61_plan_probe")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination()
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) { q.explain() }
    spark.catalog.dropTempView("q61_plan_probe")
    val plan = buf.toString("UTF-8")
    assert(plan.contains("BroadcastHashJoin"),
      s"stream-static join is not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"stream-static join degraded to per-batch sort-merge:\n$plan")
    // the BUILD side must be the bounded micro-batch (left), never the
    // O(users) dim — broadcasting the dim is the OOM-at-10⁹-users shape
    // the scaladoc rules out
    assert(plan.contains("BuildLeft"),
      s"broadcast built from the dim side, not the bounded micro-batch:\n$plan")
  }

  test("q90 streaming incremental near-dup equals the batch q74 probe") {
    // the stream bands each micro-batch with the per-row signature
    // expression and probes the persisted corpus band table; its drained
    // summary must land on exactly the batch path's answer
    val stream = SparkEntry.queries("q90_stream_neardup")(spark, sf).head
    val batch = SparkEntry.queries("q74_incremental_minhash")(spark, sf).head
    assert(stream === batch,
      s"stream $stream diverges from batch $batch")
  }

  test("stateful user running counts cover every user exactly once per final state") {
    val events = EventStreams.readEvents(spark, eventsDir)
    val updates = EventStreams.userRunningCounts(spark, events.toDF)
    val res = EventStreams.runToMemory(spark, updates.toDF, "user_counts",
      org.apache.spark.sql.streaming.OutputMode.Update())
    // final state per user (last update) must equal the batch per-user count
    val finalCounts = res.groupBy("user_id").agg(max("count").as("count"))
    val batch = graft.sources.Tables.events(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("count"))
    val diff = finalCounts.as("s").join(batch.as("b"), Seq("user_id"))
      .filter(col("s.count") =!= col("b.count"))
    assert(diff.count() === 0)
    assert(finalCounts.count() === batch.count())
  }

  test("streaming file sink + checkpoint: restart resumes exactly-once") {
    import java.nio.file.{Files, Paths}
    // stage input; start with ONE file, then add a second and restart
    val in = Files.createTempDirectory("graft_ckpt_in")
    val out = Files.createTempDirectory("graft_ckpt_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_meta").toString
    Files.copy(Paths.get(s"$sf/events.parquet"), in.resolve("a.parquet"))

    def runOnce(): Unit = {
      val q = EventStreams.readEvents(spark, in.toString)
        .select(col("event_id"), col("user_id"), col("value"))
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    val afterFirst = spark.read.parquet(out).count()
    val perFile = graft.sources.Tables.events(spark, sf).count()
    assert(afterFirst === perFile)

    // second input file appears; restart from the same checkpoint
    Files.copy(Paths.get(s"$sf/events.parquet"), in.resolve("b.parquet"))
    runOnce()
    val afterSecond = spark.read.parquet(out).count()
    // exactly-once: file a NOT reprocessed, file b processed once
    assert(afterSecond === 2 * perFile,
      s"expected ${2 * perFile}, got $afterSecond (duplicate or lost batch)")
  }

  test("q128 double-drained file sink equals the batch aggregation (no duplicate commits)") {
    val got = SparkEntry.queries("q128_stream_file_sink")(spark, sf).collect().head
    val exp = graft.sources.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(count(lit(1)), countDistinct(col("event_id")),
        sum(col("value").cast("decimal(18,2)")).cast("double"))
      .collect().head
    assert(got.getLong(0) === exp.getLong(0), "row count (dup batch would double it)")
    assert(got.getLong(1) === exp.getLong(1), "distinct ids")
    assert(got.getLong(0) === got.getLong(1), "each purchase lands exactly once")
    assert(got.getDouble(2) === exp.getDouble(2), "decimal-exact sum")
  }

  test("q106 cross-batch session MERGE: a bridging event fuses two open sessions") {
    // the session-window state store's distinguishing operation is the
    // MERGE: an event arriving in a later micro-batch can bridge two
    // previously-separate open sessions into one. A single-batch drain
    // (the gate path) never exercises that — this stages two files so
    // batch 1 opens sessions at t=0 and t=15min (gap 15 > 10) and batch 2
    // delivers the t=7min bridge; the drained complete-mode result must
    // be ONE merged session of 3 events
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess_merge")
    try {
      def write(name: String, minutes: Seq[Int], mtime: Long): Unit = {
        minutes.map(m => (1L, m * 60L * 1000000000L, 1L, "click", 1.0, "{}"))
          .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
          .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
        // file source processes in (mtime, path) order — pin it
        val f = new java.io.File(s"$dir/$name").listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.copy(f.toPath, java.nio.file.Paths.get(s"$dir/$name.parquet"))
        new java.io.File(s"$dir/$name.parquet").setLastModified(mtime)
        graft.util.Fs.deleteRecursively(new java.io.File(s"$dir/$name"))
      }
      write("a", Seq(0, 15), 1000000L)
      write("b", Seq(7), 2000000L)
      val sess = EventStreams.readEvents(spark, dir.toString)
        .groupBy(col("user_id"),
          session_window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(col("user_id"),
          unix_micros(col("session_window.start")).as("session_start"),
          col("n"))
      val got = EventStreams.runToMemory(spark, sess,
        s"sess_merge_${System.nanoTime()}",
        org.apache.spark.sql.streaming.OutputMode.Complete()).collect()
      assert(got.length === 1, s"expected one merged session, got ${got.toSeq}")
      assert(got.head.getLong(0) === 1L)
      assert(got.head.getLong(1) === 0L, "merged session starts at t=0")
      assert(got.head.getLong(2) === 3L, "merged session holds all 3 events")
    } finally graft.util.Fs.deleteRecursively(dir.toFile)
  }

  test("q53 drained user state equals the batch per-user aggregation") {
    val got = EventStreams.qStreamUserState(spark, sf)
    val expected = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(expr("unix_micros(ts)")).as("last_ts_us"))
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "stateful drain diverged from batch aggregation")
  }

  test("q55 streaming dedup suppresses cross-batch duplicates exactly") {
    val row = EventStreams.qStreamDedup(spark, sf).head
    val expected = graft.sources.Tables.events(spark, sf).count()
    assert(row.getLong(0) === expected,
      s"emitted ${row.getLong(0)} rows, batch distinct count is $expected")
    assert(row.getLong(0) === row.getLong(1), "an event_id was emitted twice")
  }

  test("q137 image near-dup: banding equals driver-side brute force over decoded hashes") {
    import graft.multimodal.Multimodal
    val hashes = Multimodal.fromDocuments(spark, sf)
      .filter(col("media_type") === "image")
      .select(col("media_id"), col("payload")).collect()
      .map { r =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        r.getLong(0) -> Multimodal.dhash56(img)
      }
    val expected = (for {
      (a, ha) <- hashes; (b, hb) <- hashes
      if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (a, b) -> d.toLong).toMap
    val q = Multimodal.q137ImageNearDup(spark, sf)
    val got = q.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected, "banding must have exact recall at hamming<=3")
    assert(expected.nonEmpty, "fixture images must contain near-dups")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q137 candidates must come from the band equi-join:\n$plan")
  }

  test("q138 audio near-dup: banding equals driver-side brute force over decoded fingerprints") {
    import graft.multimodal.Multimodal
    val fps = Multimodal.fromDocuments(spark, sf)
      .filter(col("media_type") === "audio")
      .select(col("media_id"), col("payload")).collect()
      .map { r =>
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        val samples = try ais.readAllBytes() finally ais.close()
        r.getLong(0) -> Multimodal.audioFp56(samples)
      }
    val expected = (for {
      (a, ha) <- fps; (b, hb) <- fps
      if a < b
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= 3
    } yield (a, b) -> d.toLong).toMap
    val got = Multimodal.q138AudioNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expected, "banding must have exact recall at hamming<=3")
  }

  test("JdkCodec: PNG and WAV encode→decode roundtrips recover the fixtures exactly") {
    import graft.multimodal.Multimodal.JdkCodec
    for (id <- Seq(0L, 3L, 7L, 123L, 4998L)) {
      val (w, h) = JdkCodec.imageDims(id)
      val (dw, dh, cs) = JdkCodec.decodePng(JdkCodec.encodePng(id))
      assert((dw, dh) === (w, h), s"decoded dims for id=$id")
      val expectedCs = (for (y <- 0 until h; x <- 0 until w)
        yield JdkCodec.gray(id, x, y).toLong).sum
      assert(cs === expectedCs, s"decoded pixel checksum for id=$id")
      val n = JdkCodec.audioSamples(id)
      val (us, acs) = JdkCodec.decodeWav(JdkCodec.encodeWav(id))
      assert(us === n.toLong * 125, s"decoded duration for id=$id")
      assert(acs === (0 until n).map(i => JdkCodec.sampleByte(id, i).toLong).sum,
        s"decoded sample checksum for id=$id")
    }
  }

  test("q52 media profile flows through the real codec path and sums exactly") {
    val prof = Multimodal.qMediaProfile(spark, sf).collect()
    assert(prof.length === 3)
    val byType = prof.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byType.keySet === Set("image", "audio", "video"))
    // (cnt, total_px, total_duration_us, checksum_total)
    assert(byType("image")._3 === 0L, "images have no duration")
    assert(byType("audio")._3 > 0L && byType("video")._3 > 0L)
    assert(byType("image")._2 > 0L && byType("image")._4 > 0L,
      "decoded images contribute pixels and a pixel checksum")
    assert(byType("audio")._2 === 0L && byType("audio")._4 > 0L)
    assert(byType("video")._2 === 0L && byType("video")._4 === 0L)
    // independently restate the decoded totals from the fixtures
    import graft.multimodal.Multimodal.JdkCodec
    val ids = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0))
    val expPx = ids.filter(_ % 3 == 0)
      .map { id => val (w, h) = JdkCodec.imageDims(id); w.toLong * h }.sum
    assert(byType("image")._2 === expPx, "decoded pixel total")
    val expAudioUs = ids.filter(_ % 3 == 1)
      .map(id => JdkCodec.audioSamples(id).toLong * 125).sum
    assert(byType("audio")._3 === expAudioUs, "decoded audio duration total")
  }

  test("multimodal decode keeps every row, drops payload, emits decoded metadata") {
    val media = Multimodal.fromDocuments(spark, sf)
    val decoded = Multimodal.decodeMeta(media)
    assert(decoded.count() === media.count())
    assert(!decoded.columns.contains("payload"))
    assert(decoded.filter(col("n_bytes") <= 0).count() === 0)
    // decoded image dims land in the fixture range; non-images carry none
    assert(decoded.filter(col("media_type") === "image" &&
      (col("width") < 8 || col("width") > 31 ||
        col("height") < 8 || col("height") > 31)).count() === 0)
    assert(decoded.filter(col("media_type") =!= "image" &&
      (col("width") =!= 0 || col("height") =!= 0)).count() === 0)
    // images have no duration; audio/video do
    assert(decoded.filter(col("media_type") === "image" &&
      col("duration_us") =!= 0L).count() === 0)
    assert(decoded.filter(col("media_type") =!= "image" &&
      col("duration_us") <= 0L).count() === 0)
  }

  test("multimodal feature extraction is deterministic and fixed-dim") {
    val media = Multimodal.fromDocuments(spark, sf)
    val f1 = Multimodal.extractFeatures(media, dim = 16)
    assert(f1.filter(size(col("features")) =!= 16).count() === 0)
    val twice = Multimodal.extractFeatures(media, dim = 16)
    val diff = f1.as("a").join(twice.as("b"), Seq("media_id"))
      .filter(col("a.features") =!= col("b.features"))
    assert(diff.count() === 0)
  }

  test("resize really resamples: every output payload decodes to the target dims") {
    val media = Multimodal.fromDocuments(spark, sf)
    val resized = Multimodal.resize(media, 64, 64)
    assert(resized.count() ===
      media.filter(col("media_type") === "image").count(),
      "resize covers exactly the image rows")
    assert(resized.filter(col("width") =!= 64 || col("height") =!= 64).count() === 0)
    // the payload is a REAL re-encoded PNG at the target size
    val sample = resized.select(col("payload")).head.getAs[Array[Byte]](0)
    val (w, h, _) = graft.multimodal.Multimodal.JdkCodec.decodePng(sample)
    assert((w, h) === (64, 64), "re-encoded payload must decode to target dims")
    val twice = Multimodal.resize(media, 64, 64)
    val diff = resized.as("a").join(twice.as("b"), Seq("media_id"))
      .filter(col("a.payload") =!= col("b.payload"))
    assert(diff.count() === 0)
  }

  test("frame sampling emits keys only, one row per sampled frame") {
    val media = Multimodal.fromDocuments(spark, sf)
    val frames = Multimodal.sampleFrames(media, fps = 1.0)
    assert(frames.columns.toSeq === Seq("media_id", "frame_no"))
    assert(frames.count() > 0)
    // frame numbers start at 0 per media
    assert(frames.groupBy("media_id").agg(min("frame_no").as("m"))
      .filter(col("m") =!= 0).count() === 0)
  }

  test("q163 streaming HLL registers equal the batch sketch (q160)") {
    // max-merged registers are batching-insensitive: the two-micro-batch
    // drain must land on exactly the batch sketch state and estimates
    val stream = SparkEntry.queries("q163_stream_hll")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    val batch = SparkEntry.queries("q160_hll_sketch")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(stream === batch)
    assert(stream.nonEmpty)
  }

  test("q183 streaming mixture manifest equals the batch manifest (q150)") {
    // the two disjoint mtime-ordered halves drain through the shared
    // stateless projection; count/sum merging across micro-batches must
    // land on exactly the batch shard manifest, row for row
    val stream = SparkEntry.queries("q183_stream_mixture")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val batch = SparkEntry.queries("q150_mixture_shards")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(stream === batch)
    assert(stream.size > 1, "manifest should span multiple shards")
  }

  test("q187 streaming drift equals a driver-side binned-TV recompute") {
    import org.apache.spark.sql.functions._
    val cutUs = java.time.LocalDateTime.parse("2024-01-16T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("value"), unix_micros(col("ts")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    def bin(v: Double): Long = math.min(math.floor(v / 10.0), 31.0).toLong
    val expected = ev.groupBy(_._1).map { case (et, rows) =>
      val (early, late) = rows.partition(_._3 < cutUs)
      val (n1, n2) = (early.length.toLong, late.length.toLong)
      val h1 = early.groupBy(r => bin(r._2)).view.mapValues(_.length.toLong)
      val h2 = late.groupBy(r => bin(r._2)).view.mapValues(_.length.toLong)
      val num = (h1.keySet ++ h2.keySet).toSeq.map { b =>
        math.abs(h1.getOrElse(b, 0L) * n2 - h2.getOrElse(b, 0L) * n1)
      }.sum
      et -> ((n1, n2, num * 1000000L / (2L * n1 * n2)))
    }
    val got = SparkEntry.queries("q187_stream_drift")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (et, (n1, n2, ppm, flag)) =>
      assert((n1, n2, ppm) === expected(et), s"$et")
      assert(flag === (ppm > 100000L))
    }
  }

  test("q164 lateness replay: drops, boundary merge, unemitted tail all appear") {
    import org.apache.spark.sql.functions._
    val HOUR = 3600L * 1000000L
    val DELAY = 30L * 60L * 1000000L
    val cut = java.time.LocalDateTime.parse("2024-01-30T12:00:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("tu"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def isA(e: (Long, Long)) = e._2 < cut && e._1 % 11 != 0
    def isB(e: (Long, Long)) = e._2 >= cut
    val wma = ev.filter(isA).map(_._2).max - DELAY
    val wmf = ev.map(_._2).max - DELAY
    // the probe-verified contract: A/B never late, C dropped iff its
    // window was finalized by wm_A; emit iff window end <= wm_final
    val kept = ev.filter(e => isA(e) || isB(e) ||
      (e._2 / HOUR) * HOUR + HOUR > wma)
    val expected = kept.groupBy(e => (e._2 / HOUR) * HOUR)
      .filter { case (ws, _) => ws + HOUR <= wmf }
      .view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("q164_stream_lateness")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    val dropped = ev.length - kept.length
    assert(dropped > 0, "fixture must drop some late rows")
    val unemitted = kept.map(e => (e._2 / HOUR) * HOUR).distinct
      .count(ws => ws + HOUR > wmf)
    assert(unemitted > 0, "fixture must leave an open window unemitted")
    // at least one emitted window's count was reduced by a drop
    val full = ev.groupBy(e => (e._2 / HOUR) * HOUR)
      .view.mapValues(_.length.toLong).toMap
    assert(expected.exists { case (ws, n) => full(ws) > n },
      "drops must be visible in at least one emitted count")
  }

  test("q173 timeout reaping: complete summaries for inactive users only") {
    import org.apache.spark.sql.functions._
    val GAP_MS = 7200000L
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("tu"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val wmfMs = ev.map(_._2).max / 1000L - 1800000L
    val perUser = ev.groupBy(_._1).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._2).max)).toMap
    val expected = perUser.collect {
      case (u, (n, last)) if last / 1000L + GAP_MS < wmfMs =>
        u -> ((n, last))
    }.toMap
    val got = SparkEntry.queries("q173_stream_timeout")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got === expected)
    assert(got.nonEmpty, "fixture must reap some idle user")
    assert(got.size < perUser.size,
      "users active near stream end must keep their state")
  }

  test("q165 outer-join replay: global-watermark expiry splits unmatched purchases") {
    import org.apache.spark.sql.functions._
    val DELAY = 10L * 60L * 1000000L
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val clicks = ev.filter(_._3 == "click")
    val purchases = ev.filter(_._3 == "purchase")
    val byUser = clicks.groupBy(_._2)
    val matchedPairs = purchases.flatMap { p =>
      byUser.getOrElse(p._2, Array.empty[(Long, Long, String, Long)])
        .filter(c => c._4 <= p._4 && c._4 >= p._4 - DELAY)
        .map(c => (p._1, c._1))
    }
    val gwm = math.min(clicks.map(_._4).max, purchases.map(_._4).max) - DELAY
    val matchedIds = matchedPairs.map(_._1).toSet
    val expiredUnmatched = purchases
      .count(p => !matchedIds.contains(p._1) && p._4 <= gwm)
    val got = SparkEntry.queries("q165_stream_outer_join")(spark, sf).head()
    assert(got.getLong(0) === matchedPairs.length.toLong)
    assert(got.getLong(1) === matchedIds.size.toLong)
    assert(got.getLong(2) === expiredUnmatched.toLong)
    assert(got.getLong(2) > 0, "fixture must expire some unmatched purchase")
    val openUnmatched = purchases
      .count(p => !matchedIds.contains(p._1) && p._4 > gwm)
    assert(openUnmatched > 0,
      "fixture must hold back a still-open unmatched purchase")
  }
}
