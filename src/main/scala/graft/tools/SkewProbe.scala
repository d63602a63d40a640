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
    // run only the named sections (q76/q75/q61); no args = all
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
    graft.util.Fs.deleteRecursively(tmp.toFile)
    spark.stop()
  }
}
