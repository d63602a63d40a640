package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Similarity search over embedding columns (Array[Float]).
  *
  * Baseline: brute-force cosine top-k — a broadcast of the query vector and
  * one codegen'd pass over the corpus (the right plan at any scale for a
  * single query). Scale path for query WORKLOADS: random-hyperplane LSH
  * bucketing, so candidate generation is an equi-join on bucket signature
  * instead of a cross product.
  */
object Similarity {

  /** Elementwise double-cast of a float-array column (so all arithmetic is
    * IEEE double, matching the DuckDB oracle). */
  private def asDouble(a: Column): Column = transform(a, _.cast("double"))

  /** Left-fold dot product of two double-array columns (fixed index order —
    * deterministic summation). Codegen'd kernel since r21
    * ([[graft.functions.ArrDot]] — the HOF spelling
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` is CodegenFallback,
    * interpreted per element with boxing, and this runs once per
    * candidate pair in every verify join); identical IEEE operation
    * sequence, bit-identical results. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.ArrDot(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  def norm2(a: Column): Column = sqrt(dot(a, a))

  /** Fixed-point (2⁻²⁰) squared-L2 between two double-array columns: per
    * element trunc((x−y)²·2²⁰) summed as integers. (x−y) and its square are
    * single correctly-rounded IEEE ops, the ·2²⁰ only shifts the exponent,
    * and integer summation is order-independent — so the distance is
    * bit-identical in any engine regardless of summation order (same trick
    * as the q71 centroids; see that scaladoc). Codegen'd kernel since r21
    * ([[graft.functions.ArrL2Fixed]]) — same arithmetic, compiled loop. */
  def l2Fixed(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      graft.functions.ArrL2Fixed(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm2(a) * norm2(b))

  /** Brute-force cosine top-k against the vector with id `queryId`.
    * The 1-row query side is broadcast; corpus scan stays partition-parallel;
    * top-k plans as TakeOrderedAndProject. Rounded to 4dp for oracle parity.
    */
  def bruteForceTopK(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 10): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val q = emb.filter(col("vec_id") === queryId).select(col("e").as("qe"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosine(col("e"), col("qe")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Hyperplane sign table for sign-LSH: ±1 for (bit i, dim j), derived
    * from the portable md5 hash ([[graft.functions.TextFunctions.hex60Local]]
    * of "i:j") — no stored model, reproducible across runs AND by the
    * DuckDB oracle in plain SQL (`md5(concat(i,':',j))`, q37). Computed
    * once driver-side and embedded as array literals, so bucketing costs
    * zero per-row hashing. */
  private[graft] def planeSigns(nBits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nBits, dim)((i, j) =>
      if (graft.functions.TextFunctions.hex60Local(s"$i:$j") % 2 == 0) 1.0
      else -1.0)

  /** Random-hyperplane (sign) LSH signature as a per-row expression:
    * bit i = sign(v · h_i). Returns an int bucket of `nBits` sign bits. */
  def signLshBucket(v: Column, dim: Int, nBits: Int = 12): Column = {
    val signs = planeSigns(nBits, dim)
    val bits = (0 until nBits).map { i =>
      val proj = aggregate(
        zip_with(v, array(signs(i).map(lit): _*), (x, s) => x * s),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1 << i)).otherwise(lit(0))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Corpus-scale sign-LSH buckets: posexplode the vector once, ONE
    * partial-aggregating groupBy computing all `nBits` projections (vs the
    * per-row expression form which re-traverses the array per bit). Input
    * needs columns (vec_id, e: array<double>); output (vec_id, bucket). */
  def signLshBuckets(emb: DataFrame, nBits: Int = 12, dim: Int = 64): DataFrame = {
    val signs = planeSigns(nBits, dim)
    // fail-fast dim check: element_at past the sign-array end would return
    // null under non-ANSI SQL and sum() would silently SKIP it — wrong
    // buckets with no error. A mismatched vector must be loud.
    val checked = when(size(col("e")) === dim, col("e")).otherwise(
      raise_error(concat(lit("signLshBuckets: vector dim "),
        size(col("e")).cast("string"), lit(s" != configured dim $dim"))))
    val ex = emb.select(col("vec_id"), posexplode(checked).as(Seq("j", "x")))
    val projs = (0 until nBits).map(i =>
      sum(col("x") * element_at(array(signs(i).map(lit): _*), col("j") + 1))
        .as(s"p$i"))
    ex.groupBy(col("vec_id"))
      .agg(projs.head, projs.tail: _*)
      .select(col("vec_id"),
        (0 until nBits).map(i =>
          when(col(s"p$i") > 0, lit(1 << i)).otherwise(lit(0)))
          .reduce((a, b) => a.bitwiseOR(b)).as("bucket"))
  }

  /** LSH-bucketed ANN: co-bucket join then exact cosine within bucket, top-k
    * per query vector by window rank. This is the 100 TB shape: candidate
    * generation is an equi-join on the bucket key (shuffle on int keys),
    * exact scoring touches only co-bucketed pairs. */
  def lshTopKAllPairs(spark: SparkSession, dir: String, dim: Int = 64,
      nBits: Int = 12, k: Int = 5, bucketCap: Int = 10000): DataFrame = {
    val vecs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      // norms once per vector, not per candidate pair
      .withColumn("nrm", norm2(col("e")))
    val emb = graft.plans.Skew.capBuckets(
      vecs.join(signLshBuckets(vecs, nBits, dim), Seq("vec_id")),
      Seq("bucket"), "vec_id", bucketCap)
    // capBuckets materializes (vec, norm, bucket) once — its single
    // boundary feeds both self-join sides
    val a = emb.as("a")
    val b = emb.as("b")
    // rank on the 4dp-ROUNDED sim with vec_id tie-break: raw IEEE doubles
    // differ across engines in the last ulp (summation order), so ranking
    // on them makes top-k membership engine-dependent at float ties; the
    // rounded ordering is deterministic in Spark and the DuckDB oracle
    val scored = a.join(b,
        col("a.bucket") === col("b.bucket") &&
        col("a.__sub") === col("b.__sub") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("vec_id"),
        round(dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm")), 4)
          .as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), col("sim"))
  }

  /** IVF (inverted-file) ANN, split into an index-build phase and a probe
    * phase — the shape an inverted-file index must have at scale: the
    * O(corpus) quantizer fit + assignment happens ONCE per corpus, queries
    * touch only `nProbe` of `nCells` partitions.
    *
    * Index layout under `indexRoot`:
    *  - `vectors/`   — (vec_id, e, nrm) hive-partitioned by `cell`, so a
    *    probe's `cell IN (...)` filter prunes whole directories at planning
    *    time (PlanSpec asserts PartitionFilters on this read);
    *  - `centroids/` — nCells small rows (cell, centroid), read +
    *    collected at query time (O(nCells·dim), driver-local probe choice).
    * Vector norms are precomputed into the index so probe-time scoring is a
    * dot product against the broadcast query literal, not a re-norm. */
  def ivfBuildIndex(spark: SparkSession, dir: String, indexRoot: String,
      nCells: Int = 16): Unit = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("fv", array_to_vector(col("e")))
    val model = new KMeans().setK(nCells).setSeed(8L).setFeaturesCol("fv")
      .fit(emb)
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("e"), norm2(col("e")).as("nrm"),
        col("prediction").as("cell"))
    graft.plans.Bucketing.writePartitioned(assigned, s"$indexRoot/vectors", "cell")
    import spark.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toSeq
      .toDF("cell", "centroid")
      .coalesce(1).write.mode("overwrite").parquet(s"$indexRoot/centroids")
  }

  /** [[ivfBuildIndex]] with a DETERMINISTIC coarse quantizer instead of
    * KMeans: the centroids are the corpus vectors with `vec_id < nCells`
    * and assignment is fixed-point squared-L2 argmin (ties → lowest cell).
    * Same index layout and probe path as the KMeans build — partitioned
    * vectors + tiny centroids table — but every step is exactly
    * reproducible by the DuckDB oracle (q83), so the gate hash-checks the
    * whole probe pipeline: assignment, cell choice, pruned scan, scoring.
    * The assignment plan is the 100 TB shape: nCells centroid rows are
    * broadcast, the corpus is scanned once with a bounded nCells-way
    * fan-out collapsed by one partial-aggregating groupBy. */
  def ivfBuildIndexSeeded(spark: SparkSession, dir: String, indexRoot: String,
      nCells: Int = 16): Unit = {
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val cents = emb.filter(col("vec_id") < nCells)
      .select(col("vec_id").cast("int").as("cell"), col("e").as("c"))
    val assigned = emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("e"),
        struct(l2Fixed(col("e"), col("c")).as("d2"), col("cell")).as("dc"))
      .groupBy(col("vec_id"))
      // min(struct) = argmin by (d2, cell); all e values in a group are the
      // same row's vector, so first() is deterministic here
      .agg(min(col("dc")).as("best"), first(col("e")).as("e"))
      .select(col("vec_id"), col("e"), norm2(col("e")).as("nrm"),
        col("best.cell").as("cell"))
    graft.plans.Bucketing.writePartitioned(assigned, s"$indexRoot/vectors", "cell")
    cents.select(col("cell"), col("c").as("centroid"))
      .coalesce(1).write.mode("overwrite").parquet(s"$indexRoot/centroids")
  }

  /** Build-once cache: the index for (dir, nCells) lives under the JVM temp
    * dir and is reused across calls and JVMs — crash-safe atomic
    * publication and cross-process racing handled by
    * [[graft.util.Staging.publishOnce]] (builds are reported in Bench's
    * `staged` field). Repeated q35 invocations — and every query in a
    * workload — pay only the probe. */
  private val builtIndexes = scala.collection.concurrent.TrieMap.empty[String, String]
  def ivfIndexFor(spark: SparkSession, dir: String, nCells: Int = 16,
      flavor: String = "kmeans"): String = {
    // the slug carries a content fingerprint of the source file (size +
    // mtime + footer CRC, [[graft.util.Staging.fileFingerprint]]) so a
    // regenerated corpus at the same path gets a fresh index, not a stale
    // cache hit from a previous run's publish
    val src = new java.io.File(s"$dir/embeddings.parquet")
    val slug = graft.util.Staging.pathSlug(dir) +
      s"_${graft.util.Staging.fileFingerprint(src)}" +
      (if (flavor == "kmeans") "" else s"_$flavor")
    val root = new java.io.File(
      s"${graft.util.Staging.stagingRoot}/graft_ivf/${slug}_c$nCells")
    builtIndexes.getOrElseUpdate(root.getPath,
      graft.util.Staging.publishOnce(root, s"ivf:${root.getName}") { staging =>
        if (flavor == "seeded") ivfBuildIndexSeeded(spark, dir, staging.getPath, nCells)
        else ivfBuildIndex(spark, dir, staging.getPath, nCells)
      })
  }

  /** Probe an IVF index: pick the `nProbe` nearest cells driver-side from
    * the tiny centroids table, then scan ONLY those cell partitions
    * (partition-pruned read) scoring exact cosine against the query
    * literal. No quantizer fit, no full-corpus pass. */
  def ivfProbe(spark: SparkSession, indexRoot: String, query: Array[Double],
      k: Int = 10, nProbe: Int = 4, excludeId: Long = -1L): DataFrame = {
    val probes = spark.read.parquet(s"$indexRoot/centroids")
      .collect()
      .map { r =>
        val c = r.getSeq[Double](r.fieldIndex("centroid"))
        var d = 0.0; var j = 0
        while (j < query.length) { val t = c(j) - query(j); d += t * t; j += 1 }
        (r.getInt(r.fieldIndex("cell")), d)
      }
      .sortBy(_._2).take(nProbe).map(_._1).toSeq
    scoreProbedCells(spark, indexRoot, probes, query, k, excludeId)
  }

  /** The probe's scan+score stage, shared by the KMeans and seeded index
    * flavors: read ONLY the probed cell partitions (partition-pruned),
    * exact cosine against the broadcast query literal, top-k. */
  private def scoreProbedCells(spark: SparkSession, indexRoot: String,
      probes: Seq[Int], query: Array[Double], k: Int, excludeId: Long)
      : DataFrame = {
    val qnorm = math.sqrt(query.map(x => x * x).sum)
    val qlit = array(query.map(lit): _*)
    spark.read.parquet(s"$indexRoot/vectors")
      .filter(col("cell").isin(probes: _*) && col("vec_id") =!= excludeId)
      .select(col("vec_id"),
        round(dot(col("e"), qlit) / (col("nrm") * lit(qnorm)), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Probe-cell choice for the SEEDED index: the same fixed-point
    * squared-L2 as the assignment ([[l2Fixed]]'s driver-side twin —
    * trunc((x−y)²·2²⁰) summed as longs), ties → lowest cell, so the probed
    * cell set is bit-identical to the oracle's. O(nCells·dim), driver-local. */
  private def seededProbes(spark: SparkSession, indexRoot: String,
      query: Array[Double], nProbe: Int): Seq[Int] =
    spark.read.parquet(s"$indexRoot/centroids")
      .collect()
      .map { r =>
        val c = r.getSeq[Double](r.fieldIndex("centroid"))
        var s = 0L; var j = 0
        while (j < query.length) {
          val t = query(j) - c(j); s += (t * t * 1048576d).toLong; j += 1
        }
        (r.getInt(r.fieldIndex("cell")), s)
      }
      .sortBy(t => (t._2, t._1)).take(nProbe).map(_._1).toSeq

  /** q83: the IVF probe pipeline with the seeded deterministic quantizer —
    * every stage (assignment, probe choice, pruned scan, scoring) has an
    * exact DuckDB twin, so the driver gate hash-checks the inverted-file
    * path end to end (the KMeans flavor q35 stays rows-only: its quantizer
    * has no SQL twin). */
  def q83AnnIvfSeeded(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 10, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val root = ivfIndexFor(spark, dir, nCells, flavor = "seeded")
    val q = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") === queryId)
      .select(asDouble(col("embedding"))).head.getSeq[Double](0).toArray
    scoreProbedCells(spark, root, seededProbes(spark, root, q, nProbe),
      q, k, excludeId = queryId)
  }

  /** IVF top-k for one query id: reuse (or lazily build) the corpus index,
    * fetch the query vector via a pushed-down point read, probe. */
  def ivfTopK(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 10, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val root = ivfIndexFor(spark, dir, nCells)
    val q = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") === queryId)
      .select(asDouble(col("embedding"))).head.getSeq[Double](0).toArray
    ivfProbe(spark, root, q, k, nProbe, excludeId = queryId)
  }

  /** [[ivfTopK]] with result quality made DRIVER-VISIBLE: each approximate
    * hit carries `in_exact` = 1 iff it also appears in the exact brute-force
    * top-k, so the dumped result pins recall@k (sum(in_exact)/k), not just
    * row count. The flag join is k×k rows — free next to the probe. */
  def ivfTopKWithRecall(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 10, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val ivf = ivfTopK(spark, dir, queryId, k, nCells, nProbe)
    val exact = bruteForceTopK(spark, dir, queryId, k)
      .select(col("vec_id"), lit(1L).as("in_exact"))
    ivf.join(exact, Seq("vec_id"), "left")
      .select(col("vec_id"), col("sim"),
        coalesce(col("in_exact"), lit(0L)).as("in_exact"))
  }

  /** q35: the KMeans-IVF pipeline gated by its RECALL, not its rows — the
    * quantizer fit has no SQL twin (q83's seeded flavor hash-checks the
    * probe path itself), but seeded KMeans at fixed parallelism is
    * bit-deterministic, so recall@k against the exact brute-force top-k is
    * a pinnable constant. One summary row: result count, how many of the
    * approximate hits appear in the exact top-k, and their ratio — pinned
    * by a golden-value oracle (regenerate with
    * [[graft.tools.MlOracleGen]]; determinism re-verified across cpu
    * counts before pinning). */
  def q35AnnIvfRecall(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 10, nCells: Int = 16, nProbe: Int = 4): DataFrame =
    ivfTopKWithRecall(spark, dir, queryId, k, nCells, nProbe)
      .agg(count(lit(1)).as("n_results"),
        sum(col("in_exact")).as("n_in_exact"))
      .select(col("n_results"), col("n_in_exact"),
        (col("n_in_exact").cast("double") / col("n_results")).as("recall_at_k"))

  /** Raw cosine for every co-bucketed pair (vec_a < vec_b) — the candidate
    * stage [[embeddingNearDupPairs]] filters; exposed separately so the
    * oracle-margin guard in ScaleOpsSpec can probe the unrounded sims. */
  private[graft] def embeddingCoBucketSims(spark: SparkSession, dir: String,
      dim: Int = 64, nBits: Int = 10, bucketCap: Int = 10000): DataFrame = {
    val vecs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm2(col("e")))
    val emb = graft.plans.Skew.capBuckets(
      vecs.join(signLshBuckets(vecs, nBits, dim), Seq("vec_id")),
      Seq("bucket"), "vec_id", bucketCap) // materialized by capBuckets
    val a = emb.as("a")
    val b = emb.as("b")
    a.join(b,
        col("a.bucket") === col("b.bucket") &&
        col("a.__sub") === col("b.__sub") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm"))).as("sim"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, LSH-blocked,
    * bucket fan-out capped (see [[graft.plans.Skew.capBuckets]]). */
  /** Per-label embedding centroids (q71): the class-prototype vectors an
    * embedding pipeline needs for IVF seeding, outlier scoring, and
    * per-class drift monitoring. posexplode → ONE partial-aggregating
    * groupBy on (label, dimension): each map-side partial carries 64
    * decimal sums per label, the exchange moves |labels|·dim tiny rows —
    * never the vectors. The per-element fixed-point step is ·2²⁰ then
    * truncate: scaling a float by a power of two only shifts its exponent
    * (no mantissa rounding), truncation toward zero is exactly specified in
    * both engines, and the resulting integer sum is order-independent — so
    * the centroid is oracle-exact BY CONSTRUCTION at 2⁻²⁰ resolution.
    * (A decimal(27,10) cast is the "obvious" route but engines round a
    * double's 10th decimal digit through different paths — measured ~1e-12
    * centroid divergence — while power-of-two fixed point has no rounding
    * anywhere before the single final IEEE division.) */
  def q71LabelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos").cast("bigint").as("pos"))
      .agg(
        (sum((col("x").cast("double") * lit(1048576d)).cast("long"))
          .cast("double") /
          (count(lit(1)) * lit(1048576L))).as("centroid"))

  /** Scalar (per-dimension min/max) int8 quantization of the embedding
    * table (q77) — the 4× vector-compression step an ANN system applies
    * before indexing at scale. Pass 1 is one partial-aggregating groupBy for
    * per-dimension ranges (64 tiny rows, broadcast back); pass 2 encodes
    * each component as floor(255·(x−min)/(max−min)) clamped to [0,255].
    * Every arithmetic step is a correctly-rounded IEEE op on exactly-
    * converted floats, in a fixed evaluation order on both engines, so the
    * codes are oracle-exact. Emits codes for a deterministic id slice plus
    * the full range table, proving encode + range state without dumping
    * the corpus. */
  def q77QuantizeEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("pos").cast("bigint").as("pos"),
        col("x").cast("double").as("x"))
    val ranges = e.groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    e.filter(col("vec_id") % 100 === 0)
      .join(broadcast(ranges), Seq("pos"))
      .select(col("vec_id"), col("pos"),
        when(col("mx") === col("mn"), lit(0L)).otherwise(
          least(lit(255L), greatest(lit(0L),
            floor(lit(255d) * (col("x") - col("mn")) / (col("mx") - col("mn"))))))
          .as("code"))
  }

  def embeddingNearDupPairs(spark: SparkSession, dir: String,
      dim: Int = 64, nBits: Int = 10, threshold: Double = 0.95,
      bucketCap: Int = 10000): DataFrame =
    embeddingCoBucketSims(spark, dir, dim, nBits, bucketCap)
      .filter(col("sim") > threshold)
      // filter on the raw value, emit 4dp (oracle parity for libm-heavy math)
      .select(col("vec_a"), col("vec_b"), round(col("sim"), 4).as("sim"))

  /** q117: MULTI-PROBE sign-LSH ANN — the recall lever between q31's
    * single-bucket probe and brute force: probe the query's bucket PLUS its
    * `nBits` Hamming-1 neighbors (each one sign-bit flip). A near neighbor
    * that lands across one marginal hyperplane — the dominant LSH miss
    * mode — is recovered for (nBits+1)× the candidate cost, with NO extra
    * tables (multi-probe's whole point vs adding hash tables: same index,
    * more probes).
    *
    * Scale shape: the probe set is nBits+1 literal ints, so candidate
    * fetch is `bucket IN (...)` — pushed to the scan / partition-pruned on
    * a bucket-partitioned index at corpus scale; exact scoring touches only
    * probed candidates. The query's bucket comes from the SAME
    * [[signLshBuckets]] frame the corpus uses (one pushed-down point read),
    * so engine and oracle agree bit for bit; ranking is on the 4dp-rounded
    * sim with vec_id tie-break (the q31 contract). `probe_hamming` (0 =
    * home bucket, 1 = flipped) is emitted so recall attribution per probe
    * ring is visible in the result. */
  def q117MultiProbeLsh(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 10, nBits: Int = 10, dim: Int = 64): DataFrame = {
    val vecs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm2(col("e")))
    val buckets = signLshBuckets(vecs, nBits, dim)
    val qRow = vecs.join(buckets, Seq("vec_id"))
      .filter(col("vec_id") === queryId)
      .select(col("e"), col("nrm"), col("bucket")).head
    val q = qRow.getSeq[Double](0).toArray
    val qn = qRow.getDouble(1)
    val qb = qRow.getInt(2)
    val probes = qb +: (0 until nBits).map(i => qb ^ (1 << i))
    val qLit = array(q.map(lit(_)): _*)
    vecs.join(buckets, Seq("vec_id"))
      .filter(col("bucket").isin(probes: _*) && col("vec_id") =!= queryId)
      .select(col("vec_id"),
        round(dot(col("e"), qLit) / (col("nrm") * lit(qn)), 4).as("sim"),
        when(col("bucket") === qb, 0L).otherwise(1L).as("probe_hamming"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
  }

  /** q115: SEMANTIC dedup (SemDeDup-shaped) — embedding-space near-dup
    * removal blocked by quantizer cell: assign every vector to its nearest
    * seed centroid (q83's deterministic fixed-point argmin, computed as a
    * single shuffle-free projection against the literal codebook like
    * q109), compare cosines ONLY within a cell, connect the >τ graph, keep
    * each component's min-id representative. This is the curation step
    * that removes *meaning-level* duplicates MinHash can't see (retellings,
    * translations, templated rewrites).
    *
    * Scale shape: candidate pairs are Σ_cell |cell|² — the quantizer is the
    * blocking function, so cell granularity (nCells, or a second-level PQ
    * code) bounds pair work exactly like LSH bands bound q37's; the
    * component step reuses [[graft.operators.Dedup.connectedComponents]]
    * (min-label propagation, shallow dense clusters). Output is the full
    * per-vector verdict (cell, keep), so survivorship is checkable row by
    * row. The τ filter compares raw IEEE cosines; gate data keeps every
    * pair ≥1e-5 from τ (engine noise is ~1e-15 — margin guarded in
    * ScaleOpsSpec, same contract as q37). */
  def q115SemanticDedup(spark: SparkSession, dir: String, tau: Double = 0.40,
      nCells: Int = 16): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val codebook = emb.filter(col("vec_id") < nCells).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val cands = codebook.map { case (cell, v) =>
      struct(l2Fixed(col("e"), array(v.map(lit(_)): _*)).as("d"),
        lit(cell).as("c"))
    }
    val withCell = emb
      .withColumn("cell", array_min(array(cands: _*)).getField("c"))
      .withColumn("nrm", norm2(col("e")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = withCell.as("a")
    val b = withCell.as("b")
    val pairs = a.join(b,
        col("a.cell") === col("b.cell") &&
        col("a.vec_id") < col("b.vec_id"))
      .filter(dot(col("a.e"), col("b.e")) /
        (col("a.nrm") * col("b.nrm")) > tau)
      .select(col("a.vec_id").as("doc_a"), col("b.vec_id").as("doc_b"))
    val labels = Dedup.connectedComponents(pairs)
      .withColumnRenamed("node", "vec_id")
    withCell.select(col("vec_id"), col("cell"))
      .join(labels, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        when(coalesce(col("label"), col("vec_id")) === col("vec_id"), 1L)
          .otherwise(0L).as("keep"))
  }

  /** Product-quantization encode (q109) — the IVF-PQ compression step an
    * ANN system applies at corpus scale: each vector's `nSub` disjoint
    * subvectors are independently assigned to the nearest entry of a
    * per-subspace codebook, collapsing a 64-float vector to `nSub` small
    * codes (here 4×4 bits — 64× compression; q77's scalar int8 is only 4×).
    *
    * Codebooks are the subvectors of the `nCells` seed vectors
    * (vec_id < nCells) — the same deterministic seeded-quantizer contract
    * as q83, and the same driver-side collect of a BOUNDED table (nCells
    * rows; at 100 TB the codebook is still 16 rows — the corpus never
    * reaches the driver). Assignment distance is the fixed-point ·2²⁰
    * truncated squared-L2 of [[l2Fixed]]: integer sums are order-independent
    * so argmin (ties → lowest cell) is bit-identical in any engine, which is
    * what lets a PQ ASSIGNMENT be oracle-checked exactly.
    *
    * Plan shape is the one that survives 100 TB: encode is a SINGLE
    * codegen'd projection per row (nSub·nCells zip_with folds over literal
    * codebook arrays — no join, no shuffle, no explode of the corpus);
    * `array_min` over (distance, cell) structs is the argmin with the tie
    * break in the struct ordering. The only exchange is the final tiny
    * (m, code) histogram — count + Σvec_id per cell, a membership checksum
    * that pins the full assignment, not just its distribution. */
  def q109PqCodes(spark: SparkSession, dir: String, nSub: Int = 4,
      nCells: Int = 16): DataFrame = {
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val codebook = emb.filter(col("vec_id") < nCells).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    val dim = codebook.head._2.length
    require(dim % nSub == 0, s"dim $dim not divisible into $nSub subspaces")
    val sub = dim / nSub
    val codeCols = (0 until nSub).map { m =>
      val cands = codebook.map { case (cell, v) =>
        val centLit = array(v.slice(m * sub, (m + 1) * sub).map(lit(_)): _*)
        struct(
          l2Fixed(slice(col("e"), m * sub + 1, sub), centLit).as("d"),
          lit(cell).as("c"))
      }
      array_min(array(cands: _*)).getField("c").as(s"code$m")
    }
    emb.select(col("vec_id") +: codeCols: _*)
      .select(col("vec_id"),
        posexplode(array((0 until nSub).map(m => col(s"code$m")): _*))
          .as(Seq("m", "code")))
      .groupBy(col("m").cast("bigint").as("m"), col("code"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("vec_id")).as("id_sum"))
  }

  /** q130: per-label embedding OUTLIERS — the top-k vectors farthest from
    * their own label's centroid. The mislabeled-data / noisy-embedding
    * audit a curation pipeline runs before training on labeled vectors:
    * a point far from its class center is a labeling error candidate.
    *
    * All-integer fixed point (q71/q83's 2^20 convention) so ranking and
    * output cross engines exactly:
    *  - components enter as fp = trunc(x·2^20) longs;
    *  - the label centroid is kept RATIONAL (csum, n) — never divided —
    *    so the per-vector distance numerator Σ(fp·n − csum)² over a
    *    common denominator n² is an exact integer; fp·n runs in
    *    DECIMAL(38,0) (1e6 · 1e12-vector labels would overflow BIGINT —
    *    the q120 lesson) and the squared sum stays ≤ ~1e32 « 1e38;
    *  - vectors of the SAME label share the denominator, so ranking by
    *    the numerator alone is exact; the output distance is scaled back
    *    to fp² units (÷n², integer floor both engines) to fit BIGINT.
    *
    * Plan: one posexplode groupBy builds the (label, pos) centroid sums
    * (64·|labels| rows, broadcast); one more rolls per-vector numerators;
    * the top-k window partitions by label — state O(label slice), and at
    * extreme per-label cardinality the q97 histogram-cutoff refinement
    * applies verbatim to the numerator column. */
  def q130EmbeddingOutliers(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "x")))
      .select(col("vec_id"), col("label"), col("pos"),
        (col("x").cast("double") * lit(1048576d)).cast("long").as("fp"))
    val cents = e.groupBy(col("label"), col("pos"))
      // csum has the same 1e12-vector magnitude as fp·n below — it must
      // enter DECIMAL before summing, not after overflowing
      .agg(sum(col("fp").cast("decimal(38,0)")).as("csum"),
        count(lit(1)).as("n"))
    val d2 = e.join(broadcast(cents), Seq("label", "pos"))
      .select(col("vec_id"), col("label"), col("n"),
        (col("fp").cast("decimal(38,0)") * col("n") - col("csum"))
          .as("diff"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("diff") * col("diff")).as("d2num"),
        first(col("n")).as("n"))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("d2num").desc, col("vec_id").asc)
    d2.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= k)
      .select(col("label"), col("rnk"), col("vec_id"),
        expr("cast(d2num DIV (cast(n as decimal(38,0)) * n) as bigint)")
          .as("d2_scaled"))
  }

  /** q158: EMBEDDING TRUNCATION ENERGY AUDIT — how much of each vector's
    * signal survives keeping only the front k dimensions? The question
    * behind every Matryoshka-style truncated deployment, and behind this
    * engine's own q141 grid (which trains on the front 32 of 64 dims).
    * For zero-padded truncation the cosine to the original collapses to
    * the NORM RATIO: cos(v, pad(v₁..ₖ)) = |v₁..ₖ| / |v| — one row-local
    * fold per side, no pairs, no joins.
    *
    * Per-row sums fold LEFT-TO-RIGHT over the array in both engines
    * (Spark `aggregate`, DuckDB `list_sum` in list order), floats
    * widened to double exactly, sqrt under the 4-dp libm contract —
    * hash-exact. Output per label: vector count, 4-dp mean and min
    * ratio. One codegen'd projection + a |labels|-row rollup. */
  def q158TruncationEnergy(spark: SparkSession, dir: String,
      k: Int = 32): DataFrame = {
    def sq(sliced: String) = // Σ x² over a slice, folded left-to-right
      s"aggregate(transform($sliced, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), " +
        "CAST(0 AS DOUBLE), (a, x) -> a + x)"
    Tables.load(spark, dir, "embeddings")
      .select(col("label").cast("bigint").as("label"),
        round(sqrt(expr(sq(s"slice(embedding, 1, $k)")) / expr(sq("embedding"))),
          4).as("ratio"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("ratio")), 4).as("mean_ratio"),
        min(col("ratio")).as("min_ratio"))
  }

  /** q176: JOHNSON–LINDENSTRAUSS PROJECTION + DISTORTION AUDIT — the
    * other dimensionality-reduction lever next to truncation (q158) and
    * per-dim selection (q170): project 64 → 16 dims through a
    * DETERMINISTIC ±1 matrix derived from the portable hash family
    * (sign(j,d) = parity of hash("jl:j:d")) scaled by 1/√16, then audit
    * what JL promises — pairwise Euclidean distances survive — on the
    * consecutive-id pair set: ratio = dist₁₆/dist₆₄ per pair, rolled up
    * per label (count, mean, min, max at 4dp). The hash-derived matrix
    * is the scale move: no matrix to broadcast, no RNG seed to
    * coordinate — any executor (or engine: the oracle rebuilds the same
    * signs) regenerates entry (j,d) locally, so the projection is a pure
    * per-row expression. Folds are left-to-right on both engines (the
    * q158 contract) and only the final ratio is rounded. */
  def q176JlProjection(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.sketch60
    def signed(e: org.apache.spark.sql.Column,
        j: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      when(pmod(sketch60(concat(lit("jl:"), j.cast("string"), lit(":"),
        d.cast("string"))), lit(2L)) === 0L, e).otherwise(-e)
    val proj = transform(sequence(lit(0), lit(15)), j =>
      aggregate(
        zip_with(col("embedding"),
          sequence(lit(0), size(col("embedding")) - 1),
          (x, d) => signed(x.cast("double"), j, d)),
        lit(0.0), (acc, t) => acc + t) / 4.0)
    val e = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("bigint").as("label"),
        col("embedding"), proj.as("p"))
    val pairs = e.as("a").join(e.as("b"),
      col("b.vec_id") === col("a.vec_id") + 1)
    def dist(va: org.apache.spark.sql.Column,
        vb: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sqrt(aggregate(zip_with(va, vb,
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, t) => acc + t))
    pairs
      .select(col("a.label").as("label"),
        round(dist(col("a.p"), col("b.p")) /
          dist(col("a.embedding"), col("b.embedding")), 4).as("ratio"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(col("ratio")), 4).as("mean_ratio"),
        min(col("ratio")).as("min_ratio"),
        max(col("ratio")).as("max_ratio"))
  }

  /** q170: DIMENSION-VARIANCE FEATURE RANKING — the kBest criterion
    * applied to the embedding space: rank dimensions by variance across
    * the corpus and keep the top-k (low-variance dims carry no signal
    * and are the first to prune before indexing/quantization; q158
    * audits the front-k PREFIX convention, this ranks dims
    * individually). Numerically exact by construction: components are
    * 4dp-rounded into DECIMAL, so Σx and Σx² are order-independent
    * integers in disguise; the variance (Σx²)/n − (Σx/n)² is then two
    * exact casts and four double ops in a fixed tree — no
    * sum-order wobble to absorb, only the final 6dp presentation round.
    * One posexplode + one 64-group partial agg + a top-k sort over 64
    * rows: the exchange carries per-dimension sums, never vectors. */
  def q170DimVariance(spark: SparkSession, dir: String,
      k: Int = 8): DataFrame =
    Tables.load(spark, dir, "embeddings")
      .select(posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("d").cast("bigint").as("dim"),
        col("x").cast("double").as("x"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(x, 4) AS DECIMAL(14,4))")).as("s1"),
        sum(expr("CAST(round(x, 4) AS DECIMAL(14,4)) * " +
          "CAST(round(x, 4) AS DECIMAL(14,4))")).as("s2"))
      .select(col("dim"),
        round(col("s2").cast("double") / col("n").cast("double") -
          (col("s1").cast("double") / col("n").cast("double")) *
          (col("s1").cast("double") / col("n").cast("double")), 6)
          .as("variance"))
      .orderBy(col("variance").desc, col("dim").asc)
      .limit(k)

  /** q186: MMR-DIVERSIFIED TOP-K — maximal marginal relevance (Carbonell
    * & Goldstein, SIGIR'98), the de-dup of RETRIEVAL: a plain cosine
    * top-k hands a RAG prompt eight near-copies of the same passage; MMR
    * re-ranks a relevance pool so each pick balances query relevance
    * against redundancy with what's already selected,
    *   pick_{t+1} = argmax_d  λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s).
    *
    * Scale shape: the RELEVANCE POOL is the distributed part — one
    * codegen'd brute-force cosine pass with a TakeOrderedAndProject cut
    * (or any ANN front end: q35/q117 produce the same (id, sim) shape);
    * the greedy loop then runs driver-side over the POOL-BOUNDED
    * poolN + poolN² sims (the IVF-centroid size class — k·poolN score
    * evaluations over ≤16 candidates, never corpus work). Determinism:
    * all sims 4dp-rounded (the q30 contract), unrounded λ-scores compared
    * with (score DESC, vec_id ASC) total order, emitted scores rounded
    * 4dp via the same HALF_UP Spark/DuckDB share — the DuckDB twin
    * replays the greedy as a recursive CTE and must match bit for bit. */
  def q186MmrTopK(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 8, poolN: Int = 16, lam: Double = 0.7,
      // the redundancy weight is its OWN literal, never computed as
      // 1 − λ: IEEE 1.0 − 0.7 is 0.30000000000000004, a different double
      // than the twin's parsed 0.3 — the kind of bit that flips a greedy
      mu: Double = 0.3): DataFrame = {
    import spark.implicits._
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
    val q = emb.filter(col("vec_id") === queryId).select(col("e").as("qe"))
    val cand = emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), col("e"),
        round(cosine(col("e"), col("qe")), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(poolN)
    val a = cand.select(col("vec_id").as("ai"), col("e").as("ea"))
    val b = cand.select(col("vec_id").as("bi"), col("e").as("eb"))
    val pairSim = a.crossJoin(broadcast(b)).filter(col("ai") =!= col("bi"))
      .select(col("ai"), col("bi"),
        round(cosine(col("ea"), col("eb")), 4).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val pool = cand.select(col("vec_id"), col("sim")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    def round4(x: Double): Double = // Spark round() = HALF_UP on the double
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rel = pool.toMap
    val remaining = scala.collection.mutable.TreeSet(pool.map(_._1): _*)
    val out = scala.collection.mutable.ArrayBuffer.empty[
      (Long, Long, Double, Double)]
    var step = 1
    while (step <= math.min(k, pool.length)) {
      val picked =
        if (out.isEmpty)
          remaining.toSeq.map(id => (id, lam * rel(id)))
            .minBy { case (id, sc) => (-sc, id) }
        else
          remaining.toSeq.map { id =>
            val pen = out.map(s => pairSim((id, s._2))).max
            (id, lam * rel(id) - mu * pen)
          }.minBy { case (id, sc) => (-sc, id) }
      remaining -= picked._1
      out += ((step.toLong, picked._1, rel(picked._1), round4(picked._2)))
      step += 1
    }
    out.toSeq.toDF("rank", "vec_id", "relevance", "mmr_score")
  }
}
