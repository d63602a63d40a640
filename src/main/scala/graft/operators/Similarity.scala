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
    * deterministic summation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = sqrt(dot(a, a))

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

  /** Random-hyperplane (sign) LSH signature: bit i = sign(v · h_i) where h_i
    * is a deterministic pseudo-hyperplane derived from murmur3(i, j) — no
    * stored model, reproducible across runs and engines that share the
    * hash. Returns an int bucket of `nBits` sign bits. */
  def signLshBucket(v: Column, dim: Int, nBits: Int = 12): Column = {
    val bits = (0 until nBits).map { i =>
      // pseudo-random ±1 hyperplane component for (bit i, dim j)
      val proj = aggregate(
        zip_with(v, sequence(lit(0), lit(dim - 1)), (x, j) =>
          x * when(hash(lit(i), j) % 2 === 0, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1 << i)).otherwise(lit(0))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Corpus-scale sign-LSH buckets: posexplode the vector once, ONE
    * partial-aggregating groupBy computing all `nBits` projections (vs the
    * per-row expression form which re-traverses the array per bit). Input
    * needs columns (vec_id, e: array<double>); output (vec_id, bucket). */
  def signLshBuckets(emb: DataFrame, nBits: Int = 12): DataFrame = {
    val ex = emb.select(col("vec_id"), posexplode(col("e")).as(Seq("j", "x")))
    val projs = (0 until nBits).map(i =>
      sum(col("x") *
        when(hash(lit(i), col("j")) % 2 === 0, lit(1.0)).otherwise(lit(-1.0)))
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
      nBits: Int = 12, k: Int = 5): DataFrame = {
    val vecs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      // norms once per vector, not per candidate pair
      .withColumn("nrm", norm2(col("e")))
    val emb = vecs.join(signLshBuckets(vecs, nBits), Seq("vec_id"))
    val a = emb.as("a")
    val b = emb.as("b")
    val scored = a.join(b,
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("qid"), col("b.vec_id").as("vec_id"),
        (dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm"))).as("sim"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"), round(col("sim"), 4).as("sim"))
  }

  /** IVF (inverted-file) ANN: a KMeans coarse quantizer assigns every vector
    * to a centroid cell; a query probes only the `nProbe` nearest cells and
    * scores exact cosine inside them. The scale path for repeated query
    * workloads: cell assignment is precomputable + partitionable by cell id,
    * and each query touches ~nProbe/nCells of the corpus. Centroids are
    * driver-local by construction (KMeans model), so probe selection costs
    * no job. */
  def ivfTopK(spark: SparkSession, dir: String, queryId: Long = 0L,
      k: Int = 10, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("fv", array_to_vector(col("e")))
    val km = new KMeans().setK(nCells).setSeed(8L).setFeaturesCol("fv")
    val model = km.fit(emb)
    val assigned = model.transform(emb)
      .select(col("vec_id"), col("e"), col("prediction").as("cell"))
      .persist()
    val q = assigned.filter(col("vec_id") === queryId)
      .select(col("e")).head.getSeq[Double](0).toArray
    // probe the nProbe nearest cells (centroids are local to the driver)
    val probes = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val arr = c.toArray
        var d = 0.0; var j = 0
        while (j < arr.length) { val t = arr(j) - q(j); d += t * t; j += 1 }
        (i, d)
      }
      .sortBy(_._2).take(nProbe).map(_._1)
    val qlit = array(q.map(lit): _*)
    val out = assigned
      .filter(col("cell").isin(probes.toSeq: _*) && col("vec_id") =!= queryId)
      .select(col("vec_id"), round(cosine(col("e"), qlit), 4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(k)
    // release the assignment cache (fit + query lookup already consumed it;
    // the returned frame recomputes one transform pass when materialized —
    // bounded cost vs leaking a corpus-sized cache entry per invocation)
    assigned.unpersist(blocking = false)
    out
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, LSH-blocked. */
  def embeddingNearDupPairs(spark: SparkSession, dir: String,
      dim: Int = 64, nBits: Int = 10, threshold: Double = 0.95): DataFrame = {
    val vecs = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("e"))
      .withColumn("nrm", norm2(col("e")))
    val emb = vecs.join(signLshBuckets(vecs, nBits), Seq("vec_id"))
    val a = emb.as("a")
    val b = emb.as("b")
    a.join(b,
        col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        (dot(col("a.e"), col("b.e")) / (col("a.nrm") * col("b.nrm"))).as("sim"))
      .filter(col("sim") > threshold)
  }
}
