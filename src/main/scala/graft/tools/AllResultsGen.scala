package graft.tools

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** Reproduce the reference's flagship AllResults artifact at its FULL
  * published scale: 2,288 grid cells over 7 datasets × 12 classifier
  * variants ({supervised, ST, CT} × {DT, RF, NB, LR}), i.e. 4,576 fit
  * chains at k = 2 — the same experiment volume as the reference's
  * 2,288-row `notebooks/SemiSupervised/Results/AllResults.csv` (2,289
  * lines; driver loops at SemiSupervisedAndBaseClassifiers.scala:120-234,
  * five Keel datasets at pcts 0.05-0.6 plus two big datasets at tiny
  * label fractions). Shape here: 5 "small" 500-row datasets (4 embedding
  * slices + the Keel-CSV-ingested one, the reference's file format) × 8
  * label pcts × (supervised + {ST, CT} × (3 thresholds + 2 kBest)) = 352
  * cells each, and 2 "big" full-width datasets × 6 pcts = 264 each:
  * 5·352 + 2·264 = 2,288 exactly. maxIter = 5, the reference's ST/CT
  * comparison setting.
  *
  * Runs through [[graft.ml.Experiments.runGridResumable]] — the per-cell
  * manifest the reference's 48-minute sequential loop never had: kill
  * the driver anywhere and the rerun refits only the missing cells,
  * bit-identical to an uninterrupted run (seeded fits + multiset-pure
  * staging). Prints an ORDER-INDEPENDENT checksum over the 15 result
  * columns (md5 per canonical row string, low 60 bits, summed mod 2^61)
  * so a kill-resume run and a fresh run are comparable by one value.
  * Deliberately NOT gated: identical code path to the golden-pinned
  * q141/q177/q199 grids at ~19× the fit cost.
  *
  * Usage: runMain graft.tools.AllResultsGen [sfDir] [outCsvDir] [manifestDir]
  */
object AllResultsGen {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_allresults"
    val manifest =
      if (args.length > 2) args(2) else "/tmp/graft_allresults_manifest"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.DriverSession.build(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorMax.register(spark)
    import graft.ml.Experiments
    import graft.sources.Tables

    def slice(pred: org.apache.spark.sql.Column, from: Int, dims: Int) =
      Tables.load(spark, dir, "embeddings")
        .filter(pred)
        .select(array_to_vector(transform(
          expr(s"slice(embedding, $from, $dims)"), x => abs(x)))
          .as("features"),
          (col("label") % 2).cast("double").as("label"))
    val keel = {
      val (raw, featureCols, labelIn) = graft.sources.Ingestion.loadKeelCsv(
        spark,
        s"${graft.operators.SemiSupervised.stageKeelCsv(spark, dir)}/*.csv")
      graft.ml.Featurization.pipeline(featureCols.toSeq, Nil, labelIn)
        .fit(raw).transform(raw).select(col("features"), col("label"))
    }
    // 5 small (the Keel-five analog) + 2 big (the POKER/TXNY analog:
    // every row, tiny label fractions)
    val datasets = Map(
      "small_q0" -> slice(col("vec_id") % 4 === 0, 1, 32),
      "small_q1" -> slice(col("vec_id") % 4 === 1, 1, 32),
      "small_q2" -> slice(col("vec_id") % 4 === 2, 1, 32),
      "small_keel" -> keel,
      "small_q3" -> slice(col("vec_id") % 4 === 3, 1, 32),
      "big_front" -> slice(lit(true), 1, 32),
      "big_back" -> slice(lit(true), 33, 32))
    val smallPcts = Seq(0.05, 0.1, 0.15, 0.2, 0.3, 0.4, 0.5, 0.6)
    val bigPcts = Seq(0.01, 0.03, 0.1, 0.15, 0.3, 0.6)
    def cellsFor(n: String) = Experiments.grid(n,
      classifiers = Seq("DT", "RF", "NB", "LR"),
      algos = Seq("ST", "CT", "supervised"),
      pcts = if (n.startsWith("big")) bigPcts else smallPcts,
      criterionValues = Map("threshold" -> Seq(0.4, 0.5, 0.6),
        "kBest" -> Seq(0.3, 0.5)),
      maxIter = 5)
    val cells = datasets.keys.toSeq.sorted.flatMap(cellsFor)
    require(cells.size == 2288, s"grid is ${cells.size} cells, want 2288")

    val t0 = System.nanoTime()
    val res = Experiments.runGridResumable(datasets, cells, k = 2,
      seed = 8L, parallelism = 32, manifest)
      .localCheckpoint()
    val wall = (System.nanoTime() - t0) / 1e9
    val rows = res.collect()
    val resumed = rows.count(_.getBoolean(15))
    // order-independent checksum over the 15 REAL columns (was_resumed
    // excluded — it differs between a fresh and a resumed run by design)
    // mod applied PER ADDITION: 2,288 values of up to 2^60-1 wrap a plain
    // Long sum (mod 2^64) before a trailing mod could run. Because 2^61
    // divides 2^64 the wrap never corrupts the residue — published
    // checksums from the earlier trailing-mod build are value-identical
    // (re-verified from both run manifests) — but a negative wrapped sum
    // would have printed a negative "checksum" under Scala's
    // sign-following %. acc < 2^61 and v < 2^60 keep acc+v < 2^62.
    val ck = rows.iterator.map { r =>
      val canon = (0 until 15).map { i =>
        val v = r.get(i)
        v match {
          case d: Double => java.lang.Double.doubleToLongBits(d).toString
          case other => String.valueOf(other)
        }
      }.mkString("|")
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = md.digest(canon.getBytes("UTF-8"))
      var acc = 0L
      for (i <- 0 until 8) acc = (acc << 8) | (h(i) & 0xffL)
      acc & ((1L << 60) - 1)
    }.foldLeft(0L)((a, v) => (a + v) % (1L << 61))
    res.drop("was_resumed").coalesce(1)
      .write.option("header", "true").mode("overwrite").csv(out)
    println(f"[allresults] cells=${cells.size} chains=${2 * cells.size} " +
      f"wall=$wall%.1f s resumed=$resumed checksum=$ck -> $out")
    spark.stop()
  }
}
