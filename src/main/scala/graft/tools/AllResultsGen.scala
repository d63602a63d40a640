package graft.tools

import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.functions._

/** Reproduce the reference's flagship AllResults.csv artifact shape at
  * will: several datasets × the FULL 40-cell cross-product
  * ({ST, CT, supervised} × {DT, RF, NB, LR} × {threshold, kBest} ×
  * 2 label fractions) through the SAME shared-grid runner the gate pins
  * (q84's dataset axis + q141's cross-product, both golden-oracle-exact),
  * written as one CSV committed with the round. Deliberately NOT gated:
  * it is the identical code path at k× the fit cost — this run is the
  * evidence that the reference's 2,288-row multi-dataset artifact (ref
  * FunctionsSemiSupervised.scala:188-257 over 7 Keel datasets) is
  * reproducible on demand.
  *
  * Usage: runMain graft.tools.AllResultsGen [sfDir] [outDir]
  */
object AllResultsGen {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/tmp/graft_allresults"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.DriverSession.build(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorMax.register(spark)
    import graft.ml.Experiments
    import graft.sources.Tables
    def frame(every: Int, dims: Int) = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") % every === 0)
      .select(array_to_vector(transform(slice(col("embedding"), 1, dims),
        x => abs(x))).as("features"),
        (col("label") % 2).cast("double").as("label"))
    // the q84 CSV-ingested dataset: real Keel-shaped file through the
    // reader + featurization pipeline (the reference's dataset format)
    val keel = {
      val (raw, featureCols, labelIn) = graft.sources.Ingestion.loadKeelCsv(
        spark,
        s"${graft.operators.SemiSupervised.stageKeelCsv(spark, dir)}/*.csv")
      graft.ml.Featurization.pipeline(featureCols.toSeq, Nil, labelIn)
        .fit(raw).transform(raw).select(col("features"), col("label"))
    }
    val datasets = Map(
      "embeddings_half" -> frame(4, 32),
      "embeddings_front" -> frame(1, 32),
      "keel_csv" -> keel)
    val cells = datasets.keys.toSeq.sorted.flatMap(n => Experiments.grid(n,
      classifiers = Seq("DT", "RF", "NB", "LR"),
      algos = Seq("ST", "CT", "supervised"),
      pcts = Seq(0.1, 0.3),
      criterionValues = Map("threshold" -> Seq(0.8), "kBest" -> Seq(0.5)),
      maxIter = 1))
    val t0 = System.nanoTime()
    val res = Experiments.runGridShared(datasets, cells, k = 2, seed = 8L,
      parallelism = 20)
    res.coalesce(1).write.option("header", "true").mode("overwrite").csv(out)
    println(f"[allresults] ${cells.size} cells in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s -> $out")
    spark.stop()
  }
}
