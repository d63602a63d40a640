package graft.tools

import org.apache.spark.sql.DataFrame

import graft.ml.{Evaluation, Experiments}

/** Decomposition probe for the grid runner's per-chain fixed overhead
  * (the q177 cost question): runs q141's 40-cell grid shape over one
  * embeddings slice at the given sf, but SEQUENTIALLY and with each
  * fit+evaluate chain split into timed phases, so the artifact answers
  * "how much of a grid second is model fitting vs metric evaluation vs
  * fold staging" — the number that justifies (or indicts) the
  * shared-queue runner at the reference's full 2,288-row artifact scale.
  *
  * {{{
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.GridProbe"
  * }}}
  *
  * NOT part of the gate: a measurement tool, like PlanDump/ProfileQuery.
  */
object GridProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.DriverSession.build(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import org.apache.spark.sql.functions._
    import org.apache.spark.ml.functions.array_to_vector
    val coalesceN = sys.env.get("GRIDPROBE_COALESCE").map(_.toInt)
    def frame(): DataFrame = {
      val f = graft.sources.Tables.load(spark, sfDir, "embeddings")
        .filter(col("vec_id") % 4 === 0)
        .select(
          array_to_vector(transform(slice(col("embedding"), 1, 32),
            x => abs(x))).as("features"),
          (col("label") % 2).cast("double").as("label"))
      coalesceN.fold(f)(f.coalesce)
    }

    val cells = Experiments.grid("emb_res0",
      classifiers = Seq("DT", "RF", "NB", "LR"),
      algos = Seq("ST", "CT", "supervised"),
      pcts = Seq(0.1, 0.3),
      criterionValues = Map("threshold" -> Seq(0.8), "kBest" -> Seq(0.5)),
      maxIter = 1)

    def t[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // warm pass (JIT + codegen), untimed
    Experiments.runGridShared(Map("emb_res0" -> frame()), cells.take(6),
      k = 2, seed = 8L, parallelism = 8).count()

    // optional: time the CONCURRENT grid (the q141 shape) instead of the
    // sequential decomposition — GRIDPROBE_CONCURRENT=<parallelism>
    sys.env.get("GRIDPROBE_CONCURRENT").foreach { par =>
      for (round <- 1 to 3) {
        val (_, sec) = t(Experiments.runGridShared(
          Map("emb_res0" -> frame()), cells, k = 2, seed = 8L,
          parallelism = par.toInt).count())
        println(f"GRIDPROBE concurrent par=$par round=$round wall=$sec%.2f")
      }
      spark.stop(); sys.exit(0)
    }

    for (round <- 1 to args.headOption.map(_.toInt).getOrElse(2)) {
      // phase 1 clone: stage fold/mask slices exactly like runGridShared
      val (slices, stageSec) = t {
        val k = 2
        val raw = frame()
        val folded = raw
          .coalesce(Evaluation.cvSlicePartitions(raw.count()))
          .withColumn("__fold", (rand(8L) * k).cast("int"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        folded.count()
        val folds = (0 until k).map { i =>
          (folded.filter(col("__fold") =!= i).drop("__fold"),
            folded.filter(col("__fold") === i).drop("__fold"))
        }
        Seq(0.1, 0.3).map { pct =>
          pct -> folds.map { case (train, test) =>
            val masked = new graft.ml.UnlabeledTransformer()
              .setPercentageLabeled(pct).setSeed(11L).transform(train)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            masked.count()
            (masked, test)
          }
        }.toMap
      }
      var fitSec = 0.0
      var evalSec = 0.0
      var chains = 0
      val partsSeen = scala.collection.mutable.Set.empty[Int]
      val byAlgo = scala.collection.mutable.Map.empty[String, (Double, Double, Int)]
      for (cell <- cells) {
        val fit = Experiments.fitOnMasked(cell)
        for ((masked, test) <- slices(cell.percentageLabeled)) {
          val ((model, _), fs) = t(fit(masked))
          partsSeen += masked.rdd.getNumPartitions
          val (_, es) = t(Evaluation.evaluate4(model, test))
          fitSec += fs; evalSec += es; chains += 1
          val key = s"${cell.algo}-${cell.classifierName}"
          val (f0, e0, c0) = byAlgo.getOrElse(key, (0.0, 0.0, 0))
          byAlgo(key) = (f0 + fs, e0 + es, c0 + 1)
        }
      }
      byAlgo.toSeq.sortBy(-_._2._1).foreach { case (k, (f, e, c)) =>
        println(f"GRIDPROBE   $k%-16s chains=$c fit=${f / c}%.3f eval=${e / c}%.3f")
      }
      slices.values.flatten.foreach(_._1.unpersist(blocking = true))
      println(f"GRIDPROBE round=$round chains=$chains stage=$stageSec%.2f " +
        f"fit=$fitSec%.2f eval=$evalSec%.2f " +
        f"perChainFit=${fitSec / chains}%.4f perChainEval=${evalSec / chains}%.4f " +
        f"maskedParts=${partsSeen.toSeq.sorted.mkString("/")}")
    }
    spark.stop()
  }
}
