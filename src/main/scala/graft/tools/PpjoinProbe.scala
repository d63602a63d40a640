package graft.tools

import org.apache.spark.sql.functions._

/** Dev-loop probe for q121's PPJoin candidate funnel: counts the raw
  * prefix-token occurrence matches, the distinct candidate pairs the old
  * `.distinct()` dedup would verify, the pairs surviving the r22
  * per-pair positional/suffix bound, and the true result pairs — the
  * evidence channel for the candidate-reduction claim in
  * [[graft.operators.Linkage.joinFromPrefixIndex]]'s inline note.
  *
  * Usage: runMain graft.tools.PpjoinProbe <sfDir>
  */
object PpjoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.util.DriverSession.build(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    val root = graft.operators.Linkage.stagePrefixIndexOnce(spark, sfDir)
    val prefix = spark.read.parquet(s"$root/prefix")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prefix.count()
    val joined = prefix.as("pa")
      .join(prefix.as("pb"), col("pa.tok") === col("pb.tok") &&
        col("pa.doc_id") < col("pb.doc_id") &&
        col("pa.sz") * 9 <= col("pb.sz") * 10 &&
        col("pb.sz") * 9 <= col("pa.sz") * 10 &&
        (lit(1) + least(col("pa.sz") - col("pa.rn"),
          col("pb.sz") - col("pb.rn"))) >=
          expr("(9 * (pa.sz + pb.sz) + 18) DIV 19"))
      .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"),
        col("pa.rn").as("ra"), col("pb.rn").as("rb"),
        col("pa.sz").as("sa"), col("pb.sz").as("sb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val occ = joined.count()
    val oldCand = joined.select("doc_a", "doc_b").distinct().count()
    val newCand = joined
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("o"), max(col("ra")).as("il"),
        max(col("rb")).as("jl"), first(col("sa")).as("sa"),
        first(col("sb")).as("sb"))
      .filter(col("o") + least(col("sa") - col("il"),
        col("sb") - col("jl")) >= expr("(9 * (sa + sb) + 18) DIV 19"))
      .count()
    val truePairs = graft.operators.Linkage
      .q121PrefixJaccardJoin(spark, sfDir).count()
    println(s"[ppjoin] occurrence matches: $occ")
    println(s"[ppjoin] distinct pairs (old verify set): $oldCand")
    println(s"[ppjoin] pairs after per-pair bound (new verify set): $newCand")
    println(s"[ppjoin] true result pairs: $truePairs")
    // phase attribution for the full query (steady state: 3 passes, min)
    def phase[T](label: String)(body: => T): Unit = {
      val ts = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        body
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ppjoin] phase $label: min ${ts.min}%.2f s " +
        s"(${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    joined.unpersist(blocking = true)
    val rawPairs = prefix.as("pa")
      .join(prefix.as("pb"), col("pa.tok") === col("pb.tok") &&
        col("pa.doc_id") < col("pb.doc_id")).count()
    println(s"[ppjoin] raw token-match pairs (no len/pos filters): $rawPairs")
    println(s"[ppjoin] prefix rows: ${prefix.count()}")
    phase("join-only") {
      prefix.as("pa")
        .join(prefix.as("pb"), col("pa.tok") === col("pb.tok") &&
          col("pa.doc_id") < col("pb.doc_id") &&
          col("pa.sz") * 9 <= col("pb.sz") * 10 &&
          col("pb.sz") * 9 <= col("pa.sz") * 10 &&
          (lit(1) + least(col("pa.sz") - col("pa.rn"),
            col("pb.sz") - col("pb.rn"))) >=
            expr("(9 * (pa.sz + pb.sz) + 18) DIV 19"))
        .count()
    }
    phase("candidate-join+distinct") {
      prefix.as("pa")
        .join(prefix.as("pb"), col("pa.tok") === col("pb.tok") &&
          col("pa.doc_id") < col("pb.doc_id") &&
          col("pa.sz") * 9 <= col("pb.sz") * 10 &&
          col("pb.sz") * 9 <= col("pa.sz") * 10 &&
          (lit(1) + least(col("pa.sz") - col("pa.rn"),
            col("pb.sz") - col("pb.rn"))) >=
            expr("(9 * (pa.sz + pb.sz) + 18) DIV 19"))
        .select(col("pa.doc_id").as("doc_a"), col("pb.doc_id").as("doc_b"))
        .distinct().count()
    }
    phase("full-query") {
      graft.operators.Linkage.q121PrefixJaccardJoin(spark, sfDir).count()
    }
    spark.stop()
  }
}
