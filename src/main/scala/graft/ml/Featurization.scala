package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.PipelineStage
import org.apache.spark.ml.feature.{StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame

/** Featurization conveniences mirroring the reference's pipelines.
  *
  * The reference builds one StringIndexer per categorical column with a
  * "-num" suffix and handleInvalid=keep (ref:
  * FunctionsSemiSupervised.scala:32-42), then a VectorAssembler and a label
  * StringIndexer (ref: SemiSupervisedAndBaseClassifiers.scala:61-70). Here
  * the per-column indexers collapse into ONE multi-column StringIndexer
  * stage — one pass over the data instead of n (the reference's n stages
  * each scan the dataset to build their dictionary).
  */
object Featurization {

  val NumSuffix = "-num"

  /** Multi-column StringIndexer: `cols` → `col + "-num"`, handleInvalid=keep
    * (ref M6). */
  def indexStringColumns(cols: Seq[String]): StringIndexer =
    new StringIndexer()
      .setInputCols(cols.toArray)
      .setOutputCols(cols.map(_ + NumSuffix).toArray)
      .setHandleInvalid("keep")

  /** Assemble features from numeric + indexed categorical columns
    * (ref M13: [StringIndexer ×n] → VectorAssembler → label StringIndexer). */
  def pipeline(
      numericCols: Seq[String],
      categoricalCols: Seq[String],
      labelInputCol: String,
      featuresCol: String = "features",
      labelCol: String = "label"): Pipeline = {
    val stages = Seq.newBuilder[PipelineStage]
    if (categoricalCols.nonEmpty) stages += indexStringColumns(categoricalCols)
    stages += new VectorAssembler()
      .setInputCols((numericCols ++ categoricalCols.map(_ + NumSuffix)).toArray)
      .setOutputCol(featuresCol)
    // "skip" for the LABEL indexer, matching the reference's class indexer
    // (ref SemiSupervisedAndBaseClassifiers.scala:65: handleInvalid="skip";
    // "keep" is only for the FEATURE indexers). "keep" here would add an
    // unseen-label bucket to the class attribute — numClasses+1 — making
    // every downstream binary fit produce length-3 probability vectors
    // that the binary evaluators reject.
    stages += new StringIndexer()
      .setInputCol(labelInputCol)
      .setOutputCol(labelCol)
      .setHandleInvalid("skip")
    new Pipeline().setStages(stages.result().toArray)
  }
}
