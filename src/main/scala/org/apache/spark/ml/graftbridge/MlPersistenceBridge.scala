package org.apache.spark.ml.graftbridge

import org.apache.spark.ml.param.Params
import org.apache.spark.ml.util.{DefaultParamsReader, DefaultParamsWriter}
import org.apache.spark.sql.SparkSession

/** Re-exports the `private[ml]` metadata helpers Spark's own estimators use
  * for persistence, so graft's meta-estimators (SelfTraining/CoTraining) can
  * implement the standard save layout — `path/metadata` params JSON +
  * nested writables in subdirs — exactly like `OneVsRest` does, without
  * reimplementing the JSON format.
  */
object MlPersistenceBridge {

  /** Write `path/metadata` for `instance` (class, uid, params). */
  def saveMetadata(instance: Params, path: String, spark: SparkSession): Unit =
    DefaultParamsWriter.saveMetadata(instance, path, spark)

  /** Read `path/metadata`, validate the class name, and restore every param
    * recorded there onto `instance`. */
  def loadAndSetParams(instance: Params, path: String, spark: SparkSession,
      expectedClassName: String): Unit = {
    val metadata = DefaultParamsReader.loadMetadata(path, spark, expectedClassName)
    metadata.getAndSetParams(instance)
  }

  /** Uid recorded in `path/metadata`. */
  def loadUid(path: String, spark: SparkSession, expectedClassName: String): String =
    DefaultParamsReader.loadMetadata(path, spark, expectedClassName).uid

  /** Instantiate whatever MLReadable class `path/metadata` names and load it
    * (how OneVsRest restores its nested classifier). */
  def loadParamsInstance[T](path: String, spark: SparkSession): T =
    DefaultParamsReader.loadParamsInstance[T](path, spark)
}
