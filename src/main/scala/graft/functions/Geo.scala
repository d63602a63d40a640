package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geospatial column expressions.
  *
  * The reference computes haversine trip distance with driver-side Scala math
  * over an RDD (ref: notebooks/SemiSupervised/SemiSupervisedAndBaseClassifiers.scala:899-913).
  * Here it is a pure Catalyst expression chain — whole-stage-codegen'd, no UDF,
  * no SerDe boundary — so it vectorizes and survives a 1000-executor scan.
  */
object Geo {

  /** Great-circle distance in km between (lat1,lon1) and (lat2,lon2), degrees.
    * Uses x*x instead of pow(x,2) so the float ops are plain IEEE multiplies
    * (identical across engines, oracle-friendly).
    */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val sLat = sin(dLat / lit(2.0))
    val sLon = sin(dLon / lit(2.0))
    val a = sLat * sLat +
      cos(radians(lat1)) * cos(radians(lat2)) * sLon * sLon
    lit(6371.0) * lit(2.0) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }
}
