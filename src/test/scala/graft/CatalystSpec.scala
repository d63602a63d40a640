package graft

import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorMax
import graft.plans.{BagOps, GraftExtensions}

/** Tests for the engine's custom Catalyst surface: the VectorMax expression
  * and the bag-difference → anti-join rewrite (rule + combinator forms). */
class CatalystSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (1L, Array(0.1f, 0.9f, 0.3f)),
      (2L, Array(0.5f, 0.2f, 0.5f)),
      (3L, Array(-3.0f, -1.0f, -2.0f)))
      .toDF("id", "arr")
      .withColumn("v", array_to_vector(col("arr")))
  }

  test("vector_max equals array_max(vector_to_array) on dense vectors") {
    VectorMax.register(spark)
    val out = vecs.select(
      col("id"),
      expr("vector_max(v)").as("got"),
      array_max(vector_to_array(col("v"))).as("want"))
    assert(out.filter(col("got") =!= col("want")).count() === 0)
    val m = out.orderBy("id").collect().map(_.getDouble(1)).toSeq
    // expectations widened from float32 source values
    assert(m === Seq(0.9f.toDouble, 0.5f.toDouble, -1.0f.toDouble))
  }

  test("vector_max counts implicit zeros of sparse vectors (toArray.max parity)") {
    import org.apache.spark.ml.linalg.Vectors
    import spark.implicits._
    val sparse = Seq(
      Tuple1(Vectors.sparse(4, Array(1), Array(-0.5))), // zeros present → max 0
      Tuple1(Vectors.sparse(4, Array(0, 3), Array(0.2, 0.7))))
      .toDF("v")
    VectorMax.register(spark)
    val got = sparse.select(expr("vector_max(v)").as("m")).collect().map(_.getDouble(0))
    assert(got.toSeq === Seq(0.0, 0.7))
  }

  test("vector_max participates in whole-stage codegen (no failure on codegen path)") {
    VectorMax.register(spark)
    // force a plan where the expression sits inside a codegen'd projection
    val n = vecs.filter(expr("vector_max(v) > 0.4")).count()
    assert(n === 2)
  }

  test("nfc_normalize: composition, identity fast path, null, codegen parity") {
    import spark.implicits._
    graft.functions.NfcNormalize.register(spark)
    val df = Seq(
      (1L, "cafe\u0301"),        // NFD -> composes to U+00E9
      (2L, "caf\u00e9"),          // already NFC -> identity
      (3L, "plain ascii"),
      (4L, "bad\u0007ctl \ufffd"), // control + replacement survive untouched
      (5L, null.asInstanceOf[String]))
      .toDF("id", "s")
      .withColumn("n", expr("nfc_normalize(s)"))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getString(2) === "caf\u00e9")
    assert(rows(1).getString(2) === "caf\u00e9")
    assert(rows(2).getString(2) === "plain ascii")
    assert(rows(3).getString(2) === "bad\u0007ctl \ufffd")
    assert(rows(4).isNullAt(2))
    // codegen path: the expression inside a filter must agree
    assert(df.filter(expr("nfc_normalize(s) = s")).count() === 3)
  }

  test("q216 probe arithmetic: one of each defect class per doc_id quartet") {
    val out = graft.operators.TextAnalysis.q216UnicodeAudit(spark, sf)
    val tot = out.agg(sum("n_docs"), sum("n_non_nfc"), sum("n_ctrl"),
      sum("n_repl"), sum("nfc_delta_bytes")).head
    val n = tot.getLong(0)
    // doc_ids are uniform over mod-4 classes: each defect count is the
    // size of its class, and NFC composition saves exactly 1 byte per
    // NFD doc (e+U+0301 = 3 bytes -> U+00E9 = 2)
    assert(tot.getLong(1) === tot.getLong(4), "delta bytes = 1 per NFD doc")
    assert(tot.getLong(1) + tot.getLong(2) + tot.getLong(3) <= n)
    assert(tot.getLong(1) > 0 && tot.getLong(2) > 0 && tot.getLong(3) > 0)
  }

  test("BagOps.exceptAllById equals exceptAll on uid-tagged frames") {
    val li = graft.sources.Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val tagged = BagOps.withUid(li).persist()
    tagged.count()
    val sub = tagged.filter(col("l_quantity") > 30.0)
    val viaJoin = BagOps.exceptAllById(tagged, sub)
    val viaExcept = tagged.exceptAll(sub)
    assert(viaJoin.count() === viaExcept.count())
    assert(viaJoin.select(sum("l_quantity")).head.getDouble(0) ===
      viaExcept.select(sum("l_quantity")).head.getDouble(0))
    tagged.unpersist()
  }

  test("extension rule rewrites Except(isAll=true) to anti join for disjoint uid-tagged plans") {
    // fresh session on the same context, with extensions
    val ctx = spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .config(ctx.getConf)
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      s2.conf.set(graft.plans.BagDifferenceToAntiJoin.ConfKey, "true")
      val a = BagOps.withUid(Seq(1, 2, 3, 4).toDF("x"))
        .persist(); a.count()
      // the contract: __uid is row identity in a shared universe — build the
      // subtrahend from a's own materialized rows (fresh plan → disjoint
      // exprIds, same identity space), as an anti-membership use would
      val b = s2.createDataFrame(
        a.filter(col("x") >= 3).collectAsList(), a.schema)
      val out = a.exceptAll(b)
      val optimized = out.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("Except"),
        s"Except not rewritten:\n$optimized")
      assert(out.count() === 2) // x=1,2 remain — difference by identity
      a.unpersist()
    } finally {
      // do NOT s2.stop(): it would kill the shared SparkContext; just
      // restore the suite-wide session as default/active
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
