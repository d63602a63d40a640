package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashAggregator, TextFunctions}
import graft.operators.Similarity
import graft.plans.Skew

/** Tests for the scale-path additions: IVF ANN, winnowed fingerprints,
  * MinHash Aggregator, salting. */
class ScaleOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("IVF top-k finds high-overlap results vs brute force (recall ≥ 0.5)") {
    val brute = Similarity.bruteForceTopK(spark, sf, k = 10)
      .collect().map(_.getLong(0)).toSet
    val ivf = Similarity.ivfTopK(spark, sf, k = 10, nCells = 8, nProbe = 4)
      .collect().map(_.getLong(0)).toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall too low: $recall (ivf=$ivf brute=$brute)")
  }

  test("q35 recall summary: one row, k results, recall@10 ≥ 0.5 vs brute force") {
    val rows = SparkEntry.queries("q35_ann_ivf")(spark, sf).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getLong(0) === 10L, "n_results must be k")
    val recall = r.getDouble(2)
    assert(recall === r.getLong(1).toDouble / r.getLong(0))
    assert(recall >= 0.5, s"q35 recall@k $recall")
  }

  test("q83 seeded IVF equals a driver-side recompute (assignment, probes, top-k)") {
    // independent in-JVM twin of the DuckDB oracle: fixed-point argmin
    // assignment to the vec_id<16 centroids, 4 probed cells, exact 4dp
    // cosine top-10 within them — must match the query bit for bit
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(
          col("embedding"), _.cast("double")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Long = {
      var s = 0L; var j = 0
      while (j < a.length) { val t = a(j) - b(j); s += (t * t * 1048576d).toLong; j += 1 }
      s
    }
    val cents = (0 until 16).map(c => c -> emb(c.toLong))
    def cellOf(v: Array[Double]): Int =
      cents.map { case (c, cv) => (d2(v, cv), c) }.min._2
    val qv = emb(0L)
    val probes = cents.map { case (c, cv) => (d2(qv, cv), c) }
      .sorted.take(4).map(_._2).toSet
    val qn = math.sqrt(qv.map(x => x * x).sum)
    val raw = emb.toSeq
      .filter { case (id, v) => id != 0L && probes(cellOf(v)) }
      .map { case (id, v) =>
        val dot = v.indices.foldLeft(0.0)((acc, j) => acc + v(j) * qv(j))
        val nrm = math.sqrt(v.indices.foldLeft(0.0)((acc, j) => acc + v(j) * v(j)))
        (id, dot / (nrm * qn))
      }
    val expected = raw
      .map { case (id, s) =>
        (id, BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, sim) => (-sim, id) }.take(10)
    val got = Similarity.q83AnnIvfSeeded(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expected)
    // float-noise margin guard (the q31/q37 flake guard, extended to q83's
    // probed set): scoring sums raw IEEE doubles, whose last-ulp value is
    // summation-order-dependent across engines (~1e-15 absolute); a raw
    // sim essentially ON a 4dp half-boundary could round to different 4th
    // decimals in Spark vs DuckDB. Assert every probed candidate keeps a
    // wide margin so the oracle gate cannot flake on this corpus.
    val minMargin = raw.map { case (_, s) =>
      val f = s * 10000; math.abs(f - math.floor(f) - 0.5)
    }.min
    assert(minMargin > 1e-6,
      f"probed sim within $minMargin%.2e (1e-4 units) of a 4dp rounding boundary")
  }

  test("connectedComponentsStars fails loudly when stopped before convergence") {
    import spark.implicits._
    // mirrors the propagation impl's loud-fail test: a budget too small to
    // reach the fixpoint must throw, never return plausible-looking labels
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalArgumentException] {
      graft.operators.Dedup.connectedComponentsStars(chain, maxRounds = 1)
        .collect()
    }
    assert(e.getMessage.contains("not converged"))
  }

  test("q31/q37 oracle decision boundaries keep a float-noise margin (flake guard)") {
    // Two cross-engine edges rounding can't fix: sign(proj) near 0 decides
    // bucket membership (DuckDB SUM order vs Spark fold order), and a raw
    // sim exactly on a 4dp boundary can round differently. Cross-engine
    // float disagreement is ~1e-15 absolute; this corpus keeps ≥1e-5
    // margins (measured: min|proj| 6.2e-4 at nBits=8, 3.0e-3 at nBits=6;
    // 4dp distance 7.0e-5 in 1e-4 units). If a regenerated corpus ever
    // breaks the oracle gate, this test names the razor-thin edge.
    val dir = "/root/testdata/sf0.01"
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
    def minAbsProj(nBits: Int): Double = {
      val signs = Similarity.planeSigns(nBits, 64)
      val ex = emb.select(col("vec_id"), posexplode(col("e")).as(Seq("j", "x")))
      val projs = (0 until nBits).map(i =>
        sum(col("x") * element_at(array(signs(i).map(lit): _*), col("j") + 1))
          .as(s"p$i"))
      ex.groupBy(col("vec_id")).agg(projs.head, projs.tail: _*)
        .select(least((0 until nBits).map(i => abs(col(s"p$i"))): _*).as("m"))
        .agg(min(col("m"))).head.getDouble(0)
    }
    assert(minAbsProj(8) > 1e-5, "q31 sign-LSH projection margin collapsed")
    assert(minAbsProj(6) > 1e-5, "q37 sign-LSH projection margin collapsed")
    val simMargins = Similarity.embeddingCoBucketSims(spark, dir, nBits = 6)
      .agg(
        min(abs(col("sim") * 10000 - round(col("sim") * 10000, 0))).as("m4dp"),
        min(abs(col("sim") - 0.1)).as("mthr"))
      .head
    assert(simMargins.getDouble(0) > 1e-6, "q37 sim sits on a 4dp boundary")
    assert(simMargins.getDouble(1) > 1e-5, "q37 sim sits on the 0.1 threshold")
  }

  test("winnowed fingerprints: shared long substring ⇒ shared fingerprint") {
    import spark.implicits._
    val common = "the quick brown fox jumps over the lazy dog repeatedly"
    val docs = Seq(
      (1L, s"prefix one $common suffix alpha"),
      (2L, s"completely different start $common and another ending"),
      (3L, "nothing in common with the others at all, separate text entirely"))
      .toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
      explode(TextFunctions.rollingFingerprints(col("text"))).as("fp"))
    val shared12 = fps.filter(col("doc_id") === 1).as("a")
      .join(fps.filter(col("doc_id") === 2).as("b"), Seq("fp")).count()
    val shared13 = fps.filter(col("doc_id") === 1).as("a")
      .join(fps.filter(col("doc_id") === 3).as("b"), Seq("fp")).count()
    assert(shared12 > 0, "docs sharing a 50-char substring must share fingerprints")
    assert(shared13 === 0, "unrelated docs should share no fingerprints")
  }

  test("MinHashAggregator: identical shingle streams agree, estimator tracks Jaccard") {
    import spark.implicits._
    val shingles = Seq(
      ("a", "w1 w2 w3"), ("a", "w2 w3 w4"), ("a", "w3 w4 w5"),
      ("b", "w1 w2 w3"), ("b", "w2 w3 w4"), ("b", "w3 w4 w5"), // same as a
      ("c", "x1 x2 x3"), ("c", "x2 x3 x4")) // disjoint
      .toDF("doc", "sh").as[(String, String)]
    val sketches = shingles.groupByKey(_._1).mapValues(_._2)
      .agg(new MinHashAggregator(64).toColumn)
      .collect().toMap
    assert(MinHashAggregator.estimatedJaccard(sketches("a"), sketches("b")) === 1.0)
    assert(MinHashAggregator.estimatedJaccard(sketches("a"), sketches("c")) < 0.3)
  }

  test("MinHashAggregator sketches equal minhashSignatures output (both families)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five"))
      .toDF("doc_id", "text")
    for (mode <- Seq(false, true)) {
      TextFunctions.oracleMode = mode
      try {
        val viaOp = graft.operators.Dedup.minhashSignatures(docs, numHashes = 16)
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
        val sh = docs.select(col("doc_id"), explode(array_distinct(
            graft.operators.Dedup.shingles(col("text")))).as("sh"))
          .as[(Long, String)]
        val viaUdaf = sh.groupByKey(_._1).mapValues(_._2)
          .agg(new MinHashAggregator(16).toColumn).collect().toMap
        for (id <- Seq(1L, 2L))
          assert(viaOp(id).sameElements(viaUdaf(id)),
            s"oracleMode=$mode doc $id: op=${viaOp(id).toSeq} udaf=${viaUdaf(id).toSeq}")
      } finally TextFunctions.oracleMode = false
    }
  }

  test("saltedJoin equals plain join on a skewed key") {
    import spark.implicits._
    // 90% of fact rows hit one hot key
    val fact = (0 until 2000).map(i =>
      (if (i % 10 == 0) i % 5 else 42, i.toDouble)).toDF("k", "v")
    val dim = (0 until 50).map(i => (i, s"name$i")).toDF("k", "name")
    val plain = fact.join(dim, Seq("k"))
    val salted = Skew.saltedJoin(fact, dim, "k", salt = 8)
    assert(salted.count() === plain.count())
    assert(salted.agg(sum("v")).head.getDouble(0) ===
      plain.agg(sum("v")).head.getDouble(0))
  }

  test("salt spreads identical duplicate rows across >1 reducer sub-key") {
    import spark.implicits._
    // one hot key duplicated 1000× with IDENTICAL row content — a content
    // hash would pin all of them to a single salt (the round-1 flaw)
    val hot = Seq.fill(1000)(("hot", 1.0)).toDF("k", "v").repartition(4)
    val salts = Skew.spray(hot, 8).select("__salt").distinct().count()
    assert(salts > 1, s"duplicate rows collapsed onto $salts salt(s)")
    // and the salted aggregate over those duplicates is still exact
    val agg = Skew.saltedSumCount(hot, "k", "v", salt = 8).head
    assert(agg.getDouble(1) === 1000.0 && agg.getLong(2) === 1000L)
  }

  test("per-row and corpus-scale sketch forms agree value-for-value") {
    import graft.operators.Dedup
    val docs = graft.sources.Tables.load(spark, sf, "documents").limit(50)
    // MinHash: the per-row expression and the explode→partial-agg pipeline
    // share the hex60+affine family — signatures must be identical
    val perRow = docs.select(col("doc_id"),
      Dedup.minhashSignature(col("text")).as("sig"))
    val corpus = Dedup.minhashSignatures(docs)
    val joinedM = perRow.as("p").join(corpus.as("c"), Seq("doc_id"))
      .filter(col("p.sig") =!= col("c.sig"))
    assert(joinedM.count() === 0, "minhash per-row vs corpus diverged")
    // SimHash: same contract for the 60-bit signature
    val perRowS = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("sh"))
    val joinedS = perRowS.as("p").join(Dedup.simhashes(docs).as("c"), Seq("doc_id"))
      .filter(col("p.sh") =!= col("c.sh"))
    assert(joinedS.count() === 0, "simhash per-row vs corpus diverged")
  }

  test("capBuckets bounds degenerate LSH bucket fan-out, leaves small buckets exact") {
    import spark.implicits._
    // adversarial corpus: 500 members collapse into ONE bucket (constant
    // vectors → identical sign bits); uncapped self-join would be 500²
    val members = (0 until 500).map(i => (i.toLong, 7)).toDF("vec_id", "bucket")
    val capped = Skew.capBuckets(members, Seq("bucket"), "vec_id", cap = 50)
    val sizes = capped.groupBy("bucket", "__sub").count()
      .collect().map(_.getLong(2))
    assert(sizes.length > 1, "oversized bucket was not split")
    assert(sizes.max <= 100, s"sub-bucket too large: ${sizes.max}")
    val a = capped.as("a"); val b = capped.as("b")
    val pairs = a.join(b,
      col("a.bucket") === col("b.bucket") &&
      col("a.__sub") === col("b.__sub") &&
      col("a.vec_id") < col("b.vec_id")).count()
    assert(pairs < 500L * 499 / 4, s"fan-out not reduced: $pairs pairs")
    // buckets at/under the cap get one sub-bucket — pair set unchanged
    val small = (0 until 20).map(i => (i.toLong, i % 4)).toDF("vec_id", "bucket")
    val subs = Skew.capBuckets(small, Seq("bucket"), "vec_id", cap = 50)
      .select("__sub").distinct().collect().map(_.getInt(0)).toSeq
    assert(subs === Seq(0), s"small buckets were split: $subs")
  }

  test("no band bucket approaches the candidate-pair cap at gated scale factors") {
    // q146 (and every minhashCandidatePairs consumer) generates pairs
    // through Skew.capBuckets(cap = 10000), while the DuckDB oracle's
    // `pairs` CTE is uncapped: the two silently diverge the moment any
    // (band, bucket) group exceeds the cap. This probe pins the
    // precondition at the gated scale factors — if a fixture ever grows a
    // boilerplate cluster past the cap, this fails loudly instead of the
    // gate hash drifting.
    // sf0.1 included: the BENCH runs there, and a boilerplate cluster past
    // the cap at bench scale would silently diverge engine and oracle
    // while both gated sfs stayed green (the band table is staged
    // fingerprint-keyed state, so after the first build this reads parquet)
    // the sf0.1 leg is skipped (not failed) when the bench-scale dataset
    // isn't staged — a fresh checkout shouldn't fail on environment or
    // silently pay the full sf0.1 band-table staging cost inside sbt test
    val gatedDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    val benchDir = Seq("/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory)
    for (dir <- gatedDirs ++ benchDir) {
      val maxBucket = graft.operators.Dedup.stagedBandTable(spark, dir)
        .groupBy(col("band"), col("bucket")).count()
        .agg(max(col("count"))).head.getLong(0)
      assert(maxBucket <= 10000 / 2,
        s"$dir: largest band bucket $maxBucket is within 2x of the 10000 " +
          "cap — engine pairs would soon drop sub-bucket-crossing pairs " +
          "the uncapped oracle keeps")
    }
  }

  test("registeredDomain: longest public suffix wins, unmatched hosts are NULL") {
    import spark.implicits._
    val rows = Seq(
      "blog.beta-press.co.uk",   // multi-label suffix beats the .uk tail
      "beta-press.co.uk",        // bare registrable domain is itself
      "s3.www.alpha-news.com",   // deep subdomain chain
      "alpha-news.com",
      "epsilon.net",
      "localhost",               // no suffix → unregistrable (NULL)
      "com")                     // a bare suffix has no registrable label
      .toDF("host")
      .select(graft.operators.Curation.registeredDomain(col("host"))
        .as("dom"))
      .collect().map(r => Option(r.getString(0)))
    assert(rows === Seq(
      Some("beta-press.co.uk"), Some("beta-press.co.uk"),
      Some("alpha-news.com"), Some("alpha-news.com"),
      Some("epsilon.net"), None, None))
  }

  test("q196 band compaction: row preservation arithmetic and probe parity") {
    // the gate pins exact values at sf0.01; this pins the structural
    // invariants at the OTHER sf: every tombstoned doc removes exactly its
    // 8 band rows, and the compacted index answers probes identically to
    // the fragmented+filtered view
    val r = SparkEntry.queries("q196_band_compaction")(
      spark, "/root/testdata/sf0.001").collect().head
    val (frag, comp, tomb) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(frag - 8 * tomb === comp,
      s"compaction must drop exactly the tombstoned docs' rows: $r")
    assert(r.getLong(5) === r.getLong(6),
      s"probe parity: fragmented vs compacted pair counts differ: $r")
    assert(r.getLong(3) > r.getLong(4),
      s"compaction must reduce file count: $r")
  }

  test("q196 oracle assumption: every ingest batch has far more than 4 band rows") {
    // the DuckDB oracle models the fragment file count as
    // sum(LEAST(4, c)) per batch — valid only while round-robin
    // repartition(4) fills all 4 output files, i.e. while every
    // doc_id%16 batch is comfortably larger than 4 rows (a band-table
    // read partition with >=4 rows alone fills all 4 outputs). Guard it
    // at every sf the gate or specs touch so a datagen reshape that
    // shrinks batches fails HERE with a named cause, not as a gate flake.
    import org.apache.spark.sql.functions.{col, pmod, lit, min, count}
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
         if new java.io.File(d).isDirectory) {
      val minBatch = graft.operators.Dedup.stagedBandTable(spark, d)
        .groupBy(pmod(col("doc_id"), lit(16)).as("b"))
        .agg(count(lit(1)).as("c"))
        .agg(min(col("c"))).head.getLong(0)
      assert(minBatch >= 64,
        s"$d: smallest doc_id%16 band batch has $minBatch rows — the " +
          "q196 oracle's LEAST(4, c) file-count model needs comfortably " +
          ">4 rows per batch; switch the batch write to a deterministic " +
          "partitioner before trusting the gate")
    }
  }

  test("ZOrder.interleave16 bit layout and scale16 exact integer scaling") {
    import spark.implicits._
    import graft.functions.ZOrder
    val r = Seq((0xFFFFL, 0L, 0L, 0L, 131L),
                (0L, 0xFFFFL, 0L, 0L, 131L),
                (0xFFFFL, 0xFFFFL, 0L, 0L, 131L),
                (1L, 2L, 7L, 0L, 131L))
      .toDF("x", "y", "sx", "smin", "smax")
      .select(
        ZOrder.interleave16(col("x"), col("y")).as("z"),
        ZOrder.scale16(col("sx"), col("smin"), col("smax")).as("s"))
      .collect()
    // x occupies the even bits, y the odd bits
    assert(r(0).getLong(0) === 0x55555555L, "x-only interleave")
    assert(r(1).getLong(0) === 0xAAAAAAAAL.toLong, "y-only interleave")
    assert(r(2).getLong(0) === 0xFFFFFFFFL, "full interleave")
    assert(r(3).getLong(0) === 9L,
      "x bit0 -> z bit0 (=1), y bit1 -> z bit3 (=8)")
    // 7 of [0,131] -> 7*65535 DIV 131 = 3501 (exact integer division)
    assert(r(3).getLong(1) === 7L * 65535L / 131L, "scale16 integer div")
  }

  test("q198 z-order skips where a linear sort cannot, and pays on the leading column") {
    val rows = SparkEntry.queries("q198_zorder_layout")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (zS, lS, _) = rows("suppkey_narrow")
    // the point of z-order: a suppkey box prunes strictly more z-buckets
    // than partkey-sorted buckets (the exact 2-vs-8 split — every linear
    // bucket hit, 2 of 8 z-buckets — is pinned by the golden gate row;
    // here only the ORDERING is asserted so a datagen reshape can't turn
    // a correct layout into a spurious constant mismatch)
    assert(zS < lS,
      s"suppkey-narrow box must skip more z-buckets than linear: $rows")
    val (zP, lP, _) = rows("partkey_narrow")
    // the honest trade: the leading column's perfect clustering beats the
    // curve on its own dimension
    assert(lP <= zP, s"partkey-narrow box should favor the linear sort: $rows")
  }

  test("saltedSumCount equals direct groupBy aggregation") {
    import spark.implicits._
    val df = (0 until 1000).map(i => (if (i % 3 == 0) "hot" else s"k${i % 7}", i.toDouble))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
    val salted = Skew.saltedSumCount(df, "k", "v", salt = 4)
    val joined = direct.as("d").join(salted.as("s"), Seq("k"))
      .filter(col("d.sum_v") =!= col("s.sum_v") || col("d.cnt") =!= col("s.cnt"))
    assert(joined.count() === 0)
    assert(direct.count() === salted.count())
  }

  test("signLshBuckets fails fast on a vector/dim mismatch") {
    import spark.implicits._
    // 3-wide vectors vs configured dim=8: without the guard, element_at past
    // the sign-array end is null, sum skips it, and the buckets are silently
    // wrong — this must throw instead
    val emb = Seq((1L, Array(1.0, 2.0, 3.0))).toDF("vec_id", "e")
    val ex = intercept[Throwable] {
      Similarity.signLshBuckets(emb, nBits = 4, dim = 8).collect()
    }
    val messages = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(messages.contains("signLshBuckets"), s"unexpected failure: $messages")
  }

  test("rollingFingerprintTable equals the per-row expression form (both families)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "short"), // shorter than k → single gram path
      (3L, "abcdefghijabcdefghijabcdefghij"),
      (4L, "ünïcödé text with ünïcödé rëpeated ünïcödé graphemes")) // non-ASCII
      .toDF("doc_id", "text")
    // the custom-Expression table form must reproduce the sketch60-based
    // higher-order-function form under BOTH hash families: xxhash64+mask
    // (production, incl. the non-ASCII substring fallback) and hex60
    // (oracle; pins the byte-wise md5 twin against the hex-string parse)
    for (mode <- Seq(false, true)) {
      TextFunctions.oracleMode = mode
      try {
        val viaTable = graft.operators.TextAnalysis.rollingFingerprintTable(docs)
          .orderBy("doc_id", "fp").collect().map(r => (r.getLong(0), r.getLong(1)))
        val viaExpr = docs.select(col("doc_id"),
            explode(TextFunctions.rollingFingerprints(col("text"))).as("fp"))
          .distinct().orderBy("doc_id", "fp").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        assert(viaTable.toSeq === viaExpr.toSeq, s"oracleMode=$mode")
        assert(viaTable.forall { case (_, fp) => fp >= 0 && fp < (1L << 60) },
          s"fingerprints must be non-negative 60-bit (oracleMode=$mode)")
      } finally TextFunctions.oracleMode = false
    }
  }

  test("sketch60 production branch is pinned: xxhash64 masked to 60 bits") {
    import spark.implicits._
    // fixed vector: xxhash64('graft', seed 42) = -4815631219266125053;
    // & (2^60-1) = 948976303768109827. A transposed mask or sign bug in the
    // production branch (which every Bench sketch number rides on) fails
    // here even though the oracle gate only ever exercises hex60.
    TextFunctions.oracleMode = false
    val r = Seq("graft").toDF("s")
      .select(TextFunctions.sketch60(col("s"))).head.getLong(0)
    assert(r === 948976303768109827L)
    assert(r >= 0 && r < (1L << 60))
    // and the oracle branch agrees with its driver-side twin
    TextFunctions.oracleMode = true
    try {
      val o = Seq("graft").toDF("s")
        .select(TextFunctions.sketch60(col("s"))).head.getLong(0)
      assert(o === TextFunctions.hex60Local("graft"))
    } finally TextFunctions.oracleMode = false
  }

  test("sketch family invariance on sf0.01: production results track the oracle-checked family") {
    // The correctness gate runs every sketch oracle under hex60; Bench and
    // production run xxhash64. This pins the production family's end-to-end
    // results against the oracle-checked ones so a production-branch-only
    // bug cannot ship invisibly. Family-agnostic ops (q22/q23 — md5 content
    // digests) must be EXACTLY equal; banding candidate counts (q24) move
    // only within banding noise; Jaccard-VERIFIED survivors (q49) and
    // sign-LSH pairs (q37 — hyperplanes are md5-driver-side in both
    // families) are exactly equal on this corpus; SimHash blocks (q25) are
    // vocabulary-driven (bit biases of common tokens shift whole buckets),
    // so only the order of magnitude is pinned.
    val dir = "/root/testdata/sf0.01"
    def counts(mode: Boolean): Map[String, Long] = {
      TextFunctions.oracleMode = mode
      try Map(
        "q22" -> SparkEntry.queries("q22_dedup_exact")(spark, dir)
          .collect().map(_.toString).mkString.hashCode.toLong,
        "q23" -> SparkEntry.queries("q23_dedup_tokenset")(spark, dir).count(),
        "q24" -> SparkEntry.queries("q24_dedup_minhash")(spark, dir).count(),
        "q25" -> SparkEntry.queries("q25_dedup_simhash")(spark, dir).count(),
        "q37" -> SparkEntry.queries("q37_embedding_neardup")(spark, dir).count(),
        "q49" -> SparkEntry.queries("q49_neardup_pipeline")(spark, dir).count(),
        "q65" -> SparkEntry.queries("q65_hash_sample")(spark, dir)
          .agg(org.apache.spark.sql.functions.sum("n_sampled")).head.getLong(0))
      finally TextFunctions.oracleMode = false
    }
    val prod = counts(mode = false)
    val oracle = counts(mode = true)
    assert(prod("q22") === oracle("q22"), "exact dedup must be family-agnostic")
    assert(prod("q23") === oracle("q23"), "tokenset dedup must be family-agnostic")
    val relDiff = math.abs(prod("q24") - oracle("q24")).toDouble /
      math.max(prod("q24"), oracle("q24"))
    assert(relDiff <= 0.5, s"q24 candidate counts diverged: $prod vs $oracle")
    val ratio = math.max(prod("q25"), oracle("q25")).toDouble /
      math.min(prod("q25"), oracle("q25"))
    assert(ratio <= 4.0 && prod("q25") > 0,
      s"q25 block-candidate counts diverged: $prod vs $oracle")
    assert(prod("q37") === oracle("q37"),
      "sign-LSH pairs must be family-independent (md5 hyperplanes)")
    assert(prod("q49") === oracle("q49"),
      s"verified near-dup survivors diverged: $prod vs $oracle")
    // hash-sampling keeps ~10% of 10k events under EITHER family; a broken
    // production branch (wrong mask/sign) would skew the rate wildly
    for ((fam, n) <- Seq("prod" -> prod("q65"), "oracle" -> oracle("q65")))
      assert(n > 600 && n < 1400,
        s"q65 $fam-family sample rate implausible: $n of 10000")
  }

  test("ngramJaccard: identical docs score 1.0, near-dup pipeline finds them") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (3L, "alpha beta gamma delta epsilon zeta eta iota"),  // near dup of 1
      (4L, "one two three four five six seven eight"))       // unrelated
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val j = graft.operators.Dedup.ngramJaccard(docs, pairs)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((1L, 2L)) === 1.0)
    assert(j((1L, 3L)) > 0.5 && j((1L, 3L)) < 1.0)
    assert(!j.contains((1L, 4L)) || j((1L, 4L)) < 0.1) // zero intersection drops out
  }

  test("connectedComponents: chain needs multiple propagation rounds, disjoint clusters stay apart") {
    import spark.implicits._
    // 1-2-3-4-5 is a diameter-4 chain (one hop of label movement per
    // round — exercises the iteration + convergence logic, not just the
    // one-round case); {10,11,12} is a triangle; {20,21} an isolated pair.
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)).toDF("doc_a", "doc_b")
    val labels = graft.operators.Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.size === 10)
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(labels(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(labels(_) == 10L))
    assert(Seq(20L, 21L).forall(labels(_) == 20L))
  }

  test("connectedComponentsStars equals propagation on randomized graphs, chains, and stars") {
    import spark.implicits._
    val rng = new scala.util.Random(8)
    def labelsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // deterministic adversarial shapes: a long chain (propagation's worst
    // case), a star, and seeded Erdős–Rényi-ish edge sets
    val shapes = Seq(
      (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq,
      (1L to 20L).map(i => (0L, i)),
      Seq.fill(60)((rng.nextInt(30).toLong, rng.nextInt(30).toLong))
        .filter(p => p._1 != p._2),
      Seq.fill(80)((rng.nextInt(200).toLong, rng.nextInt(200).toLong))
        .filter(p => p._1 != p._2))
    for ((es, i) <- shapes.zipWithIndex) {
      val pairs = es.toDF("doc_a", "doc_b")
      // the 40-chain exceeds propagation's default round budget (diameter
      // 39) — that case must fail LOUDLY at the default, not mislabel
      if (i == 0) intercept[IllegalArgumentException] {
        graft.operators.Dedup.connectedComponents(pairs, maxIter = 30).collect()
      }
      val a = labelsOf(graft.operators.Dedup.connectedComponents(pairs, maxIter = 60))
      val b = labelsOf(graft.operators.Dedup.connectedComponentsStars(pairs))
      assert(a === b, s"shape $i: propagation and star-contraction disagree")
    }
  }

  test("staged band table equals the inline docsWithDups band table (both families)") {
    // stagedBandTable builds over plain `documents`, claiming duplicates
    // collapse in the signature min-aggregate; this pins that claim against
    // the inline computation over the duplicated corpus, per hash family
    import graft.operators.Dedup
    for (oracle <- Seq(false, true)) {
      TextFunctions.withOracleMode(oracle) {
        def rows(df: org.apache.spark.sql.DataFrame) =
          df.collect().map(r => (r.getLong(r.fieldIndex("doc_id")),
            r.getInt(r.fieldIndex("band")),
            r.getLong(r.fieldIndex("bucket")))).toSet
        val staged = rows(Dedup.stagedBandTable(spark, sf))
        val inline = rows(Dedup.bandTable(
          Dedup.minhashSignatures(Dedup.docsWithDups(spark, sf))))
        assert(staged === inline, s"family oracle=$oracle")
      }
    }
  }

  test("stagedBandTable rebuilds on a changed corpus fingerprint, reuses on an unchanged one") {
    import graft.operators.Dedup
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft_bands_fp").toFile
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/documents.parquet"),
      java.nio.file.Paths.get(dir.getPath, "documents.parquet"))
    def stagedEntries =
      graft.util.Staging.builtThisJvm.asScala.count(_.startsWith("bands:" +
        graft.util.Staging.pathSlug(dir.getPath)))
    val n0 = stagedEntries
    val c1 = Dedup.stagedBandTable(spark, dir.getPath).count()
    assert(stagedEntries === n0 + 1, "first call must build and report it")
    Dedup.stagedBandTable(spark, dir.getPath).count()
    assert(stagedEntries === n0 + 1, "unchanged fingerprint must reuse")
    // a regenerated corpus at the same path (new mtime) must NOT hit the
    // stale table — silent reuse here would be wrong dedup with no error
    val f = new java.io.File(dir, "documents.parquet")
    assert(f.setLastModified(f.lastModified() + 60000))
    val c2 = Dedup.stagedBandTable(spark, dir.getPath).count()
    assert(stagedEntries === n0 + 2, "changed fingerprint must rebuild")
    assert(c1 === c2, "same content must yield the same band table")
    graft.util.Fs.deleteRecursively(dir)
    // remove the two published band tables (+ lock files): their slugs
    // embed this run's unique temp path and can never be reused
    val bandsRoot = new java.io.File(
      s"${graft.util.Staging.stagingRoot}/graft_bands")
    val prefix = dir.getPath.replaceAll("[^A-Za-z0-9]+", "_")
    Option(bandsRoot.listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.contains(prefix))
      .foreach(graft.util.Fs.deleteRecursively)
  }

  test("q88 curation verdict: one row per doc, reasons consistent with the source signals") {
    val rows = SparkEntry.queries("q88_curation_verdict")(spark, sf).collect()
    val nDocs = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(rows.length === nDocs, "one verdict per corpus document")
    val codes = Set("boilerplate", "duplicate", "lang", "repetition", "short")
    rows.foreach { r =>
      val keep = r.getBoolean(r.fieldIndex("keep"))
      val n = r.getLong(r.fieldIndex("n_reasons"))
      val reasons = r.getString(r.fieldIndex("reasons"))
      val parts = if (reasons.isEmpty) Seq.empty else reasons.split(",").toSeq
      assert(keep === (n == 0L), s"keep must mean zero reasons: $r")
      assert(parts.length.toLong === n, s"n_reasons must count the codes: $r")
      assert(parts.forall(codes), s"unknown reason code in: $reasons")
      assert(parts === parts.sorted, s"reasons must be alphabetical: $reasons")
    }
    // the duplicate reason must agree with q73's survivorship summary
    val nDup = rows.count(_.getString(3).split(",").contains("duplicate"))
    val q73 = SparkEntry.queries("q73_dedup_survivors")(spark, sf).head
    assert(nDup.toLong === q73.getLong(q73.fieldIndex("n_dropped")),
      "q88's duplicate drops must equal q73's n_dropped")
    // a curation rule that never fires (or always fires) is miscalibrated
    val kept = rows.count(_.getBoolean(1))
    assert(kept > 0 && kept < nDocs, s"degenerate verdict: kept=$kept/$nDocs")
    codes.foreach { c =>
      assert(rows.exists(_.getString(3).split(",").contains(c)),
        s"reason '$c' never fires at gate SF — threshold miscalibrated")
    }
  }

  test("q89 mix rebalance: sqrt smoothing flattens the head, budget and rates bounded") {
    val rows = SparkEntry.queries("q89_mix_rebalance")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length === 5, "one row per language")
    val totalDocs = rows.map(_._2).sum
    val totalTake = rows.map(_._4).sum
    assert(totalTake <= 200L, s"mix exceeds the budget: $totalTake")
    rows.foreach { case (lang, n, wt, take, ppm, sampled) =>
      assert(take <= n, s"$lang: take $take exceeds available $n")
      assert(ppm >= 0 && ppm <= 1000000L, s"$lang: rate $ppm out of range")
      assert(wt === math.sqrt(n.toDouble).floor.toLong, s"$lang: wrong weight")
      assert(sampled <= n, s"$lang: sampled $sampled exceeds available $n")
    }
    // the point of sqrt smoothing: the head language's share of the mix is
    // strictly below its share of the corpus, the tail's strictly above
    val (_, nEn, _, takeEn, _, _) = rows.find(_._1 == "en").get
    assert(takeEn.toDouble / totalTake < nEn.toDouble / totalDocs,
      "head language must be downweighted in the mix")
    rows.filter(_._1 != "en").foreach { case (lang, n, _, take, _, _) =>
      assert(take.toDouble / totalTake > n.toDouble / totalDocs,
        s"tail language $lang must be upweighted in the mix")
    }
  }

  test("staged component labels equal an inline star contraction") {
    import graft.operators.Dedup
    val staged = Dedup.stagedComponentLabels(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = Dedup.connectedComponentsStars(
      Dedup.minhashCandidatePairs(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(staged === inline,
      "persisted labels must match a fresh contraction of the same pairs")
  }

  test("q67 cluster roster: clusters have >= 2 docs and cover exactly the paired docs") {
    val rows = SparkEntry.queries("q67_dedup_clusters")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(1) >= 2L), "a singleton is not a dup cluster")
    val pairDocs = graft.operators.Dedup.minhashCandidatePairs(spark, sf)
      .select(col("doc_a").as("d")).union(
        graft.operators.Dedup.minhashCandidatePairs(spark, sf).select(col("doc_b")))
      .distinct().count()
    assert(rows.map(_.getLong(1)).sum === pairDocs,
      "cluster membership must cover exactly the docs that appear in a pair")
  }

  test("q91 split: partitions the corpus per language, shares near 80/10/10") {
    val rows = SparkEntry.queries("q91_split_assign")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nDocs = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_._3).sum === nDocs, "splits must partition the corpus")
    assert(rows.map(_._2).toSet === Set("train", "val", "test"))
    // hash assignment is independent of lang, so the GLOBAL shares
    // concentrate near 80/10/10 (loose bounds — it's a hash, not a quota)
    val bySplit = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val trainShare = bySplit("train").toDouble / nDocs
    assert(trainShare > 0.7 && trainShare < 0.9, s"train share $trainShare")
    assert(bySplit("val") > 0 && bySplit("test") > 0, "empty holdout split")
    // the assignment contract: re-deriving a doc's split from its key
    // alone reproduces the roster (pure function of the data)
    val h = pmod(TextFunctions.sketch60(col("doc_id").cast("string")), lit(100L))
    val redo = graft.sources.Tables.load(spark, sf, "documents")
      .withColumn("split", when(h < 80, "train").when(h < 90, "val")
        .otherwise("test"))
      .groupBy(col("lang"), col("split")).count()
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    rows.foreach { case (lang, split, n) =>
      assert(redo((lang, split)) === n, s"split not reproducible for $lang/$split")
    }
  }

  test("q92 merge: latest version wins, tombstones drop keys, inserts appear") {
    val rows = SparkEntry.queries("q92_corpus_merge")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byId = rows.map(r => r._1 -> r).toMap
    assert(byId.size === rows.length, "one resolved row per key")
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val deleted = docs.filter(_ % 101 == 0)
    val inserted = docs.filter(_ % 97 == 0).map(d => -(d + 1L))
    assert(deleted.forall(d => !byId.contains(d)),
      "a surviving tombstone must drop its key")
    assert(inserted.forall(byId.contains), "v2 inserts must appear")
    inserted.foreach(i => assert(byId(i)._2 === 2L))
    // updated (and not deleted) keys resolve to v2; untouched keys to v1
    docs.filterNot(deleted).foreach { d =>
      assert(byId(d)._2 === (if (d % 5 == 0) 2L else 1L),
        s"wrong winning version for key $d")
    }
    assert(rows.length === docs.size - deleted.size + inserted.size)
  }

  test("q93 curriculum: phases partition the corpus into ordered near-quarters") {
    val rows = SparkEntry.queries("q93_curriculum_phases")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val nDocs = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_._1).toSeq === Seq(0L, 1L, 2L, 3L), "exactly 4 phases")
    assert(rows.map(_._2).sum === nDocs, "phases must partition the corpus")
    // near-quarters: value ties can only GROW a phase past n/4 by the tie
    // run straddling the boundary; at gate SF no ratio value is hot, so
    // every phase lands within 2x of the ideal quarter
    rows.foreach { case (p, c, _, _) =>
      assert(c > nDocs / 8 && c < nDocs / 2, s"phase $p degenerate size $c")
    }
    // phase 0 is the highest-quality (stopword-densest) slice: mean
    // stopword share must DECREASE monotonically across phases
    val shares = rows.map(r => r._4.toDouble / r._3)
    assert(shares.zip(shares.tail).forall { case (a, b) => a > b },
      s"phase quality must be monotone: ${shares.mkString(", ")}")
  }

  test("q96 z-order cells: every cell's bounds fit its quadrant in BOTH dims") {
    val rows = SparkEntry.queries("q96_zorder_cells")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.forall(r => r._1 >= 0 && r._1 < 16),
      "cells are the 4-bit z prefix")
    val nEv = graft.sources.Tables.events(spark, sf).count()
    assert(rows.map(_._2).sum === nEv, "cells must partition the event log")
    // z-prefix bit layout: cell bits [3,2,1,0] = [ub7, db7, ub6, db6] — so
    // a cell constrains ub AND db each to one 64-wide bucket quadrant;
    // this containment is exactly the per-file min/max pruning property a
    // z-ordered layout gives both dimensions
    rows.foreach { case (cell, _, minUb, maxUb, minDb, maxDb) =>
      val ubTop = (((cell >> 3) & 1) << 1) | ((cell >> 1) & 1)
      val dbTop = (((cell >> 2) & 1) << 1) | (cell & 1)
      assert(minUb >= ubTop * 64 && maxUb < (ubTop + 1) * 64,
        s"cell $cell ub bounds [$minUb,$maxUb] escape quadrant $ubTop")
      assert(minDb >= dbTop * 64 && maxDb < (dbTop + 1) * 64,
        s"cell $cell db bounds [$minDb,$maxDb] escape quadrant $dbTop")
    }
  }

  test("q94 canonical pick: keeper is the token-richest member of each cluster") {
    import graft.operators.Dedup
    val rows = SparkEntry.queries("q94_canonical_pick")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // same clusters and sizes as q67's roster
    val q67 = SparkEntry.queries("q67_dedup_clusters")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows.map(r => (r._1, r._4)).toMap === q67,
      "q94 must report exactly q67's clusters and sizes")
    // keeper maximizes token count within its cluster (ties: smaller id)
    val toks = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val members = Dedup.stagedComponentLabels(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    rows.foreach { case (cluster, keeper, kTok, _) =>
      val best = members(cluster).map(d => (toks(d), -d)).max
      assert((kTok, -keeper) === best,
        s"cluster $cluster keeper $keeper is not the quality argmax")
    }
  }

  test("q98 soft near-dedup keeps exactly ⌈√n⌉ best-ranked members per cluster") {
    import graft.operators.Dedup
    val rows = SparkEntry.queries("q98_soft_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // per-cluster retention count is ⌈√n⌉ with n = the q67 cluster size
    val q67 = SparkEntry.queries("q67_dedup_clusters")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val kept = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    assert(kept.keySet === q67.keySet, "q98 must cover exactly q67's clusters")
    kept.foreach { case (cluster, k) =>
      val n = q67(cluster)
      assert(k === math.ceil(math.sqrt(n.toDouble)).toLong,
        s"cluster $cluster (n=$n) kept $k members")
    }
    // the picks are the rank prefix of the quality ordering, and every
    // cluster's rank-1 pick is q94's canonical keeper
    val toks = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val members = Dedup.stagedComponentLabels(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    rows.groupBy(_._1).foreach { case (cluster, picks) =>
      val expected = members(cluster)
        .sortBy(d => (-toks(d), d)).take(picks.length)
      assert(picks.sortBy(_._4).map(_._2).toSeq === expected.toSeq,
        s"cluster $cluster picks are not the quality-rank prefix")
    }
    val q94 = SparkEntry.queries("q94_canonical_pick")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.filter(_._4 == 1L).foreach { case (cluster, keeper, _, _, _) =>
      assert(q94(cluster) === keeper,
        s"cluster $cluster rank-1 pick disagrees with q94's canonical keeper")
    }
  }

  test("q97 group top-k equals the naive per-group window rank") {
    val got = SparkEntry.queries("q97_group_topk")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // brute force on the driver from the raw table
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.groupBy(_._2).toSeq.flatMap { case (lang, rows) =>
      rows.sortBy(r => (-r._3, r._1)).take(3).zipWithIndex.map {
        case ((id, _, n), i) => (lang, (i + 1).toLong, id, n)
      }
    }.toSet
    assert(got === expected)
  }

  test("q97 cutoff keeps ties flowing into the rank window (>k docs share rank-k count)") {
    // VERDICT r11 task 5: when more than k documents share the rank-k
    // token count in one language, the histogram cutoff (>= cutoff) must
    // admit EVERY tied document into the survivor set and let the exact
    // rank window break ties by doc_id — dropping ties at the cutoff
    // boundary would silently pick an engine-dependent subset
    import spark.implicits._
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = (
      // lang "tt": five docs ALL with 7 tokens — every one ties at rank k=3
      (1L to 5L).map(i => (i, words(7), "tt")) ++
      // lang "uu": distinct counts 9,8,7,6 — cutoff at 7, no ties
      Seq((10L, words(9), "uu"), (11L, words(8), "uu"),
        (12L, words(7), "uu"), (13L, words(6), "uu"))
    ).toDF("doc_id", "text", "lang")
    val dir = java.nio.file.Files.createTempDirectory("graft_q97_ties")
    try {
      docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = graft.operators.TextAnalysis.qGroupTopK(spark, dir.toString, k = 3)
        .collect().map(r =>
          (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val expected = Set(
        // ties broken by doc_id asc — 1,2,3 of the five tied docs
        ("tt", 1L, 1L, 7L), ("tt", 2L, 2L, 7L), ("tt", 3L, 3L, 7L),
        ("uu", 1L, 10L, 9L), ("uu", 2L, 11L, 8L), ("uu", 3L, 12L, 7L))
      assert(got === expected)
    } finally {
      graft.util.Fs.deleteRecursively(dir.toFile)
    }
  }

  test("q99 bigram PMI equals a driver-side recompute (counts, margins, integer lift)") {
    val got = SparkEntry.queries("q99_bigram_pmi")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val texts = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val bi = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
    for (t <- texts) {
      val w = t.split(" ", -1)
      w.foreach(x => uni(x) += 1)
      w.sliding(2).filter(_.length == 2).foreach(p => bi((p(0), p(1))) += 1)
    }
    val n = uni.values.sum
    val expected = bi.toSeq.map { case ((w1, w2), c12) =>
      val (c1, c2) = (uni(w1), uni(w2))
      (w1, w2, c12, c1, c2, c12 * n * 1000000L / (c1 * c2))
    }.sortBy(r => (-r._6, r._1, r._2)).take(20)
    assert(got.toSeq === expected)
  }

  test("q100 PII scrub replaces every planted kind and is a shuffle-free scan") {
    import graft.operators.TextAnalysis
    // behavior on a hand-built row: all three kinds replaced, text around
    // them untouched
    import spark.implicits._
    val scrubbed = Seq(
      "mail a.b+c@ex-1.org then 192.168.0.1 and +1-555-123-4567 end")
      .toDF("t").select(TextAnalysis.scrubPii(col("t"))).head.getString(0)
    assert(scrubbed === "mail <EMAIL> then <IP> and <PHONE> end")
    // overlap accounting: an IP-shaped email local part is consumed by the
    // email pass — it must scrub to ONE <EMAIL> and count zero IPs
    val overlap = Seq("from 1.2.3.4@ex.org sent").toDF("t")
    assert(overlap.select(TextAnalysis.scrubPii(col("t"))).head.getString(0)
      === "from <EMAIL> sent")
    val nIp = overlap.select(
      regexp_count(regexp_replace(col("t"), TextAnalysis.EmailRe, "<EMAIL>"),
        lit(TextAnalysis.Ipv4Re))).head.getInt(0)
    assert(nIp === 0, "IP consumed by the email pass must not be counted")
    // the gate query: every doc carries exactly one planted instance of
    // each kind (the synthetic corpus itself contains none)
    val rows = SparkEntry.queries("q100_pii_scrub")(spark, sf)
    assert(rows.collect().forall(r =>
      r.getLong(2) === 1L && r.getLong(3) === 1L && r.getLong(4) === 1L))
    // plan shape: per-row regex work only — no Exchange anywhere
    val plan = rows.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"q100 must not shuffle:\n$plan")
  }

  test("q101 unigram NLL: one token-stream shuffle, reduced-frame join, " +
      "driver recompute matches") {
    val q = SparkEntry.queries("q101_unigram_logprob")(spark, sf)
    val got = q.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // driver twin: corpus unigram model, per-doc mean -ln p(w), 4 dp
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val uni = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach(_._2.split(" ").filter(_.nonEmpty).foreach(w => uni(w) += 1))
    val n = uni.values.sum.toDouble
    docs.foreach { case (id, t) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      val nll = -ws.map(w => math.log(uni(w) / n)).sum / ws.length
      val (gn, gs) = got(id)
      assert(gn === ws.length.toLong)
      assert(math.abs(gs - nll) < 5e-4, s"doc $id nll $gs vs $nll")
    }
    // scale shape: the exploded token stream rolls up into the persisted
    // (doc_id, w, tf) frame, and BOTH consumers (model branch and scoring
    // join) read that cache — the corpus is exploded and shuffled once,
    // however many scans print its lineage. The InMemoryTableScan on both
    // sides is the witness that the explode computes once.
    val plan = q.queryExecution.executedPlan.toString
    assert("InMemoryTableScan".r.findAllIn(plan).length >= 2,
      s"both consumers must read the persisted token rollup:\n$plan")
  }

  test("q107 fuzzy blocked join equals a driver-side brute force; equi-join, not cartesian") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val cust = graft.sources.Tables.load(spark, sf, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey").cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = cust.groupBy(_._3).map { case (nation, rows) =>
      val pairs = for {
        (ka, na, _) <- rows; (kb, nb, _) <- rows
        if ka < kb && lev(na, nb) <= 2
      } yield ka * 100000 + kb
      nation -> ((pairs.size.toLong, pairs.min))
    }.filter(_._2._1 > 0)
    val q = SparkEntry.queries("q107_fuzzy_join")(spark, sf)
    val got = q.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q107 must block into an equi-join, not an all-pairs product:\n$plan")
  }

  test("q108 BPE merge counts equal a driver-side brute force (top-30 cut, tie order)") {
    val texts = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val vocab = texts.flatMap(_.split(" ", -1)).filter(_.length >= 2)
      .groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val counts = collection.mutable.Map.empty[String, Long]
    vocab.foreach { case (w, f) =>
      (0 until w.length - 1).foreach { i =>
        val p = w.substring(i, i + 2)
        counts(p) = counts.getOrElse(p, 0L) + f
      }
    }
    val expected = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(30)
    val got = SparkEntry.queries("q108_bpe_merges")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("q109 PQ histogram equals a driver-side fixed-point argmin; encode is shuffle-free") {
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(
          col("embedding"), _.cast("double")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def d2(a: Array[Double], b: Array[Double]): Long = {
      var s = 0L; var j = 0
      while (j < a.length) { val t = a(j) - b(j); s += (t * t * 1048576d).toLong; j += 1 }
      s
    }
    val cb = emb.filter(_._1 < 16).sortBy(_._1)
    val expected = collection.mutable.Map.empty[(Long, Long), (Long, Long)]
    emb.foreach { case (id, v) =>
      (0 until 4).foreach { m =>
        val sv = v.slice(m * 16, (m + 1) * 16)
        val code = cb.map { case (cell, cv) =>
          (d2(sv, cv.slice(m * 16, (m + 1) * 16)), cell) }.min._2
        val k = (m.toLong, code)
        val (n, s) = expected.getOrElse(k, (0L, 0L))
        expected(k) = (n + 1, s + id)
      }
    }
    val q = SparkEntry.queries("q109_pq_codes")(spark, sf)
    val got = q.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected.toMap)
    // encode must be a pure projection: the only exchange in the plan is
    // the final tiny histogram aggregation (no join, no corpus explode
    // ahead of it)
    // AQE prints the tree twice (final + initial) — count the materialized
    // shuffle stages, not Exchange text occurrences
    val plan = q.queryExecution.executedPlan.toString
    assert("ShuffleQueryStage".r.findAllIn(plan).length === 1,
      s"q109 encode must not shuffle the corpus:\n$plan")
    assert(!plan.contains("Join"), s"q109 codebook must be literal, not joined:\n$plan")
  }

  test("q111 source overlap matrix folds the candidate pairs symmetrically and completely") {
    val pairs = graft.operators.Dedup.minhashCandidatePairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val srcOf = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = pairs.map { case (a, b) =>
      val (sa, sb) = (srcOf(a), srcOf(b))
      if (sa <= sb) (sa, sb) else (sb, sa)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val got = SparkEntry.queries("q111_source_overlap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === expected)
    assert(got.values.sum === pairs.length.toLong,
      "matrix must account for every candidate pair exactly once")
    got.keys.foreach { case (a, b) =>
      assert(a <= b, s"matrix must be upper-triangular, saw ($a, $b)")
    }
  }

  test("q112 percentile rank equals the naive per-group window; corpus never sorts") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byLang = docs.groupBy(_._2)
    val expected = docs.map { case (id, lang, n) =>
      val g = byLang(lang)
      val pr = g.count(_._3 < n).toDouble / g.length
      id -> BigDecimal(pr).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val q = SparkEntry.queries("q112_pct_rank")(spark, sf)
    val got = q.collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got === expected)
    // the only sort in the plan must be the histogram window's — which
    // sorts (lang, n_chars) rollup rows, behind a partial aggregate, never
    // the document rows themselves
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("partial_count"),
      s"q112 histogram must partial-aggregate map-side:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"q112 rank join-back must broadcast the histogram:\n$plan")
  }

  test("q113 trimmed mean equals the naive double-rank window; kept pass never sorts") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), col("value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val expected = ev.groupBy(_._1).map { case (g, rows) =>
      val t = (rows.length * 10 / 100).toInt
      val byDesc = rows.sortBy(r => (-r._3, r._2)).drop(t).toSet
      val byAsc = rows.sortBy(r => (r._3, r._2)).drop(t).toSet
      val kept = (byDesc & byAsc).toSeq
      val sum = kept.map(r => BigDecimal(r._3).setScale(2)).sum
      g -> ((kept.size.toLong, sum.toDouble))
    }
    val q = SparkEntry.queries("q113_trimmed_mean")(spark, sf)
    val got = q.collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === expected)
    // trim boundaries come from Selection's histogram refinement; the kept
    // pass is filter + hash aggregate — no per-group sort in the plan
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"q113 must not rank via window:\n$plan")
    assert(!plan.contains("Sort"), s"q113 kept pass must not sort:\n$plan")
  }

  test("q115 semantic dedup equals a driver-side recompute; tau margin is guarded") {
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(
          col("embedding"), _.cast("double")).as("e"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def d2(a: Array[Double], b: Array[Double]): Long = {
      var s = 0L; var j = 0
      while (j < a.length) { val t = a(j) - b(j); s += (t * t * 1048576d).toLong; j += 1 }
      s
    }
    val cb = emb.filter(_._1 < 16).sortBy(_._1)
    val cellOf = emb.map { case (id, v) =>
      id -> cb.map { case (c, cv) => (d2(v, cv), c) }.min._2 }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dt = 0.0; var na = 0.0; var nb = 0.0; var j = 0
      while (j < a.length) { dt += a(j) * b(j); na += a(j) * a(j); nb += b(j) * b(j); j += 1 }
      dt / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCell = emb.groupBy(x => cellOf(x._1))
    val tau = 0.40
    var minMargin = Double.MaxValue
    val parent = collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    byCell.values.foreach { vs =>
      for (i <- vs.indices; j <- (i + 1) until vs.length) {
        val s = cos(vs(i)._2, vs(j)._2)
        minMargin = math.min(minMargin, math.abs(s - tau))
        if (s > tau) {
          val (ra, rb) = (find(vs(i)._1), find(vs(j)._1))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
    }
    assert(minMargin > 1e-6,
      s"a within-cell cosine sits $minMargin from tau — oracle margin too thin")
    val expected = emb.map { case (id, _) =>
      id -> ((cellOf(id), if (find(id) == id) 1L else 0L)) }.toMap
    val got = SparkEntry.queries("q115_semantic_dedup")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
  }

  test("q116 calibration columns match an independent local shingle recompute") {
    val got = SparkEntry.queries("q116_sketch_calibration")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got.nonEmpty, "the duplicated corpus must yield candidate pairs")
    // independent exact-overlap recompute: local 3-shingles mirroring
    // Dedup.shingles (w<3 fallback = whole text), sets intersected on the
    // driver — no shared code with the query's join pipeline
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingleSet(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length < 3) Set(t)
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    got.foreach { case ((a, b), (nInter, nUnion, m)) =>
      val (sa, sb) = (shingleSet(docs(a)), shingleSet(docs(b)))
      assert(nInter === (sa & sb).size.toLong, s"n_inter wrong for ($a,$b)")
      assert(nUnion === (sa | sb).size.toLong, s"n_union wrong for ($a,$b)")
      // a candidate pair shares a band bucket = 4 identical signature
      // coordinates (modulo a ~2^-60 bucket-hash collision)
      assert(m >= 4L && m <= 32L, s"match_coords $m out of range for ($a,$b)")
      if (sa == sb)
        assert(m === 32L, s"identical shingle sets must agree on all coords ($a,$b)")
    }
  }

  test("q117 multi-probe stays within Hamming<=1 and never loses recall vs single-probe") {
    val vecs = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"),
        org.apache.spark.sql.functions.transform(
          col("embedding"), _.cast("double")).as("e"))
    val buckets = Similarity.signLshBuckets(vecs, nBits = 10, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val qb = buckets(0L)
    val got = SparkEntry.queries("q117_multiprobe_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(got.nonEmpty && got.length <= 10)
    got.foreach { case (id, _, ph) =>
      val hamming = java.lang.Integer.bitCount(buckets(id) ^ qb)
      assert(hamming <= 1, s"vec $id at Hamming $hamming from the query bucket")
      assert(ph === hamming.toLong, s"probe_hamming mislabeled for vec $id")
    }
    val brute = Similarity.bruteForceTopK(spark, sf, k = 10)
      .collect().map(_.getLong(0)).toSet
    val multi = got.map(_._1).toSet
    val single = got.filter(_._3 == 0L).map(_._1).toSet
    assert((brute & multi).size >= (brute & single).size,
      "adding probe rings must not lose exact-top-k members")
  }

  test("q118/q119 equal driver-side brute forces (baskets, ordered transitions)") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("tu"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // q118: distinct baskets, unordered pairs, integer-floor lift
    val baskets = ev.map(e => (e._1, e._2)).distinct
    val nUsers = ev.map(_._1).distinct.length.toLong
    val c1 = baskets.groupBy(_._2).map { case (t, xs) => t -> xs.length.toLong }
    val exp118 = baskets.groupBy(_._1).values.flatMap { ts =>
      val types = ts.map(_._2).sorted
      for (i <- types.indices; j <- (i + 1) until types.length)
        yield (types(i), types(j))
    }.groupBy(identity).map { case ((a, b), xs) =>
      val cab = xs.size.toLong
      (a, b) -> ((cab, cab * nUsers * 1000000L / (c1(a) * c1(b))))
    }
    val got118 = SparkEntry.queries("q118_cooccurrence_lift")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got118 === exp118)
    // q119: per-user (ts, event_id)-ordered successors, row-normalized ppm
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      val s = es.sortBy(e => (e._3, e._4)).map(_._2)
      s.zip(s.drop(1))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val rowN = trans.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val exp119 = trans.map { case ((f, t), n) =>
      (f, t) -> ((n, n * 1000000L / rowN(f))) }
    val got119 = SparkEntry.queries("q119_transition_matrix")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got119 === exp119)
  }

  test("q110 shard manifest: totals reconcile and the checksum matches an independent plan") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val n = docs.count()
    val chars = docs.agg(sum(col("n_chars"))).head.getLong(0)
    val m = SparkEntry.queries("q110_shard_manifest")(spark, sf).collect()
    assert(m.map(_.getLong(1)).sum === n, "shard doc counts must cover the corpus")
    assert(m.map(_.getLong(2)).sum === chars, "shard char totals must reconcile")
    // independent checksum: per-doc hashes collected and summed on the
    // driver (no groupBy path shared with the query)
    val perDoc = docs.select(
        pmod(TextFunctions.sketch60(col("doc_id").cast("string")),
          lit(64L)).as("shard"),
        pmod(TextFunctions.sketch60(col("doc_id").cast("string")),
          lit(1073741824L)).as("idh"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expectedSums = perDoc.groupBy(_._1).map { case (s, rows) =>
      s -> rows.map(_._2).sum }
    assert(m.map(r => r.getLong(0) -> r.getLong(3)).toMap === expectedSums)
  }

  test("q120 segment AUC equals a driver-side per-row average-rank computation") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("user_id"), col("value"), col("event_type"))
      .collect().map(r => (r.getLong(0) % 4, math.round(r.getDouble(1) * 100),
        if (r.getString(2) == "purchase") 1 else 0))
    val expected = ev.groupBy(_._1).map { case (seg, rows) =>
      // naive per-row average ranks (the definition), not the histogram
      // identity the query uses — an independent path to the same number
      val sorted = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val avgRank = sorted.zipWithIndex.groupBy(_._1._1).map {
        case (bin, grp) =>
          bin -> grp.map(_._2 + 1).sum.toDouble / grp.size
      }
      val p = sorted.count(_._2 == 1).toLong
      val n = sorted.size.toLong
      val rPos = sorted.filter(_._2 == 1).map(r => avgRank(r._1)).sum
      seg -> ((p, n - p, (rPos - p * (p + 1) / 2.0) / (p * (n - p))))
    }
    val got = SparkEntry.queries("q120_roc_auc")(spark, sf).collect()
      .map(r => r.getInt(0).toLong ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === expected.keySet)
    expected.foreach { case (seg, (p, nn, auc)) =>
      val (gp, gnn, gauc) = got(seg)
      assert(gp === p && gnn === nn, s"segment $seg pos/neg counts")
      assert(math.abs(gauc - auc) < 2e-6,
        s"segment $seg AUC $gauc vs driver-side $auc")
      assert(auc > 0.3 && auc < 0.7,
        s"sanity: random-ish scores should give mid AUC, got $auc")
    }
  }

  test("q121 prefix-filtered Jaccard join equals brute force; candidates never go all-pairs") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSet))
    val expected = (for {
      (a, ta) <- docs; (b, tb) <- docs
      if a < b
      inter = (ta & tb).size.toLong
      uni = (ta | tb).size.toLong
      if inter * 10 >= uni * 9
    } yield (a, b) -> ((inter, uni, inter * 1000000L / uni))).toMap
    val q = SparkEntry.queries("q121_prefix_jaccard")(spark, sf)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
    assert(expected.nonEmpty, "fixture must contain ≥1 near-dup pair")
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"q121 must generate candidates via the prefix equi-join:\n$plan")
  }

  test("q123 search equals a driver-side brute force; the postings scan prunes buckets") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val tf = docs.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, g) => (t, d, g.length.toLong) } }
    val dfRank = tf.groupBy(_._1).map { case (t, g) => (t, g.size) }.toSeq
      .sortBy { case (t, c) => (-c, t) }
    val terms = dfRank.take(3).map(_._1).toSet
    val expected = tf.filter(p => terms(p._1)).groupBy(_._2)
      .filter(_._2.map(_._1).toSet.size == terms.size)
      .map { case (d, ps) =>
        val score = ps.map(_._3).sum
        d -> ((score, score * 1000000L / docs.find(_._1 == d).get._2.size))
      }
    val q = SparkEntry.queries("q123_search")(spark, sf)
    val got = q.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    assert(expected.nonEmpty, "the top-df conjunction must match ≥1 doc")
    // the index promise: the pruned postings read opens ≤3 of 16 buckets.
    // Assert on the FILTERED index scan itself (the df-ranking subquery in
    // the gate query legitimately scans all buckets once to pick terms).
    val termLits = got.keySet // force materialization before plan read
    val sfx = sf.replaceAll(".*/", "").replace('.', '_')
    val top3 = spark.table(s"graft_postings_$sfx")
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok").asc).limit(3)
      .collect().map(_.getString(0)).toSeq
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    val plan = try {
      spark.conf.set(key, "false")
      spark.table(s"graft_postings_$sfx")
        .filter(col("tok").isin(top3: _*))
        .queryExecution.executedPlan.toString
    } finally spark.conf.set(key, prev)
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"postings scan must prune buckets:\n$plan")
    assert(m.get.group(1).toInt <= 3,
      s"≤3 query terms must select ≤3 buckets, got ${m.get.group(1)}")
    assert(termLits.nonEmpty)
  }

  test("q124 source-drift TV equals a driver-side rational computation (incl. absent-token mass)") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1).split(" ", -1)))
    val counts = docs.flatMap { case (s, ts) => ts.map(t => (s, t)) }
      .groupBy(identity).map { case ((s, t), g) => (s, t, g.size.toLong) }
    val global = counts.groupBy(_._2).map { case (t, g) => t -> g.map(_._3).sum }
    val nS = counts.groupBy(_._1).map { case (s, g) => s -> g.map(_._3).sum }
    val nT = nS.values.sum
    val expected = nS.map { case (src, ns) =>
      val nr = nT - ns
      // full vocab walk (the naive definition): includes tokens the source
      // never saw — the closed-form term the query folds in
      val cMap = counts.map { case (s, t, c) => (s, t) -> c }.toMap
      val num = global.keysIterator.map { t =>
        val cs = BigInt(cMap.getOrElse((src, t), 0L))
        val cr = BigInt(global(t)) - cs
        (cs * nr - cr * ns).abs
      }.sum
      src -> ((ns, (num * 1000000) / (2 * BigInt(ns) * BigInt(nr))))
    }
    val got = SparkEntry.queries("q124_source_drift")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), BigInt(r.getLong(2))))).toMap
    assert(got === expected)
    assert(expected.values.exists(_._2 > 0), "sources should differ somewhat")
  }

  test("q125 phrase search equals a driver-side scan; both posting reads prune to 1 bucket") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val bigrams = docs.flatMap { case (_, ts) =>
      ts.dropRight(1).zip(ts.drop(1)) }
    val (w1, w2) = bigrams.groupBy(identity).map { case (p, g) => (p, g.size) }
      .toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.head._1
    val expected = docs.map { case (d, ts) =>
      d -> ts.dropRight(1).zip(ts.drop(1)).count(_ == ((w1, w2))).toLong
    }.filter(_._2 > 0).toMap
    val got = SparkEntry.queries("q125_phrase_search")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === expected)
    assert(expected.nonEmpty, "top bigram must occur somewhere")
    // each single-term posting read must open exactly 1 of 16 buckets
    val sfx = sf.replaceAll(".*/", "").replace('.', '_')
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(key)
    val plan = try {
      spark.conf.set(key, "false")
      spark.table(s"graft_postings_pos_$sfx")
        .filter(col("tok") === w1)
        .queryExecution.executedPlan.toString
    } finally spark.conf.set(key, prev)
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(m.isDefined && m.get.group(1).toInt == 1,
      s"a one-term posting read must open exactly 1 bucket:\n$plan")
  }

  test("q123/q125 bucketing toggle is scoped to a cloned session — parent conf untouched") {
    // the queries pin their bucketed scans on a spark.newSession() clone;
    // there is no conf mutation (and no restore) on the parent session at
    // all, so the parent value must be the pre-existing default both
    // before and after — concurrent queries on this session can never
    // observe auto-bucketed scans turned off.
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val before = spark.conf.get(key)
    assert(before === "true", "parent session must start at the default")
    assert(SparkEntry.queries("q123_search")(spark, sf).collect().nonEmpty)
    assert(SparkEntry.queries("q125_phrase_search")(spark, sf).collect().nonEmpty)
    assert(spark.conf.get(key) === before,
      "the scoped-session toggle leaked into the parent session")
  }

  test("q127 systematic sample: chunking-invariant, Σ picks = k, equals driver-side scan") {
    import graft.operators.Sketches
    def rows(chunk: Long) =
      Sketches.q127SystematicSample(spark, sf, k = 12, chunk = chunk)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .sortBy(_._1).toSeq
    // the two-level scan is an implementation detail: any chunk width must
    // produce the identical sample (sf0.001 has 50 docs → 7 chunks at 8)
    val c8 = rows(8)
    assert(c8 === rows(1000), "chunk width must not change the sample")
    assert(c8.map(_._3).sum === 12L, "systematic sampling emits exactly k picks")
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val wt = docs.map(_._2).sum
    var cum = 0L
    val expected = docs.flatMap { case (d, w) =>
      val hi = (24L * (cum + w) + wt - 1) / (2 * wt)
      val lo = (24L * cum + wt - 1) / (2 * wt)
      cum += w
      if (hi - lo >= 1) Some((d, w, hi - lo)) else None
    }.toSeq
    assert(c8 === expected)
  }

  test("q129 grouped median/MAD equal a driver-side order-statistic scan") {
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val expected = ev.groupBy(_._1).map { case (g, rows) =>
      val vs = rows.map(_._2).sorted
      val med = vs((vs.length / 2 + 1) - 1) // rank n/2+1, 1-based
      val devs = vs.map(v => math.abs(v - med)).sorted
      val mad = devs((vs.length / 2 + 1) - 1)
      g -> ((vs.length.toLong, med, mad))
    }
    val got = SparkEntry.queries("q129_grouped_mad")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3))))
      .toMap
    assert(got === expected)
    expected.foreach { case (g, (_, med, mad)) =>
      assert(mad >= 0 && med > 0, s"sanity for $g") }
  }

  test("q130 embedding outliers equal a driver-side exact fixed-point recompute") {
    val rows = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => (x.toDouble * 1048576d).toLong).toArray))
    val expected = rows.groupBy(_._2).toSeq.flatMap { case (label, vs) =>
      val n = BigInt(vs.length)
      val dims = vs.head._3.length
      val csum = Array.tabulate(dims)(p => BigInt(vs.map(_._3(p)).sum))
      val scored = vs.map { case (id, _, fp) =>
        val d2 = (0 until dims).map(p =>
          (BigInt(fp(p)) * n - csum(p)).pow(2)).sum
        (id, d2)
      }.sortBy { case (id, d2) => (-d2, id) }.take(5)
      scored.zipWithIndex.map { case ((id, d2), i) =>
        (label, i + 1L, id) -> (d2 / (n * n)).toLong }
    }
    val got = SparkEntry.queries("q130_embedding_outliers")(spark, sf)
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(got === expected.toMap)
    assert(got.nonEmpty)
  }

  test("q132 cluster label vote equals a driver-side majority recompute") {
    val labels = graft.operators.Dedup.stagedComponentLabels(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap // node -> root
    val langOf = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byRoot = labels.toSeq.groupBy(_._2)
    val expected = byRoot.toSeq.flatMap { case (root, members) =>
      val ids = members.map(_._1).filter(langOf.contains)
      val trusted = ids.filter(_ % 3 == 0)
      if (trusted.isEmpty) Nil
      else {
        val prop = trusted.groupBy(langOf).toSeq
          .sortBy { case (l, g) => (-g.size, l) }.head._1
        ids.filterNot(_ % 3 == 0).map(id =>
          (id, langOf(id), prop, langOf(id) != prop))
      }
    }.toSet
    val got = SparkEntry.queries("q132_cluster_label_vote")(spark, sf)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3))).toSet
    assert(got === expected)
    assert(expected.nonEmpty, "some cluster must propagate a label")
  }

  test("q133 leak-free split: totals reconcile, zero violations, doc-hash split WOULD leak") {
    val rows = SparkEntry.queries("q133_leakfree_split")(spark, sf).collect()
    val nDocs = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum === nDocs, "splits cover the corpus")
    assert(rows.forall(_.getLong(3) === 0L), "no cluster may span splits")
    // the contrast that justifies the operator: hashing DOC ids (q91's
    // split) DOES scatter at least one near-dup cluster across splits here.
    // The doc-level split is computed with the ENGINE'S OWN sketch60
    // expression (whatever hash family this session runs), not a driver
    // twin of one fixed family — the claim is about q91's actual split.
    val labels = graft.operators.Dedup.stagedComponentLabels(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val docSplit = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"),
        pmod(graft.functions.TextFunctions.sketch60(
          col("doc_id").cast("string")), lit(100L)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val leaky = labels.groupBy(_._2).exists { case (_, members) =>
      members.flatMap(m => docSplit.get(m._1)).map {
        case h if h < 80 => "train"; case h if h < 90 => "val"; case _ => "test"
      }.distinct.size > 1
    }
    assert(leaky, "fixture should demonstrate doc-hash leakage " +
      "(if this corpus stops leaking, the contrast claim needs new data)")
  }

  test("q134 datasheet figures reconcile with direct table counts") {
    val r = SparkEntry.queries("q134_datasheet")(spark, sf).collect().head
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    assert(r.getLong(0) === docs.count(), "n_docs")
    assert(r.getLong(3) <= r.getLong(0), "uniques cannot exceed docs")
    assert(r.getLong(11) ===
      (r.getLong(0) - r.getLong(3)) * 1000000L / r.getLong(0), "dup_ppm")
    assert(r.getLong(6) === graft.sources.Tables.events(spark, sf).count(), "n_events")
    assert(r.getLong(9) ===
      graft.sources.Tables.load(spark, sf, "embeddings").count(), "n_vectors")
    assert(r.getLong(8) >= 0, "span_days non-negative")
  }

  test("q135 join-size sketch: exact matches recompute, estimate is a true upper bound") {
    val r = SparkEntry.queries("q135_join_size_sketch")(spark, sf).collect().head
    val counts = graft.sources.Tables.events(spark, sf)
      .groupBy(col("user_id")).count().collect().map(_.getLong(1))
    val exact = counts.map(c => c * c).sum
    assert(r.getLong(0) === exact, "exact self-join cardinality")
    assert(r.getBoolean(2), "CMS inner product must upper-bound the truth")
    assert(r.getLong(1) >= r.getLong(0))
    assert(r.getLong(3) === r.getLong(1) * 1000000L / r.getLong(0), "ppm ratio")
    // sanity: with 1024 counters per row vs this fixture's key count, the
    // collision inflation should be moderate, not orders of magnitude
    assert(r.getLong(3) < 10000000L, s"estimate off by >10x: ${r.getLong(3)} ppm")
  }

  test("q136 RRF fusion: scores recompute from ranks; keyword ranks match a driver scan") {
    val rows = SparkEntry.queries("q136_rrf_fusion")(spark, sf).collect()
    assert(rows.length === 10)
    def term(r: org.apache.spark.sql.Row, i: Int): Long =
      if (r.isNullAt(i)) 0L else 1000000000L / (60L + r.getLong(i))
    rows.foreach { r =>
      assert(r.getLong(3) === term(r, 1) + term(r, 2), s"rrf formula for $r") }
    val scores = rows.map(_.getLong(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "fused list must be rank-ordered")
    // independent keyword-side ranking
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val tf = docs.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, g) => (t, d, g.length.toLong) } }
    val terms = tf.groupBy(_._1).map { case (t, g) => (t, g.size) }.toSeq
      .sortBy { case (t, c) => (-c, t) }.take(3).map(_._1).toSet
    val kwRank = tf.filter(p => terms(p._1)).groupBy(_._2)
      .map { case (d, ps) => d -> ps.map(_._3).sum }.toSeq
      .sortBy { case (d, s) => (-s, d) }.take(50).zipWithIndex
      .map { case ((d, _), i) => d -> (i + 1L) }.toMap
    rows.filterNot(_.isNullAt(1)).foreach { r =>
      assert(kwRank(r.getLong(0)) === r.getLong(1),
        s"kw_rank mismatch for doc ${r.getLong(0)}") }
  }

  test("q139 skyline: chunk-invariant and equals a brute-force dominance scan") {
    import graft.operators.Relational
    def rows(c: Int) = Relational.q139Skyline(spark, sf, chunks = c)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val got = rows(16)
    assert(got === rows(1), "chunking must not change the skyline")
    val m = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars"), col("text")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getString(2).split(" ", -1).distinct.length.toLong))
    val expected = m.filter { case (_, nc, dt) =>
      !m.exists { case (_, nc2, dt2) =>
        dt2 >= dt && nc2 <= nc && (dt2 > dt || nc2 < nc) }
    }.sortBy(_._1).toSeq
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("q140 curation pipeline: stage composition equals a driver-side recompute") {
    val labels = graft.operators.Dedup.stagedComponentLabels(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).length.toLong))
    // recompute the split hash with the engine expression per GROUP key
    val grpOf = docs.map { case (d, _, _) => d -> labels.getOrElse(d, d) }.toMap
    import spark.implicits._
    val grpHash = grpOf.values.toSeq.distinct.toDF("grp")
      .select(col("grp"), pmod(graft.functions.TextFunctions.sketch60(
        col("grp").cast("string")), lit(100L)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = docs
      .filter { case (d, _, _) => labels.get(d).forall(_ == d) } // survivor
      .filter { case (_, _, nt) => nt >= 20 }                    // quality
      .groupBy { case (d, _, _) =>
        grpHash(grpOf(d)) match {
          case h if h < 80 => "train"; case h if h < 90 => "val"; case _ => "test"
        }
      }
      .map { case (s, rows) =>
        s -> ((rows.size.toLong, rows.map(_._3).sum,
          rows.map(_._2).distinct.size.toLong)) }
    val got = SparkEntry.queries("q140_curation_pipeline")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    assert(got.values.map(_._1).sum > 0)
  }

  test("q131 calibration bins: totals reconcile and ppm matches counts") {
    val got = SparkEntry.queries("q131_calibration_bins")(spark, sf).collect()
    val ev = graft.sources.Tables.events(spark, sf)
    assert(got.map(_.getLong(1)).sum === ev.count(), "bins cover every event")
    assert(got.map(_.getLong(2)).sum ===
      ev.filter(col("event_type") === "purchase").count(), "positives covered")
    got.foreach { r =>
      assert(r.getLong(3) === r.getLong(2) * 1000000L / r.getLong(1),
        s"ppm mismatch in bin ${r.getLong(0)}")
      assert(r.getLong(0) >= 0 && r.getLong(0) <= 9)
    }
  }

  test("q143 perplexity terciles equal a driver-side bigram-LM recompute") {
    // independent in-JVM twin of the DuckDB oracle: interpolated bigram LM
    // (0.9·c12/c1 + 0.1·c(w2)/N), nll HALF_UP-rounded to 4 dp, terciles
    // cut at the smallest 2-dp bin with 3·cum ≥ k·total — counts must
    // match exactly, score ranges to 1e-4 (double sum-order headroom)
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val dbt = docs.map { case (id, lang, text) =>
      val t = text.split(" ", -1) // Spark split keeps trailing empties
      val bg = t.sliding(2).filter(_.length == 2)
        .map(a => (a(0), a(1))).toSeq
      (id, lang, bg.groupBy(identity).map { case (k, v) => (k, v.size.toLong) })
    }.filter(_._3.nonEmpty)
    val bi = scala.collection.mutable.HashMap.empty[(String, String), Long]
    dbt.foreach(_._3.foreach { case (k, c) => bi(k) = bi.getOrElse(k, 0L) + c })
    val uni = bi.groupBy(_._1._1).map { case (w, m) => (w, m.values.sum) }
    val n = uni.values.sum.toDouble
    val scored = dbt.map { case (_, lang, m) =>
      val tot = m.values.sum
      val s = m.map { case ((w1, w2), tf) =>
        tf * math.log(0.9 * bi((w1, w2)).toDouble / uni(w1) +
          0.1 * uni.getOrElse(w2, 0L).toDouble / n)
      }.sum
      (lang,
        BigDecimal(-s / tot).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }
    val labeled: Seq[((String, String), Double)] =
      scored.toSeq.groupBy(_._1).toSeq.flatMap { case (lang, ds) =>
        val hist = ds.map(d => math.floor(d._2 * 100).toLong)
          .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
          .toSeq.sortBy(_._1)
        val tot = ds.size.toLong
        var cum = 0L; var t1 = Long.MaxValue; var t2 = Long.MaxValue
        hist.foreach { case (s2, c) =>
          cum += c
          if (t1 == Long.MaxValue && 3 * cum >= tot) t1 = s2
          if (t2 == Long.MaxValue && 3 * cum >= 2 * tot) t2 = s2
        }
        ds.map { case (_, nll) =>
          val s2 = math.floor(nll * 100).toLong
          val b = if (s2 <= t1) "head" else if (s2 <= t2) "middle" else "tail"
          ((lang, b), nll)
        }
      }
    val expected = labeled.groupBy(_._1).map { case (k, vs) =>
      (k, (vs.size.toLong, vs.map(_._2).min, vs.map(_._2).max))
    }
    val got = SparkEntry.queries("q143_ppl_buckets")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet === expected.keySet)
    for ((k, (nD, mn, mx)) <- expected) {
      val (gn, gmn, gmx) = got(k)
      assert(gn === nD, s"$k n_docs: engine $gn vs recompute $nD")
      assert(math.abs(gmn - mn) <= 1e-4 && math.abs(gmx - mx) <= 1e-4,
        s"$k nll range: engine ($gmn,$gmx) vs recompute ($mn,$mx)")
    }
  }

  test("q144 duplicated spans equal a driver-side diagonal-run recompute") {
    // same algorithm on raw gram STRINGS (no hash): 8-token grams, ≤16
    // distinct-doc df cap, diagonal consecutive-run grouping, spans ≥ 12
    val g = 8; val dfCap = 16; val minSpan = 12
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val grams = docs.flatMap { case (id, t) =>
      (0 to t.length - g).map(i => (t.slice(i, i + g).mkString(" "), id, i + 1))
    }
    val keep = grams.groupBy(_._1).filter { case (_, occ) =>
      val d = occ.map(_._2).distinct.size; d >= 2 && d <= dfCap
    }
    val pairHits = keep.values.flatten.toSeq.groupBy(_._1).toSeq.flatMap {
      case (_, occ) =>
        for { a <- occ; b <- occ; if a._2 < b._2 }
          yield ((a._2, b._2, a._3 - b._3), a._3)
    }
    val expected = pairHits.groupBy(_._1).toSeq.flatMap { case ((a, b, _), ps) =>
      // consecutive-run split on one diagonal
      val sorted = ps.map(_._2).distinct.sorted
      val runs = sorted.zipWithIndex.groupBy { case (p, i) => p - i }
        .values.map(_.size + g - 1).filter(_ >= minSpan).toSeq
      runs.map(s => ((a, b), s))
    }.groupBy(_._1).map { case (k, vs) =>
      (k, (vs.map(_._2).max.toLong, vs.size.toLong))
    }
    val got = SparkEntry.queries("q144_dup_spans")(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expected)
    assert(expected.nonEmpty, "fixture must contain ≥1 duplicated span")
  }

  test("q151 BM25 equals a driver-side recompute (scores to 4dp, same top-20 set)") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1).toSeq))
    val tf = docs.flatMap { case (d, ts) =>
      ts.groupBy(identity).map { case (t, g) => (t, d, g.length.toLong) } }
    val dfm = tf.groupBy(_._1).map { case (t, g) => (t, g.size.toLong) }
    val terms = dfm.toSeq.sortBy { case (t, c) => (-c, t) }.take(3)
    val n = docs.length.toLong
    val sumLen = docs.map(_._2.size.toLong).sum
    val avg = sumLen.toDouble / n
    val lens = docs.map { case (d, ts) => d -> ts.size.toLong }.toMap
    val scores = tf.filter(p => terms.exists(_._1 == p._1))
      .groupBy(_._2).map { case (d, ps) =>
        val s = ps.map { case (t, _, f) =>
          val df = dfm.find(_._1 == t).get._2
          math.log((n - df + 0.5) / (df + 0.5) + 1.0) * (f * 2.2) /
            (f + 1.2 * (0.25 + 0.75 * lens(d) / avg))
        }.sum
        d -> (ps.size.toLong, s)
      }
    val expected = scores.toSeq
      .sortBy { case (d, (_, sc)) =>
        (-BigDecimal(sc).setScale(4, BigDecimal.RoundingMode.HALF_UP), d) }
      .take(20).toMap
    val got = SparkEntry.queries("q151_bm25_search")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.keySet === expected.keySet)
    for ((d, (nt, sc)) <- expected) {
      assert(got(d)._1 === nt, s"doc $d n_terms")
      assert(math.abs(got(d)._2 - sc) < 1e-3, s"doc $d score ${got(d)._2} vs $sc")
    }
  }

  test("q152 Gopher rules equal an exact driver-side recompute") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val stop = graft.functions.TextFunctions.EnStopwords.toSet
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val rules = ds.map { case (_, text) =>
        val t = text.split(" ", -1)
        val nW = t.length.toLong
        val sumTok = text.length.toLong - nW + 1
        val nAlpha = t.count(_.exists(c => c >= 'a' && c <= 'z')).toLong
        val nStop = t.distinct.count(stop).toLong
        (nW >= 50 && nW <= 100000,
          3 * nW <= sumTok && sumTok <= 10 * nW,
          5 * nAlpha >= 4 * nW, nStop >= 2)
      }
      src -> ((ds.size.toLong, rules.count(!_._1).toLong,
        rules.count(!_._2).toLong, rules.count(!_._3).toLong,
        rules.count(!_._4).toLong,
        rules.count(r => r._1 && r._2 && r._3 && r._4).toLong))
    }
    val got = SparkEntry.queries("q152_gopher_rules")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got === expected)
    assert(expected.values.exists(_._6 > 0), "some docs should pass all rules")
    assert(expected.values.exists(v => v._2 > 0 || v._3 > 0),
      "some docs should fail some rule")
  }

  test("q153 DSIR weights: target language scores above every background language") {
    val rows = SparkEntry.queries("q153_dsir_weights")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val total = graft.sources.Tables.load(spark, sf, "documents").count()
    assert(rows.map(_._2).sum === total, "every doc must be scored")
    val en = rows.find(_._1 == "en").get
    for ((lang, _, nPos, meanW) <- rows if lang != "en") {
      assert(en._4 > meanW, s"en mean weight must beat $lang")
      assert(nPos <= rows.find(_._1 == lang).get._2)
    }
    assert(en._3 > 0, "some en docs must score positive")
  }

  test("q146 releases its iteration frames: ≤2 new persistent RDDs survive a run") {
    // the PageRank loop localCheckpoints one rank frame per round; the
    // prev-handle sweep must free each round's blocks as the next lands,
    // leaving only the result checkpoint (+ the capBuckets band frame its
    // candidate generator materializes) — not one leaked frame per round
    val before = spark.sparkContext.getPersistentRDDs.keySet
    assert(graft.operators.Dedup.q146PageRank(spark, sf).count() > 0)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.size <= 2,
      s"q146 left ${leaked.size} persistent RDDs behind (expected ≤2)")
  }

  test("q149 BPE encode equals an independent driver-side train+encode") {
    import scala.collection.mutable
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0),
        r.getString(1).split(" ", -1).filter(_.nonEmpty).toSeq))
    val freq = mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { case (_, ws) => ws.foreach(w => freq(w) += 1) }
    var vocab: Map[String, Vector[String]] =
      freq.keysIterator.map(w => w -> w.map(_.toString).toVector).toMap
    for (_ <- 1 to 20) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((w, syms) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += freq(w)
      if (counts.nonEmpty) {
        // identical total order to the engine: cnt DESC, pair ASC
        val (a, b) = counts.toSeq
          .minBy { case ((x, y), c) => (-c, x, y) }._1
        vocab = vocab.map { case (w, syms) =>
          val out = mutable.ArrayBuffer.empty[String]
          for (s <- syms) {
            if (out.nonEmpty && out.last == a && s == b)
              out(out.length - 1) = a + b
            else out += s
          }
          w -> out.toVector
        }
      }
    }
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val ws = ds.flatMap(_._2)
      val nChars = ws.map(_.length.toLong).sum
      val nToks = ws.map(w => vocab(w).size.toLong).sum
      src -> ((ws.size.toLong, nChars, nToks, nChars * 1000000L / nToks))
    }
    val got = SparkEntry.queries("q149_bpe_encode")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("q220 distributed BPE trainer is bit-identical to the capped driver fold (and cap-free)") {
    import org.apache.spark.sql.functions.{count => cnt, _}
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("source"), col("text"))
    val wordFreq = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy(col("w")).agg(cnt(lit(1)).as("f"))
      .persist()
    try {
      val dict = wordFreq.orderBy(col("f").desc, col("w").asc)
        .collect().map(r => (r.getString(0), r.getLong(1)))
      val driver = graft.operators.TextAnalysis.trainMerges(dict, 20)
      val dist = graft.operators.TextAnalysis
        .trainMergesDistributed(wordFreq, 20)
      // same argmax total order => same merge list, round for round
      assert(dist === driver)
      // CAP-FREE: a driver dict capped to 25 words trains on a mutilated
      // pair census and diverges; the distributed trainer has no cap to
      // bind — it must still equal the UNCAPPED driver fold
      val capped = graft.operators.TextAnalysis
        .trainMerges(dict.take(25), 20)
      assert(capped !== driver,
        "fixture too small: the 25-word cap did not bind, pick a smaller cap")
      assert(dist === driver)
      // end-to-end: q220's accounting equals q149's bit for bit (the
      // shared-golden-oracle claim the gate makes)
      val q149 = SparkEntry.queries("q149_bpe_encode")(spark, sf)
        .collect().map(_.toSeq).sortBy(_.head.toString)
      val q220 = SparkEntry.queries("q220_bpe_dist_train")(spark, sf)
        .collect().map(_.toSeq).sortBy(_.head.toString)
      assert(q220 === q149)
    } finally wordFreq.unpersist()
  }

  test("q155 token ids equal an independent driver-side encode (ids + order-sensitive checksums)") {
    import scala.collection.mutable
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("source"), col("doc_id"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ", -1).filter(_.nonEmpty).toSeq))
    val freq = mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { case (_, _, ws) => ws.foreach(w => freq(w) += 1) }
    var vocab: Map[String, Vector[String]] =
      freq.keysIterator.map(w => w -> w.map(_.toString).toVector).toMap
    for (_ <- 1 to 20) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((w, syms) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += freq(w)
      if (counts.nonEmpty) {
        val (a, b) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
        vocab = vocab.map { case (w, syms) =>
          val out = mutable.ArrayBuffer.empty[String]
          for (s <- syms) {
            if (out.nonEmpty && out.last == a && s == b)
              out(out.length - 1) = a + b
            else out += s
          }
          w -> out.toVector
        }
      }
    }
    // frequency-ordered ids over the FINAL symbol vocab
    val symFreq = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, syms) <- vocab; s <- syms) symFreq(s) += freq(w)
    val id = symFreq.toSeq.sortBy { case (sym, f) => (-f, sym) }
      .zipWithIndex.map { case ((sym, _), i) => sym -> i.toLong }.toMap
    val perDoc = docs.map { case (src, d, ws) =>
      val ids = ws.flatMap(w => vocab(w)).map(id)
      val ck = ids.zipWithIndex.map { case (i, p) => (p + 1) * i }.sum
      (src, d, ids.size.toLong, ((ck % 1073741824L) + 1073741824L) % 1073741824L)
    }
    val expected = perDoc.groupBy(_._1).map { case (src, ds) =>
      src -> ((ds.size.toLong, ds.map(_._3).sum, ds.map(_._4).sum))
    }
    val got = SparkEntry.queries("q155_token_ids")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("q202 byte BPE equals an independent driver-side pretokenize+train+encode") {
    import scala.collection.mutable
    val pat = java.util.regex.Pattern
      .compile(graft.operators.TextAnalysis.Gpt2StylePretokenRegex)
    def pretok(t: String): Vector[String] = {
      val m = pat.matcher(t); val out = mutable.ArrayBuffer.empty[String]
      while (m.find()) out += m.group(0)
      out.toVector
    }
    def hexSyms(w: String): Vector[String] =
      w.getBytes("UTF-8").map(b => f"${b & 0xff}%02X").toVector
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("source"), col("doc_id"), col("text"))
      .collect().map { r =>
        val d = r.getLong(1)
        val suffix = (d % 4) match {
          case 0 => " caf\u00e9 9"
          case 1 => " it's ok!"
          case 2 => " we'll win 42"
          case _ => " na\u00efve, \u20ac5..."
        }
        (r.getString(0), d, pretok(r.getString(2) + suffix))
      }
    val freq = mutable.Map.empty[String, Long].withDefaultValue(0L)
    docs.foreach { case (_, _, ws) => ws.foreach(w => freq(w) += 1) }
    var vocab: Map[String, Vector[String]] =
      freq.keysIterator.map(w => w -> hexSyms(w)).toMap
    for (_ <- 1 to 20) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      for ((w, syms) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += freq(w)
      if (counts.nonEmpty) {
        val (a, b) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
        vocab = vocab.map { case (w, syms) =>
          val out = mutable.ArrayBuffer.empty[String]
          for (s <- syms) {
            if (out.nonEmpty && out.last == a && s == b)
              out(out.length - 1) = a + b
            else out += s
          }
          w -> out.toVector
        }
      }
    }
    val symFreq = mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, syms) <- vocab; s <- syms) symFreq(s) += freq(w)
    val id = symFreq.toSeq.sortBy { case (sym, f) => (-f, sym) }
      .zipWithIndex.map { case ((sym, _), i) => sym -> i.toLong }.toMap
    val perDoc = docs.map { case (src, d, ws) =>
      val ids = ws.flatMap(w => vocab(w)).map(id)
      val ck = ids.zipWithIndex.map { case (i, p) => (p + 1) * i }.sum
      val nBytes = ws.map(_.getBytes("UTF-8").length.toLong).sum
      (src, d, ws.size.toLong, nBytes, ids.size.toLong,
        ((ck % 1073741824L) + 1073741824L) % 1073741824L)
    }
    val expected = perDoc.groupBy(_._1).map { case (src, ds) =>
      src -> ((ds.size.toLong, ds.map(_._3).sum, ds.map(_._4).sum,
        ds.map(_._5).sum, ds.map(_._6).sum))
    }
    val got = SparkEntry.queries("q202_byte_bpe")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === expected)
    assert(expected.nonEmpty)
  }

  test("q202 reduces to q149 on a single-word ASCII corpus (byte == char alphabet)") {
    import spark.implicits._
    // one ASCII word per doc: pretokens == words, UTF-8 bytes == chars,
    // so the byte-level trainer/encoder must degenerate EXACTLY to the
    // char-level q149 pipeline — token counts equal per source
    val docs = Seq(
      ("s1", 1L, "alpha"), ("s1", 2L, "alphabet"), ("s1", 3L, "beta"),
      ("s2", 4L, "betamax"), ("s2", 5L, "alpha"), ("s2", 6L, "gamma"),
      ("s2", 7L, "gamut")).toDF("source", "doc_id", "text")
    val byteSide = graft.operators.TextAnalysis
      .byteBpeTokenIds(docs, nMerges = 5).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap // n_tokens
    val charSide = graft.operators.TextAnalysis
      .bpeEncode(docs.select(col("source"), col("text")), nMerges = 5)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap // n_tokens
    assert(byteSide === charSide)
    assert(byteSide("s1") > 0)
  }

  test("q202 pretokenizer contract: contractions, digits, punctuation, multibyte") {
    import spark.implicits._
    // nMerges = 0 isolates the pretokenizer + byte alphabet: tokens ==
    // bytes, and the pretoken/byte counts are hand-derivable.
    // "it's café 42!" -> [it]["'s"][ café][ 42][!]
    //   bytes: 2 + 2 + (1+3+2{é}) + 3 + 1 = 14
    // "a €5... b" -> [a][ €]{1+3}[5][...][ b]
    //   bytes: 1 + 4 + 1 + 3 + 2 = 11
    val docs = Seq(
      ("s1", 1L, "it's caf\u00e9 42!"),
      ("s2", 2L, "a \u20ac5... b")).toDF("source", "doc_id", "text")
    val got = graft.operators.TextAnalysis
      .byteBpeTokenIds(docs, nMerges = 0).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      "s1" -> ((5L, 14L, 14L)),
      "s2" -> ((5L, 11L, 11L))))
  }

  test("q206 streaming CDC merge end-state equals the single-shot q204 merge") {
    // the oracle pins this against SQL at sf0.01; this pins ENGINE vs
    // ENGINE at the other sf — the micro-batched apply and the one-pass
    // batch merge must land on identical per-lang reports
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getString(0), r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7))).sortBy(_._1).toSeq
    val batch = canon(SparkEntry.queries("q204_merge_upsert")(spark, sf)
      .collect())
    val streamed = canon(SparkEntry.queries("q206_stream_cdc_merge")(
      spark, sf).collect())
    assert(streamed === batch)
    assert(batch.exists(_._2) && batch.exists(!_._2),
      "degenerate fixture: need both touched and untouched partitions")
  }

  test("q207 roundtrip survives every doc, incl. a multibyte no-merge fixture") {
    val rows = SparkEntry.queries("q207_bpe_roundtrip")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === r.getLong(2),
        s"${r.getString(0)}: ${r.getLong(2)} of ${r.getLong(1)} docs " +
          "survived the encode->decode roundtrip")
    }
    // zero merges isolates pretokenize + byte alphabet + id bijection:
    // every id is a pure byte symbol, and the decorated corpus's 2- and
    // 3-byte chars must reassemble exactly with no merge fold in play
    graft.operators.TextAnalysis.q207BpeRoundtrip(spark, sf, nMerges = 0)
      .collect().foreach(r => assert(r.getLong(1) === r.getLong(2),
        s"no-merge roundtrip failed for ${r.getString(0)}"))
  }

  test("q149 greedy merge fold: left-to-right non-overlapping, hand-pinned") {
    import spark.implicits._
    // 'aaaa' pins the only overlap case (a == b): greedy left-to-right
    // gives [aa, aa], never the 3 overlapping matches
    val docs = Seq(("s1", "aaaa aa a"), ("s2", "abab bab"))
      .toDF("source", "text")
    // round 1 merges (a,a) (count 4 beats (a,b)=3); round 2 merges (a,b)
    val got = graft.operators.TextAnalysis.bpeEncode(docs, nMerges = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(
      "s1" -> ((3L, 7L, 4L, 1750000L)),
      "s2" -> ((2L, 7L, 4L, 1750000L))))
  }

  test("q150 mixture shards reconcile exactly with q148's recipe totals") {
    // the manifest materializes q148's copy counts row for row: total rows
    // across shards = total copies, total tokens = the recipe's token-out
    val mix = SparkEntry.queries("q148_epoch_mix")(spark, sf).collect()
    val shards = SparkEntry.queries("q150_mixture_shards")(spark, sf).collect()
    assert(shards.map(_.getLong(1)).sum === mix.map(_.getLong(3)).sum)
    assert(shards.map(_.getLong(2)).sum === mix.map(_.getLong(4)).sum)
    assert(shards.length > 1, "copies must spread over multiple shards")
    assert(shards.map(_.getLong(0)).distinct.length === shards.length)
  }

  test("q159 packing accounting matches a driver-side sequential simulation") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("nt"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val L = 256L
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      var off = 0L; var crossings = 0L; var splitDocs = 0L
      rows.sortBy(_._2).foreach { case (_, _, nt) =>
        val k = (off + nt - 1) / L - off / L
        crossings += k; if (k > 0) splitDocs += 1; off += nt
      }
      src -> ((rows.length.toLong, off, (off + L - 1) / L,
        (off + L - 1) / L * L - off, splitDocs, crossings))
    }
    val got = SparkEntry.queries("q159_seq_packing")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got === expected)
    assert(got.values.exists(_._5 > 0), "fixture should split some doc")
  }

  test("q160 HLL registers match an independent JVM md5 implementation") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def sketch(id: Long): (Long, Long) = {
      val h = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val b = java.lang.Long.parseLong(h.take(2), 16) % 64
      val v = java.lang.Long.parseLong(h.substring(2), 16) // 52 bits
      val rho = if (v == 0L) 53L
        else 52L - (64 - java.lang.Long.numberOfLeadingZeros(v)) + 1L
      (b, rho)
    }
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (t, rows) =>
      val regs = rows.map(r => sketch(r._2))
        .groupBy(_._1).map { case (b, rs) => b -> rs.map(_._2).max }
      t -> ((rows.map(_._2).distinct.length.toLong, regs.size.toLong,
        regs.values.sum, regs.map { case (b, r) => r * (b + 1) }.sum))
    }
    val got = SparkEntry.queries("q160_hll_sketch")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(6)))).toMap
    assert(got.view.mapValues(v => (v._1, v._2, v._3, v._4)).toMap ===
      expected)
    // corrected estimate sanity: within 2x of the exact distinct
    got.foreach { case (t, v) =>
      assert(v._5 > 0.5 * v._1 && v._5 < 2.0 * v._1,
        s"$t corrected HLL estimate ${v._5} vs exact ${v._1}")
    }
  }

  test("q161 k-anonymity census matches a driver-side recount") {
    val rows = graft.sources.Tables.load(spark, sf, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"), col("c_acctbal"))
      .collect()
      .map(r => (r.getAs[Number](0).longValue, r.getString(1),
        math.floor(r.getDouble(2) / 1000.0).toLong))
    val classes = rows.groupBy(identity).view.mapValues(_.length.toLong)
    val expected = classes.toSeq.groupBy(_._1._1).map { case (nat, cs) =>
      val sizes = cs.map(_._2)
      nat -> ((cs.length.toLong, sizes.sum,
        sizes.count(_ < 5L).toLong, sizes.filter(_ < 5L).sum, sizes.min))
    }
    val got = SparkEntry.queries("q161_k_anonymity")(spark, sf).collect()
      .map(r => r.getAs[Number](0).longValue ->
        ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))).toMap
    assert(got === expected)
  }

  test("q167 pipeline reconciles internally and stays one shallow plan") {
    val rows = SparkEntry.queries("q167_pretrain_e2e")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (shard, nRows, nTok, nSeq, pad, nSplit, nCross) =>
      assert(pad >= 0 && pad < 256, s"shard $shard pad $pad out of range")
      assert(nSeq * 256 - pad === nTok, s"shard $shard packing identity")
      assert(nSplit <= nRows && nCross >= nSplit)
    }
    // the mixture stage must reconcile with q148's recipe restricted to
    // quality-passing docs: per-source copies × tokens sum to the same
    // totals the shards carry
    val docs = graft.sources.Tables.load(spark, sf, "documents")
    val kept = graft.operators.Curation.gopherPass(docs)
      .filter(col("pass"))
      .select(col("source"), col("doc_id"), col("n_toks"))
    import graft.functions.TextFunctions.sketch60
    val recipe = kept
      .withColumn("factor_ppm",
        lit(500000L) + pmod(sketch60(col("source")), lit(3000000L)))
      .withColumn("copies", expr("factor_ppm DIV 1000000") +
        when(pmod(sketch60(concat_ws(":", col("source"), col("doc_id"))),
          lit(1000000L)) < col("factor_ppm") % 1000000, 1L).otherwise(0L))
      .agg(sum(col("copies")), sum(col("copies") * col("n_toks"))).head()
    assert(rows.map(_._2).sum === recipe.getLong(0))
    assert(rows.map(_._3).sum === recipe.getLong(1))
    // one plan, shallow: packing window + final rollup are the only
    // full-size exchanges
    val plan = SparkEntry.queries("q167_pretrain_e2e")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 4, s"q167 has $exchanges exchanges:\n$plan")
  }

  test("q168 bloom calibration matches an independent JVM replay") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def pos(id: Long): Seq[Long] = {
      val h = md.digest(s"bf:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      (0 until 3).map(j =>
        java.lang.Long.parseLong(h.substring(3 * j, 3 * j + 3), 16) % 4096)
    }
    val ids = graft.sources.Tables.load(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val inserted = ids.filter(_ % 2 == 0)
    val probes = ids.filter(_ % 2 != 0)
    val bits = inserted.flatMap(pos).toSet
    val nFp = probes.count(p => pos(p).forall(bits.contains))
    val r = SparkEntry.queries("q168_bloom_calibration")(spark, sf).head()
    assert(r.getLong(0) === inserted.length.toLong)
    assert(r.getLong(1) === bits.size.toLong)
    assert(r.getLong(2) === probes.length.toLong)
    assert(r.getLong(3) === nFp.toLong)
    assert(r.getBoolean(4))
  }

  test("q169 word entropy matches a driver-side recomputation") {
    def h(words: Seq[String]): Double = {
      val n = words.length.toDouble
      val clc = words.groupBy(identity).values
        .map(g => g.length.toDouble * (math.log(g.length) / math.log(2.0)))
        .sum
      val v = math.log(n) / math.log(2.0) - clc / n
      math.rint(v * 10000.0) / 10000.0
    }
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).toSeq))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val hs = ds.map(d => h(d._2))
      src -> ((ds.length.toLong,
        math.rint(hs.sum / hs.length * 10000.0) / 10000.0,
        hs.min, hs.count(_ < 3.0).toLong))
    }
    val got = SparkEntry.queries("q169_word_entropy")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (src, (n, mean, mn, low)) =>
      val e = expected(src)
      assert(n === e._1)
      assert(math.abs(mean - e._2) < 2e-4, s"$src mean $mean vs ${e._2}")
      assert(math.abs(mn - e._3) < 2e-4)
      assert(low === e._4, s"$src low-entropy count")
    }
  }

  test("q170 dimension variances match a driver-side exact recompute") {
    val vecs = graft.sources.Tables.load(spark, sf, "embeddings")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val dims = vecs.head.length
    val expected = (0 until dims).map { d =>
      // same quantization: 4dp HALF_UP into exact decimal units
      val q = vecs.map(v => math.rint(v(d).toDouble * 10000.0).toLong)
      val n = q.length.toDouble
      val s1 = q.sum.toDouble / 10000.0
      val s2 = q.map(x => x * x).sum.toDouble / 1e8
      d.toLong -> math.rint((s2 / n - (s1 / n) * (s1 / n)) * 1e6) / 1e6
    }.toMap
    val top = expected.toSeq.sortBy { case (d, v) => (-v, d) }.take(8)
    val got = SparkEntry.queries("q170_dim_variance")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getDouble(1))
    assert(got.map(_._1).toSeq === top.map(_._1).toSeq,
      s"selected dims ${got.map(_._1).toSeq} vs ${top.map(_._1).toSeq}")
    got.foreach { case (d, v) =>
      assert(math.abs(v - expected(d)) < 2e-6, s"dim $d: $v vs ${expected(d)}")
    }
  }

  test("q175 A-ES sample: exact bottom-k cut, biased toward heavy docs") {
    import graft.functions.TextFunctions.sketch60
    val keys = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars").cast("double").as("w"),
        ((pmod(sketch60(concat(lit("aes:"), col("doc_id"))),
          lit(1152921504606846976L)).cast("double") + 1.0) /
          1.152921504606846976e18).as("u"))
      .select(col("doc_id"), col("w"),
        round(-log(col("u")) / col("w") * 1000000.0, 4).as("k"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val expected = keys.sortBy(r => (r._3, r._1)).take(20).map(_._1).toSeq
    val got = SparkEntry.queries("q175_weighted_sample")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(got === expected, "bottom-k cut must match the driver replay")
    // weighted bias: the sample's mean weight exceeds the corpus mean
    val sampleW = keys.filter(r => got.contains(r._1)).map(_._2)
    assert(sampleW.sum / sampleW.length > keys.map(_._2).sum / keys.length,
      "A-ES must favor heavier documents")
  }

  test("q176 JL distortion matches a driver replay and preserves distances") {
    // the replay's sign matrix is md5-based (hex60Local), so build and run
    // the engine plan under the same hash family
    graft.functions.TextFunctions.withOracleMode(true) {
    import graft.functions.TextFunctions.hex60Local
    val vecs = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
      .sortBy(_._1)
    def proj(v: Array[Double]): Array[Double] =
      Array.tabulate(16) { j =>
        var acc = 0.0
        var d = 0
        while (d < v.length) {
          acc += (if (hex60Local(s"jl:$j:$d") % 2 == 0) v(d) else -v(d))
          d += 1
        }
        acc / 4.0
      }
    def dist(a: Array[Double], b: Array[Double]): Double =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    val byId = vecs.map(v => v._1 -> v).toMap
    val ratios = vecs.flatMap { case (id, lab, v) =>
      byId.get(id + 1).map { case (_, _, w) =>
        lab -> math.rint(dist(proj(v), proj(w)) / dist(v, w) * 10000.0) / 10000.0
      }
    }
    val expected = ratios.groupBy(_._1).view.mapValues { rs =>
      val vs = rs.map(_._2)
      (vs.length.toLong,
        math.rint(vs.sum / vs.length * 10000.0) / 10000.0, vs.min, vs.max)
    }.toMap
    val got = SparkEntry.queries("q176_jl_projection")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (lab, (n, mean, mn, mx)) =>
      val e = expected(lab)
      assert(n === e._1)
      assert(math.abs(mean - e._2) < 2e-4, s"label $lab mean")
      assert(math.abs(mn - e._3) < 2e-4 && math.abs(mx - e._4) < 2e-4)
      // the JL promise itself: distances survive 64 -> 16 on average
      assert(mean > 0.8 && mean < 1.2, s"label $lab distortion $mean")
    }
    }
  }

  test("q162 triangle counts match a brute-force driver enumeration") {
    val es = graft.operators.Dedup.minhashCandidatePairs(spark, sf)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    es.foreach { case (u, v) => adj(u) += v; adj(v) += u }
    val tri = scala.collection.mutable.Map.empty[Long, Long]
      .withDefaultValue(0L)
    for ((u, v) <- es; w <- adj(u) & adj(v) if w > v) {
      tri(u) += 1; tri(v) += 1; tri(w) += 1
    }
    val expected = adj.map { case (d, nb) =>
      d -> ((nb.size.toLong, tri(d)))
    }.toMap
    val got = SparkEntry.queries("q162_triangle_count")(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    // a doc's triangles are bounded by its wedge count C(deg, 2)
    got.foreach { case (d, (deg, t)) =>
      assert(t <= deg * (deg - 1) / 2, s"doc $d: $t triangles, deg $deg")
    }
  }

  test("q178 CDC chunking is insertion-robust; fixed windows are not") {
    import spark.implicits._
    // 200 deterministic pseudo-words, then the same doc with ONE word
    // inserted near the front — the CDC selling point is that only the
    // chunk containing the insertion reflows
    val words = (0 until 200).map(i => s"w${(i * 2654435761L) % 997}")
    val inserted = (words.take(10) :+ "INSERTED") ++ words.drop(10)
    val docs = Seq(
      (1L, "srcA", words.mkString(" ")),
      (2L, "srcA", inserted.mkString(" "))
    ).toDF("doc_id", "source", "text")
    val chunks = graft.operators.Dedup.cdcChunkTable(docs)
      .select(col("doc_id"), col("cfp")).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val (a, b) = (chunks(1L), chunks(2L))
    // every original chunk except the (possibly split) one holding the
    // insertion survives byte-identically: ≤ 2 of A's fingerprints missing
    val lost = (a -- b).size
    assert(lost <= 2, s"CDC lost $lost of ${a.size} chunks on one insertion")
    assert(a.size >= 10, s"divisor-8 CDC should cut ~25 chunks, got ${a.size}")
    // contrast: FIXED 8-word windows lose every window after the insertion
    def fixedFps(ws: Seq[String]): Set[String] =
      ws.grouped(8).map(_.mkString(" ")).toSet
    val fixedLost = (fixedFps(words) -- fixedFps(inserted)).size
    assert(fixedLost > a.size / 2,
      s"fixed windows should shift nearly everywhere, lost only $fixedLost")
  }

  test("q180 Zipf slope matches a driver-side least-squares recompute") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).toSeq))
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val counts = ds.flatMap(_._2).groupBy(identity).view
        .mapValues(_.size.toLong).toSeq
      // rank by (freq desc, token asc) — the query's deterministic order
      val top = counts.sortBy { case (tok, c) => (-c, tok) }.take(50)
      val pts = top.zipWithIndex.map { case ((_, c), i) =>
        (math.rint(math.log(i + 1.0) * 10000.0) / 10000.0,
          math.rint(math.log(c.toDouble) * 10000.0) / 10000.0)
      }
      val n = pts.length.toDouble
      val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
      val sxy = pts.map(p => p._1 * p._2).sum
      val sxx = pts.map(p => p._1 * p._1).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      src -> ((pts.length.toLong, top.map(_._2).max,
        math.rint(slope * 10000.0) / 10000.0))
    }
    val got = SparkEntry.queries("q180_zipf_slope")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (src, (n, top, slope)) =>
      val e = expected(src)
      assert(n === e._1, s"$src n_ranks")
      assert(top === e._2, s"$src top_freq")
      assert(math.abs(slope - e._3) < 2e-4, s"$src slope $slope vs ${e._3}")
      // any real token stream ranks downhill: slope strictly negative
      assert(slope < 0.0 && slope > -5.0, s"$src implausible slope $slope")
    }
  }

  test("q181 repetition rules: interval union counts overlaps once") {
    import spark.implicits._
    // doc 1: "a b a b a b ..." — the top 2-gram "a b" owns the doc, and
    // every 5-gram repeats, so BOTH top2 and dup5 fire. Its duplicated
    // 5-gram occurrences overlap heavily: naive 5·occurrences would be
    // ≫ n, the exact union is the whole doc.
    // doc 2: 60 distinct words — nothing repeats, all rules pass.
    // doc 3: two copies of one 5-gram inside otherwise-distinct text —
    //   covered = exactly 10 of 70 tokens (no overlap), under the 15%
    //   bound ⇒ dup5 must NOT fire; top2 occ=2 over n=70 passes too.
    val rep = Seq.fill(30)("a b").mkString(" ")
    val uniq = (0 until 60).map("u" + _).mkString(" ")
    val planted = ((0 until 20).map("v" + _) ++ Seq("p q r s t") ++
      (20 until 60).map("v" + _) ++ Seq("p q r s t")).mkString(" ")
    val docs = Seq((1L, "sA", rep), (2L, "sB", uniq), (3L, "sC", planted))
      .toDF("doc_id", "source", "text")
    val got = graft.operators.Curation.repetitionRollup(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got("sA") === ((1L, 1L, 1L, 1L, 0L)), s"sA ${got("sA")}")
    assert(got("sB") === ((1L, 0L, 0L, 0L, 1L)), s"sB ${got("sB")}")
    assert(got("sC") === ((1L, 0L, 0L, 0L, 1L)), s"sC ${got("sC")}")
  }

  test("q182 tokenizer coverage equals an independent driver-side audit") {
    import graft.operators.TextAnalysis.{encodeDriver, trainMerges}
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("source"), col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getString(2).split(" ", -1).filter(_.nonEmpty).toSeq))
    // train on the en slice, capped dict — same total order as the query
    val freq = scala.collection.mutable.Map.empty[String, Long]
      .withDefaultValue(0L)
    docs.filter(_._2 == "en").foreach(_._3.foreach(w => freq(w) += 1))
    val dict = freq.toSeq.sortBy { case (w, f) => (-f, w) }.take(12).toArray
    val merges = trainMerges(dict, 20)
    val vocab = dict.iterator
      .flatMap { case (w, _) => encodeDriver(w, merges) }.toSet
    val expected = docs.groupBy(_._1).map { case (src, ds) =>
      val ws = ds.flatMap(_._3)
      val encs = ws.map(w => encodeDriver(w, merges))
      val nTok = encs.map(_.size.toLong).sum
      val nOovTok = encs.map(_.count(s => !vocab(s)).toLong).sum
      val nOovW = encs.count(_.exists(s => !vocab(s))).toLong
      src -> ((ws.size.toLong, nTok, nOovTok, nOovW,
        nOovTok * 1000000L / nTok))
    }
    val got = SparkEntry.queries("q182_tokenizer_coverage")(spark, sf)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got === expected)
    // the audit must measure something: real OOV somewhere
    assert(expected.values.map(_._3).sum > 0L, "no OOV anywhere — vacuous")
  }

  test("q184 KS drift equals a driver-side exact two-sample recompute") {
    val cutUs = java.time.LocalDateTime.parse("2024-01-16T00:00:00")
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    val ev = graft.sources.Tables.events(spark, sf)
      .select(col("event_type"), col("value"), unix_micros(col("ts")))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val expected = ev.groupBy(_._1).map { case (et, rows) =>
      val early = rows.filter(_._3 < cutUs).map(_._2).sorted
      val late = rows.filter(_._3 >= cutUs).map(_._2).sorted
      val (n1, n2) = (early.length.toLong, late.length.toLong)
      val support = (early ++ late).distinct.sorted
      val num = support.map { v =>
        val c1 = early.count(_ <= v).toLong
        val c2 = late.count(_ <= v).toLong
        math.abs(c1 * n2 - c2 * n1)
      }.max
      et -> ((n1, n2, num * 1000000L / (n1 * n2)))
    }
    val got = SparkEntry.queries("q184_ks_drift")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (et, (n1, n2, ppm, flag)) =>
      val e = expected(et)
      assert((n1, n2, ppm) === e, s"$et")
      assert(flag === (ppm > 50000L), s"$et flag")
    }
    // same synthetic distribution both halves: D should sit well under
    // the D≈1 a real shift would produce (sanity that ppm is a fraction)
    assert(got.values.forall(_._3 < 1000000L))
  }

  test("q185 curriculum phases equal a driver-side ranked recompute") {
    val docs = graft.sources.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val ws = r.getString(1).split(" ", -1)
        (r.getLong(0), ws.length.toLong,
          ws.distinct.length.toLong * 1000000L / ws.length)
      }
    val total = docs.map(_._2).sum
    var cum = 0L
    val expected = docs.sortBy(d => (d._3, d._1)).map { case (_, n, s) =>
      cum += n
      ((cum - 1) * 4 / total, n, s)
    }.groupBy(_._1).map { case (p, rows) =>
      p -> ((rows.length.toLong, rows.map(_._2).sum,
        rows.map(_._3).min, rows.map(_._3).max))
    }
    val got = SparkEntry.queries("q185_curriculum_phases")(spark, sf)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    assert(got === expected)
    // the defining property: phases carry near-equal token budgets
    // (off by at most one straddling document's tokens)
    val budgets = got.values.map(_._2)
    val maxDoc = docs.map(_._2).max
    assert(got.size === 4)
    assert(budgets.max - budgets.min <= 2 * maxDoc,
      s"unbalanced phases: $budgets (max doc $maxDoc)")
  }

  test("q186 MMR equals a driver-side greedy; first pick is top relevance") {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val emb = graft.sources.Tables.load(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val qv = emb(0L)
    val pool = emb.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(v, qv)) }
      .sortBy { case (id, s) => (-s, id) }.take(16)
    val rel = pool.toMap
    var remaining = pool.map(_._1).toSet
    val sel = scala.collection.mutable.ArrayBuffer.empty[(Long, Double)]
    while (sel.length < 8) {
      val pick = remaining.toSeq.map { id =>
        val pen = if (sel.isEmpty) None
          else Some(sel.map(s => cos(emb(id), emb(s._1))).max)
        (id, pen.fold(0.7 * rel(id))(p => 0.7 * rel(id) - 0.3 * p))
      }.minBy { case (id, s) => (-s, id) }
      remaining -= pick._1
      sel += ((pick._1, BigDecimal(pick._2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
    }
    val got = SparkEntry.queries("q186_mmr_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.map(g => (g._2, g._4)).toSeq === sel.toSeq)
    assert(got.map(_._1).toSeq === (1L to 8L), "ranks 1..k in order")
    // MMR's defining move: the first pick is the pure-relevance argmax
    assert(got.head._2 === pool.head._1)
    // relevance column carries the pool sims; the score bound is
    // |s − λ·rel| ≤ μ (pairwise cosine lives in [−1, 1], so the penalty
    // term can push EITHER way)
    got.foreach { case (_, id, r, s) =>
      assert(r === rel(id))
      assert(math.abs(s - 0.7 * r) <= 0.3 + 1e-9, s"vec $id score $s")
    }
  }

  test("q194 water-fill: budget exact, supplies respected, level flat") {
    val rows = SparkEntry.queries("q194_token_budget")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    val totalSupply = rows.map(_._2).sum
    val budget = totalSupply / 2
    // the defining identity: allocations spend the budget EXACTLY
    assert(rows.map(_._3).sum === budget)
    // nobody is allocated more than they have
    rows.foreach { case (s, supply, alloc, capped) =>
      assert(alloc <= supply, s"$s over-allocated")
      assert(capped === (alloc < supply), s"$s capped flag")
    }
    val cappedAllocs = rows.filter(_._4).map(_._3)
    val fullSupplies = rows.filterNot(_._4).map(_._2)
    assert(cappedAllocs.nonEmpty, "budget=total/2 must cap someone")
    // water level is flat: capped allocations differ by at most 1, and
    // every capped allocation >= every fully-funded source's supply
    // (otherwise the fill wasn't level)
    assert(cappedAllocs.max - cappedAllocs.min <= 1,
      s"uneven water level: $cappedAllocs")
    if (fullSupplies.nonEmpty)
      assert(cappedAllocs.min >= fullSupplies.max,
        s"capped level ${cappedAllocs.min} below a full supply")
  }
}
