package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Inverted-index retrieval — the corpus-search surface a curation
  * pipeline uses to pull targeted slices ("every document mentioning
  * these terms") out of a 100 TB corpus without scanning it.
  *
  * The index IS a bucketed table: postings (token, doc_id, tf) staged
  * once via [[graft.plans.Bucketing.stageBucketedOnce]] with the token as
  * the bucket key. A conjunctive query then becomes an `IN (terms)` filter
  * on the bucket column, which Spark turns into BUCKET PRUNING at plan
  * time — the scan opens only the buckets that can hold the query terms
  * (`SelectedBucketsCount` in the scan node, asserted in ScaleOpsSpec),
  * i.e. query cost scales with posting-list size, not corpus size. That is
  * the moral equivalent of opening a posting list in a search engine,
  * expressed in pure Spark table machinery.
  *
  * MEASURED at 20M postings / 100k-term vocab ([[graft.tools.SkewProbe]]
  * section q123): the staged table's per-bucket sort additionally enables
  * parquet page-index pruning — 20M → 137k rows decoded (145×) vs a flat
  * postings file — and the pinned bucketed scan opens 3 of 16 bucket
  * files for a 3-term query. The two effects stack; at cluster scale the
  * unopened 13/16 of index I/O is the dominant saving.
  */
object Search {

  /** q123: conjunctive (AND) keyword search over the staged postings
    * index, TF-scored.
    *
    * The "user query" is a stand-in chosen deterministically — the top-3
    * tokens by (document frequency DESC, token ASC) — so the gate can pin
    * it; production queries arrive as literals and skip that step. The df
    * ranking collects exactly 3 rows to the driver (the IVF-centroid
    * precedent: bounded, driver-scale), because the pruning filter must be
    * LITERAL for the planner to prune buckets at compile time.
    *
    * AND semantics: group the pruned postings by doc and keep docs whose
    * matched-term count equals the query length. Score = Σtf over matched
    * terms, plus a length-normalized integer score_ppm (Σtf·1e6 div |doc|)
    * — all-integer, oracle-exact. */
  def q123ConjunctiveSearch(spark: SparkSession, dir: String): DataFrame = {
    val suffix = dir.replaceAll(".*/", "").replace('.', '_')
    val table = s"graft_postings_$suffix"
    val docs = Tables.load(spark, dir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("tf"))
    graft.plans.Bucketing.stageBucketedOnce(tf, table, "tok",
      graft.plans.Bucketing.inputFingerprint(spark, s"$dir/documents.parquet"))
    val terms = spark.table(table)
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok").asc).limit(3)
      .collect().map(_.getString(0)).toSeq
    // Spark's DisableUnnecessaryBucketedScan rule sees that the downstream
    // aggregation keys on doc_id (not the bucket column) and silently
    // un-buckets the scan — taking BUCKET PRUNING down with it, which is
    // the entire point of the index. Pin the bucketed scan for the probe
    // inside a CLONED session: newSession() shares the SparkContext,
    // SharedState catalog (so the staged bucketed table resolves) and
    // cache, but owns its SQLConf — the toggle can never be observed by a
    // query planned concurrently on the parent session, and there is no
    // conf restore left to race. Every frame under the toggle is built
    // FROM the clone (frames from two sessions must never meet in one
    // plan), and localCheckpoint materializes eagerly, so the clone is
    // discardable when this returns. (Same pattern in q125 below.)
    val scoped = spark.newSession()
    scoped.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val postings = scoped.table(table).filter(col("tok").isin(terms: _*))
    val len = Tables.load(scoped, dir, "documents").select(col("doc_id"),
      size(split(col("text"), " ")).cast("bigint").as("n_toks"))
    postings.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"), sum(col("tf")).as("score"))
      .filter(col("n_terms") === terms.size)
      .join(len, Seq("doc_id"))
      .select(col("doc_id"), col("score"),
        expr("score * 1000000 DIV n_toks").as("score_ppm"))
      .localCheckpoint()
  }

  /** q125: PHRASE search over a POSITIONAL postings index.
    *
    * The index extends q123's postings with token positions
    * ((token, doc_id, pos), still bucketed by token), which is what turns
    * an index from "which documents" into "where in the document" — the
    * structure phrase queries, snippet extraction, and n-gram
    * decontamination all stand on. A two-token phrase query reads exactly
    * TWO bucket-pruned posting lists and joins them on
    * (doc_id, pos_b = pos_a + 1) — query cost again scales with the
    * posting lists, not the corpus.
    *
    * The stand-in phrase is the corpus's top bigram by (count DESC, w1,
    * w2) — computed with q99's zip_with pairing (one pass, no self-join)
    * and collected as 1 row; positional adjacency and zip_with produce the
    * IDENTICAL pair set, so the DuckDB oracle can restate both halves from
    * its 1-based generate_subscripts positions (adjacency is
    * offset-invariant). Output: per-doc occurrence counts of the phrase. */
  def q125PhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val suffix = dir.replaceAll(".*/", "").replace('.', '_')
    val table = s"graft_postings_pos_$suffix"
    val docs = Tables.load(spark, dir, "documents")
    val pos = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .select(col("tok"), col("doc_id"), col("pos").cast("bigint").as("pos"))
    graft.plans.Bucketing.stageBucketedOnce(pos, table, "tok",
      graft.plans.Bucketing.inputFingerprint(spark, s"$dir/documents.parquet"))
    val top = docs.select(split(col("text"), " ").as("t"))
      .select(explode(zip_with(col("t"),
        slice(col("t"), lit(2), size(col("t"))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .filter(col("p.w2").isNotNull)
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w1").asc, col("w2").asc)
      .limit(1).collect().head
    val (w1, w2) = (top.getString(0), top.getString(1))
    // scoped-session toggle — see q123's comment
    val scoped = spark.newSession()
    scoped.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    val a = scoped.table(table).filter(col("tok") === w1)
      .select(col("doc_id"), col("pos"))
    val b = scoped.table(table).filter(col("tok") === w2)
      .select(col("doc_id"), (col("pos") - 1).as("pos"))
    a.join(b, Seq("doc_id", "pos"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_occ"))
      .localCheckpoint()
  }

  /** q136: HYBRID retrieval via RECIPROCAL RANK FUSION — the standard way
    * a search stack combines a keyword ranking and a vector ranking
    * (RRF, Cormack et al. SIGIR'09: score = Σ 1/(60 + rank)). Documents
    * and vectors share the id domain here, so the two lists fuse
    * directly.
    *
    * Both input lists are TOP-LISTLEN cuts on engine-deterministic total
    * orders: keyword = TF sum over the q123 stand-in terms ranked
    * (score DESC, doc_id), vector = q30's rounded-cosine brute force vs
    * vec 0 ranked (sim DESC, vec_id). Each cut runs as
    * TakeOrderedAndProject (orderBy.limit — never a global sort), and the
    * rank row_numbers are then assigned over the ALREADY-CUT 50-row
    * frames, so the unpartitioned windows are bounded by construction.
    * The fusion term 1e9 div (60+rank) is integer floor-division —
    * deterministic across engines, no 1/x doubles — and absent-from-list
    * contributes 0 via the outer join's null. */
  def q136RrfFusion(spark: SparkSession, dir: String, k: Int = 10,
      listLen: Int = 50): DataFrame = {
    val tf = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val terms = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok").asc).limit(3)
      .collect().map(_.getString(0)).toSeq
    val kwRanked = tf.filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id")).agg(sum(col("tf")).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(listLen)
      .withColumn("kw_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("score").desc, col("doc_id").asc)).cast("bigint"))
      .select(col("doc_id"), col("kw_rank"))
    val vecRanked = Similarity.bruteForceTopK(spark, dir, 0L, listLen)
      .withColumn("vec_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("sim").desc, col("vec_id").asc)).cast("bigint"))
      .select(col("vec_id").as("doc_id"), col("vec_rank"))
    kwRanked.join(vecRanked, Seq("doc_id"), "full_outer")
      .select(col("doc_id"), col("kw_rank"), col("vec_rank"),
        (coalesce(expr("1000000000 DIV (60 + kw_rank)"), lit(0L)) +
          coalesce(expr("1000000000 DIV (60 + vec_rank)"), lit(0L)))
          .as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** q151: BM25-SCORED RETRIEVAL over the staged postings index —
    * q123's conjunctive search upgraded to the ranking function every
    * production search stack runs (Robertson–Spärck Jones; the Lucene
    * variant: idf = ln((N − df + 0.5)/(df + 0.5) + 1), k1 = 1.2,
    * b = 0.75). Disjunctive (OR) semantics: BM25 ranks partial matches.
    *
    * Same scale shape as q123: the literal query terms prune buckets at
    * plan time, so cost scales with the 3 posting lists, not the corpus;
    * the df table is 3 driver rows, the length stats one broadcast row.
    * Doubles enter ONLY in the final score expression, written
    * token-for-token identically in the DuckDB twin and rounded to 4 dp
    * (the q20/q101 libm contract); ranking ties break on doc_id, so the
    * top-k cut is engine-deterministic and runs as TakeOrderedAndProject
    * (orderBy.limit — never a global sort). */
  def q151Bm25Search(spark: SparkSession, dir: String, k: Int = 20)
      : DataFrame = {
    val suffix = dir.replaceAll(".*/", "").replace('.', '_')
    val table = s"graft_postings_$suffix"
    val docs = Tables.load(spark, dir, "documents")
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("tf"))
    graft.plans.Bucketing.stageBucketedOnce(tf, table, "tok",
      graft.plans.Bucketing.inputFingerprint(spark, s"$dir/documents.parquet"))
    val terms = spark.table(table)
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok").asc).limit(3)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // scoped-session bucketed-scan pin — see q123's comment
    val scoped = spark.newSession()
    scoped.conf.set(
      "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    import scoped.implicits._
    val dfTable = terms.toDF("tok", "df")
    val lens = Tables.load(scoped, dir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("bigint").as("len"))
    val stats = lens.agg(count(lit(1)).as("n"), sum(col("len")).as("sum_len"))
    scoped.table(table).filter(col("tok").isin(terms.map(_._1): _*))
      .join(broadcast(dfTable), Seq("tok"))
      .join(lens, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_terms"),
        round(sum(
          log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
            (col("tf") * 2.2) /
            (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("len") /
              (col("sum_len").cast("double") / col("n"))))), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
      .localCheckpoint()
  }
}
