package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column expressions for large-scale corpus processing.
  * All pure Catalyst (codegen'd, no UDFs): at 100 TB the scan dominates, so
  * per-row text features must stay inside whole-stage codegen.
  */
object TextFunctions {

  /** English stopword shortlist used by the quality / language heuristics. */
  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to")

  /** Whitespace tokenization (single-space convention of the testdata). */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of tokens that are in the English stopword shortlist. */
  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), w => w.isin(EnStopwords: _*)))

  /** Stopword ratio in [0,1]; single IEEE division (oracle-stable). */
  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / tokenCount(text)

  /** n-gram-free language-ID heuristic: English stopword density.
    * A real pipeline would use per-language n-gram profiles; the engine keeps
    * the decision a branch-free Catalyst expression.
    */
  def langIdEn(text: Column, threshold: Double = 0.05): Column =
    when(stopwordRatio(text) > threshold, lit("en")).otherwise(lit("other"))

  /** Punctuation count via regexp strip-and-diff. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Content fingerprints: md5 + sha256 over the raw text. Used for exact
    * dedup keys — hashing first means the dedup shuffle moves 16/32-byte
    * keys, not document bodies. */
  def fpMd5(text: Column): Column = md5(text)
  def fpSha256(text: Column): Column = sha2(text, 256)

  /** Canonical token-multiset key: sort tokens, rejoin, hash. Detects
    * bag-of-words duplicates (reordered near-dups). */
  def tokenSetKey(text: Column): Column =
    md5(concat_ws(" ", array_sort(tokens(text))))

  /** Engine-portable 60-bit hash: first 15 hex digits of md5, parsed as a
    * BIGINT. Chosen over xxhash64/murmur3 for ORACLE runs because the SAME
    * value is expressible in standard SQL — DuckDB:
    * `CAST(concat('0x', substr(md5(x),1,15)) AS BIGINT)` — which is what
    * lets the MinHash/SimHash/winnowing queries be oracle-checked exactly
    * instead of rows-only. Always non-negative (60 < 63 bits). */
  def hex60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Sketch hash family switch. md5 is ~5-10× the per-call cost of xxhash64
    * and at corpus scale the sketch scan is hash-bound, so production runs
    * must not pay md5 per shingle/token/k-gram. `oracleMode = false`
    * (default): xxhash64 masked to 60 bits — one codegen'd hash, the
    * production family. `oracleMode = true`: [[hex60]], so every sketch
    * value is recomputable by the DuckDB oracle ([[graft.Verify]] — the
    * driver's correctness gate — enables it; [[graft.Bench]] measures the
    * production family). Both families are non-negative 60-bit, so every
    * downstream fold (30-bit MinHash base, 60-bit SimHash/winnowing,
    * 15-bit SimHash blocks) is family-agnostic. */
  @volatile var oracleMode: Boolean = false

  /** Scoped oracle-mode switch: runs `body` with the hex60 family active and
    * ALWAYS restores the previous family, so a Verify run (or a test) can't
    * leak the oracle family into plans built later in the same JVM.
    * The flag is read at PLAN CONSTRUCTION time — build and execute the
    * query inside the scope. Not reentrancy-safe across threads building
    * plans concurrently with different families (the process has one
    * family at a time by design; Bench additionally forces production). */
  def withOracleMode[T](on: Boolean)(body: => T): T = {
    val prev = oracleMode
    oracleMode = on
    try body finally oracleMode = prev
  }

  /** The active 60-bit sketch hash (see [[oracleMode]]). All sketch
    * operators (MinHash, SimHash, winnowing, LSH band buckets) hash through
    * this; per-document content digests ([[fpMd5]], [[tokenSetKey]]) stay
    * md5 — one hash per document is scan-noise, and md5 is their spec. */
  def sketch60(c: Column): Column =
    if (oracleMode) hex60(c)
    else xxhash64(c).bitwiseAND(lit((1L << 60) - 1))

  /** Driver-side twin of [[hex60]] for precomputing literal hash tables
    * (e.g. LSH hyperplane signs) — same md5, same 15-hex-digit parse. */
  def hex60Local(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** BPE-ish subword count: word-chars runs + digit runs + punct singletons.
    * Approximates tokenizer load for cost accounting. */
  def subwordCount(text: Column): Column =
    size(split(text, "(?<=[a-z0-9])(?=[^a-z0-9])|(?<=[^a-z0-9 ])(?=[a-z0-9])"))

  /** Winnowed rolling fingerprint set: hash every character k-gram, keep the
    * min of each sliding window of `window` consecutive hashes (winnowing —
    * Schleimer/Wilkerson/Aiken MOSS scheme), dedup. Guarantees any shared
    * substring of length ≥ k+window−1 yields a shared fingerprint, so
    * chunk-level near-dups are joinable on fingerprints.
    *
    * WARNING — per-row expression form: Catalyst's projection collapse
    * re-expands the k-gram hash subtree under every window element, making
    * this O(len²) hashes per document. Fine for short strings; for corpus
    * work use [[graft.operators.TextAnalysis.rollingFingerprintTable]]
    * (posexplode + sliding window-min: linear, one shuffle). */
  def rollingFingerprints(text: Column, k: Int = 8, window: Int = 4): Column = {
    val nGrams = greatest(length(text) - (k - 1), lit(0))
    val hashes = transform(sequence(lit(1), greatest(nGrams, lit(1))),
      i => sketch60(text.substr(i, lit(k))))
    val nWin = greatest(nGrams - (window - 1), lit(1))
    array_distinct(transform(sequence(lit(0), nWin - 1),
      j => array_min(slice(hashes, j + lit(1), lit(window)))))
  }
}
