package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed per-partition in batches.
  *
  * The image and audio codecs are REAL JDK-native decoders
  * (`javax.imageio` for PNG, `javax.sound.sampled` for WAV — both ship in
  * the JDK, no external dependency): payload bytes are decoded
  * partition-locally and the emitted metadata (dimensions, duration,
  * pixel/sample checksums) comes from the decoded content, not from the
  * container. Only video remains a deterministic stand-in (the JDK has no
  * video codec and the environment allows no media libraries). At 100 TB
  * the rules are:
  *  - payload bytes are read ONCE per row inside a partition-local batch
  *    loop (`mapPartitions`), never shuffled unless the operator output
  *    needs them;
  *  - derived features/metadata travel as small typed columns, so
  *    downstream joins/aggs shuffle kilobytes, not media;
  *  - frame sampling explodes to (media_id, frame_no) keys only, decoding
  *    lazily downstream.
  */
object Multimodal {

  /** Canonical multimodal schema. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("source", StringType, nullable = true)))

  /** Real JDK-native media codecs over deterministic fixtures. The ENCODE
    * side generates content as a pure function of the media id (so the
    * DuckDB oracle can restate what decoding must recover); the DECODE side
    * reads actual containers — a corrupted payload fails the decoder, not a
    * hash check.
    *  - PNG via `javax.imageio.ImageIO` (lossless: decoded pixels equal the
    *    generated pattern exactly);
    *  - WAV (8-bit unsigned PCM mono) via `javax.sound.sampled.AudioSystem`
    *    (duration and samples come from the decoded stream's frame length
    *    and rate, not from the byte count).
    */
  object JdkCodec {
    /** Image fixture dims: 8..31 × 8..31, a pure function of the id. */
    def imageDims(id: Long): (Int, Int) =
      ((8 + id % 24).toInt, (8 + (id / 3) % 24).toInt)

    /** Gray level of fixture pixel (x, y): pure function of (id, x, y). */
    def gray(id: Long, x: Int, y: Int): Int =
      ((id * 31 + x * 7 + y * 13) % 256).toInt

    /** Encode the id's fixture image as a real PNG. */
    def encodePng(id: Long): Array[Byte] = {
      val (w, h) = imageDims(id)
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = gray(id, x, y)
          img.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Decode a PNG payload: (width, height, sum of blue-channel bytes).
      * The checksum is over DECODED pixels — a payload that does not decode
      * to the expected image produces a different sum. */
    def decodePng(payload: Array[Byte]): (Int, Int, Long) = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      require(img != null, "payload is not a decodable image")
      val w = img.getWidth
      val h = img.getHeight
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += (img.getRGB(x, y) & 0xFF); x += 1 }
        y += 1
      }
      (w, h, sum)
    }

    /** Audio fixture: 8 kHz mono 8-bit unsigned PCM. */
    val AudioRate = 8000f
    /** Sample count: 800..2390, a pure function of the id. */
    def audioSamples(id: Long): Int = 800 + (id % 160).toInt * 10
    /** Unsigned sample byte i: pure function of (id, i). */
    def sampleByte(id: Long, i: Int): Int = ((id * 17 + i * 11) % 256).toInt

    /** Encode the id's fixture signal as a real WAV container. */
    def encodeWav(id: Long): Array[Byte] = {
      val n = audioSamples(id)
      val data = Array.tabulate[Byte](n)(i => sampleByte(id, i).toByte)
      val fmt = new javax.sound.sampled.AudioFormat(
        AudioRate, 8, 1, false, false) // 8-bit unsigned PCM, mono
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Decode a WAV payload: (duration_us, sum of unsigned sample bytes).
      * Duration comes from the decoded stream's frame length and rate. */
    def decodeWav(payload: Array[Byte]): (Long, Long) = {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val frames = ais.getFrameLength
        val us = Math.round(frames * 1e6 / ais.getFormat.getFrameRate)
        val buf = ais.readAllBytes()
        var sum = 0L
        var i = 0
        while (i < buf.length) { sum += (buf(i) & 0xFF); i += 1 }
        (us, sum)
      } finally ais.close()
    }
  }

  /** Build a media table from the documents table: image rows carry a REAL
    * PNG, audio rows a REAL WAV (both generated partition-locally from the
    * deterministic [[JdkCodec]] fixtures), video rows the utf-8 text bytes
    * as an opaque blob (no JDK video codec exists). Encoding happens in one
    * partition-local pass — at scale this is the ingest step that writes
    * media blobs next to their metadata. */
  def fromDocuments(spark: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(mediaSchema)
    val docs = graft.sources.Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"))
    // r22 (guide §2.5 input skew): the per-row codec work below (PNG/WAV
    // encode, ~ms per row) is orders of magnitude heavier than the bytes
    // that carry it, and the gate corpus is ONE parquet file — one scan
    // partition, so the whole encode (and every decode chained on it:
    // q52/q137/q138) ran single-task at any core count (q137 measured
    // 5.4 s steady at 32 idle cores, all in one task). Spread rows over
    // the cores first when the scan is narrower than the session's
    // parallelism; a wide production scan is left exactly as it is.
    val parts = spark.sparkContext.defaultParallelism
    val spread =
      if (docs.rdd.getNumPartitions < parts) docs.repartition(parts)
      else docs
    spread
      .mapPartitions { rows =>
        // positional access only: rows crossing fused mapPartitions stages
        // are schemaless GenericRows (name lookup throws)
        rows.map { r =>
          val id = r.getLong(0)
          val payload = r.getString(1) match {
            case "image" => JdkCodec.encodePng(id)
            case "audio" => JdkCodec.encodeWav(id)
            case _       => r.getAs[Array[Byte]](2)
          }
          Row(id, r.getString(1), payload, r.getString(3))
        }
      }(enc)
  }

  private val decodedSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("source", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_us", LongType),
    StructField("n_bytes", LongType),
    StructField("checksum", LongType)))

  /** Decode metadata per partition in one pass (batch shape: iterator →
    * iterator, no driver collect, payload dropped from output so nothing
    * heavy shuffles downstream). Image and audio payloads go through the
    * real JDK decoders — width/height/duration/checksum describe DECODED
    * content; video (no JDK codec) gets a deterministic duration derived
    * from its byte length and a zero checksum. Duration is an exact µs
    * integer so downstream sums need no float rounding. */
  def decodeMeta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    media.select("media_id", "media_type", "payload", "source")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          val mt = r.getString(1)
          val nBytes = if (payload == null) 0L else payload.length.toLong
          val (w, h, durUs, checksum) =
            if (payload == null || payload.isEmpty) (0, 0, 0L, 0L)
            else mt match {
              case "image" =>
                val (pw, ph, sum) = JdkCodec.decodePng(payload)
                (pw, ph, 0L, sum)
              case "audio" =>
                val (us, sum) = JdkCodec.decodeWav(payload)
                (0, 0, us, sum)
              case _ =>
                (0, 0, 1000000L + (nBytes % 300) * 100000L, 0L)
            }
          Row(r.getLong(0), mt, r.getString(3), w, h, durUs, nBytes, checksum)
        }
      }(enc)
  }

  /** Fixed-dim feature extraction — output is a compact float array column
    * keyed by media_id. The featurizer is a deterministic byte-level map
    * (a real embedding model / mel-spectrogram is model weights, out of
    * scope here); the Spark shape — partition-local batch loop, payload
    * read once, small typed output — is the production contract. */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](1)
          val out = new Array[Float](dim)
          if (payload != null && payload.length > 0) {
            var i = 0
            while (i < dim) {
              out(i) = ((payload(i % payload.length) & 0xFF) - 128) / 128.0f
              i += 1
            }
          }
          Row(r.getLong(0), out.toSeq)
        }
      }(enc)
  }

  /** Resize images: decode each PNG payload, resample to `width`×`height`
    * with AWT bilinear interpolation, re-encode — a REAL pixel resampler,
    * partition-local, one payload read per row. Non-image rows are not
    * resizable and are excluded (resampling audio is a different operator;
    * video has no JDK codec). */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media_type", StringType),
      StructField("payload", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    media.filter(col("media_type") === "image")
      .select("media_id", "media_type", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          val src = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload))
          require(src != null, "payload is not a decodable image")
          val dst = new java.awt.image.BufferedImage(
            width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g2 = dst.createGraphics()
          g2.setRenderingHint(
            java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(src, 0, 0, width, height, null)
          g2.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(dst, "png", bos)
          Row(r.getLong(0), r.getString(1), bos.toByteArray, width, height)
        }
      }(enc)
  }

  /** Driver query (q52): per-media-type corpus profile computed THROUGH the
    * partition-local codec path ([[decodeMeta]] → mapPartitions batch
    * loop), then aggregated to small typed columns. Every aggregate is
    * restatable by the DuckDB oracle because the fixtures are pure
    * functions of doc_id: decoded pixel counts and checksums (PNG is
    * lossless, so decode recovers the generated pattern exactly), decoded
    * audio durations/sample sums, and the video stand-in duration. All
    * sums are exact integers — no float rounding anywhere. */
  def qMediaProfile(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(fromDocuments(spark, dir))
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("width").cast("long") * col("height")).as("total_px"),
        sum(col("duration_us")).as("total_duration_us"),
        sum(col("checksum")).as("checksum_total"))

  /** Frame sampling plan for videos: one row per sampled frame index —
    * payload NOT duplicated per frame (keys only; decode happens lazily in
    * a later partition-local stage). */
  def sampleFrames(media: DataFrame, fps: Double = 1.0): DataFrame = {
    val withDur = decodeMeta(media).filter(col("media_type") === "video")
    withDur
      .withColumn("n_frames",
        floor(col("duration_us") / lit(1000000.0) * fps).cast("int"))
      // zero sampled frames ⇒ zero rows (clamping to sequence(0,0) would
      // fabricate a frame 0 that doesn't exist)
      .filter(col("n_frames") >= 1)
      .select(
        col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_no"))
  }

  private val dhashSchema = StructType(Seq(
    StructField("media_id", LongType),
    StructField("dhash", LongType)))

  /** 56-bit difference hash of a DECODED image: sample an 8×8 grid of
    * pixels (row y_j = j·(h−1) div 7, col x_i = i·(w−1) div 7 — pure
    * integer grid, no resampling arithmetic, so the lossless-PNG oracle
    * can restate every sampled gray level from the fixture formula), set
    * bit j·7+i iff gray(x_{i+1}, y_j) > gray(x_i, y_j). 56 bits, never
    * the sign bit — both engines' shifts stay in positive BIGINT. */
  def dhash56(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    def g(x: Int, y: Int): Int = img.getRGB(x, y) & 0xFF
    var bits = 0L
    var j = 0
    while (j < 8) {
      val y = j * (h - 1) / 7
      var i = 0
      while (i < 7) {
        val x0 = i * (w - 1) / 7
        val x1 = (i + 1) * (w - 1) / 7
        if (g(x1, y) > g(x0, y)) bits |= 1L << (j * 7 + i)
        i += 1
      }
      j += 1
    }
    bits
  }

  /** q137: PERCEPTUAL image near-dup — decode every image payload with the
    * real JDK codec, difference-hash the pixels ([[dhash56]]), and find
    * pairs within Hamming distance 3 by LSH BANDING, never all-pairs:
    * the 56-bit hash splits into 4 bands of 14 bits, and two hashes with
    * hamming ≤ 3 differ in at most 3 bands, so they MUST collide on at
    * least one band — candidate generation is an equi-join on
    * (band, band_key) with EXACT recall at the threshold (the simhash
    * q25 argument, applied to decoded pixels instead of token text).
    * Verification is one codegen'd `bit_count(xor)` per candidate.
    *
    * The oracle restates the whole pipeline from the fixture formula
    * (PNG is lossless: decoded gray ≡ (id·31 + x·7 + y·13) mod 256) and
    * brute-forces pairs at sf scale — the banding must land on exactly
    * that set. */
  def q137ImageNearDup(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(dhashSchema)
    val hashed = fromDocuments(spark, dir)
      .filter(col("media_type") === "image")
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          require(img != null, "payload is not a decodable image")
          Row(r.getLong(0), dhash56(img))
        }
      }(enc)
    val bands = hashed.select(col("media_id"), col("dhash"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("dhash"), b * 14).bitwiseAND(lit(0x3FFFL))
          .as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("dhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val cand = bands.as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("a.dhash").as("ha"),
        col("b.media_id").as("id_b"), col("b.dhash").as("hb"))
      .distinct()
    cand
      .withColumn("hamming",
        expr("bit_count(ha ^ hb)").cast("bigint"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** 56-bit audio fingerprint over DECODED PCM samples: 57 integer grid
    * points p_k = k·(n−1) div 56 across the clip, bit k set iff
    * sample(p_{k+1}) > sample(p_k) — the 1-D twin of [[dhash56]]'s
    * gradient-sign idea (real audio fingerprinting signs spectral-band
    * deltas; the Spark shape — decode once per partition, fixed-width
    * integer fingerprint, banded pairing — is identical). */
  def audioFp56(samples: Array[Byte]): Long = {
    val n = samples.length
    def s(i: Int): Int = samples(i) & 0xFF
    var bits = 0L
    var k = 0
    while (k < 56) {
      val p0 = k * (n - 1) / 56
      val p1 = (k + 1) * (n - 1) / 56
      if (s(p1) > s(p0)) bits |= 1L << k
      k += 1
    }
    bits
  }

  /** q138: AUDIO near-dup — q137's banding applied to decoded WAV samples
    * ([[audioFp56]]): 4 bands × 14 bits, exact recall at hamming ≤ 3,
    * bit_count(xor) verify. The oracle restates the sampled PCM bytes
    * from the fixture formula (PCM is lossless) and brute-forces the pair
    * set. */
  def q138AudioNearDup(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = {
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(dhashSchema)
    val hashed = fromDocuments(spark, dir)
      .filter(col("media_type") === "audio")
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
          val samples = try ais.readAllBytes() finally ais.close()
          Row(r.getLong(0), audioFp56(samples))
        }
      }(enc)
    val bands = hashed.select(col("media_id"), col("dhash"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("dhash"), b * 14).bitwiseAND(lit(0x3FFFL))
          .as("key"))): _*)).as("bk"))
      .select(col("media_id"), col("dhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    bands.as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") &&
        col("a.key") === col("b.key") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("a.dhash").as("ha"),
        col("b.media_id").as("id_b"), col("b.dhash").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)").cast("bigint"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
