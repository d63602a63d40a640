package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` payloads
  * with typed metadata, processed per-partition in batches.
  *
  * The actual media codecs are NOT in this environment, so the decode step
  * is a clearly-marked deterministic stub ([[StubCodec]]); everything
  * Spark-side — schema, partitioning, batch iteration shape, output
  * contracts — is real and tested. At 100 TB the rules are:
  *  - payload bytes are read ONCE per row inside a partition-local batch
  *    loop (`mapPartitions`), never shuffled unless the operator output
  *    needs them;
  *  - derived features/metadata travel as small typed columns, so
  *    downstream joins/apqs shuffle kilobytes, not media;
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

  /** Build a media table from the documents table: payload = utf-8 bytes of
    * the text (a stand-in blob with realistic size variance). */
  def fromDocuments(spark: SparkSession, dir: String): DataFrame =
    graft.sources.Tables.load(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"))

  /** =========== STUB: deterministic fake codec ===========
    * Real implementation would call an image/audio library here (per-batch,
    * partition-local). The stub derives pseudo metadata purely from payload
    * bytes so tests are deterministic and engine plumbing is exercised
    * end-to-end. */
  object StubCodec {
    def decodeMeta(payload: Array[Byte], mediaType: String): (Int, Int, Double) = {
      // ??? <- real codec goes here; deterministic fake below
      val n = if (payload == null) 0 else payload.length
      val h = java.util.Arrays.hashCode(payload)
      val width = 64 + math.abs(h % 1920)
      val height = 64 + math.abs((h / 7) % 1080)
      val durationS = if (mediaType == "image") 0.0 else 1.0 + (n % 300) / 10.0
      (width, height, durationS)
    }

    /** Fake fixed-size feature vector from payload bytes (stands in for an
      * embedding model / mel-spectrogram). */
    def extractFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      // ??? <- real feature extractor goes here; deterministic fake below
      val out = new Array[Float](dim)
      if (payload != null && payload.length > 0) {
        var i = 0
        while (i < dim) {
          out(i) = ((payload(i % payload.length) & 0xFF) - 128) / 128.0f
          i += 1
        }
      }
      out
    }
  }

  private val decodedSchema = StructType(mediaSchema.fields.filterNot(_.name == "payload") ++ Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_s", DoubleType),
    StructField("n_bytes", LongType)))

  /** Decode metadata per partition in one pass (batch shape: iterator →
    * iterator, no driver collect, payload dropped from output so nothing
    * heavy shuffles downstream). */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    media.select("media_id", "media_type", "payload", "source")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val mt = r.getString(1)
          val (w, h, d) = StubCodec.decodeMeta(payload, mt)
          Row(r.getLong(0), mt, r.getString(3), w, h, d,
            if (payload == null) 0L else payload.length.toLong)
        }
      }(enc)
  }

  /** Fixed-dim feature extraction (stub embedding) — output is a compact
    * float array column keyed by media_id. */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("features", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0),
            StubCodec.extractFeatures(r.getAs[Array[Byte]]("payload"), dim).toSeq)
        }
      }(enc)
  }

  /** Resize plan: payload → resized payload + updated metadata, partition-
    * local single pass. The transform itself is stubbed (deterministic
    * byte-level downsample standing in for a pixel resampler); the contract
    * — binary in/out, new dims columns, no shuffle — is the real part. */
  def resize(media: DataFrame, width: Int, height: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("media_type", StringType),
      StructField("payload", BinaryType),
      StructField("width", IntegerType),
      StructField("height", IntegerType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(schema)
    media.select("media_id", "media_type", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          // ??? <- real pixel resampler goes here; deterministic fake:
          // sample every stride-th byte down to a target budget
          val target = math.max(1, width * height / 256)
          val out = if (payload == null || payload.isEmpty) Array.empty[Byte]
            else {
              val stride = math.max(1, payload.length / target)
              payload.indices.by(stride).map(payload).toArray
            }
          Row(r.getLong(0), r.getString(1), out, width, height)
        }
      }(enc)
  }

  /** Driver query (q52): per-media-type corpus profile computed THROUGH the
    * partition-local codec path ([[decodeMeta]] → mapPartitions batch loop),
    * then aggregated to small typed columns. The stub codec's n_bytes /
    * duration_s are pure arithmetic on payload length, so the DuckDB oracle
    * recomputes them exactly (octet_length); width/height derive from a JVM
    * hash and deliberately stay out of the oracle-facing projection. */
  def qMediaProfile(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(fromDocuments(spark, dir))
      .groupBy(col("media_type"))
      .agg(
        count(lit(1)).as("cnt"),
        sum(col("n_bytes")).as("total_bytes"),
        // sums of 0.1-grained durations are decimal-multiples of 0.1; 1dp
        // round absorbs partial-agg ordering ulps on both engines
        round(sum(col("duration_s")), 1).as("total_duration_s"))

  /** Frame sampling plan for videos: one row per sampled frame index —
    * payload NOT duplicated per frame (keys only; decode happens lazily in
    * a later partition-local stage). */
  def sampleFrames(media: DataFrame, fps: Double = 1.0): DataFrame = {
    val withDur = decodeMeta(media).filter(col("media_type") === "video")
    withDur
      .withColumn("n_frames", floor(col("duration_s") * fps).cast("int"))
      // zero sampled frames ⇒ zero rows (clamping to sequence(0,0) would
      // fabricate a frame 0 that doesn't exist)
      .filter(col("n_frames") >= 1)
      .select(
        col("media_id"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_no"))
  }
}
