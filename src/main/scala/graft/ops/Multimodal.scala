package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to typed metadata; decode / feature
  * extraction runs batched per partition.
  *
  * The actual codec step is STUBBED — this container has no image/audio
  * libraries — behind [[MediaDecoder]]. The Spark-side contract (schema,
  * partition-batched execution, deterministic fake features) is real and
  * tested; swapping in a JNI/ffmpeg-backed decoder changes one function.
  *
  * Scale notes: payloads stay byte-arrays end to end (no base64 blowup),
  * decode is `mapPartitions` so per-batch model/codec init amortizes, and
  * metadata-only queries never touch the payload column thanks to parquet
  * column pruning.
  */
object Multimodal {

  /** Typed media record schema: payload + metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("payload", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
  ))

  /** Decoded per-media features. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType),
    StructField("n_frames_sampled", IntegerType),
    StructField("feature", ArrayType(FloatType)),
  ))

  /** Pluggable batch decoder. `decode` receives the raw payload and must
    * return a fixed-length feature vector.
    */
  trait MediaDecoder extends Serializable {
    def featureDim: Int
    def decode(mime: String, payload: Array[Byte]): Array[Float]
  }

  /** STUB decoder: a real deployment replaces this with an image/audio
    * codec (??? marks the boundary). The fake is deterministic — features
    * derive from byte content — so the plumbing is testable offline.
    */
  final class StubDecoder(val featureDim: Int = 8) extends MediaDecoder {
    // Real codec goes here: e.g. JPEG decode → resize → channel means.
    // Deliberately NOT implemented in this offline container:
    //   def realDecode(...): Array[Float] = ???
    def decode(mime: String, payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](featureDim)
      var i = 0
      while (i < payload.length) {
        out(i % featureDim) += (payload(i) & 0xff).toFloat / 255f
        i += 1
      }
      out
    }
  }

  /** Image resize — the codec boundary proper. NOT implemented in this
    * offline container (no image libraries); the `???` marks exactly
    * where a JNI/ImageIO-backed implementation plugs in. Callers in this
    * repo use [[StubDecoder]]'s deterministic fake instead.
    */
  def resizeImage(payload: Array[Byte], width: Int, height: Int): Array[Byte] =
    ??? // real codec boundary: decode -> scale -> re-encode

  /** Extract the frame at `posMs` from a timed medium — same codec
    * boundary as [[resizeImage]]; the deterministic offline fake slices
    * bytes proportionally so plumbing is testable.
    */
  def extractFrameStub(payload: Array[Byte], posMs: Long, durationMs: Long): Array[Byte] = {
    if (payload.isEmpty || durationMs <= 0) Array.emptyByteArray
    else {
      val frac = math.min(math.max(posMs.toDouble / durationMs, 0.0), 1.0)
      val start = (frac * (payload.length - 1)).toInt
      payload.slice(start, math.min(start + 16, payload.length))
    }
  }

  /** Frame-sampling positions for a timed medium: every `stepMs`
    * starting at 0 — the video analog of the reference pipeline's
    * hour-slot sampling.
    */
  def framePositions(durationMs: Long, stepMs: Long): Seq[Long] =
    0L.to(math.max(durationMs - 1, 0L)).by(math.max(stepMs, 1L))

  /** Batched decode: one decoder instance per partition (amortizes codec
    * init), payload → feature vector + cheap metadata.
    */
  def decodeFeatures(media: DataFrame, decoder: MediaDecoder,
      frameStepMs: Long = 1000L): DataFrame = {
    val spark = media.sparkSession
    val md5 = java.security.MessageDigest.getInstance("MD5")
    val rdd = media.select("media_id", "mime", "payload", "duration_ms").rdd
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val id = r.getLong(0)
          val mime = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          val durationMs = if (r.isNullAt(3)) 0L else r.getLong(3)
          val checksum = digest.digest(payload).map("%02x".format(_)).mkString
          val nFrames = framePositions(durationMs, frameStepMs).size
          Row(id, mime, payload.length.toLong, checksum, nFrames,
            decoder.decode(mime, payload).toSeq)
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Payload-free metadata extraction — pure column algebra, prunable to
    * a metadata-only parquet scan when the caller selects no payload.
    */
  def mediaMetadata(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("mime"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("checksum"),
      (col("duration_ms") / 1000L).cast("long").as("duration_s"),
    )
}
