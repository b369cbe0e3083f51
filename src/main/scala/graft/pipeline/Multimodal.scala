package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal column plumbing: image/audio/video payloads as opaque
 * `binary` columns with typed metadata, batch-shaped decode/feature
 * stages.
 *
 * The decode itself is STUBBED (no image/audio libs in this container):
 * `decodeStub` derives deterministic fake metadata from the bytes. The
 * Spark-side contract is real — schema, partition-parallel
 * `mapPartitions` batching, and the metadata struct a real decoder
 * would fill. Swapping in a real codec changes only the function body.
 */
object Multimodal {

  final case class MediaMeta(
      media_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_frames: Int,
      byte_len: Long,
      checksum: String)

  /**
   * STUB decoder: deterministic fake metadata from the payload bytes.
   * A real implementation would parse the container header here.
   */
  def decodeStub(id: Long, bytes: Array[Byte]): MediaMeta = {
    val len = bytes.length
    val h = java.util.Arrays.hashCode(bytes)
    val fmt = (math.abs(h) % 3) match {
      case 0 => "png"
      case 1 => "jpeg"
      case _ => "wav"
    }
    MediaMeta(id, fmt,
      width = 16 + math.abs(h % 1024),
      height = 16 + math.abs((h / 1024) % 1024),
      n_frames = 1 + math.abs(h % 32),
      byte_len = len.toLong,
      checksum = graft.functions.TextFunctions.sha256Hex(new String(bytes.map(b => (b & 0x7f).toChar))))
  }

  /**
   * Decode a `media(media_id: long, payload: binary)` relation into
   * typed metadata. `mapPartitions` keeps per-batch decoder state (a
   * real codec context) alive across rows of a partition.
   */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // decoder context would be initialized once per partition here
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }

  /**
   * STUB feature extractor: a deterministic 16-dim float vector from
   * byte histograms (a real implementation would run the image/audio
   * model here). The batch shape is the real contract: one vector per
   * payload, `array<float>` column directly consumable by the
   * Similarity ANN operators.
   */
  def featureStub(bytes: Array[Byte]): Array[Float] = {
    val v = new Array[Float](16)
    var i = 0
    while (i < bytes.length) {
      v(bytes(i) & 0x0f) += 1f
      i += 1
    }
    val n = math.max(bytes.length, 1).toFloat
    var j = 0
    while (j < 16) { v(j) /= n; j += 1 }
    v
  }

  /** media(media_id, payload) -> (vec_id, embedding) feature relation —
    * partition-parallel batch decode+featurize, ANN-ready. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // model/codec context would be initialized once per partition
        it.map { case (id, bytes) => (id, featureStub(bytes)) }
      }
      .toDF("vec_id", "embedding")
  }

  /**
   * STUB resize: deterministic payload transform to the target
   * dimensions (a real implementation decodes, scales, re-encodes).
   * The contract is the shape: payload-in/payload-out with recorded
   * output dims, map-side, no shuffle.
   */
  def resizeStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](math.min(bytes.length, math.max(16, (w * h) / 64)))
    var i = 0
    while (i < out.length) { out(i) = bytes(i % math.max(bytes.length, 1)); i += 1 }
    out
  }

  /** media(media_id, payload) -> (media_id, payload, width, height)
    * resized to fixed target dims — the thumbnail/training-resolution
    * normalization stage. */
  def resize(media: DataFrame, w: Int = 224, h: Int = 224): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, resizeStub(bytes, w, h), w, h) })
      .toDF("media_id", "payload", "width", "height")
  }

  /**
   * Frame sampling: one row per sampled frame (every `everyN`-th of the
   * decoded frame count) — the video fan-out stage. STUB frame payload
   * = deterministic slice of the container bytes; the real contract is
   * the explode SHAPE: (media_id, frame_idx, frame_payload) rows whose
   * payloads feed extractFeatures/ANN per frame.
   */
  def sampleFrames(media: DataFrame, everyN: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val meta = decodeStub(id, bytes)
        (0 until meta.n_frames by everyN).map { f =>
          val n = math.max(bytes.length, 1)
          val start = (f * n / math.max(meta.n_frames, 1)) % n
          (id, f, java.util.Arrays.copyOfRange(bytes, start, math.min(start + 64, bytes.length)))
        }
      })
      .toDF("media_id", "frame_idx", "frame_payload")
  }

  /** Documents table viewed as a binary media relation (UTF-8 payloads). */
  def documentsAsMedia(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"))
}
