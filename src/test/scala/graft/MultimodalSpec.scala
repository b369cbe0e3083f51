package graft

import graft.pipeline.{Multimodal, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Multimodal end-to-end: binary payloads -> batch decode -> feature
 * vectors -> ANN over the features. Container-header decode (PNG IHDR,
 * JPEG SOFn, GIF block walk, WAV RIFF chunks, BMP) is REAL byte
 * arithmetic pinned below against fixture containers GENERATED
 * in-test via JDK javax.imageio / hand-built canonical headers (no
 * external data); non-media payloads take the documented "bin"
 * fallback path.
 */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("decode metadata is deterministic and length-faithful") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.documentsAsMedia(docs)
    val meta = Multimodal.decodeMeta(media).collect()
    assert(meta.length == docs.count())
    val lens = docs.select(col("doc_id"), length(col("text")).cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    meta.foreach { m =>
      assert(m.byte_len == lens(m.media_id)) // single-byte chars in corpus
      assert(m.format == "bin") // text payloads are not a media container
    }
    // determinism
    val again = Multimodal.decodeMeta(media).collect()
    assert(meta.sortBy(_.media_id).toSeq == again.sortBy(_.media_id).toSeq)
  }

  test("resize normalizes dims; frame sampling fans out per sampled frame") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val media = Multimodal.documentsAsMedia(docs)
    val resized = Multimodal.resize(media, 224, 224)
    assert(resized.count() == docs.count())
    assert(resized.select("width", "height").distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSeq == Seq((224, 224)))

    val frames = Multimodal.sampleFrames(media, everyN = 4)
    // every media contributes ceil(n_frames/4) rows; cross-check counts
    val meta = Multimodal.decodeMeta(media).collect()
      .map(m => m.media_id -> ((m.n_frames + 3) / 4).toLong).toMap
    val got = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == meta)
    // per-frame payloads compose with the feature extractor (per-frame ANN)
    val frameFeats = Multimodal.extractFeatures(
      frames.select(
        (col("media_id") * 1000 + col("frame_idx")).as("media_id"),
        col("frame_payload").as("payload")))
    assert(frameFeats.count() == frames.count())
  }

  // ---- in-test fixture generators (JDK-only; no external data) ----
  private def img(w: Int, h: Int, seed: Int): java.awt.image.BufferedImage = {
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      im.setRGB(x, y, (x * 31 + y * 17 + seed) * 2654435761L.toInt)
    im
  }
  private def encode(im: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, fmt, bos)
    bos.toByteArray
  }
  private def gifBytes(frames: Int): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (f <- 0 until frames)
      writer.writeToSequence(
        new javax.imageio.IIOImage(img(11, 9, f * 97), null, null), null)
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }
  private def wavBytes(sampleFrames: Int, channels: Int, rate: Int): Array[Byte] = {
    val blockAlign = channels * 2 // PCM16
    val dataLen = sampleFrames * blockAlign
    val b = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    b.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(rate)
      .putInt(rate * blockAlign).putShort(blockAlign.toShort).putShort(16)
    b.put("data".getBytes("US-ASCII")).putInt(dataLen)
    for (i <- 0 until dataLen / 2) b.putShort((i * 1103 - 7000).toShort)
    b.array()
  }

  test("synthetic containers: parse-back equals the id formulas (q131 contract)") {
    // formulas restated from Multimodal.syntheticContainer scaladoc —
    // the same closed forms the q131 DuckDB oracle uses
    ((0L until 64L) ++ Seq(997L, 1000003L, 123456789L)).foreach { id =>
      val bytes = Multimodal.syntheticContainer(id)
      val m = Multimodal.parseMeta(id, bytes)
      val (kind, wE, hE, fE, lE) = (id % 4) match {
        case 0 => ("png", 16 + id % 100, 8 + id % 50, 1L, 33L)
        case 1 => ("wav", 8000 + 100 * (id % 8), 1 + id % 2, 5 + id % 9,
          44 + (5 + id % 9) * (1 + id % 2) * 2)
        case 2 => ("gif", 16 + id % 100, 8 + id % 50, 1 + id % 3,
          14 + (1 + id % 3) * 15)
        case _ => ("bmp", 16 + id % 100, 8 + id % 50, 1L, 54L)
      }
      assert(m.format == kind && m.width == wE && m.height == hE &&
        m.n_frames == fE && m.byte_len == lE, s"id=$id -> $m")
      assert(m.byte_len == bytes.length.toLong)
      // width != height always — a swapped-offset bug cannot hide
      assert(m.width != m.height, s"id=$id")
    }
    // the distributed relation carries the same payloads
    import spark.implicits._
    val ids = (0L until 32L).toDF("media_id")
    val metas = Multimodal.decodeMeta(Multimodal.syntheticContainers(ids))
      .collect().map(m => m.media_id -> m).toMap
    assert(metas.size == 32 &&
      metas.forall { case (id, m) =>
        m.checksum == graft.functions.TextFunctions.sha256Hex(
          Multimodal.syntheticContainer(id))
      })
  }

  test("golden headers: real PNG/JPEG/GIF/WAV/BMP container parsing") {
    import spark.implicits._
    val png = encode(img(23, 17, 1), "png")
    val jpg = encode(img(31, 13, 2), "jpg")
    val bmp = encode(img(9, 7, 3), "bmp")
    val gif = gifBytes(3)
    val wav = wavBytes(sampleFrames = 10, channels = 2, rate = 8000)
    val media = Seq((1L, png), (2L, jpg), (3L, bmp), (4L, gif), (5L, wav),
        (6L, "just some text bytes".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val meta = Multimodal.decodeMeta(media).collect()
      .map(m => m.media_id -> m).toMap
    assert(meta(1L).format == "png" && meta(1L).width == 23 && meta(1L).height == 17
      && meta(1L).n_frames == 1)
    assert(meta(2L).format == "jpeg" && meta(2L).width == 31 && meta(2L).height == 13)
    assert(meta(3L).format == "bmp" && meta(3L).width == 9 && meta(3L).height == 7)
    assert(meta(4L).format == "gif" && meta(4L).width == 11 && meta(4L).height == 9
      && meta(4L).n_frames == 3, s"gif meta: ${meta(4L)}")
    assert(meta(5L).format == "wav" && meta(5L).width == 8000 && meta(5L).height == 2
      && meta(5L).n_frames == 10, s"wav meta: ${meta(5L)}")
    assert(meta(6L).format == "bin")
    meta.values.foreach { m =>
      assert(m.checksum == graft.functions.TextFunctions.sha256Hex(
        m.media_id match {
          case 1L => png; case 2L => jpg; case 3L => bmp
          case 4L => gif; case 5L => wav
          case _ => "just some text bytes".getBytes("UTF-8")
        }))
    }

    // REAL resize: the resized payload is a decodable PNG at target dims
    val resized = Multimodal.resize(media.filter(col("media_id") <= 4L), 64, 48)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    resized.foreach { case (id, bytes) =>
      val m2 = Multimodal.parseMeta(id, bytes)
      assert(m2.format == "png" && m2.width == 64 && m2.height == 48,
        s"media $id resize -> $m2")
    }

    // REAL frame sampling: GIF image-descriptor segments, WAV PCM frames
    val gifFrames = Multimodal.sampleFrames(media.filter(col("media_id") === 4L),
      everyN = 2).collect()
    assert(gifFrames.length == 2) // frames 0 and 2 of 3
    gifFrames.foreach { r =>
      val payload = r.getAs[Array[Byte]](2)
      assert((payload(0) & 0xff) == 0x2c, "gif frame slice starts at its image descriptor")
    }
    val wavFrames = Multimodal.sampleFrames(media.filter(col("media_id") === 5L),
      everyN = 4).collect()
    assert(wavFrames.length == 3) // sample frames 0, 4, 8 of 10
    wavFrames.foreach(r => assert(r.getAs[Array[Byte]](2).length == 4)) // blockAlign

    // REAL pixel features: an all-dark vs an all-bright image separate
    // in luminance-histogram space
    val dark = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB) // all zero = black
    val bright = img(8, 8, 0)
    for (y <- 0 until 8; x <- 0 until 8) bright.setRGB(x, y, 0xffffff)
    val fd = Multimodal.featureVector(encode(dark, "png"))
    val fb = Multimodal.featureVector(encode(bright, "png"))
    assert(fd(0) > 0.99f && fb(15) > 0.99f)
    assert(math.abs(fd.sum - 1f) < 1e-3 && math.abs(fb.sum - 1f) < 1e-3)
  }

  test("feature vectors feed the ANN operators directly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val feats = Multimodal.extractFeatures(Multimodal.documentsAsMedia(docs))
    assert(feats.schema("embedding").dataType.typeName == "array")
    // histograms are normalized: components sum to ~1
    val sums = feats.select(aggregate(col("embedding"), lit(0.0),
      (a, v) => a + v.cast("double")).as("s")).collect()
    sums.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-3))
    // brute-force top-k over the media features (composition check)
    val probes = feats.filter(col("vec_id") % 100 === 0)
    val top = Similarity.bruteForceTopK(probes, feats, 3)
    assert(top.groupBy("probe_id").count().collect().forall(_.getLong(1) == 3))
  }
}
