package graft

import graft.pipeline.{Multimodal, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Multimodal plumbing end-to-end: binary payloads -> batch decode ->
 * feature vectors -> ANN over the features. The decode/featurize bodies
 * are stubs; the schema, batching, and downstream composition are real.
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
      assert(Seq("png", "jpeg", "wav").contains(m.format))
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
