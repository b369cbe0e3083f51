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
