package graft

import graft.streaming.EventStream
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/**
 * Structured Streaming surface: the SAME windowedCounts transform runs
 * in batch and streaming; streaming (memory sink, processAllAvailable)
 * must equal batch on the bounded events table.
 */
class StreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  test("streaming windowed counts equal batch result") {
    val sfDir = "/root/testdata/sf0.001"
    val batch = EventStream.windowedCounts(
      spark.read.parquet(s"$sfDir/events.parquet"))
      .collect().map(_.toString).sorted

    val q = EventStream.windowedCounts(EventStream.readEventStream(spark, sfDir))
      .writeStream.outputMode("complete")
      .format("memory").queryName("stream_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("stream_out").collect().map(_.toString).sorted
      assert(streamed.nonEmpty)
      assert(streamed.toSeq == batch.toSeq)
    } finally q.stop()
  }
}
