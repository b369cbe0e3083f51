package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming surface. The reference is purely batch (SURVEY
 * §1.1 — no streaming to replicate), but the engine exposes the events
 * table as a stream for incremental KG maintenance: windowed mention /
 * event aggregation with watermarking.
 *
 * `windowedCounts` is written so the SAME transform runs in batch and
 * streaming (Structured Streaming's unified Dataset semantics); the
 * batch form is what the correctness oracle checks, the streaming form
 * is exercised in tests via a memory sink.
 */
object EventStream {

  /** 5-minute tumbling-window counts per event_type. */
  def windowedCounts(events: DataFrame): DataFrame =
    events
      // parquet NTZ timestamps -> LTZ (session TZ is UTC, so a no-op
      // semantically) because event-time watermarks require TIMESTAMP
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Read the events parquet as a bounded stream (for tests).
    * FileStreamSource requires a directory of files, so the single-file
    * table is exposed through a temp directory symlink. */
  def readEventStream(spark: SparkSession, sfDir: String): DataFrame = {
    val schema: StructType = spark.read.parquet(s"$sfDir/events.parquet").schema
    val dir = java.nio.file.Files.createTempDirectory("graft-events-stream")
    java.nio.file.Files.createSymbolicLink(
      dir.resolve("events.parquet"),
      java.nio.file.Paths.get(s"$sfDir/events.parquet"))
    spark.readStream.schema(schema).parquet(dir.toString)
  }
}
