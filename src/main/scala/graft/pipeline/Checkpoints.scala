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

  /** True iff the stage snapshot was fully committed: the manifest
    * exists AND is structurally complete (the atomic rename below makes
    * a torn manifest near-impossible, but a half-written file from an
    * older writer or a non-atomic copy must still read as uncommitted —
    * resuming from a stage whose lineage record is garbage would be a
    * silent trust violation even when the parquet itself is fine). */
  def isCommitted(name: String): Boolean =
    Files.exists(manifest(name)) && {
      val m = try Files.readString(manifest(name)) catch { case _: Exception => "" }
      m.startsWith("{") && m.trim.endsWith("}") && m.contains("\"rows\"")
    }

  /**
   * Run a stage: if committed, reload the snapshot (no recompute); else
   * compute, write, record per-partition counts, commit the manifest
   * last via temp-file + atomic rename (`Files.move(..., ATOMIC_MOVE)`)
   * — a crash mid-commit leaves either no manifest or a complete one,
   * never a truncated record that `isCommitted` would trust (Iceberg
   * snapshots give the same guarantee transactionally).
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
      val tmp = Paths.get(s"${stageDir(name)}/_MANIFEST.tmp")
      Files.writeString(tmp,
        s"""{"stage":"$name","rows":$rows,"partitions":$total,
           |"lineage":[${counts.mkString(",")}]}""".stripMargin)
      Files.move(tmp, manifest(name),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
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
