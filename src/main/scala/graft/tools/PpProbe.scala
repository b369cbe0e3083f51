// Scratch: PPJoin candidate-meet residual counts with each filter
// toggled, at q105's threshold, over an sf dir's documents table.
// usage: runMain graft.tools.PpProbe <sfDir>
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$dir/documents.parquet")
    for ((pos, sig) <- Seq((false, false), (true, false), (true, true))) {
      val t0 = System.nanoTime()
      val (_, meets) = graft.pipeline.Dedup.jaccardCandidateMeets(
        docs, col("doc_id"), col("text"), 19, 20, posFilter = pos, sigFilter = sig)
      val n = meets.count()
      println(f"PPPROBE pos=$pos sig=$sig meets=$n (${(System.nanoTime() - t0) / 1e9}%.2f s)")
    }
    s.stop()
  }
}
