// Scratch: packed-vs-row HyperBall timing + shuffle-row-count probe.
// usage: runMain graft.tools.HbProbe <sfDir> [radius]
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object HbProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val radius = if (args.length > 1) args(1).toInt else 4
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    // "synth:N" generates an N-node out-degree-2 graph instead of
    // reading a sf dir — the scale knob the tiny test graphs lack
    val docs =
      if (dir.startsWith("synth:"))
        s.range(dir.stripPrefix("synth:").toLong).select(col("id").as("doc_id"))
      else s.read.parquet(s"$dir/documents.parquet")
    val n = docs.count()
    val edges = docs.select(col("doc_id").as("src"),
        (((col("doc_id") % n) * (col("doc_id") % n) + 3) % n).as("dst"))
      .unionByName(docs.select(col("doc_id").as("src"),
        ((col("doc_id") * 7 + 3) % n).as("dst")))
    (1 to 2).foreach { k =>
      val t0 = System.nanoTime()
      val rowRows = graft.pipeline.TopicGraph.hyperBallRegisters(edges, radius).count()
      val tRow = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val pkRows = graft.pipeline.TopicGraph.hyperBallPackedRegisters(edges, radius).count()
      val tPk = (System.nanoTime() - t1) / 1e9
      println(f"HBPROBE pass$k radius=$radius rowForm=$tRow%.2f s ($rowRows register rows) packed=$tPk%.2f s ($pkRows node rows) ratio=${tRow / tPk}%.2f")
    }
    s.stop()
  }
}
