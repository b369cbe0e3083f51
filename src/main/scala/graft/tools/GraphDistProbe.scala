// Scratch: time SparkEntry.distGraphQueries (the localThreshold = 0
// twins) on a given dir — the graph_dist bench leg in isolation.
// usage: runMain graft.tools.GraphDistProbe <dir> [query...]
package graft.tools

import org.apache.spark.sql.SparkSession

object GraphDistProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else graft.SparkEntry.distGraphQueries.keys.toSeq.sorted
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.distGraphQueries(n)(s, dir).count()
      println(f"GRAPHDIST $n ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$c")
    }
    s.stop()
  }
}
