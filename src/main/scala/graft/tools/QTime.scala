// Scratch: wall-time individual driver queries at a given sf dir.
// usage: runMain graft.tools.QTime <sfDir> <query> [query...]
package graft.tools

import org.apache.spark.sql.SparkSession

object QTime {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { q =>
      (1 to 2).foreach { k =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(q)(s, dir).count()
        println(f"QTIME $q pass$k ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    s.stop()
  }
}
