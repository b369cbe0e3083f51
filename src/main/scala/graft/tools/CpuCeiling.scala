// Scratch: machine scaling ceiling via a pure-CPU embarrassingly
// parallel job (sha256 over synthetic strings), 8 vs 32 threads.
package graft.tools

import org.apache.spark.sql.SparkSession

object CpuCeiling {
  def main(args: Array[String]): Unit = {
    val n = 3000000L
    def run(cores: Int): Double = {
      val s = SparkSession.builder().master(s"local[$cores]")
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      import s.implicits._
      val t0 = System.nanoTime()
      s.range(n).repartition(128).map(i =>
        graft.functions.TextFunctions.sha256Hex("row-" + i + "-payload-padding-x").length)
        .reduce(_ + _)
      val dt = (System.nanoTime() - t0) / 1e9
      s.stop(); dt
    }
    run(32) // warmup
    for (c <- Seq(8, 32, 8, 32)) println(f"CEIL cores $c sec ${run(c)}%.2f")
  }
}
