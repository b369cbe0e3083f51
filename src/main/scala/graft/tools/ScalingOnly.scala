// Scratch: just the two-parallelism scaling measurement (corpus must exist).
package graft.tools

import graft.Bench
import org.apache.spark.sql.SparkSession

object ScalingOnly {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val cpusHi = if (args.length > 1) args(1).toInt else 32
    def session(n: Int) = {
      val s = SparkSession.builder().master(s"local[$n]")
        .config("spark.sql.shuffle.partitions", n)
        .config("spark.sql.files.maxPartitionBytes", "4m") // see Bench.newSession
        .config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel("ERROR"); s
    }
    // warmup
    val w = session(cpusHi); Bench.extractTriples(w, corpusDir); w.stop()
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    for (n <- Seq(cpusHi / 4, cpusHi, cpusHi / 4, cpusHi, cpusHi / 4, cpusHi)) {
      val s = session(n)
      val t0 = System.nanoTime(); val cpu0 = osBean.getProcessCpuTime; val gc0 = gcMs
      val c = Bench.extractTriples(s, corpusDir)
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - cpu0) / 1e9
      println(f"CORES $n triples $c sec $wall%.2f cpu $cpu%.1f util ${cpu / wall / n * 100}%.0f%% gc ${(gcMs - gc0) / 1000.0}%.1f s")
      s.stop()
    }
  }
}
