package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: star-contraction vs min-label CC wall time on graphs
  * large enough to force the distributed paths (the sizes where the
  * dedup keep-list's component step stops fitting the driver).
  * Usage: runMain graft.tools.CcProbe [nNodes] */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // half a long chain (diameter n/2 — propagation's worst case),
    // half random (hash-derived) edges: one giant component + noise
    val chain = spark.range(n / 2)
      .select(col("id").as("src"), (col("id") + 1).as("dst"))
    val rand = spark.range(n / 2)
      .select((xxhash64(col("id")) % (n / 2)).as("src"),
        (xxhash64(col("id") + 7) % n).as("dst"))
      .select(abs(col("src")).as("src"), abs(col("dst")).as("dst"))
    val edges = chain.unionByName(rand)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    println(s"[ccprobe] edges: ${edges.count()}")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"[ccprobe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows labels)")
    }
    // warm both code paths once at small size
    val tiny = spark.range(64).select(col("id").as("src"), (col("id") + 1).as("dst"))
    graft.pipeline.TopicGraph.connectedComponents(tiny, localThreshold = 0).count()
    graft.pipeline.TopicGraph.connectedComponentsMinLabel(tiny).count()
    time("contraction") {
      graft.pipeline.TopicGraph.connectedComponents(edges, maxIter = 60,
        localThreshold = 0).count()
    }
    time("min-label  ") {
      graft.pipeline.TopicGraph.connectedComponentsMinLabel(edges, maxIter = 60).count()
    }
    spark.stop()
  }
}
