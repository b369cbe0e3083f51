// Scratch: measure the two round-7 skew guards at planted-pathology
// scale — Adamic-Adar's maxDeg wedge cap on a hub graph and the
// containment join's maxDf common-code elimination under a
// boilerplate flood. usage: runMain graft.tools.CapProbe
package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object CapProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.maxPlanStringLength", "1048576")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"CAPPROBE $label ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }

    // ---- Adamic-Adar: one degree-D hub + a 200k-node ring ----
    val d = if (args.length > 0) args(0).toInt else 10000
    val n = 200000L
    val hub = s.range(1, d + 1).select(lit(0L).as("src"), (col("id") + lit(1000000L)).as("dst"))
    val ring = s.range(n).select(col("id").as("src"),
      ((col("id") + 1) % n).as("dst"))
    val edges = hub.unionByName(ring).localCheckpoint(true)
    val exact = timed(s"aa exact hubDeg=$d")(
      graft.pipeline.TopicGraph.adamicAdar(edges, k = 100).count())
    val capped = timed(s"aa maxDeg=32 hubDeg=$d")(
      graft.pipeline.TopicGraph.adamicAdar(edges, k = 100,
        maxDeg = Some(32)).count())
    println(s"CAPPROBE aa rows exact=$exact capped=$capped " +
      s"(hub wedges ${d.toLong * (d - 1) / 2} -> ${32L * 31 / 2})")

    // ---- containment: boilerplate flood (pure-header quotes) ----
    val nCont = if (args.length > 1) args(1).toInt else 5000
    val nQuote = if (args.length > 2) args(2).toInt else 1000
    val header = (1 to 40).map(i => s"lic$i").mkString(" ")
    val docs = s.range(nCont).select(col("id").as("doc_id"),
        concat(lit(header + " "), concat_ws(" ",
          (0 until 60).map(j => concat(lit(s"u${j}_"), col("id"))): _*))
          .as("text"))
      .unionByName(s.range(nQuote).select((col("id") + 1000000L).as("doc_id"),
        lit(header).as("text")))
      .localCheckpoint(true)
    val un = timed(s"containment uncapped cont=$nCont quotes=$nQuote")(
      graft.pipeline.Dedup.containmentJoinExact(docs, 4, 5).count())
    val cp = timed(s"containment maxDf=50 cont=$nCont quotes=$nQuote")(
      graft.pipeline.Dedup.containmentJoinExact(docs, 4, 5,
        maxDf = Some(50)).count())
    println(s"CAPPROBE containment rows uncapped=$un capped=$cp")
    s.stop()
  }
}
