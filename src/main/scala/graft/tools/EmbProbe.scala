// scratch probe via sbt console-like main: reuse tools pattern
package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object EmbProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.1"
    val emb = s.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count(); val cols = emb.columns
    val copies = (0 until 10).map { k =>
      val rot = (6 * k) % 64
      val rotated = if (rot == 0) col("embedding")
        else concat(slice(col("embedding"), rot + 1, 64 - rot), slice(col("embedding"), 1, rot))
      emb.select((col("vec_id") + lit(k * n)).as("vec_id") +: rotated.as("embedding") +:
        cols.filter(c => c != "vec_id" && c != "embedding").map(col): _*)
    }
    val dir = "/tmp/graft-embprobe"
    copies.reduce(_ unionByName _).repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    println("vectors: " + s.read.parquet(s"$dir/embeddings.parquet").count())
    Seq("q43_sim_topk","q44_sim_lsh","q53_emb_neardup","q77_semdedup",
        "q87_semdedup_kmeans","q89_sim_pq","q90_sim_ivf_pq").foreach { q =>
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(q)(s, dir).count()
      println(f"EMBPROBE $q ${(System.nanoTime()-t0)/1e9}%.2f s rows=$c")
    }
    s.stop()
  }
}
