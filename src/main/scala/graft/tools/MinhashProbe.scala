// Scratch: stage-level timing of q42 minhash at sf0.1.
package graft.tools

import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object MinhashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 2) {
      println(s"--- round $round")
      t("shingle_explode_count") {
        docs.select(col("doc_id"),
          explode(Dedup.wordShingles(col("text"), 3)).as("s")).count()
      }
      t("signatures") { Dedup.minhashSignatures(docs).count() }
      t("full_candidates") { Dedup.minhashCandidates(docs).count() }
    }
    spark.stop()
  }
}
// finer probe
object MinhashProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE2 $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (_ <- 1 to 2) {
      val sigs = t("checkpoint_sigs") {
        Dedup.minhashSignatures(docs).localCheckpoint(true)
      }
      val keyed = sigs.select(col("doc_id"), col("sig"),
        explode(Dedup.lshBandKeys(col("sig"), 4, 4)).as("bucket"))
      t("keyed_count") { keyed.count() }
      val a = keyed.select(col("bucket"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
      val b = keyed.select(col("bucket"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
      t("join_count") { a.join(b, Seq("bucket")).filter(col("id_a") < col("id_b")).count() }
    }
    spark.stop()
  }
}
