// Scratch: phase-level timing of the bench pipeline at a given core count.
package graft.tools

import graft.core.CodeFile
import graft.fixtures.CorpusGen
import graft.pipeline.{Mentions, Redirects}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val corpusDir = args(1)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    for (round <- 1 to 2) {
      println(s"--- round $round (cpus=$cpus)")
      val files = spark.read.parquet(corpusDir).as[CodeFile]
      val dict = CorpusGen.dictionary
      t("parse+mentions+count") { Mentions.extract(files, dict).count() }
      val edges = t("aliasEdges") { Mentions.aliasEdges(files, dict).toDF("src", "dst").localCheckpoint(true) }
      val canon = t("closure") { Redirects.transitiveClosure(edges).localCheckpoint(true) }
      t("join+distinct+count") {
        Mentions.extract(files, dict).toDF()
          .join(canon.withColumnRenamed("src", "target"), Seq("target"), "left_outer")
          .select(col("uri").as("subj"), coalesce(col("root"), col("target")).as("obj"))
          .distinct().count()
      }
    }
    spark.stop()
  }
}
