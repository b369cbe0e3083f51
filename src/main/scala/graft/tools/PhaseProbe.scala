// Scratch: per-phase wall times of the bench pipeline at one parallelism.
package graft.tools

import graft.core.CodeFile
import graft.fixtures.CorpusGen
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 32
    val s = SparkSession.builder().master(s"local[$n]")
      .config("spark.sql.shuffle.partitions", n)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    import s.implicits._
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm-up full run
    t("warmup-full")(graft.Bench.extractTriples(s, corpusDir))
    for (_ <- 1 to 2) {
      val files = s.read.parquet(corpusDir).as[CodeFile]
      val dictB = s.sparkContext.broadcast(CorpusGen.dictionary)
      val edges = t("edges-scan") {
        files.filter(_.content.startsWith("#ALIAS [["))
          .map(f => graft.parse.CodeParser.parse(f, dictB.value))
          .flatMap(p => p.aliasTarget.map(x => (p.uri, x)))
          .toDF("src", "dst").localCheckpoint(true)
      }
      val canon = t("closure")(graft.pipeline.Redirects.transitiveClosure(edges))
      t("canon-count")(canon.count())
      val mentions = files.flatMap { f =>
        val p = graft.parse.CodeParser.parse(f, dictB.value)
        if (p.aliasTarget.isDefined) Iterator.empty[(String, String)]
        else graft.parse.Segmenter.sentencesWithMentions(p).iterator.map(m => (m.uri, m.target))
      }.toDF("uri", "target")
      t("mentions-distinct") {
        mentions.join(canon.withColumnRenamed("src", "target"), Seq("target"), "left_outer")
          .select(col("uri").as("subj"), coalesce(col("root"), col("target")).as("obj"))
          .distinct().count()
      }
    }
    s.stop()
  }
}
