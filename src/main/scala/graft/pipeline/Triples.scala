package graft.pipeline

import graft.core.CodeFile
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Mention-triple construction: parse -> mentions -> alias-closure
 * resolution -> distinct (subj, obj). The shared core of the bench
 * pipeline, the spark-submit Main, and the P/R harness.
 */
object Triples {

  def mentionTriples(files: Dataset[CodeFile], dict: Map[String, String]): DataFrame = {
    val mentions = Mentions.extract(files, dict)
    val edges = Mentions.aliasEdges(files, dict).toDF("src", "dst")
    val canon = Redirects.transitiveClosure(edges)
    mentions.toDF()
      .join(canon.withColumnRenamed("src", "target"), Seq("target"), "left_outer")
      .select(col("uri").as("subj"),
        coalesce(col("root"), col("target")).as("obj"))
      .distinct()
  }

  /** Precision/recall of a got-vs-want triple set (the north rule's
    * P/R>=0.95 criterion, computed distributed — no driver collect). */
  def precisionRecall(got: DataFrame, want: DataFrame): (Double, Double) = {
    val g = got.select("subj", "obj").distinct().cache()
    val w = want.select("subj", "obj").distinct().cache()
    val inter = g.join(w, Seq("subj", "obj"), "left_semi").count().toDouble
    val (ng, nw) = (g.count(), w.count())
    g.unpersist(); w.unpersist()
    (if (ng == 0) 0.0 else inter / ng, if (nw == 0) 0.0 else inter / nw)
  }
}
