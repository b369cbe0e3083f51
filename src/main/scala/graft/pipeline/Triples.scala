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
    val spark = files.sparkSession
    import spark.implicits._
    // parse ONCE: mentions and alias edges both branch off the persisted
    // parse (without it, each branch re-runs the full parse — the
    // single most expensive stage). On a cluster this persist is the
    // 01_parse snapshot stage (see graft.Main).
    val parsed = Mentions.parseAll(files, dict)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mentions = parsed.flatMap(p => graft.parse.Segmenter.sentencesWithMentions(p))
    val edges = parsed.filter(_.aliasTarget.isDefined)
      .map(p => (p.uri, p.aliasTarget.get)).toDF("src", "dst")
    val canon = Redirects.transitiveClosure(edges)
    val out = mentions.toDF()
      .join(canon.withColumnRenamed("src", "target"), Seq("target"), "left_outer")
      .select(col("uri").as("subj"),
        coalesce(col("root"), col("target")).as("obj"))
      .distinct()
    out
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
