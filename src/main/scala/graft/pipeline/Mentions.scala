package graft.pipeline

import graft.core.{CodeFile, Mention, ParsedFile}
import graft.parse.{CodeParser, Segmenter}
import org.apache.spark.sql.{Dataset, SparkSession}

/**
 * Per-file mention extraction — the extract_links.pig /
 * ner-corpus/01_extract_sentences_with_links.pig pipeline: parse every
 * file, segment, emit one row per (sentence ⊇ mention).
 *
 * Execution shape (SURVEY §3 entry point A): scan → map(parse) →
 * flatMap(mentions) — a single no-shuffle stage; the anchor dictionary
 * rides to every task as a broadcast variable (the replicated-join
 * pattern of ner-corpus/03_…pig:22 generalized to the parser).
 */
object Mentions {

  def parseAll(files: Dataset[CodeFile], dictionary: Map[String, String]): Dataset[ParsedFile] = {
    val spark = files.sparkSession
    import spark.implicits._
    val dictB = spark.sparkContext.broadcast(dictionary)
    files.map(f => CodeParser.parse(f, dictB.value))
  }

  def extract(files: Dataset[CodeFile], dictionary: Map[String, String],
      sentenceTokens: Int = 10): Dataset[Mention] = {
    val spark = files.sparkSession
    import spark.implicits._
    parseAll(files, dictionary).flatMap(p => Segmenter.sentencesWithMentions(p, sentenceTokens))
  }

  /** Alias edge list from the corpus (extract_redirects.pig analog). */
  def aliasEdges(files: Dataset[CodeFile], dictionary: Map[String, String]): Dataset[(String, String)] = {
    val spark = files.sparkSession
    import spark.implicits._
    parseAll(files, dictionary)
      .filter(_.aliasTarget.isDefined)
      .map(p => (p.uri, p.aliasTarget.get))
  }
}
