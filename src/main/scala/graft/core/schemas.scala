package graft.core

/**
 * Canonical record types of the knowledge-graph construction engine.
 *
 * Re-realization of the reference data model (pignlproc; see
 * /root/reference/src/main/java/pignlproc/storage/ParsingWikipediaLoader.java:70-105
 * for the page schema and markup/Annotation.java:3-20 for spans) over a
 * source-code corpus per the BASELINE input_hint:
 * `code_files(repo, path, commit, lang, content)`.
 */

/** Primary input row (the Iceberg `code_files` analog). */
final case class CodeFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    content: String)

/** Char-offset span over parsed text (Annotation.java:3-20 analog). */
final case class Span(begin: Int, end: Int, label: String, value: String)

/**
 * Parsed file: the `page` schema analog
 * (ParsingWikipediaLoader.java:80-102). `aliasTarget` plays the role of
 * `redirect`; `mentions` the role of the link bag; `blocks`/`headers`
 * the paragraph/header bags. `sha256` is the per-row invariant carried
 * onto every derived row.
 */
final case class ParsedFile(
    repo: String,
    path: String,
    commit: String,
    lang: String,
    uri: String,
    text: String,
    aliasTarget: Option[String],
    mentions: Seq[Span],
    headers: Seq[Span],
    blocks: Seq[Span],
    sha256: String)

/**
 * Sentence-level mention (SentencesWithLink.java:134-148 output schema,
 * flattened as in examples/ner-corpus/01_extract_sentences_with_links.pig:25-29).
 */
final case class Mention(
    uri: String,
    sentenceOrder: Int,
    target: String,
    begin: Int,
    end: Int,
    sentence: String,
    sha256: String)

/** (subject, predicate, object) triple — the universal output artifact. */
final case class Triple(subj: String, pred: String, obj: String)

/** Directed edge of an alias / redirect / broader-topic graph. */
final case class Edge(src: String, dst: String)
