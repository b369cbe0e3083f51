package graft.parse

import graft.core.{CodeFile, Mention, ParsedFile, Span}
import graft.functions.TextFunctions

/**
 * Deterministic per-file parser — the ParsingWikipediaLoader +
 * AnnotatingMarkupParser analog (reference
 * storage/ParsingWikipediaLoader.java:33-67,
 * markup/AnnotatingMarkupParser.java) for a source-code corpus.
 *
 * Offset-exactness contract (§2.9 of SURVEY.md): every emitted span
 * satisfies `text.substring(begin, end) == value`; the sha256(content)
 * invariant is computed here once and carried onto every derived row.
 *
 * The parse is a pure function — at scale it runs as `ds.map(parse)`
 * inside one WholeStageCodegen-adjacent stage with zero shuffle; the
 * anchor dictionary is broadcast (the replicated-join pattern of
 * ner-corpus/03_join_by_type_and_convert.pig:22).
 */
object CodeParser {

  /** `#ALIAS [[Target Name]]` on the first line — the `#REDIRECT [[T]]`
    * analog (AnnotatingMarkupParser.java:69,103-109). */
  private val AliasRe = "^#ALIAS \\[\\[([^\\]]*)\\]\\]".r

  /** Header line marker: `## name` (declaration-header analog);
    * detected inline in the line loop (semantics of `^## (.+)$`). */

  /**
   * Parse one file. `dictionary` maps surface form -> entity name; it is
   * the broadcast anchor dictionary. Mentions are dictionary surface
   * forms found at single-space token boundaries (the corpus is
   * space-tokenized), label = canonical target URI.
   */
  def parse(f: CodeFile, dictionary: Map[String, String]): ParsedFile = {
    val text = f.content
    val alias = AliasRe.findFirstMatchIn(text)
      .map(m => TextFunctions.nameToUri(m.group(1), f.lang))

    val headers = Vector.newBuilder[Span]
    val blocks = Vector.newBuilder[Span]
    // blocks = maximal runs of non-empty lines; headers = `## x` lines
    var lineStart = 0
    var blockStart = -1
    def closeBlock(end: Int): Unit =
      if (blockStart >= 0 && end > blockStart) {
        blocks += Span(blockStart, end, "block", text.substring(blockStart, end))
        blockStart = -1
      }
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == '\n') {
        if (i == lineStart) closeBlock(lineStart - 1 max 0)
        else {
          if (blockStart < 0) blockStart = lineStart
          // `^## (.+)$` without the per-line regex + substring: group(1)
          // is everything after the 3-char marker, non-empty
          if (i - lineStart > 3 && text.startsWith("## ", lineStart))
            headers += Span(lineStart + 3, i, "header", text.substring(lineStart + 3, i))
        }
        if (i == n) closeBlock(n)
        lineStart = i + 1
      }
      i += 1
    }

    val mentions =
      if (alias.isDefined) Vector.empty[Span]
      else scanMentions(text, dictionary, f.lang)

    ParsedFile(f.repo, f.path, f.commit, f.lang,
      uri = TextFunctions.nameToUri(s"${f.repo}/${f.path}", f.lang),
      text = text, aliasTarget = alias,
      mentions = mentions, headers = headers.result(), blocks = blocks.result(),
      sha256 = TextFunctions.sha256Hex(text))
  }

  /**
   * Token-boundary dictionary scan. Single left-to-right pass over
   * whitespace-delimited tokens; multi-word surfaces are matched
   * greedily (longest first) like the reference's anchor labels. Skips
   * tokens containing ':' (interlang-link analog,
   * AnnotatingMarkupParser.java:153-155).
   */
  /** Per-dictionary scan metadata, cached by broadcast-instance identity
    * (the dictionary rides to every task as ONE broadcast Map, so the
    * single-slot reference-equality cache hits on every file after the
    * first; without it the max-words scan reran over the whole
    * dictionary once per file). `labelUri` memoizes the per-(surface,
    * lang) canonical URI so URL-encoding runs once per distinct label,
    * not once per mention occurrence. */
  private final class DictMeta(val dict: Map[String, String]) {
    val maxWords: Int =
      if (dict.isEmpty) 1 else dict.keysIterator.map(_.count(_ == ' ') + 1).max
    /** First tokens of multi-word surfaces: a w>1 probe can only match
      * when the current token is one of these. */
    val multiFirst: java.util.HashSet[String] = {
      val s = new java.util.HashSet[String]()
      dict.keysIterator.filter(_.contains(' '))
        .foreach(k => s.add(k.substring(0, k.indexOf(' '))))
      s
    }
    private val uriCache = new java.util.concurrent.ConcurrentHashMap[(String, String), String]()
    def labelUri(surface: String, lang: String): String =
      uriCache.computeIfAbsent((surface, lang),
        _ => TextFunctions.nameToUri(dict(surface), lang))
  }
  @volatile private var cachedMeta: DictMeta = null
  private def metaFor(d: Map[String, String]): DictMeta = {
    val c = cachedMeta
    if (c != null && (c.dict eq d)) c
    else { val m = new DictMeta(d); cachedMeta = m; m }
  }

  def scanMentions(text: String, dictionary: Map[String, String], lang: String): Vector[Span] = {
    if (dictionary.isEmpty) return Vector.empty
    val meta = metaFor(dictionary)
    val maxWords = meta.maxWords
    val out = Vector.newBuilder[Span]
    // token positions
    val tokens = tokenizePos(text)
    var ti = 0
    while (ti < tokens.length) {
      var matched = false
      // multi-word probes only when the current token can start one
      val tryMulti = maxWords > 1 && {
        val t0 = text.substring(tokens(ti)._1, tokens(ti)._2)
        meta.multiFirst.contains(t0)
      }
      var w = if (tryMulti) math.min(maxWords, tokens.length - ti) else 1
      while (w >= 1 && !matched) {
        val begin = tokens(ti)._1
        val end = tokens(ti + w - 1)._2
        val surface = text.substring(begin, end)
        if (!surface.contains(':') && dictionary.contains(surface)) {
          out += Span(begin, end, meta.labelUri(surface, lang), surface)
          ti += w
          matched = true
        }
        w -= 1
      }
      if (!matched) ti += 1
    }
    out.result()
  }

  /** (begin, end) of each whitespace-delimited token. */
  def tokenizePos(text: String): Array[(Int, Int)] =
    tokenizePos(text, 0, text.length)

  /** Same, over `[from, until)` without copying the slice; offsets are
    * absolute into `text`. */
  def tokenizePos(text: String, from: Int, until: Int): Array[(Int, Int)] = {
    val out = Array.newBuilder[(Int, Int)]
    var i = from
    val n = until
    while (i < n) {
      while (i < n && (text.charAt(i) == ' ' || text.charAt(i) == '\n' || text.charAt(i) == '\t')) i += 1
      if (i < n) {
        val b = i
        while (i < n && text.charAt(i) != ' ' && text.charAt(i) != '\n' && text.charAt(i) != '\t') i += 1
        out += ((b, i))
      }
    }
    out.result()
  }
}

/**
 * Sentence/statement segmentation + per-sentence mention emission — the
 * SentencesWithLink analog (evaluation/SentencesWithLink.java:62-131).
 *
 * Within each block (paragraph analog), sentences are runs of
 * `sentenceTokens` tokens (the corpus has no punctuation; the reference
 * used OpenNLP's detector — here segmentation is rule-based and
 * deterministic). The sentence order counter is global and 1-based
 * across blocks (:103); mention offsets are rebased sentence-local
 * (:116-127); only sentences containing at least one mention are
 * emitted (containment semantics only — the reference's `>1` early-exit
 * quirk, §2.10.3, is not replicated).
 */
object Segmenter {
  /**
   * `recoverStraddlers = false` (default) keeps the reference's
   * containment semantics exactly: a mention crossing a window
   * boundary is dropped (the measured ~1.2% recall loss of the bench
   * corpus — PipelineSpec pins the accounting exactly). The opt-in emits one
   * OVERLAP sentence per straddling mention — a fresh `sentenceTokens`
   * window starting at the token the mention begins in — recovering
   * every straddler that fits a window at all. Overlap sentences take
   * the next global order numbers at the point of detection, so
   * downstream per-sentence grouping keys stay unique; only opt-in
   * callers see the renumbering.
   */
  def sentencesWithMentions(p: ParsedFile, sentenceTokens: Int = 10,
      recoverStraddlers: Boolean = false): Vector[Mention] = {
    val out = Vector.newBuilder[Mention]
    var order = 0
    val mentions = p.mentions.sortBy(_.begin)
    // mentions and sentence windows are both begin-ordered within a
    // block; mi advances monotonically so each mention is inspected a
    // bounded number of times (not once per window). The normalized
    // sentence string is only materialized when the window actually
    // contains a mention — most windows don't, and building it anyway
    // was the dominant allocation of the whole mention pipeline.
    p.blocks.foreach { blk =>
      val toks = CodeParser.tokenizePos(p.text, blk.begin, blk.end)
      var mi = 0
      while (mi < mentions.length && mentions(mi).begin < blk.begin) mi += 1
      var s = 0
      while (s < toks.length) {
        val e = math.min(s + sentenceTokens, toks.length)
        val sBegin = toks(s)._1
        val sEnd = toks(e - 1)._2
        order += 1
        while (mi < mentions.length && mentions(mi).begin < sBegin) mi += 1
        if (mi < mentions.length && mentions(mi).begin < sEnd) {
          // normalize \n\t -> ' ' without changing length (reference :112-113)
          val sentence = p.text.substring(sBegin, sEnd).map(c => if (c == '\n' || c == '\t') ' ' else c)
          var j = mi
          while (j < mentions.length && mentions(j).begin < sEnd) {
            val m = mentions(j)
            if (m.begin >= sBegin && m.end <= sEnd)
              out += Mention(p.uri, order, m.label, m.begin - sBegin, m.end - sBegin, sentence, p.sha256)
            else if (recoverStraddlers && m.begin >= sBegin && m.end > sEnd) {
              // straddler: a fresh window anchored at the mention's own
              // first token (find it by scan from s — bounded by the
              // window width, and each mention is visited once)
              var tb = s
              while (tb + 1 < toks.length && toks(tb + 1)._1 <= m.begin) tb += 1
              val we = math.min(tb + sentenceTokens, toks.length)
              val (wBegin, wEnd) = (toks(tb)._1, toks(we - 1)._2)
              if (m.begin >= wBegin && m.end <= wEnd) {
                order += 1
                val ws = p.text.substring(wBegin, wEnd)
                  .map(c => if (c == '\n' || c == '\t') ' ' else c)
                out += Mention(p.uri, order, m.label,
                  m.begin - wBegin, m.end - wBegin, ws, p.sha256)
              }
            }
            j += 1
          }
        }
        s = e
      }
    }
    out.result()
  }
}
