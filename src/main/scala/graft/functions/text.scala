package graft.functions

import java.net.URLEncoder
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/**
 * Pure text functions re-stating the reference UDF contracts
 * (/root/reference/src/main/java/pignlproc/evaluation/). All are
 * deterministic, allocation-light, and usable from typed `map`/`flatMap`
 * or wrapped as Spark UDFs; the Column-expressible ones also exist as
 * Catalyst-native expressions in `graft.SparkEntry` query bodies so the
 * hot paths stay inside WholeStageCodegen.
 */
object TextFunctions {

  /** sha256 hex of a UTF-8 string — the per-row content invariant. */
  def sha256Hex(s: String): String =
    sha256Hex(s.getBytes(StandardCharsets.UTF_8))

  /** sha256 hex of raw bytes — the binary-payload (multimodal) form. */
  def sha256Hex(bytes: Array[Byte]): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(bytes)
    val sb = new StringBuilder(64)
    d.foreach(b => sb.append(f"${b & 0xff}%02x"))
    sb.toString
  }

  /**
   * Canonical URI for an entity name: spaces to '_', URL-encoded, under a
   * language-templated namespace. Contract of
   * AnnotatingMarkupParser.titleToUri (markup/AnnotatingMarkupParser.java:117-125),
   * retargeted to a code-entity namespace.
   */
  def nameToUri(name: String, lang: String): String = {
    val enc = URLEncoder.encode(name.replaceAll(" ", "_"), "UTF-8")
    s"http://graft.dev/$lang/entity/$enc"
  }

  /**
   * NTriples US-ASCII escaping (AbstractNTriplesStorer.java:77-123
   * contract, Clerezza-style): control/meta chars escaped, non-ASCII as
   * backslash-uXXXX / backslash-UXXXXXXXX.
   */
  def ntEscape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      cp match {
        case 0x09 => sb.append("\\t")
        case 0x0a => sb.append("\\n")
        case 0x0d => sb.append("\\r")
        case 0x22 => sb.append("\\\"")
        case 0x5c => sb.append("\\\\")
        case _ if cp >= 0x20 && cp <= 0x7e => sb.append(cp.toChar)
        case _ if cp <= 0xffff => sb.append(f"\\u$cp%04X")
        case _ => sb.append(f"\\U$cp%08X")
      }
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /**
   * NT literal unescaping (UriStringLiteralNTriplesLoader.java:140-202
   * contract): backslash escapes n, r, t, backslash, quote, uXXXX,
   * UXXXXXXXX. Returns None on a
   * malformed escape (caller drops the row, as the reference `continue`s).
   */
  def ntUnescape(s: String): Option[String] = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '\\') { sb.append(c); i += 1 }
      else if (i + 1 >= s.length) return None
      else s.charAt(i + 1) match {
        case 'n' => sb.append('\n'); i += 2
        case 'r' => sb.append('\r'); i += 2
        case 't' => sb.append('\t'); i += 2
        case '\\' => sb.append('\\'); i += 2
        case '"' => sb.append('"'); i += 2
        case 'u' =>
          if (i + 6 > s.length) return None
          try { sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6 }
          catch { case _: NumberFormatException => return None }
        case 'U' =>
          if (i + 10 > s.length) return None
          try { sb.appendAll(Character.toChars(Integer.parseInt(s.substring(i + 2, i + 10), 16))); i += 10 }
          catch { case _: Exception => return None }
        case _ => return None
      }
    }
    Some(sb.toString)
  }

  /**
   * TSV-safe escaping (SafeTsvText.java:43-47): tabs/newlines to space,
   * '"' doubled, whole value wrapped in quotes.
   */
  def tsvSafe(s: String): String =
    "\"" + s.replaceAll("[\\t\\n]", " ").replace("\"", "\"\"") + "\""

  /**
   * Path cycle guard (NoLoopInPath.java:32-67): split the trimmed path on
   * `sep`; true if fewer than 2 elements; false iff the LAST element
   * equals any earlier element (only last-element loops are checked —
   * documented reference behavior, TestEvalFunctions.java:180-182).
   */
  def noLoopInPath(path: String, sep: Char = '/'): Boolean = {
    val parts = path.trim.split(sep)
    if (parts.length < 2) true
    else !parts.view.slice(0, parts.length - 1).contains(parts.last)
  }

  /**
   * Quality gate for a text (CheckAbstract.java:46-84): non-null,
   * non-empty, at least `minWords` single-space-separated tokens
   * (reference splits on a single space — multiple spaces inflate the
   * count; replicated exactly, §2.10.5), and no blacklisted fingerprint.
   */
  val defaultBlacklist: Seq[String] = Seq("A B C D E F G H I J K L M N O P Q R S T U V W X Y Z")
  def checkText(s: String, minWords: Int = 30, blacklist: Seq[String] = defaultBlacklist): Boolean =
    s != null && s.nonEmpty &&
      s.split(" ").length >= minWords &&
      !blacklist.exists(s.contains)

  /**
   * Size-capped bag concatenation (AggregateTextBag.java:53-109): given
   * the bag size, each item gets budget max(sizeLimit/bagSize, 200);
   * items longer than the budget are cut at the first space at or past
   * budget-1, else hard-cut; items are space-joined while total budget
   * remains. Order-sensitive: callers must sort the bag first (§2.10.4).
   */
  def cappedConcat(items: Seq[String], sizeLimit: Int = 100000): String = {
    if (items.isEmpty) return ""
    val perItem = math.max(sizeLimit / items.size, 200)
    val sb = new StringBuilder
    var remaining = sizeLimit
    val it = items.iterator
    while (remaining > 0 && it.hasNext) {
      val raw = it.next()
      if (raw != null) {
        val t = if (raw.length <= perItem) raw else {
          val cut = raw.indexOf(' ', perItem - 1)
          if (cut >= 0) raw.substring(0, cut) else raw.substring(0, perItem)
        }
        if (sb.nonEmpty) { sb.append(' '); remaining -= 1 }
        sb.append(t)
        remaining -= t.length
      }
    }
    sb.toString
  }

  /**
   * Trim-dedup-join (ConcatTextBag.java:44-95): trim items, drop
   * null/empty, dedup keeping first-occurrence order, join with `sep`.
   */
  def concatDistinct(items: Seq[String], sep: String = " "): String = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    items.foreach { i =>
      if (i != null) { val t = i.trim; if (t.nonEmpty) seen += t }
    }
    seen.mkString(sep)
  }

  /**
   * Char-offset variant of the annotated merge — the exact contract of
   * MergeAsOpenNLPAnnotatedText.java:105-162: tokenize the sentence,
   * wrap maximal token runs fully covered by an annotation span
   * [begin, end) with `<START:type> ... <END>`, single-space join, trim.
   * Spans sorted; overlapping spans: first (by begin) wins, later ones
   * starting inside a consumed run are dropped.
   */
  def mergeAnnotatedChars(text: String, spans: Seq[(Int, Int, String)]): String = {
    // whitespace token positions
    val toks = {
      val out = Vector.newBuilder[(Int, Int)]
      var i = 0
      val n = text.length
      while (i < n) {
        while (i < n && text.charAt(i).isWhitespace) i += 1
        if (i < n) {
          val b = i
          while (i < n && !text.charAt(i).isWhitespace) i += 1
          out += ((b, i))
        }
      }
      out.result()
    }
    val sorted = spans.sortBy(s => (s._1, s._2))
    val sb = new StringBuilder
    var si = 0
    var ti = 0
    while (ti < toks.length) {
      val (tb, te) = toks(ti)
      while (si < sorted.length && sorted(si)._2 <= tb) si += 1
      if (sb.nonEmpty) sb.append(' ')
      if (si < sorted.length && tb >= sorted(si)._1 && te <= sorted(si)._2) {
        val (b, e, tpe) = sorted(si)
        if (tpe != null && tpe.nonEmpty) sb.append(s"<START:$tpe> ") else sb.append("<START> ")
        var first = true
        while (ti < toks.length && toks(ti)._1 >= b && toks(ti)._2 <= e) {
          if (!first) sb.append(' ')
          sb.append(text.substring(toks(ti)._1, toks(ti)._2))
          first = false
          ti += 1
        }
        sb.append(" <END>")
        si += 1
      } else {
        sb.append(text.substring(tb, te))
        ti += 1
      }
    }
    sb.toString.trim
  }

  /**
   * OpenNLP-style annotated text merge (MergeAsOpenNLPAnnotatedText.java:105-162):
   * tokenize by single spaces (the corpus is single-space tokenized; the
   * reference used SimpleTokenizer), wrap token runs covered by a span
   * with `<START:type> … <END>`, single-space join, trim. Spans are
   * token-index based [beginTok, endTok) and sorted before merging.
   */
  def mergeAnnotated(text: String, spans: Seq[(Int, Int, String)]): String = {
    val toks = text.split(" ")
    val sorted = spans.sortBy(s => (s._1, s._2))
    val sb = new StringBuilder
    var si = 0
    var i = 0
    while (i < toks.length) {
      val inSpan = si < sorted.length && sorted(si)._1 == i
      if (sb.nonEmpty) sb.append(' ')
      if (inSpan) {
        val (b, e, tpe) = sorted(si)
        if (tpe != null && tpe.nonEmpty) sb.append(s"<START:$tpe> ") else sb.append("<START> ")
        sb.append(toks.slice(b, math.min(e, toks.length)).mkString(" "))
        sb.append(" <END>")
        i = math.max(e, i + 1)
        si += 1
        while (si < sorted.length && sorted(si)._1 < i) si += 1 // skip overlaps
      } else {
        sb.append(toks(i))
        i += 1
      }
    }
    sb.toString.trim
  }
}
