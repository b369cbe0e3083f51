package graft.io

import graft.functions.TextFunctions

/**
 * NTriples line codec — the S4/S5 loaders and K2-K4 storers of the
 * reference re-stated as pure functions used inside typed
 * `flatMap`/`map` over `spark.read.text` / `df.write.text`.
 *
 * Loader contracts:
 *  - uri-uri (UriUriNTriplesLoader.java:35-66): split on single spaces,
 *    require exactly 4 tokens ending in "."; optional predicate filter
 *    (pushed ahead of everything downstream — in Spark this is a plain
 *    `filter` Catalyst places before any shuffle); optional namespace
 *    strip (AbstractNTriplesLoader.java:52-63: strip only when the value
 *    starts with the namespace).
 *  - uri-literal (UriStringLiteralNTriplesLoader.java:78-124): split in
 *    3, require " ." suffix, full NT literal unescape + language tag.
 * Malformed lines are dropped, never errored (reference `continue`s);
 * the (null,null) end-of-split sentinel quirk (§2.10.1) is NOT
 * replicated — fixed by design.
 */
object NTriples {

  final case class UriUri(subject: String, obj: String)
  final case class UriLit(subject: String, obj: String, lang: String)

  private def stripNs(v: String, ns: String): String =
    if (ns.nonEmpty && v.startsWith(ns)) v.substring(ns.length) else v

  private def stripAngle(t: String): Option[String] =
    if (t.length >= 2 && t.charAt(0) == '<' && t.charAt(t.length - 1) == '>')
      Some(t.substring(1, t.length - 1))
    else None

  /** Parse one `<s> <p> <o> .` line; None when malformed or filtered. */
  def parseUriUri(line: String, predicateFilter: String = "",
      subjNs: String = "", objNs: String = ""): Option[UriUri] = {
    val parts = line.split(" ")
    if (parts.length != 4 || parts(3) != ".") return None
    for {
      s <- stripAngle(parts(0))
      p <- stripAngle(parts(1))
      o <- stripAngle(parts(2))
      if predicateFilter.isEmpty || p == predicateFilter
    } yield UriUri(stripNs(s, subjNs), stripNs(o, objNs))
  }

  /** Parse one `<s> <p> "literal"@lang .` line. */
  def parseUriLiteral(line: String, predicateFilter: String = "",
      subjNs: String = ""): Option[UriLit] = {
    val parts = line.split(" ", 3)
    if (parts.length != 3 || !parts(2).endsWith(" .")) return None
    for {
      s <- stripAngle(parts(0))
      p <- stripAngle(parts(1))
      if predicateFilter.isEmpty || p == predicateFilter
      body = parts(2).substring(0, parts(2).length - 2)
      lit <- parseLiteralBody(body)
      unescaped <- TextFunctions.ntUnescape(lit._1)
    } yield UriLit(stripNs(s, subjNs), unescaped, lit._2)
  }

  /** `"escaped"@lang` or `"escaped"` or `"escaped"^^<type>` → (escaped, lang). */
  private def parseLiteralBody(body: String): Option[(String, String)] = {
    if (!body.startsWith("\"")) return None
    // find the closing unescaped quote
    var i = 1
    var close = -1
    while (i < body.length && close < 0) {
      if (body.charAt(i) == '"' && body.charAt(i - 1) != '\\') close = i
      i += 1
    }
    if (close < 0) return None
    val lit = body.substring(1, close)
    val rest = body.substring(close + 1)
    val lang =
      if (rest.startsWith("@") || rest.startsWith("-")) rest.substring(1)
      else ""
    Some((lit, lang))
  }

  /**
   * Format `(s, o)` as `<ns_s+s> <pred> <ns_o+o> .`
   * (UriUriNTriplesStorer.java:24-61); rows with any null field are
   * skipped by the caller (`na.drop`), matching :40-50.
   */
  def formatUriUri(s: String, o: String, pred: String,
      subjNs: String = "", objNs: String = ""): String =
    s"<${TextFunctions.ntEscape(subjNs + s)}> <${TextFunctions.ntEscape(pred)}> <${TextFunctions.ntEscape(objNs + o)}> ."

  /**
   * Format `(s, lit)` as `<ns_s+s> <pred> "escaped"@lang .`
   * (UriStringLiteralNTriplesStorer.java:24-61).
   */
  def formatUriLiteral(s: String, lit: String, lang: String, pred: String,
      subjNs: String = ""): String = {
    val tag = if (lang == null || lang.isEmpty) "" else s"@$lang"
    s"<${TextFunctions.ntEscape(subjNs + s)}> <${TextFunctions.ntEscape(pred)}> " +
      s""""${TextFunctions.ntEscape(lit)}"$tag ."""
  }
}
