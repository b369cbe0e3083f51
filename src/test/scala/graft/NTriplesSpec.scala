package graft

import graft.io.NTriples
import org.scalatest.funsuite.AnyFunSuite

/**
 * NTriples codec goldens — loader/storer contracts of the reference
 * (TestUriUriNTriplesLoader / TestUriStringLiteralNTriplesLoader /
 * TestUriUriNTriplesStorer semantics).
 */
class NTriplesSpec extends AnyFunSuite {

  test("parseUriUri basic + predicate filter + namespace strip") {
    val line = "<http://db.org/resource/A> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://db.org/ontology/City> ."
    val got = NTriples.parseUriUri(line)
    assert(got == Some(NTriples.UriUri("http://db.org/resource/A", "http://db.org/ontology/City")))
    // predicate filter keeps matching
    assert(NTriples.parseUriUri(line,
      predicateFilter = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type").isDefined)
    // predicate filter drops non-matching
    assert(NTriples.parseUriUri(line, predicateFilter = "http://other").isEmpty)
    // namespace strip only when prefix matches (AbstractNTriplesLoader.java:52-63)
    val stripped = NTriples.parseUriUri(line,
      subjNs = "http://db.org/resource/", objNs = "http://db.org/ontology/")
    assert(stripped == Some(NTriples.UriUri("A", "City")))
    val notStripped = NTriples.parseUriUri(line, subjNs = "http://nope/")
    assert(notStripped.get.subject == "http://db.org/resource/A")
  }

  test("parseUriUri rejects malformed lines (reference drops, never errors)") {
    assert(NTriples.parseUriUri("").isEmpty)
    assert(NTriples.parseUriUri("<a> <b> .").isEmpty)          // 3 tokens
    assert(NTriples.parseUriUri("<a> <b> <c> <d> .").isEmpty)  // 5 tokens
    assert(NTriples.parseUriUri("<a> <b> \"lit\" .").isEmpty)  // literal object
    assert(NTriples.parseUriUri("# comment line").isEmpty)
  }

  test("parseUriLiteral with escaped quotes and @en tag") {
    val line = """<http://db.org/resource/A> <http://db.org/ontology/abstract> "He said \"hi\" loudly"@en ."""
    val got = NTriples.parseUriLiteral(line)
    assert(got == Some(NTriples.UriLit("http://db.org/resource/A", "He said \"hi\" loudly", "en")))
  }

  test("parseUriLiteral unescapes unicode and drops malformed") {
    val line = """<http://a> <http://p> "café" ."""
    assert(NTriples.parseUriLiteral(line).get.obj == "café")
    assert(NTriples.parseUriLiteral("""<http://a> <http://p> "bad\q" .""").isEmpty)
    assert(NTriples.parseUriLiteral("""<http://a> <http://p> noquote .""").isEmpty)
  }

  test("formatUriUri byte-exact golden with namespaces") {
    assert(NTriples.formatUriUri("A", "B", "http://p",
      subjNs = "http://s/", objNs = "http://o/") ==
      "<http://s/A> <http://p> <http://o/B> .")
  }

  test("formatUriLiteral escapes é and carries @en (storer goldens)") {
    assert(NTriples.formatUriLiteral("A", "café", "en", "http://p", "http://s/") ==
      "<http://s/A> <http://p> \"caf\\u00E9\"@en .")
    assert(NTriples.formatUriLiteral("A", "x", "", "http://p") ==
      """<A> <http://p> "x" .""")
  }

  test("format/parse round-trip") {
    val line = NTriples.formatUriLiteral("http://s/A", "multi\nline \"q\"", "fr", "http://p")
    val back = NTriples.parseUriLiteral(line)
    assert(back == Some(NTriples.UriLit("http://s/A", "multi\nline \"q\"", "fr")))
  }
}
