package graft

import graft.functions.TextFunctions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Tier-1 golden tests — pure-function contracts ported from the
 * reference's TestEvalFunctions.java semantics (goldens re-stated, not
 * copied code).
 */
class TextFunctionsSpec extends AnyFunSuite {

  test("mergeAnnotated golden (TestEvalFunctions.java:42-54 semantics)") {
    val text = "John Smith works at Smith Consulting ."
    val spans = Seq((0, 2, "person"), (4, 6, "organization"))
    assert(mergeAnnotated(text, spans) ==
      "<START:person> John Smith <END> works at <START:organization> Smith Consulting <END> .")
  }

  test("mergeAnnotated untyped span") {
    assert(mergeAnnotated("a b c", Seq((1, 2, ""))) == "a <START> b <END> c")
  }

  test("mergeAnnotated no spans is identity") {
    assert(mergeAnnotated("x y z", Seq.empty) == "x y z")
  }

  test("noLoopInPath truth table (TestEvalFunctions.java:165-183 semantics)") {
    assert(noLoopInPath("a"))
    assert(noLoopInPath("a/b/c"))
    assert(!noLoopInPath("a/b/a"))       // last element loops
    assert(noLoopInPath("a/a/b"))        // only LAST element is checked
    assert(!noLoopInPath("a/b/b"))
    assert(noLoopInPath(""))
  }

  test("checkText word-count gate (CheckAbstract.java:46-84 semantics)") {
    val good = (1 to 30).map(i => s"w$i").mkString(" ")
    assert(checkText(good))
    assert(!checkText("too short"))
    assert(!checkText(null))
    assert(!checkText(""))
    // single-space split quirk is replicated: double spaces inflate count
    val padded = (1 to 16).map(i => s"w$i").mkString("  ")
    assert(checkText(padded)) // 16 words, 31 single-space tokens
    assert(!checkText(good + " A B C D E F G H I J K L M N O P Q R S T U V W X Y Z"))
  }

  test("tsvSafe (SafeTsvText.java:43-47 semantics)") {
    assert(tsvSafe("a\tb\nc") == "\"a b c\"")
    assert(tsvSafe("say \"hi\"") == "\"say \"\"hi\"\"\"")
  }

  test("cappedConcat joins under cap") {
    assert(cappedConcat(Seq("aa", "bb", "cc"), 1000) == "aa bb cc")
  }

  test("cappedConcat respects total budget") {
    val out = cappedConcat(Seq.fill(10)("x" * 300), 1000)
    assert(out.length <= 1000 + 300) // one item may straddle
    assert(out.startsWith("x"))
  }

  test("cappedConcat cuts long item at first space past per-item budget") {
    // bagSize=1 -> perItem = max(10/1, 200) = 200; item < 200 passes whole
    assert(cappedConcat(Seq("hello world"), 10) == "hello world")
    // force cut: item longer than perItem=200 with a space after 200
    val item = ("a" * 199) + " tail more"
    val out = cappedConcat(Seq(item), 100)
    assert(out == "a" * 199)  // cut at first space at/after perItem-1
  }

  test("concatDistinct trims, drops empties, dedups keeping first order") {
    assert(concatDistinct(Seq(" b ", "a", "", null, "b", "a")) == "b a")
    assert(concatDistinct(Seq("x", "y"), ",") == "x,y")
  }

  test("ntEscape goldens incl. accented char (TestUriUriNTriplesStorer semantics)") {
    assert(ntEscape("abc") == "abc")
    assert(ntEscape("café") == "caf\\u00E9")
    assert(ntEscape("a\tb\nc\"d\\e") == "a\\tb\\nc\\\"d\\\\e")
    assert(ntEscape(new String(Character.toChars(0x1f600))) == "\\U0001F600")
  }

  test("ntUnescape inverts ntEscape") {
    val samples = Seq("plain", "café", "tab\there", "q\"q", "back\\slash",
      new String(Character.toChars(0x1f600)) + " emoji")
    samples.foreach { s =>
      assert(ntUnescape(ntEscape(s)) == Some(s), s"round-trip failed for $s")
    }
    assert(ntUnescape("bad\\x") == None)
    assert(ntUnescape("bad\\u12") == None)
  }

  test("sha256 invariant is stable") {
    assert(sha256Hex("abc") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("nameToUri canonicalization (titleToUri semantics: space->underscore, URL-encode)") {
    assert(nameToUri("Hash Join", "scala") == "http://graft.dev/scala/entity/Hash_Join")
    assert(nameToUri("Akhénaton", "fr") == "http://graft.dev/fr/entity/Akh%C3%A9naton")
  }
}
