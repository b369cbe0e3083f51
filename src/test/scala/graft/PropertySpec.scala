package graft

import graft.core.CodeFile
import graft.functions.TextFunctions._
import graft.parse.CodeParser
import graft.pipeline.Dedup
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

/**
 * Property-based invariants (SURVEY §5 tier-2): escape round-trips,
 * offset bounds, budget bounds — over arbitrary inputs, not just
 * goldens.
 */
object TextProperties extends Properties("graft.text") {

  // strings incl. non-ASCII, controls, surrogate pairs
  private val anyText: Gen[String] = Gen.listOf(Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '\t', '\n', '"', '\\', 'é', '中', ''),
    1 -> Gen.oneOf("😀", "x").map(_.head))).map(_.mkString)

  property("ntEscape round-trips through ntUnescape") = forAll(anyText) { s =>
    ntUnescape(ntEscape(s)) == Some(s)
  }

  property("ntEscape emits printable US-ASCII only") = forAll(anyText) { s =>
    ntEscape(s).forall(c => c >= 0x20 && c <= 0x7e)
  }

  property("tsvSafe removes tabs/newlines and balances quotes") = forAll(anyText) { s =>
    val t = tsvSafe(s)
    !t.contains('\t') && !t.contains('\n') &&
      t.head == '"' && t.last == '"' &&
      t.count(_ == '"') % 2 == 0
  }

  private val pathElem: Gen[String] = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
  property("noLoopInPath: fresh last element never loops") =
    forAll(Gen.nonEmptyListOf(pathElem)) { parts =>
      val fresh = parts.mkString("") + "X" // provably not among parts
      noLoopInPath((parts :+ fresh).mkString("/"))
    }
  property("noLoopInPath: repeated last element always loops") =
    forAll(Gen.nonEmptyListOf(pathElem)) { parts =>
      !noLoopInPath((parts :+ parts.head).mkString("/"))
    }

  private val words: Gen[List[String]] =
    Gen.listOf(Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString))
  property("cappedConcat stays within budget + one item overhang") =
    forAll(words, Gen.choose(10, 2000)) { (items, limit) =>
      val out = cappedConcat(items, limit)
      val maxItem = if (items.isEmpty) 0 else items.map(_.length).max
      out.length <= limit + math.max(maxItem, 200) + 1
    }
  property("cappedConcat under-budget is plain join") =
    forAll(words) { items =>
      val total = items.map(_.length + 1).sum
      total >= 100000 || cappedConcat(items, 100000) == items.mkString(" ")
    }

  property("concatDistinct has no duplicate tokens and is idempotent") =
    forAll(words) { items =>
      val out = concatDistinct(items)
      val toks = out.split(" ").filter(_.nonEmpty)
      toks.distinct.length == toks.length &&
        concatDistinct(toks.toIndexedSeq) == out
    }

  property("simhash is deterministic; hamming bounded by bit width") =
    forAll(words, words) { (a, b) =>
      val (ta, tb) = (a.mkString(" "), b.mkString(" "))
      Dedup.simhash64(ta) == Dedup.simhash64(ta) &&
        Dedup.hamming(Dedup.simhash64(ta), Dedup.simhash64(tb)) <= Dedup.SimhashBits
    }
}

/** Parser offset invariants over randomized corpus content. */
object ParserProperties extends Properties("graft.parser") {
  private val dict = graft.fixtures.CorpusGen.dictionary
  private val line: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.oneOf("the", "fast", "data", "x:y", "order"),
    3 -> Gen.oneOf(dict.keys.toSeq),
    1 -> Gen.const("## hdr"))).map(_.mkString(" "))
  private val content: Gen[String] =
    Gen.listOf(Gen.frequency(5 -> line, 1 -> Gen.const(""))).map(_.mkString("\n"))

  property("every span substring-roundtrips and lands on a token") =
    forAll(content) { c =>
      val p = CodeParser.parse(CodeFile("r", "p", "c", "scala", c), dict)
      p.mentions.forall(m => p.text.substring(m.begin, m.end) == m.value &&
        dict.contains(m.value)) &&
        p.headers.forall(h => p.text.substring(h.begin, h.end) == h.value) &&
        p.blocks.forall(b => p.text.substring(b.begin, b.end) == b.value)
    }

  property("mentions never overlap and are ordered") = forAll(content) { c =>
    val ms = CodeParser.parse(CodeFile("r", "p", "c", "scala", c), dict).mentions
    ms.sliding(2).forall {
      case Seq(a, b) => a.end <= b.begin
      case _ => true
    }
  }

  property("colon-bearing tokens are never mentions") = forAll(content) { c =>
    CodeParser.parse(CodeFile("r", "p", "c", "scala", c), dict)
      .mentions.forall(!_.value.contains(':'))
  }
}
