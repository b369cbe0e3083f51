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

  // pigeonhole guarantee of the Hamming-ball banding: fewer flipped
  // bits than bands ==> at least one 15-bit chunk is untouched, so the
  // banded bucket join ALWAYS finds such pairs (JVM-level restatement
  // of Dedup.simhashBandKeys' contract)
  private val bitFlips: Gen[List[Int]] =
    Gen.choose(0, 3).flatMap(n => Gen.listOfN(n, Gen.choose(0, 59)))
  property("simhash band match guaranteed when hamming < bands (pigeonhole)") =
    forAll(words, bitFlips) { (a, flips) =>
      val sa = Dedup.simhash64(a.mkString(" "))
      val sb = flips.foldLeft(sa)((h, b) => h ^ (1L << b))
      val bandMatch = (0 until 4).exists { k =>
        ((sa >>> (k * 15)) & 0x7fff) == ((sb >>> (k * 15)) & 0x7fff)
      }
      Dedup.hamming(sa, sb) >= 4 || bandMatch
    }

  // the bounded CappedConcat buffer is arrival-order and merge-split
  // invariant: any shuffle of the rows through any reduce/merge split
  // finishes to the same string as the unbounded sorted reference
  private val keyedItems: Gen[List[(Long, String)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 1000000L),
      Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)))
  property("CappedConcat(bounded buffer) == unbounded reference, any order/split") =
    forAll(keyedItems, Gen.choose(0, 100), Gen.choose(200, 3000)) { (items0, seed, limit) =>
      // unique keys (ties are nondeterministic by documented contract)
      val items = items0.zipWithIndex.map { case ((k, v), i) => (k * 2048 + i, v) }
      val agg = new graft.functions.Aggregators.CappedConcat(limit)
      val shuffled = new scala.util.Random(seed).shuffle(items)
      val cut = if (shuffled.isEmpty) 0 else seed % (shuffled.length + 1)
      val (h1, h2) = shuffled.splitAt(cut)
      val merged = agg.merge(
        h1.foldLeft(agg.zero)(agg.reduce),
        h2.foldLeft(agg.zero)(agg.reduce))
      agg.finish(merged) ==
        graft.functions.TextFunctions.cappedConcat(
          items.sortBy(_._1).map(_._2), limit)
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

/** Exactly-once split ownership of the raw-dump DSv2 reader, over
  * random corpora and ARBITRARY split sizes (every boundary position:
  * mid-marker, mid-title, mid-body, between pages) — driven through
  * the reader class directly, no Spark job per trial. */
object DumpReaderProperties extends Properties("graft.dumpreader") {
  import graft.io.WikiPageSource

  private val page: Gen[(String, String)] = for {
    t <- Gen.chooseNum(0, 999).map(n => s"Title $n")
    w <- Gen.chooseNum(0, 25)
    b <- Gen.listOfN(w, Gen.chooseNum(0, 99).map(n => s"tok$n"))
  } yield (t, b.mkString(" "))

  private def writeDump(pages: Seq[(String, String)]): java.io.File = {
    val sb = new StringBuilder("<dump>")
    pages.foreach { case (t, c) =>
      sb.append("<page><title>").append(t)
        .append("</title><text xml:space=\"preserve\">").append(c)
        .append("</text></page>")
    }
    sb.append("</dump>")
    val f = java.io.File.createTempFile("graft-prop-dump", ".xml")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath, sb.toString)
    f
  }

  property("byte-range partition reads every page exactly once, any split size") =
    forAll(Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, page)),
        Gen.chooseNum(7L, 2048L)) { (pages, split) =>
      val f = writeDump(pages)
      try {
        val len = f.length()
        val ranges = (0L until math.max(1L, (len + split - 1) / split))
          .map(i => (i * split, math.min((i + 1) * split, len)))
        val got = ranges.flatMap { case (s, e) =>
          WikiPageSource.readRange(f.getPath, s, e)
        }
        got.sorted == pages.sorted
      } finally { f.delete(); () }
    }
}
