package graft

import graft.core.CodeFile
import graft.fixtures.CorpusGen
import graft.parse.{CodeParser, Segmenter}
import org.scalatest.funsuite.AnyFunSuite

/**
 * Tier-2: parser offset invariants over the deterministic synthetic
 * corpus — the analog of the reference's dump-sample golden tests
 * (TestWikipediaParsing.java): exact spans, substring round-trip,
 * alias/redirect detection, header/block structure.
 */
class CodeParserSpec extends AnyFunSuite {

  private val dict = CorpusGen.dictionary
  private val corpus = CorpusGen.generate(512)

  test("corpus generation is deterministic") {
    val again = CorpusGen.generate(512)
    assert(corpus.map(_.file) == again.map(_.file))
  }

  test("per-index file() agrees with bulk generate() (bench vs test paths)") {
    (0 until 128).foreach { i =>
      assert(CorpusGen.file(i.toLong) == corpus(i).file, s"index $i")
    }
  }

  test("offset invariant: every mention span round-trips through substring") {
    corpus.foreach { g =>
      val p = CodeParser.parse(g.file, dict)
      p.mentions.foreach { m =>
        assert(p.text.substring(m.begin, m.end) == m.value,
          s"${g.file.path}: [${m.begin},${m.end}) != ${m.value}")
      }
      p.headers.foreach { h =>
        assert(p.text.substring(h.begin, h.end) == h.value)
      }
      p.blocks.foreach { b =>
        assert(p.text.substring(b.begin, b.end) == b.value)
      }
    }
  }

  test("parsed mentions match planted goldens exactly (P=R=1.0)") {
    var planted = 0
    var found = 0
    var matched = 0
    corpus.foreach { g =>
      val p = CodeParser.parse(g.file, dict)
      val got = p.mentions.map(m => (m.begin, m.end, m.value)).toSet
      val want = g.mentions.map(m => (m.begin, m.end, m.value)).toSet
      planted += want.size
      found += got.size
      matched += (got intersect want).size
    }
    assert(planted > 100, s"fixture too small: $planted")
    val precision = matched.toDouble / found
    val recall = matched.toDouble / planted
    assert(precision >= 0.95, s"precision $precision")
    assert(recall >= 0.95, s"recall $recall")
  }

  test("alias files are detected with canonical URIs") {
    val aliases = corpus.filter(_.aliasTarget.isDefined)
    assert(aliases.nonEmpty)
    aliases.foreach { g =>
      val p = CodeParser.parse(g.file, dict)
      assert(p.aliasTarget.contains(
        graft.functions.TextFunctions.nameToUri(g.aliasTarget.get, g.file.lang)))
      assert(p.mentions.isEmpty, "alias files emit no mentions")
    }
  }

  test("multi-word surface matched greedily") {
    val f = CodeFile("r", "p", "c", "scala", "use spark engine here")
    val p = CodeParser.parse(f, dict)
    assert(p.mentions.map(_.value) == Vector("spark engine"))
    assert(p.text.substring(p.mentions.head.begin, p.mentions.head.end) == "spark engine")
  }

  test("tokens containing colon are skipped (interlang-link analog)") {
    val p = CodeParser.scanMentions("shuffle x:shuffle shuffle", dict, "scala")
    assert(p.map(_.begin) == Vector(0, 18))
  }

  test("headers and blocks on a hand-written file") {
    val content = "## Top header\nline one\nline two\n\n## Second\nbody"
    val p = CodeParser.parse(CodeFile("r", "p", "c", "md", content), dict)
    assert(p.headers.map(_.value) == Vector("Top header", "Second"))
    assert(p.blocks.size == 2)
    assert(p.blocks(0).value == "## Top header\nline one\nline two")
    assert(p.blocks(1).value == "## Second\nbody")
  }

  test("sha256 invariant carried through parse and segmentation") {
    val g = corpus.find(g => g.mentions.nonEmpty).get
    val p = CodeParser.parse(g.file, dict)
    assert(p.sha256 == graft.functions.TextFunctions.sha256Hex(g.file.content))
    Segmenter.sentencesWithMentions(p).foreach { m =>
      assert(m.sha256 == p.sha256)
    }
  }

  test("segmenter: sentence-local offsets round-trip; global 1-based order") {
    corpus.foreach { g =>
      val p = CodeParser.parse(g.file, dict)
      val ms = Segmenter.sentencesWithMentions(p)
      ms.foreach { m =>
        assert(m.sentenceOrder >= 1)
        // sentence-local offsets land exactly on a dictionary surface
        assert(dict.contains(m.sentence.substring(m.begin, m.end)))
      }
    }
  }

  test("segmenter emits every mention exactly once") {
    corpus.foreach { g =>
      val p = CodeParser.parse(g.file, dict)
      val ms = Segmenter.sentencesWithMentions(p, sentenceTokens = 10)
      // single-token mentions always land inside a 10-token sentence
      // window; only multi-word surfaces can straddle a boundary and be
      // dropped (containment semantics) — bound the emission count
      val multiWord = p.mentions.count(_.value.contains(' '))
      assert(ms.size <= p.mentions.size &&
        ms.size >= p.mentions.size - multiWord,
        s"${g.file.path}: ${ms.size} emitted of ${p.mentions.size} planted ($multiWord multi-word)")
    }
  }
}
