package graft

import graft.pipeline.Tokenizer
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Distributed BPE trainer/tokenizer vs an independent in-memory
  * reference implementation of the Sennrich 2016 algorithm. */
class TokenizerSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // ---- naive reference BPE (driver-side, list-of-symbols form) ----

  private def refVocab(texts: Seq[String]): Map[Vector[String], Long] =
    texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        (w.split("").toVector :+ Tokenizer.EndOfWord) -> ws.size.toLong
      }

  private def refPairCounts(v: Map[Vector[String], Long]): Map[(String, String), Long] =
    v.toSeq.flatMap { case (syms, f) =>
      syms.sliding(2).collect { case Vector(a, b) => ((a, b), f) }
    }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }

  /** merge all non-overlapping occurrences left-to-right. */
  private def refMergeWord(syms: Vector[String], l: String, r: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private def refLearn(texts: Seq[String], k: Int): Seq[(Int, String, String, Long)] = {
    var v = refVocab(texts)
    (1 to k).flatMap { rank =>
      val pc = refPairCounts(v)
      if (pc.isEmpty) None
      else {
        val ((l, r), c) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        v = v.map { case (syms, f) => refMergeWord(syms, l, r) -> f }
          .groupBy(_._1).map { case (s, xs) => s -> xs.values.sum }
        Some((rank, l, r, c))
      }
    }
  }

  private def refTokenize(text: String, merges: Seq[(String, String)]): Seq[String] =
    text.split(" ").filter(_.nonEmpty).flatMap { w =>
      merges.foldLeft(w.split("").toVector :+ Tokenizer.EndOfWord) {
        case (syms, (l, r)) => refMergeWord(syms, l, r)
      }
    }.toSeq

  private val corpus = Seq(
    "the theme of the theater",
    "a banana and an ananas",
    "low lower lowest newer newest",
    "she sells sea shells by the sea shore",
    "aaaa aaa aa a")

  test("learnMerges matches the reference algorithm exactly (k=12)") {
    val d = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Tokenizer.learnMerges(d, k = 12)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val want = refLearn(corpus, 12)
    assert(got == want)
  }

  test("merge handles consecutive runs like the reference: a a a a -> aa aa") {
    val d = Seq((1L, "aaaa aaa")).toDF("doc_id", "text")
    // first learned merge on this corpus must be (a, a)
    val m = Tokenizer.learnMerges(d, k = 1)
      .as[(Int, String, String, Long)].collect().head
    assert((m._2, m._3) == ("a", "a"))
    // count: "aaaa" -> pairs (a,a)x3 + (a,</w>) ; "aaa" -> (a,a)x2 ; total 5
    assert(m._4 == 5L)
    val toks = d.select(Tokenizer.bpeTokens(col("text"), Seq(("a", "a"))))
      .as[String].collect().head
    assert(toks == "aa aa </w> aa a </w>")
  }

  test("bpeTokens equals the reference tokenizer under learned merges") {
    val d = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Tokenizer.learnMerges(d, k = 8)
      .as[(Int, String, String, Long)].collect().toSeq
      .sortBy(_._1).map(m => (m._2, m._3))
    val got = d.select(col("doc_id"), Tokenizer.bpeTokens(col("text"), merges).as("t"))
      .as[(Long, String)].collect().toMap
    corpus.zipWithIndex.foreach { case (text, i) =>
      assert(got(i.toLong).split(" ").filter(_.nonEmpty).toSeq
        === refTokenize(text, merges), s"doc $i")
    }
  }

  test("learned merges are partitioning-independent") {
    val d = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val a = Tokenizer.learnMerges(d, k = 6)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val b = Tokenizer.learnMerges(d.repartition(13), k = 6)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(a == b)
  }

  /** driver-side mirror of the batched greedy: candidates = top
    * want*4 by (-cnt, l, r); greedy symbol-disjoint prefix, ≤ want
    * picks; all picks applied before the next count. */
  private def refLearnBatched(texts: Seq[String], k: Int, batch: Int)
      : Seq[(Int, String, String, Long)] = {
    var v = refVocab(texts)
    val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var exhausted = false
    while (out.size < k && !exhausted) {
      val want = math.min(batch, k - out.size)
      val top = refPairCounts(v).toSeq
        .sortBy { case ((a, b), n) => (-n, a, b) }.take(want * 4)
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set[String]()
        val picked = top.iterator.flatMap { case ((l, r), c) =>
          val syms = Seq(l, r, l + r)
          if (syms.exists(used.contains)) None
          else { used ++= syms; Some((l, r, c)) }
        }.take(want).toSeq
        picked.foreach { case (l, r, c) => out += ((out.size + 1, l, r, c)) }
        picked.foreach { case (l, r, _) =>
          v = v.map { case (syms, f) => refMergeWord(syms, l, r) -> f }
            .groupBy(_._1).map { case (s, xs) => s -> xs.values.sum }
        }
        if (picked.size < want && top.size < want * 4) exhausted = true
      }
    }
    out.toSeq
  }

  test("batch > 1 matches the batched reference and stays deterministic") {
    val d = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val b1 = Tokenizer.learnMerges(d, k = 8, batch = 4)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    val b2 = Tokenizer.learnMerges(d.repartition(7), k = 8, batch = 4)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(b1 == b2)
    assert(b1 == refLearnBatched(corpus, 8, 4))
  }

  test("early exhaustion: more merges requested than pairs exist") {
    val d = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // "ab" -> a b </w>: merges (a,b)? then (ab,</w>) then nothing
    val got = Tokenizer.learnMerges(d, k = 10)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got.size < 10)
    assert(got.map(m => (m._2, m._3)) == Seq(("a", "b"), ("ab", Tokenizer.EndOfWord)))
  }

  test("minFreq stops below-threshold merges") {
    val d = Seq((1L, "xy xy xy z")).toDF("doc_id", "text")
    val got = Tokenizer.learnMerges(d, k = 10, minFreq = 3L)
      .as[(Int, String, String, Long)].collect().toSeq
    assert(got.forall(_._4 >= 3L))
    assert(got.map(m => (m._2, m._3)).take(2) == Seq(("x", "y"), ("xy", Tokenizer.EndOfWord)))
  }

  test("empty and whitespace-only texts contribute nothing") {
    val d = Seq((1L, ""), (2L, "   "), (3L, "hi")).toDF("doc_id", "text")
    val hist = Tokenizer.bpeHistogram(d, Seq(("h", "i")))
      .as[(String, Long)].collect().toMap
    assert(hist == Map("hi" -> 1L, Tokenizer.EndOfWord -> 1L))
  }

  test("a literal </w> in content cannot forge the marker") {
    val d = Seq((1L, "x</w>x y")).toDF("doc_id", "text")
    val toks = d.select(Tokenizer.bpeTokens(col("text"), Nil)).as[String].collect().head
    // char-split breaks the literal into < / w > chars
    assert(toks == "x < / w > x </w> y </w>")
  }

  // ---- byte-level (GPT-2 bytes_to_unicode) variant ----

  private def refByteSyms(w: String): Vector[String] =
    w.getBytes("UTF-8").toVector.map(b => Tokenizer.ByteToChar(b & 0xff))

  private def refVocabBytes(texts: Seq[String]): Map[Vector[String], Long] =
    texts.flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        (refByteSyms(w) :+ Tokenizer.EndOfWord) -> ws.size.toLong
      }

  private def refLearnBytes(texts: Seq[String], k: Int)
      : Seq[(Int, String, String, Long)] = {
    var v = refVocabBytes(texts)
    (1 to k).flatMap { rank =>
      val pc = refPairCounts(v)
      if (pc.isEmpty) None
      else {
        val ((l, r), c) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        v = v.map { case (syms, f) => refMergeWord(syms, l, r) -> f }
          .groupBy(_._1).map { case (s, xs) => s -> xs.values.sum }
        Some((rank, l, r, c))
      }
    }
  }

  test("byte alphabet is the GPT-2 bytes_to_unicode table") {
    val a = Tokenizer.ByteToChar
    assert(a.length == 256 && a.distinct.length == 256)
    assert(a.forall(s => s.length == 1 && s != " ")) // single, non-space
    // printable bytes map to themselves; the 68 others shift to U+0100..
    assert(a('A'.toInt) == "A" && a('!'.toInt) == "!" && a(0xFF) == "ÿ")
    assert(a(0) == "Ā" && a(32) == "Ġ" && a(0xAD).head >= 0x100)
    assert(a.count(_.head >= 0x100) == 68)
  }

  test("byte-level learnMerges matches the byte reference on multi-byte UTF-8") {
    // é/ü/emoji force multi-byte sequences; the repeated 'é' words make
    // an UTF-8 continuation-byte pair the top merge — invisible to the
    // char-level trainer
    val texts = Seq(
      "héllo héllo héllo naïve café café",
      "日本語 テスト 日本語",
      "smile 🙂 smile 🙂 🙂",
      "plain ascii words here")
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = Tokenizer.learnMerges(d, k = 8, byteLevel = true)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == refLearnBytes(texts, 8))
    // and differs from the char-level table (multi-byte chars split)
    val charLevel = Tokenizer.learnMerges(d, k = 8)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got != charLevel)
  }

  test("byte-level: no <unk> — any input decomposes to alphabet symbols and round-trips") {
    val wild = "héllo 🙂 日本語 x</w>x control ¡ÿ mixed"
    val d = Seq((1L, wild)).toDF("doc_id", "text")
    val toks = d.select(Tokenizer.bpeTokens(col("text"), Nil, byteLevel = true))
      .as[String].collect().head.split(" ").toSeq
    val alphabet = Tokenizer.ByteToChar.toSet + Tokenizer.EndOfWord
    assert(toks.nonEmpty && toks.forall(alphabet.contains))
    // round trip: mapping symbols back to bytes reconstructs the words
    val charToByte = Tokenizer.ByteToChar.zipWithIndex
      .map { case (c, b) => c -> b.toByte }.toMap
    val words = toks.foldLeft(Vector(Vector.empty[Byte])) { (acc, t) =>
      if (t == Tokenizer.EndOfWord) acc :+ Vector.empty
      else acc.init :+ (acc.last :+ charToByte(t))
    }.filter(_.nonEmpty).map(bs => new String(bs.toArray, "UTF-8"))
    assert(words == wild.split(" ").filter(_.nonEmpty).toVector)
    // histogram path composes with a learned byte merge table
    val merges = Tokenizer.learnMerges(d, k = 2, byteLevel = true)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
      .map(m => (m._2, m._3))
    val hist = Tokenizer.bpeHistogram(d, merges, byteLevel = true)
      .as[(String, Long)].collect()
    assert(hist.map(_._2).sum > 0)
  }
}
