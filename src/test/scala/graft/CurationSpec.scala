package graft

import graft.pipeline.Curation
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-curation operators: deterministic split/sample, redaction,
  * boilerplate ratio, contamination check. */
class CurationSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text").withColumn("lang", lit("en"))

  test("split is deterministic, total, and roughly 80/10/10") {
    val d = spark.range(10000).toDF("doc_id")
      .withColumn("text", lit("x")).withColumn("lang", lit("en"))
    val s1 = Curation.splitAssign(d).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val s2 = Curation.splitAssign(d).groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(s1 == s2)
    assert(s1.values.sum == 10000L)
    assert(s1("train") > 7700 && s1("train") < 8300)
    assert(s1("val") > 700 && s1("val") < 1300)
    assert(s1("test") > 700 && s1("test") < 1300)
  }

  test("split assignment depends only on the key, not on partitioning") {
    val d = spark.range(1000).toDF("doc_id")
      .withColumn("text", lit("x")).withColumn("lang", lit("en"))
    val a = Curation.splitAssign(d).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = Curation.splitAssign(d.repartition(7)).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }

  test("redact counts word-boundary matches and hashes the scrubbed text") {
    val d = docs((1L, "the key of the hash is keyhash customer key"))
    val row = Curation.redact(d).as[(Long, Long, String)].collect().head
    // "key", "hash", "customer", "key" match; "keyhash" does not (word boundary)
    assert(row._2 == 4L)
    val expected = "the [REDACTED] of the [REDACTED] is keyhash [REDACTED] [REDACTED]"
    assert(row._3 == java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString)
  }

  test("boilerplate ratio counts corpus-wide duplicate chunks") {
    // chunks of 2 tokens; "a b" appears in docs 1 and 2, "c d" only in 1,
    // "e f" only in 2
    val d = docs((1L, "a b c d"), (2L, "a b e f"), (3L, "g h"))
    val got = Curation.boilerplate(d, chunkTokens = 2)
      .select("doc_id", "n_chunks", "n_dup_chunks")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (2L, 2L, 1L), (3L, 1L, 0L)))
  }

  test("contamination finds shared shingles against a broadcast benchmark") {
    val bench = docs((1L, "alpha beta gamma delta"))
    val corpus = docs(
      (10L, "alpha beta gamma zeta"), // shares shingle "alpha beta gamma"
      (11L, "zeta eta theta iota"))   // shares nothing
    val got = Curation.contamination(corpus, bench, shingleWords = 3)
      .as[(Long, Long)].collect().toSet
    assert(got == Set((10L, 1L)))
  }

  test("shard packing equals the naive global cumsum, independent of partitioning") {
    val rnd = new scala.util.Random(5)
    val d = (0L until 300L).map(i => (i, Seq.fill(1 + rnd.nextInt(40))("w").mkString(" ")))
      .toDF("doc_id", "text")
    // naive driver truth
    val lens = d.select("doc_id", "text").as[(Long, String)].collect()
      .sortBy(_._1).map { case (id, t) => (id, t.split(" ").length.toLong) }
    var cum = 0L
    val want = lens.map { case (id, n) => cum += n; (id, (cum - n) / 64) }.toMap
    val got = Curation.packShards(d, budgetTokens = 64L)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    assert(got == want)
    val got7 = Curation.packShards(d.repartition(7), budgetTokens = 64L)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    assert(got7 == want)
  }

  test("mixture sample: proportions track target weights; binding source fully kept") {
    // 3 sources, 3000/3000/1000 docs, target mixture 0.2/0.3/0.5:
    // feasible N = min(3000/0.2, 3000/0.3, 1000/0.5) = 2000 — source c
    // is binding (rate exactly 1.0, every doc kept), a keeps 2000*0.2/3000
    // ≈ 13.3%, b keeps 20%
    val d = spark.range(7000).toDF("doc_id")
      .withColumn("source",
        when(col("doc_id") < 3000, "a").when(col("doc_id") < 6000, "b")
          .otherwise("c"))
      .withColumn("lang", lit("en"))
    val w = Map("a" -> 0.2, "b" -> 0.3, "c" -> 0.5, "ghost" -> 0.9)
    val kept = Curation.mixtureSample(d, w)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("c") == 1000L, s"binding source must keep every doc: $kept")
    // hash thresholds land within ~3% of the target rates
    assert(math.abs(kept("a") - 400L) <= 60, s"a: ${kept("a")} vs ~400")
    assert(math.abs(kept("b") - 600L) <= 60, s"b: ${kept("b")} vs ~600")
    // deterministic: a second run is identical, and repartitioning
    // does not change membership
    val again = Curation.mixtureSample(d.repartition(13), w)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again == kept)
    // unweighted corpus sources are dropped; all-absent weights refuse
    val d2 = d.withColumn("source", lit("unweighted"))
    intercept[IllegalArgumentException] { Curation.mixtureSample(d2, w) }
  }

  test("mixture UPsampling: integer replicas + seeded fractional extras, partitioning-independent") {
    // 3 sources 3000/3000/1000; target N = 5000 with weights
    // 0.2/0.3/0.5 gives rates 1000/3000=1/3 (downsample),
    // 1500/3000=0.5 (downsample), 2500/1000=2.5 (UPSAMPLE: two full
    // replicas + a half-probability third)
    val d = spark.range(7000).toDF("doc_id")
      .withColumn("source",
        when(col("doc_id") < 3000, "a").when(col("doc_id") < 6000, "b")
          .otherwise("c"))
    val w = Map("a" -> 0.2, "b" -> 0.3, "c" -> 0.5)
    val out = Curation.mixtureSample(d, w, targetN = Some(5000L))
    val byRep = out.groupBy("source", "rep").count()
      .as[(String, Int, Long)].collect()
      .map { case (s0, r0, n0) => (s0, r0) -> n0 }.toMap
    // upsampled source: replicas 0 and 1 carry EVERY doc, replica 2 is
    // the seeded ~50% remainder; downsampled sources have rep 0 only
    assert(byRep(("c", 0)) == 1000L && byRep(("c", 1)) == 1000L)
    assert(math.abs(byRep(("c", 2)) - 500L) <= 60, s"c rep2: ${byRep(("c", 2))}")
    assert(!byRep.contains(("a", 1)) && !byRep.contains(("b", 1)))
    // proportions track N*w
    val bySrc = out.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(math.abs(bySrc("a") - 1000L) <= 60, s"a: ${bySrc("a")}")
    assert(math.abs(bySrc("b") - 1500L) <= 60, s"b: ${bySrc("b")}")
    assert(math.abs(bySrc("c") - 2500L) <= 60, s"c: ${bySrc("c")}")
    // the fractional replica reuses the SAME per-doc draw as the
    // downsample path: a doc gets the extra copy iff its seed hash
    // falls below the fractional threshold — so c's rep-2 membership
    // equals the 50%-downsample membership of source c
    val rep2Ids = out.filter(col("source") === "c" && col("rep") === 2)
      .select("doc_id").as[Long].collect().toSet
    val halfC = Curation.mixtureSample(
        d.filter(col("source") === "c"), Map("c" -> 1.0),
        targetN = Some(500L))
      .select("doc_id").as[Long].collect().toSet
    assert(rep2Ids == halfC, "fractional replica draw != the seeded threshold draw")
    // partitioning-independence and determinism (replica set identical)
    val again = Curation.mixtureSample(d.repartition(17), w, targetN = Some(5000L))
      .select("source", "doc_id", "rep").as[(String, Long, Int)].collect().toSet
    assert(again == out.select("source", "doc_id", "rep")
      .as[(String, Long, Int)].collect().toSet)
    // downsample-only default is unchanged by the extension: no rep
    // column in the None path
    assert(!Curation.mixtureSample(d, w).columns.contains("rep"))
  }

  test("temperature mixture: alpha flattens proportions, key column honored, guards") {
    // heavily skewed 2-key corpus: 6400 "big" vs 100 "small"
    val d = spark.range(6500).toDF("doc_id")
      .withColumn("lang", when(col("doc_id") < 6400, "big").otherwise("small"))
      .withColumn("source", lit("s"))
    def share(alpha: Double): Double = {
      val out = Curation.temperatureMixture(d, "lang", alpha, total = 2000L)
      val m = out.groupBy("lang").count().as[(String, Long)].collect().toMap
      m("small").toDouble / (m("small") + m("big"))
    }
    // natural share of "small" is 100/6500 ≈ 1.5%; alpha = 1 keeps it,
    // alpha = 0.5 lifts toward sqrt proportions 10/(80+10) ≈ 11%
    val s1 = share(1.0)
    val s05 = share(0.5)
    assert(math.abs(s1 - 100.0 / 6500) < 0.01, s"alpha=1 share $s1")
    assert(math.abs(s05 - 10.0 / 90) < 0.02, s"alpha=0.5 share $s05")
    assert(s05 > 2 * s1)
    // total size tracks the requested N for both temperatures
    val n05 = Curation.temperatureMixture(d, "lang", 0.5, 2000L).count()
    assert(math.abs(n05 - 2000L) <= 100, s"n=$n05")
    // keyed on a non-source column: the source column passes through
    val cols = Curation.temperatureMixture(d, "lang", 0.5, 2000L).columns
    assert(cols.contains("source") && cols.contains("rep"))
    // determinism under repartition
    val a = Curation.temperatureMixture(d, "lang", 0.5, 2000L)
      .select("doc_id", "rep").as[(Long, Int)].collect().toSet
    val b = Curation.temperatureMixture(d.repartition(13), "lang", 0.5, 2000L)
      .select("doc_id", "rep").as[(Long, Int)].collect().toSet
    assert(a == b)
    intercept[IllegalArgumentException] {
      Curation.temperatureMixture(d, "lang", 0.0, 2000L)
    }
    intercept[IllegalArgumentException] {
      Curation.temperatureMixture(d, "lang", 1.5, 2000L)
    }
    intercept[IllegalArgumentException] {
      Curation.temperatureMixture(d, "lang", 0.5, 0L)
    }
  }

  test("weighted sample: prob tracks weight, matches driver reference, guards") {
    // 500 light docs (w=1) + 100 heavy docs (w=50)
    val d = spark.range(600).toDF("doc_id")
      .withColumn("w", when(col("doc_id") < 500, 1.0).otherwise(50.0))
    val got = Curation.weightedSample(d, col("w"), k = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(got.size == 100)
    // driver reference with the same formula
    def h4(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"ws:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(md.take(2).map(b => f"$b%02x").mkString, 16)
    }
    val want = (0L until 600L)
      .map { id =>
        val w = if (id < 500) 1.0 else 50.0
        (id, math.log((h4(id) + 1).toDouble / 65536.0) / w)
      }
      .sortBy { case (id, key) => (-key, id) }.take(100).map(_._1).toSet
    assert(got == want)
    // heavy docs (1/6 of corpus, 10x total weight mass) dominate the draw
    val nHeavy = got.count(_ >= 500L)
    assert(nHeavy > 60, s"heavy selected: $nHeavy/100")
    // without replacement: k > positive-weight population returns all of it
    val zeroed = d.withColumn("w",
      when(col("doc_id") < 590, 0.0).otherwise(col("w")))
    assert(Curation.weightedSample(zeroed, col("w"), k = 100).count() == 10)
    // partitioning-independent
    val again = Curation.weightedSample(d.repartition(11), col("w"), k = 100)
      .select("doc_id").as[Long].collect().toSet
    assert(again == got)
    intercept[IllegalArgumentException] {
      Curation.weightedSample(d, col("w"), k = 0)
    }
  }

  test("stratified sample: exactly k per stratum, key-deterministic, partitioning-independent") {
    val d = spark.range(997).toDF("doc_id")
      .withColumn("lang", (col("doc_id") % 3).cast("string"))
      .withColumn("text", lit("x"))
    def pick(df: org.apache.spark.sql.DataFrame) =
      Curation.stratifiedSample(df, "lang", 25)
        .select("doc_id", "lang").as[(Long, String)].collect().toSet
    val a = pick(d.repartition(1))
    val b = pick(d.repartition(7, col("doc_id")))
    assert(a == b, "sample depends on partitioning")
    val perLang = a.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perLang.values.toSet == Set(25), perLang.toString)
    // under-full stratum keeps everything
    val tiny = Seq((1L, "zz", "x"), (2L, "zz", "x")).toDF("doc_id", "lang", "text")
    assert(Curation.stratifiedSample(tiny, "lang", 25).count() == 2)
  }

  test("repetition signals: duplicate windows and top-bigram coverage on crafted docs") {
    import graft.pipeline.TextAnalysis
    // doc 1: windows [w1..w10] repeated 3x -> 3 windows, 1 distinct
    val rep = ((1 to 10).map(i => s"w$i") ++ (1 to 10).map(i => s"w$i") ++
      (1 to 10).map(i => s"w$i")).mkString(" ")
    // doc 2: 30 distinct tokens -> no duplicate windows
    val uniq = (1 to 30).map(i => s"u$i").mkString(" ")
    val d = Seq((1L, rep), (2L, uniq)).toDF("doc_id", "text")
    val dwr = d.select(col("doc_id"),
        TextAnalysis.dupWindowRatio(col("text")).as("r"))
      .as[(Long, Double)].collect().toMap
    assert(dwr(1L) == 0.6667, dwr.toString) // 1 - 1/3
    assert(dwr(2L) == 0.0)
    val t1 = TextAnalysis.topBigramFraction(d).filter(col("doc_id") === 1)
      .select("top_bigram", "top_bigram_fraction").as[(String, Double)].collect().head
    // "w10 w1" occurs twice (at the two window seams)... every other
    // bigram once except ties; the doc-1 winner must occur >= 2 times
    assert(t1._2 > 0.0 && t1._2 <= 1.0)
    val t2 = TextAnalysis.topBigramFraction(d).filter(col("doc_id") === 2)
      .select("top_bigram", "top_bigram_fraction").as[(String, Double)].collect().head
    // all bigrams distinct -> tie broken by LARGEST bigram string
    assert(t2._1 == "u9 u10", t2.toString)
  }

  test("ccnetBuckets: per-language equal-population terciles, deterministic ties") {
    // 9 docs in lang a (3 per tercile), 4 in lang b (ntile 3 over 4 =
    // sizes 2/1/1); scores are driven by token rarity — doc texts are
    // built so the unigram LM separates them strictly
    val rows = (1 to 9).map { i =>
      // higher i -> rarer tokens -> lower logprob
      (i.toLong, "a", ((1 to 3).map(_ => "common") ++ (1 to i).map(j => s"rare${i}_$j")).mkString(" "))
    } ++ (11 to 14).map { i =>
      (i.toLong, "b", ((1 to 2).map(_ => "common") ++ (1 to (i - 10)).map(j => s"brare${i}_$j")).mkString(" "))
    }
    val d = rows.toDF("doc_id", "lang", "text")
    val got = Curation.ccnetBuckets(d).select("doc_id", "lang", "bucket")
      .as[(Long, String, Int)].collect()
    assert(got.length == rows.size, "one row per doc")
    val aBuckets = got.filter(_._2 == "a").groupBy(_._3).view.mapValues(_.length).toMap
    assert(aBuckets == Map(1 -> 3, 2 -> 3, 3 -> 3), s"lang a terciles: $aBuckets")
    val bBuckets = got.filter(_._2 == "b").groupBy(_._3).view.mapValues(_.length).toMap
    assert(bBuckets == Map(1 -> 2, 2 -> 1, 3 -> 1), s"lang b ntile split: $bBuckets")
    // determinism: a second evaluation is identical
    val again = Curation.ccnetBuckets(d).select("doc_id", "lang", "bucket")
      .as[(Long, String, Int)].collect()
    assert(got.sortBy(_._1).sameElements(again.sortBy(_._1)))
    // monotone: within a language, a bucket-1 doc never scores below a
    // bucket-3 doc (head = highest logprob = most-common tokens)
    val lp = Curation.ccnetBuckets(d).select("doc_id", "lp_r6")
      .as[(Long, Double)].collect().toMap
    val a1 = got.filter(g => g._2 == "a" && g._3 == 1).map(g => lp(g._1)).min
    val a3 = got.filter(g => g._2 == "a" && g._3 == 3).map(g => lp(g._1)).max
    assert(a1 >= a3)
  }

  test("token chunking is a total segmentation (every token in one chunk)") {
    val d = docs((1L, (1 to 13).map(i => s"t$i").mkString(" ")))
    val chunks = d.select(explode(Curation.tokenChunks(col("text"), 5)).as("c"))
      .as[String].collect()
    assert(chunks.toSeq == Seq(
      "t1 t2 t3 t4 t5", "t6 t7 t8 t9 t10", "t11 t12 t13"))
  }

  test("dsirSelect matches a naive driver-side reference and ranks target-like docs first") {
    // target = lang 'en'; docs sharing the en vocabulary must outscore
    // docs drawn from the disjoint de vocabulary
    val rows = Seq(
      (1L, "alpha beta gamma", "en"), (2L, "alpha beta beta", "en"),
      (3L, "zug zwang blitz", "de"), (4L, "zug blitz blitz", "de"),
      (5L, "alpha beta gamma alpha", "xx"), // en-like, unlabeled
      (6L, "zug zwang zwang blitz", "xx"), // de-like, unlabeled
      (7L, "", "xx"))
    val d = rows.toDF("doc_id", "text", "lang")
    val got = Curation.dsirSelect(d, col("lang") === "en", k = 7)
      .as[(Long, Long, Long)].collect().toSeq

    // naive reference: 256-bucket smoothed log-ratio, fixed-point
    def bk(t: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(2)
    val toks = rows.flatMap { case (id, t, l) =>
      t.split(" ").filter(_.nonEmpty).map(w => (id, bk(w), l == "en")) }
    val cr = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ct = toks.filter(_._3).groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val (tr, tt) = (toks.size.toLong, toks.count(_._3).toLong)
    val lfp = cr.map { case (b, c) =>
      b -> math.floor((math.log(ct.getOrElse(b, 0L) + 1) - math.log(c + 1)
        - math.log(tt + 256.0) + math.log(tr + 256.0)) * 1e6).toLong }
    val want = rows.map { case (id, t, _) =>
      val ws = t.split(" ").filter(_.nonEmpty)
      (id, ws.length.toLong, ws.map(w => lfp(bk(w))).sum)
    }.sortBy { case (id, _, s) => (-s, id) }
    assert(got == want)
    // en-vocab docs (1, 2, 5) all rank above every de-vocab doc (3, 4, 6)
    val rank = got.map(_._1).zipWithIndex.toMap
    for (hi <- Seq(1L, 2L, 5L); lo <- Seq(3L, 4L, 6L))
      assert(rank(hi) < rank(lo), s"doc $hi should outrank doc $lo")
  }

  test("dsirSelect is partitioning-independent and k-truncates deterministically") {
    val d = (0L until 400L).map { i =>
      (i, if (i % 3 == 0) "aa bb cc" else "dd ee ff", if (i % 5 == 0) "en" else "xx")
    }.toDF("doc_id", "text", "lang")
    val a = Curation.dsirSelect(d, col("lang") === "en", k = 50)
      .as[(Long, Long, Long)].collect().toSeq
    val b = Curation.dsirSelect(d.repartition(17), col("lang") === "en", k = 50)
      .as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.size == 50)
  }
}
