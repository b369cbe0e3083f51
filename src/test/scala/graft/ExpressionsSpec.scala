package graft

import graft.functions.{GraftExtensions, GraftFunctions, TextFunctions}
import graft.io.NTriples
import graft.pipeline.{Dedup, TripleMaterialize}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native Catalyst expressions: evaluation parity with the pure
  * functions, WholeStageCodegen participation, SQL registration, and
  * session-extension injection. */
class ExpressionsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("nt_escape expression matches TextFunctions.ntEscape") {
    val samples = Seq("plain", "café", "tab\there", "q\"q", "back\\slash", "")
    val got = samples.toDF("s")
      .select(GraftFunctions.nt_escape(col("s")).as("e"))
      .as[String].collect().toSeq
    assert(got == samples.map(TextFunctions.ntEscape))
  }

  test("simhash64 expression matches Dedup.simhash64") {
    val samples = Seq("a b c", "the fast key order", "x", "")
    val got = samples.toDF("s")
      .select(GraftFunctions.simhash64(col("s")).as("h"))
      .as[Long].collect().toSeq
    assert(got == samples.map(Dedup.simhash64))
  }

  test("minhash_sig expression equals the relational explode+partial-min signatures") {
    val docs = Seq(
      (0L, (1 to 40).map(i => s"tok$i").mkString(" ")),
      (1L, "short"),
      (2L, "two words"),
      (3L, ""),
      (4L, "a  b   c d"), // empty tokens from runs of spaces
      (5L, (1 to 7).map(i => s"café中$i").mkString(" "))) // non-ASCII utf-8
      .toDF("doc_id", "text")
    val relational = Dedup.minhashSignatures(docs)
      .as[(Long, Seq[String])].collect().toMap
    val onePass = Dedup.minhashSignaturesOnePass(docs)
      .as[(Long, Seq[String])].collect().toMap
    assert(onePass == relational)
    // and the pure JVM function agrees row-by-row
    assert(Dedup.minhashSigArray("two words").toSeq == relational(2L))
  }

  test("expressions run inside WholeStageCodegen (no fallback)") {
    // use range (a codegen source) — a local Seq gets constant-folded
    // into LocalTableScan before planning
    val df = spark.range(3).select(
      GraftFunctions.nt_escape(col("id").cast("string")),
      GraftFunctions.simhash64(col("id").cast("string")),
      GraftFunctions.minhash_sig(col("id").cast("string")))
    // "*(1)" marks operators inside WholeStageCodegen stage 1
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(df.collect().length == 3)
  }

  test("SQL registration on an existing session") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT nt_escape('café') AS e, simhash64('a b') AS h, minhash_sig('a b c d') AS m")
      .collect().head
    assert(r.getString(0) == "caf\\u00E9")
    assert(r.getLong(1) == Dedup.simhash64("a b"))
    assert(r.getSeq[String](2) == Dedup.minhashSigArray("a b c d").toSeq)
  }

  test("GraftExtensions injects functions at session build") {
    val s2 = SparkSession.builder().master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql("SELECT nt_escape('é') AS e").collect().head
      assert(r.getString(0) == "\\u00E9")
    } finally ()
  }

  test("Column-path NT lines match the pure formatter byte-exactly") {
    val df = Seq(("A", "café"), ("B", "x")).toDF("subj", "obj")
    val got = TripleMaterialize.uriUriLines(df, "http://p", "http://s/", "http://o/")
      .as[String].collect().sorted.toSeq
    val want = Seq(("A", "café"), ("B", "x")).map { case (s, o) =>
      NTriples.formatUriUri(s, o, "http://p", "http://s/", "http://o/")
    }.sorted
    assert(got == want)
    val lit = Seq(("A", "say \"hi\"", "en"), ("B", "plain", null))
      .toDF("subj", "obj", "lang")
    val gotLit = TripleMaterialize.uriLiteralLines(lit, "http://p", "http://s/")
      .as[String].collect().sorted.toSeq
    val wantLit = Seq(
      NTriples.formatUriLiteral("A", "say \"hi\"", "en", "http://p", "http://s/"),
      NTriples.formatUriLiteral("B", "plain", "", "http://p", "http://s/")).sorted
    assert(gotLit == wantLit)
  }
}
