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

  test("vec_dot/vec_norm/vec_l2 are bit-identical to the HOF forms (float + double)") {
    // HOF reference forms (what Similarity.dot/norm used before the
    // codegen expressions): same accumulation order, so exact equality
    import org.apache.spark.sql.Column
    val hofDot = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val hofNorm = (a: Column) =>
      sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val hofL2 = (a: Column, b: Column) =>
      sqrt(aggregate(zip_with(a, b, (x, y) => (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))), lit(0.0), (acc, v) => acc + v))
    // range => codegen source; pseudo-random but deterministic arrays
    val fdf = spark.range(500).select(
      transform(sequence(lit(1), lit(64)),
        i => ((i * 31 + col("id") * 7) % 101 - 50).cast("float") / 9f).as("a"),
      transform(sequence(lit(1), lit(64)),
        i => ((i * 17 + col("id") * 13) % 97 - 48).cast("float") / 7f).as("b"))
    val ddf = fdf.select(col("a").cast("array<double>").as("a"),
      col("b").cast("array<double>").as("b"))
    for (df <- Seq(fdf, ddf)) {
      val rows = df.select(
        GraftFunctions.vec_dot(col("a"), col("b")).as("d1"), hofDot(col("a"), col("b")).as("d2"),
        GraftFunctions.vec_norm(col("a")).as("n1"), hofNorm(col("a")).as("n2"),
        GraftFunctions.vec_l2(col("a"), col("b")).as("l1"), hofL2(col("a"), col("b")).as("l2"))
        .collect()
      rows.foreach { r =>
        assert(r.getDouble(0) == r.getDouble(1)) // bit-equal, no epsilon
        assert(r.getDouble(2) == r.getDouble(3))
        assert(r.getDouble(4) == r.getDouble(5))
      }
    }
  }

  test("vec_dot null semantics mirror zip_with: null array, length mismatch, null element") {
    val df = Seq(
      (Some(Seq(1f, 2f)), Some(Seq(3f, 4f))),
      (None, Some(Seq(3f, 4f))),
      (Some(Seq(1f, 2f, 5f)), Some(Seq(3f, 4f)))).toDF("a", "b")
    val got = df.select(GraftFunctions.vec_dot(col("a"), col("b")).as("d"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0))).toSeq
    assert(got == Seq(Some(11.0), None, None))
    // null ELEMENT (needs containsNull=true schema)
    GraftFunctions.register(spark)
    val withNullElem = spark.sql(
      "SELECT vec_dot(CAST(array(1.0, NULL) AS ARRAY<DOUBLE>), " +
        "CAST(array(2.0, 3.0) AS ARRAY<DOUBLE>)) AS d")
    assert(withNullElem.collect().head.isNullAt(0))
  }

  test("vector expressions run inside WholeStageCodegen (no fallback)") {
    val df = spark.range(3).select(
      transform(sequence(lit(1), lit(8)), i => (i + col("id")).cast("float")).as("a"))
      .select(GraftFunctions.vec_dot(col("a"), col("a")).as("d"),
        GraftFunctions.vec_norm(col("a")).as("n"),
        GraftFunctions.vec_l2(col("a"), col("a")).as("l"))
    val plan = df.queryExecution.executedPlan.toString
    // the vec_* Project is starred (inside WholeStageCodegen) — while,
    // illustrating exactly the motivation, the HOF `transform` Project
    // that builds the array is NOT
    assert("""\*\(\d+\) Project \[vec_dot""".r.findFirstIn(plan).isDefined, plan)
    assert(df.collect().forall(r => r.getDouble(2) == 0.0))
  }

  test("vec_* SQL registration") {
    GraftFunctions.register(spark)
    // numeric literals parse as DECIMAL; the expressions demand an
    // explicit cast rather than silently copying the array per row
    val r = spark.sql(
      "SELECT vec_dot(CAST(array(1.0,2.0) AS ARRAY<DOUBLE>), CAST(array(3.0,4.0) AS ARRAY<DOUBLE>)) AS d, " +
        "vec_norm(CAST(array(3.0,4.0) AS ARRAY<DOUBLE>)) AS n, " +
        "vec_l2(CAST(array(1.0,1.0) AS ARRAY<DOUBLE>), CAST(array(4.0,5.0) AS ARRAY<DOUBLE>)) AS l")
      .collect().head
    assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 5.0 && r.getDouble(2) == 5.0)
  }

  test("pq_codes/pq_dtable/pq_adc match an independent Scala evaluation; adc == exact on codewords") {
    val dim = 8; val sub = 4; val subDim = dim / sub
    // 3-row codebook, hand-set
    val cb: Array[Double] = Array(
      1, 1, 2, 2, 3, 3, 4, 4,
      -1, -1, -2, -2, -3, -3, -4, -4,
      0, 0, 0, 0, 0, 0, 0, 0).map(_.toDouble)
    val vecs = Seq(
      (0L, Array(1f, 1f, 2f, 2f, 3f, 3f, 4f, 4f)),   // == codeword 0
      (1L, Array(-1f, -1f, -2f, -2f, 0f, 0f, 0f, 0f)), // cw1 head, cw2 tail
      (2L, Array(0.6f, 0.6f, 1.4f, 1.4f, -2f, -2f, 0.1f, 0.1f)))
    def expCodes(v: Array[Float]): Seq[Int] = (0 until sub).map { s =>
      (0 until 3).minBy { j =>
        (0 until subDim).map { i =>
          val d = v(s * subDim + i).toDouble - cb(j * dim + s * subDim + i)
          d * d
        }.sum
      }
    }
    val df = vecs.toDF("vec_id", "embedding").select(col("vec_id"),
      GraftFunctions.pq_codes(col("embedding"), cb, sub).as("codes"),
      GraftFunctions.pq_dtable(col("embedding"), cb, sub).as("dt"))
    val got = df.as[(Long, Seq[Int], Seq[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id)._1 == expCodes(v), s"codes for $id")
      assert(got(id)._2.length == sub * 3)
    }
    assert(got(0L)._1 == Seq(0, 0, 0, 0) && got(1L)._1 == Seq(1, 1, 2, 2))
    // adc of a vector against its own codes == sum of its own table
    // entries at those codes; for vec 0 (exactly codeword 0) that is 0
    val adc = df.as("a").join(df.as("b"), col("a.vec_id") === col("b.vec_id"))
      .select(col("a.vec_id"),
        GraftFunctions.pq_adc(col("a.codes"), col("b.dt"), 3).as("adc"))
      .as[(Long, Double)].collect().toMap
    assert(adc(0L) == 0.0)
    assert(adc(1L) == 0.0) // vec1's subvectors sit exactly on cw1/cw2
    assert(adc(2L) > 0.0)
  }

  test("pq expressions run inside WholeStageCodegen (no fallback)") {
    val cb = Array.fill(2 * 16)(0.5) // 2 codewords x 16 dims
    val df = spark.range(4).select(
      transform(sequence(lit(1), lit(16)), i => (i + col("id")).cast("float")).as("a"))
      .select(GraftFunctions.pq_codes(col("a"), cb, 4).as("codes"),
        GraftFunctions.pq_dtable(col("a"), cb, 4).as("dt"))
      .select(GraftFunctions.pq_adc(col("codes"), col("dt"), 2).as("adc"),
        col("codes"))
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[pq_adc""".r.findFirstIn(plan).isDefined, plan)
    // adc of a vector's own codes against its own table = the minimal
    // per-subspace distances, strictly positive off-codebook
    assert(df.collect().forall(r => r.getDouble(0) > 0.0))
  }

  test("rproj_bits matches an independent Scala evaluation of the seeded family") {
    val seed = graft.pipeline.Similarity.ProjSeed
    val vecs = Seq(
      (0L, Array(1f, -2f, 3.5f, 0f, -0.25f, 7f, -1f, 2f)),
      (1L, Array.fill(8)(0f)), // zero vector: every projection sum = 0 -> all '1'
      (2L, Array(-3f, 1f, 4f, -1f, 5f, -9f, 2f, 6f)))
    def expected(v: Array[Float], first: Int, bits: Int): String =
      (0 until bits).map { j =>
        val acc = v.indices.foldLeft(0.0)((a, d) =>
          a + GraftFunctions.rademacher(seed, first + j, d) * v(d))
        if (acc >= 0) '1' else '0'
      }.mkString
    val got = vecs.toDF("vec_id", "embedding")
      .select(col("vec_id"),
        GraftFunctions.rproj_bits(col("embedding"), 0, 12, seed).as("b0"),
        GraftFunctions.rproj_bits(col("embedding"), 24, 6, seed).as("b24"))
      .as[(Long, String, String)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    vecs.foreach { case (id, v) =>
      assert(got(id)._1 == expected(v, 0, 12), s"vec $id block0")
      assert(got(id)._2 == expected(v, 24, 6), s"vec $id block24")
    }
    assert(got(1L)._1 == "1" * 12)
    // hyperplane blocks are independent: block 24 is not a substring
    // reuse of block 0 for a generic vector
    assert(got(0L)._2 != got(0L)._1.take(6) || got(2L)._2 != got(2L)._1.take(6))
  }

  test("rproj_bits runs in codegen, handles nulls, and registers for SQL") {
    // two consumers of `a` keep CollapseProject from folding the HOF
    // array build into the rproj Project (as in the vec_* codegen test)
    val df = spark.range(4).select(
      transform(sequence(lit(1), lit(16)), i => (i * (col("id") + 1) - 8).cast("float")).as("a"))
      .select(GraftFunctions.rproj_bits(col("a"), 0, 8, 42L).as("b"),
        GraftFunctions.rproj_bits(col("a"), 8, 8, 42L).as("b2"))
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[rproj_bits""".r.findFirstIn(plan).isDefined, plan)
    assert(df.as[(String, String)].collect()
      .forall(r => r._1.matches("[01]{8}") && r._2.matches("[01]{8}")))
    GraftFunctions.register(spark)
    // null array and null element -> null
    val nulls = spark.sql(
      "SELECT rproj_bits(CAST(NULL AS ARRAY<DOUBLE>), 0, 4, 42), " +
        "rproj_bits(CAST(array(1.0, NULL) AS ARRAY<DOUBLE>), 0, 4, 42)")
      .collect().head
    assert(nulls.isNullAt(0) && nulls.isNullAt(1))
    // SQL form equals the Column form on the same input
    GraftFunctions.register(spark)
    val viaSql = spark.sql(
      "SELECT rproj_bits(CAST(array(1.0,-2.0,3.0) AS ARRAY<DOUBLE>), 2, 6, 7) AS b")
      .as[String].head()
    val viaCol = Seq(Tuple1(Array(1.0, -2.0, 3.0))).toDF("a")
      .select(GraftFunctions.rproj_bits(col("a"), 2, 6, 7L).as("b")).as[String].head()
    assert(viaSql == viaCol)
    // non-array input rejected at analysis
    intercept[Exception] { spark.sql("SELECT rproj_bits('x', 0, 4, 1)").collect() }
  }

  test("rolling_fp expression matches Dedup.rollingFingerprints (incl. short/empty)") {
    val long = (1 to 40).map(i => s"tok$i").mkString(" ")
    val samples = Seq(long, long.take(31), "short", "", long + " tail edit")
    val got = samples.zipWithIndex.map { case (s, i) => (i, s) }.toDF("i", "s")
      .select(col("i"), GraftFunctions.rolling_fp(col("s")).as("fp"))
      .as[(Int, Seq[Long])].collect().toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      assert(got(i) == Dedup.rollingFingerprints(s), s"sample $i")
    }
    // codegen participation: non-literal input (a literal one constant-
    // folds to a LocalTableScan before any codegen can appear)
    val df = spark.range(8)
      .select(concat(lit(long), col("id").cast("string")).as("s"))
      .select(GraftFunctions.rolling_fp(col("s")).as("fp"))
      .select(size(col("fp")).as("n"))
    val wsc = df.queryExecution.executedPlan.find(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec])
    assert(wsc.isDefined, df.queryExecution.executedPlan.toString)
    assert(df.collect().length == 8)
  }

  test("rproj_bits rejects embeddings wider than the 4096 hyperplane stride") {
    // r(h, d) strides hyperplanes by 4096 in the seed formula, so a
    // dim-4097 embedding would alias r(h, 4096) with r(h+1, 0) and
    // silently correlate 'independent' bands — must fail loudly
    val wide = Seq((0L, Array.fill(4097)(1.0f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      wide.select(GraftFunctions.rproj_bits(col("embedding"), 0, 4, 1L)).collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" "))
    assert(rootMsg(e).contains("4096"), s"unexpected error: $e")
    // 4096 exactly is the last safe width (d in [0, 4096))
    val ok = Seq((0L, Array.fill(4096)(1.0f))).toDF("vec_id", "embedding")
    assert(ok.select(GraftFunctions.rproj_bits(col("embedding"), 0, 4, 1L))
      .as[String].head().length == 4)
  }

  test("check_text Column form matches TextFunctions.checkText on edge inputs") {
    val words30 = (1 to 30).map(i => s"w$i").mkString(" ")
    val words29 = (1 to 29).map(i => s"w$i").mkString(" ")
    val samples: Seq[String] = Seq(
      null, "", "   ", "a", words30, words29,
      words30 + " ", words29 + "   ", // trailing spaces: Java split drops them
      words29 + "  x", // interior double space inflates the Java count too
      "a  b   c", // runs of spaces = empty tokens, counted (reference quirk)
      words30 + " A B C D E F G H I J K L M N O P Q R S T U V W X Y Z tail")
    val got = samples.zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("i", "s")
      .select(col("i"), GraftFunctions.check_text(col("s"), 30).as("ok"))
      .as[(Int, Boolean)].collect().toMap
    samples.zipWithIndex.foreach { case (s, i) =>
      val want = s != null && TextFunctions.checkText(s, 30)
      assert(got(i) == want, s"checkText mismatch on sample $i: ${Option(s).map(_.take(40))}")
    }
  }

  test("tsv_safe Column form matches TextFunctions.tsvSafe") {
    val samples = Seq("plain", "tab\there", "line\nbreak", "q\"q\"", "", "a\t\n\"b")
    val got = samples.toDF("s")
      .select(GraftFunctions.tsv_safe(col("s")).as("t"))
      .as[String].collect().toSeq
    assert(got == samples.map(TextFunctions.tsvSafe))
  }

  test("pq expressions with structurally equal codebooks are semantically equal") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    // two SEPARATE but element-equal arrays: with a raw Array param the
    // case-class equality would be reference-based and CSE would
    // silently miss — the ArraySeq param restores structural equality
    val cb1 = Array(1.0, 2.0, 3.0, 4.0)
    val cb2 = Array(1.0, 2.0, 3.0, 4.0)
    // one shared child Column: the unresolved attribute node carries
    // call-site Origin metadata that differs per `col(...)` call — the
    // codebook is the equality axis under test here
    val emb = col("embedding")
    val e1 = ColumnBridge.expression(GraftFunctions.pq_codes(emb, cb1, 2))
    val e2 = ColumnBridge.expression(GraftFunctions.pq_codes(emb, cb2, 2))
    assert(e1 == e2, "PqCodesExpr equality must be structural over the codebook")
    val d1 = ColumnBridge.expression(GraftFunctions.pq_dtable(emb, cb1, 2))
    val d2 = ColumnBridge.expression(GraftFunctions.pq_dtable(emb, cb2, 2))
    assert(d1 == d2, "PqDtableExpr equality must be structural over the codebook")
    val other = ColumnBridge.expression(
      GraftFunctions.pq_codes(emb, Array(9.0, 2.0, 3.0, 4.0), 2))
    assert(e1 != other, "different codebooks must not compare equal")
  }
}
