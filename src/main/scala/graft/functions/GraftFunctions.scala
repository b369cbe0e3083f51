package graft.functions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge

/**
 * Column wrappers + SQL registration for the engine's native Catalyst
 * expressions. `GraftExtensions` makes them injectable at session build
 * time (`.withExtensions(new GraftExtensions)`), the idiomatic way a
 * deployment ships custom functions; `register` covers an existing
 * session.
 */
object GraftFunctions {

  private def expr(c: Column): Expression = ColumnBridge.expression(c)
  private def col(e: Expression): Column = ColumnBridge.column(e)

  /** Codegen NTriples escape (see NtEscapeExpr). */
  def nt_escape(c: Column): Column = col(NtEscapeExpr(expr(c)))

  /** Pure-Column form of [[TextFunctions.checkText]] (CheckAbstract,
    * U5): non-null, non-empty, ≥ `minWords` single-space-separated
    * words, no blacklisted fingerprint. Word counting replicates
    * Java's `split(" ")` TRAILING-empty removal exactly (Spark's
    * `split` maps limit 0 to −1 and keeps trailing empties, so the
    * trailing spaces are stripped first; an all-space text counts 0
    * words, as Java's all-trailing-empties split does). Stays inside
    * WholeStageCodegen — no UDF serialization wall. */
  def check_text(c: Column, minWords: Int = 30,
      blacklist: Seq[String] = TextFunctions.defaultBlacklist): Column = {
    import org.apache.spark.sql.functions._
    val stripped = regexp_replace(c, " +$", "")
    val nWords = when(stripped === "", lit(0))
      .otherwise(size(split(stripped, " ", -1)))
    val base = c.isNotNull && length(c) > 0 && nWords >= minWords
    blacklist.foldLeft(base)((acc, b) => acc && !c.contains(b))
  }

  /** Pure-Column form of [[TextFunctions.tsvSafe]] (SafeTsvText, U7):
    * tabs/newlines to spaces, quotes doubled, wrapped in quotes. */
  def tsv_safe(c: Column): Column = {
    import org.apache.spark.sql.functions._
    concat(lit("\""),
      regexp_replace(regexp_replace(c, "[\\t\\n]", " "), "\"", "\"\""),
      lit("\""))
  }

  /** Codegen 60-bit SimHash (see SimHash64Expr). */
  def simhash64(c: Column): Column = col(SimHash64Expr(expr(c)))

  /** Codegen one-pass MinHash signature (see MinhashSigExpr). */
  def minhash_sig(c: Column, shingleWords: Int = 3, numHashes: Int = 16): Column =
    col(MinhashSigExpr(expr(c), shingleWords, numHashes))

  /** Codegen content-defined rolling fingerprints (see RollingFpExpr). */
  def rolling_fp(c: Column, window: Int = 32, maskBits: Int = 4): Column =
    col(RollingFpExpr(expr(c), window, maskBits))

  /** Static helper the generated code (and nullSafeEval) calls. */
  def rollingFpData(text: String, window: Int,
      maskBits: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.pipeline.Dedup.rollingFingerprints(text, window, maskBits)
        .map(l => l: Any))

  /** Codegen dot product over array<float|double> (see FloatDotExpr). */
  def vec_dot(a: Column, b: Column): Column = col(FloatDotExpr(expr(a), expr(b)))

  /** Codegen L2 norm over array<float|double> (see FloatNormExpr). */
  def vec_norm(a: Column): Column = col(FloatNormExpr(expr(a)))

  /** Codegen L2 distance over array<float|double> (see FloatL2Expr). */
  def vec_l2(a: Column, b: Column): Column = col(FloatL2Expr(expr(a), expr(b)))

  /** Codegen seeded random-projection sign bits (see RandProjBitsExpr). */
  def rproj_bits(a: Column, first: Int, bits: Int, seed: Long): Column =
    col(RandProjBitsExpr(expr(a), first, bits, seed))

  /** Rademacher hyperplane entry r(h, d) ∈ {+1, −1} of the seeded
    * multiply–xorshift–multiply family (RandProjBitsExpr scaladoc has
    * the derivation; the DuckDB oracles restate this arithmetic). */
  def rademacher(seed: Long, h: Int, d: Int): Double = {
    val s = seed + h.toLong * 4096L + d
    val x = (s * 2654435761L) % 2147483648L
    val z = x ^ (x >> 15)
    val w = (z * 1103515245L + 12345L) % 2147483648L
    if (((w >> 16) & 1L) == 1L) 1.0 else -1.0
  }

  /** Static helper the generated code (and nullSafeEval) calls: the
    * `bits` projection signs in one tight loop per row. Returns null on
    * a null element (FloatDotExpr's null discipline). */
  def randProjBitsData(a: org.apache.spark.sql.catalyst.util.ArrayData,
      isFloat: Boolean, first: Int, bits: Int,
      seed: Long): org.apache.spark.unsafe.types.UTF8String = {
    val n = a.numElements()
    // the hyperplane index is strided by 4096 in the seed formula
    // (s = seed + h*4096 + d), so entry r(h, d) would alias
    // r(h+1, d-4096) on wider embeddings: 'independent' bands become
    // correlated SILENTLY, degrading recall with no error. Widening
    // the stride would change the family (and every oracle that
    // restates it verbatim), so wide embeddings fail loudly instead.
    if (n > 4096) throw new IllegalArgumentException(
      s"rproj_bits: embedding dim $n exceeds the 4096 hyperplane stride " +
        "(r(h,d) would alias r(h+1,d-4096) and correlate bands); " +
        "PCA/slice the embedding below 4096 dims or define a wider family")
    val out = new Array[Byte](bits)
    var j = 0
    while (j < bits) {
      var acc = 0.0
      var d = 0
      while (d < n) {
        if (a.isNullAt(d)) return null
        val e = if (isFloat) a.getFloat(d).toDouble else a.getDouble(d)
        acc += rademacher(seed, first + j, d) * e
        d += 1
      }
      out(j) = if (acc >= 0) '1' else '0'
      j += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromBytes(out)
  }

  /** Static helper the generated code (and nullSafeEval) calls: the
    * one-pass signature packed as Catalyst ArrayData. */
  def minhashSigData(text: String, shingleWords: Int,
      numHashes: Int): org.apache.spark.sql.catalyst.util.ArrayData =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      graft.pipeline.Dedup.minhashSigArray(text, shingleWords, numHashes)
        .map(s => org.apache.spark.unsafe.types.UTF8String.fromString(s): Any))

  /** PQ codes column (see PqCodesExpr); the codebook is a plan-time
    * constant, so there is no SQL-literal form — Column API only.
    * The array is wrapped (zero-copy) in an immutable ArraySeq so the
    * expression compares structurally (semanticEquals/CSE; callers
    * must not mutate the array after handing it over). */
  def pq_codes(emb: Column, cbFlat: Array[Double], subspaces: Int): Column =
    col(PqCodesExpr(expr(emb),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(cbFlat), subspaces))

  /** PQ per-probe distance table (see PqDtableExpr). */
  def pq_dtable(emb: Column, cbFlat: Array[Double], subspaces: Int): Column =
    col(PqDtableExpr(expr(emb),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(cbFlat), subspaces))

  /** PQ asymmetric distance (see PqAdcExpr). */
  def pq_adc(codes: Column, dtable: Column, codewords: Int): Column =
    col(PqAdcExpr(expr(codes), expr(dtable), codewords))

  @inline private def vecElem(a: org.apache.spark.sql.catalyst.util.ArrayData,
      isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  /** Static helper behind PqCodesExpr: per subspace, the index of the
    * nearest codebook row by squared L2 (ties to the smallest index). */
  def pqCodesData(a: org.apache.spark.sql.catalyst.util.ArrayData,
      isFloat: Boolean, cb: Array[Double],
      subspaces: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val dim = a.numElements()
    val subDim = dim / subspaces
    val codewords = cb.length / dim
    val out = new Array[Any](subspaces)
    var s = 0
    while (s < subspaces) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < codewords) {
        var d2 = 0.0
        var i = 0
        while (i < subDim) {
          val idx = s * subDim + i
          if (a.isNullAt(idx)) return null
          val diff = vecElem(a, isFloat, idx) - cb(j * dim + idx)
          d2 += diff * diff
          i += 1
        }
        if (d2 < bestD) { bestD = d2; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Static helper behind PqDtableExpr: d(s, j) flat at s·codewords+j. */
  def pqDtableData(a: org.apache.spark.sql.catalyst.util.ArrayData,
      isFloat: Boolean, cb: Array[Double],
      subspaces: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val dim = a.numElements()
    val subDim = dim / subspaces
    val codewords = cb.length / dim
    val out = new Array[Any](subspaces * codewords)
    var s = 0
    while (s < subspaces) {
      var j = 0
      while (j < codewords) {
        var d2 = 0.0
        var i = 0
        while (i < subDim) {
          val idx = s * subDim + i
          if (a.isNullAt(idx)) return null
          val diff = vecElem(a, isFloat, idx) - cb(j * dim + idx)
          d2 += diff * diff
          i += 1
        }
        out(s * codewords + j) = d2
        j += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Static helper behind PqAdcExpr (subspace-order accumulation). */
  def pqAdc(codes: org.apache.spark.sql.catalyst.util.ArrayData,
      dt: org.apache.spark.sql.catalyst.util.ArrayData, codewords: Int): Double = {
    var acc = 0.0
    var s = 0
    val n = codes.numElements()
    while (s < n) {
      acc += dt.getDouble(s * codewords + codes.getInt(s))
      s += 1
    }
    acc
  }

  private[functions] def arity(name: String, n: Int)(es: Seq[Expression]): Seq[Expression] = {
    require(es.length == n, s"$name expects $n argument(s), got ${es.length}")
    es
  }

  /** Foldable-integer argument of a SQL function call (the
    * first/bits/seed parameters of rproj_bits are plan-time constants,
    * not per-row columns). */
  private[functions] def litLong(name: String, e: Expression): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects an integer literal argument, got $other")
  }

  private[functions] def rprojFromSql(es: Seq[Expression]): RandProjBitsExpr = {
    arity("rproj_bits", 4)(es)
    RandProjBitsExpr(es.head, litLong("rproj_bits", es(1)).toInt,
      litLong("rproj_bits", es(2)).toInt, litLong("rproj_bits", es(3)))
  }

  /** Register the functions for SQL use on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nt_escape", es => NtEscapeExpr(arity("nt_escape", 1)(es).head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", es => SimHash64Expr(arity("simhash64", 1)(es).head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", es => MinhashSigExpr(arity("minhash_sig", 1)(es).head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", es => { arity("vec_dot", 2)(es); FloatDotExpr(es.head, es(1)) }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_norm", es => FloatNormExpr(arity("vec_norm", 1)(es).head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_l2", es => { arity("vec_l2", 2)(es); FloatL2Expr(es.head, es(1)) }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rproj_bits", rprojFromSql, "scala_udf")
  }
}

/** Session extension injecting the engine's functions at build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("nt_escape"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[NtEscapeExpr].getName, "nt_escape"),
        (es: Seq[Expression]) => NtEscapeExpr(GraftFunctions.arity("nt_escape", 1)(es).head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SimHash64Expr].getName, "simhash64"),
        (es: Seq[Expression]) => SimHash64Expr(GraftFunctions.arity("simhash64", 1)(es).head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("minhash_sig"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[MinhashSigExpr].getName, "minhash_sig"),
        (es: Seq[Expression]) => MinhashSigExpr(GraftFunctions.arity("minhash_sig", 1)(es).head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[FloatDotExpr].getName, "vec_dot"),
        (es: Seq[Expression]) => { GraftFunctions.arity("vec_dot", 2)(es); FloatDotExpr(es.head, es(1)) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("vec_norm"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[FloatNormExpr].getName, "vec_norm"),
        (es: Seq[Expression]) => FloatNormExpr(GraftFunctions.arity("vec_norm", 1)(es).head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("vec_l2"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[FloatL2Expr].getName, "vec_l2"),
        (es: Seq[Expression]) => { GraftFunctions.arity("vec_l2", 2)(es); FloatL2Expr(es.head, es(1)) }))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("rproj_bits"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[RandProjBitsExpr].getName, "rproj_bits"),
        (es: Seq[Expression]) => GraftFunctions.rprojFromSql(es)))
  }
}
