package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the engine's hot-path scalar
 * functions. A custom `Expression` with `doGenCode` stays inside
 * WholeStageCodegen (one static call per row, no Scala-UDF
 * encoder/serialization detour) — the (b) tier of the extension
 * preference order (compose built-ins > custom Expression > custom
 * plan > mapPartitions).
 */

/** NTriples US-ASCII escaping (TextFunctions.ntEscape contract,
  * reference AbstractNTriplesStorer.java:77-123) as a codegen'd
  * expression — used in the triple-materialization hot path. */
case class NtEscapeExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(TextFunctions.ntEscape(v.toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextFunctions.ntEscape($c.toString()))")
  override protected def withNewChildInternal(newChild: Expression): NtEscapeExpr =
    copy(child = newChild)
  override def prettyName: String = "nt_escape"
}

/** Whole MinHash signature in one codegen'd pass per document
  * (graft.pipeline.Dedup.minhashSigArray): the signature stage becomes
  * a pure map-side projection — no shingle row explosion, no shuffle —
  * while emitting byte-exact the same array<string> as the relational
  * explode + partial-min form (equality tested in ExpressionsSpec). */
case class MinhashSigExpr(child: Expression, shingleWords: Int = 3,
    numHashes: Int = 16) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
  override def nullSafeEval(v: Any): Any =
    GraftFunctions.minhashSigData(v.toString, shingleWords, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftFunctions.minhashSigData(" +
        s"$c.toString(), $shingleWords, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSigExpr =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** Content-defined rolling (Rabin-Karp) window fingerprints of a text
  * (see graft.pipeline.Dedup.rollingFingerprints: base-257 polynomial
  * mod 2^61−1 over a sliding `window`-char frame, emitted when the
  * hash's low `maskBits` bits are zero — shift-invariant sampling, so
  * fingerprints of unedited regions survive insertions elsewhere).
  * Exact integer arithmetic, so the q95 DuckDB oracle restates it with
  * HUGEINT math. Output: array<long> (possibly empty; one whole-text
  * hash for texts shorter than the window). */
case class RollingFpExpr(child: Expression, window: Int = 32,
    maskBits: Int = 4) extends UnaryExpression {
  require(window > 0 && maskBits >= 0, s"rolling_fp: window=$window maskBits=$maskBits")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
  override def nullSafeEval(v: Any): Any =
    GraftFunctions.rollingFpData(v.toString, window, maskBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftFunctions.rollingFpData(" +
        s"$c.toString(), $window, $maskBits)")
  override protected def withNewChildInternal(newChild: Expression): RollingFpExpr =
    copy(child = newChild)
  override def prettyName: String = "rolling_fp"
}

/** Element getter fragment for array<float>/array<double> children. */
private[functions] object VecExprs {
  def getter(e: Expression): String = e.dataType match {
    case ArrayType(FloatType, _) => "getFloat"
    case _ => "getDouble"
  }
  def elemAt(a: ArrayData, isFloat: Boolean, i: Int): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
  def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
}

/**
 * Dot product of two array<float|double> columns in double math — a
 * true codegen'd tight loop. The relational form
 * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is semantically identical
 * but higher-order functions are CodegenFallback: every pair walks an
 * interpreted expression tree per ELEMENT, in the innermost loop of
 * every ANN/near-dup join. Same accumulation order (left-to-right,
 * each element widened to double before multiply), so results are
 * bit-identical to the HOF form (asserted in ExpressionsSpec).
 *
 * Null semantics mirror the HOF form: null array, length mismatch
 * (zip_with pads with null), or any null element → null.
 */
case class FloatDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs (cast explicitly; " +
          "an implicit whole-array cast would materialize a copy per row)")
    }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lf, rf) = (VecExprs.isFloat(left), VecExprs.isFloat(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += VecExprs.elemAt(x, lf, i) * VecExprs.elemAt(y, rf, i)
      i += 1
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (acc, i, n) = (ctx.freshName("acc"), ctx.freshName("i"), ctx.freshName("n"))
      val (lg, rg) = (VecExprs.getter(left), VecExprs.getter(right))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ((double) $a.$lg($i)) * ((double) $b.$rg($i));
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatDotExpr = copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

/**
 * L2 norm of an array<float|double> column (double math), codegen'd —
 * same motivation and same accumulation order as `FloatDotExpr`
 * (bit-identical to `sqrt(aggregate(a, 0.0, acc + v*v))`).
 */
case class FloatNormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input")
  }
  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val f = VecExprs.isFloat(child)
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (x.isNullAt(i)) return null
      val e = VecExprs.elemAt(x, f, i)
      acc += e * e
      i += 1
    }
    math.sqrt(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val (acc, i, n, e) = (ctx.freshName("acc"), ctx.freshName("i"),
        ctx.freshName("n"), ctx.freshName("e"))
      val g = VecExprs.getter(child)
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  double $e = (double) $a.$g($i);
         |  $acc += $e * $e;
         |}
         |if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): FloatNormExpr =
    copy(child = newChild)
  override def prettyName: String = "vec_norm"
}

/**
 * L2 distance of two array<float|double> columns (double math),
 * codegen'd — the IVF cell-assignment inner loop (every vector ×
 * every centroid). Bit-identical to
 * `sqrt(aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0.0, _+_))`;
 * null semantics as `FloatDotExpr`.
 */
case class FloatL2Expr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs (cast explicitly; " +
          "an implicit whole-array cast would materialize a copy per row)")
    }
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lf, rf) = (VecExprs.isFloat(left), VecExprs.isFloat(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = VecExprs.elemAt(x, lf, i) - VecExprs.elemAt(y, rf, i)
      acc += d * d
      i += 1
    }
    math.sqrt(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (acc, i, n, d) = (ctx.freshName("acc"), ctx.freshName("i"),
        ctx.freshName("n"), ctx.freshName("d"))
      val (lg, rg) = (VecExprs.getter(left), VecExprs.getter(right))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = ((double) $a.$lg($i)) - ((double) $b.$rg($i));
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = java.lang.Math.sqrt($acc);
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): FloatL2Expr = copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_l2"
}

/**
 * Seeded random-projection sign bits (`bits` hyperplanes starting at
 * global hyperplane index `first`) over an array<float|double>
 * embedding — the LSH family behind `Similarity.signBucket` /
 * `signBandKeys` / `semDedup` cells.
 *
 * Hyperplane entries are a deterministic Rademacher (±1) family: for
 * hyperplane h and dimension d,
 *
 *   s = seed + h*4096 + d
 *   x = (s * 2654435761) mod 2^31
 *   z = x XOR (x >> 15)
 *   w = (z * 1103515245 + 12345) mod 2^31
 *   r(h,d) = +1 if bit 16 of w else -1
 *
 * (multiply–xorshift–multiply: the xor between the two multiplies
 * makes the map nonlinear in s, so distinct hyperplanes are
 * decorrelated — a plain LCG is LINEAR in s and every hyperplane would
 * be a shift of one underlying sequence; measured on 64 hyperplanes ×
 * 64 dims the family's balance and pairwise correlations match iid
 * signs). Every step is exact int64 arithmetic with no wraparound, so
 * any engine restates it verbatim — the DuckDB oracles for
 * q44/q53/q77 do. Output bit j = '1' iff Σ_d r(first+j, d)·emb[d] ≥ 0,
 * accumulated left-to-right in double (bit-identical across engines
 * for identical input, same discipline as FloatDotExpr).
 *
 * Unlike an axis-aligned sign family, `bits`+`first` are NOT bounded
 * by the embedding dimension — hyperplanes are generated, not sliced —
 * and every bit mixes ALL dimensions, so recall survives anisotropic
 * (correlated-dimension) embeddings where leading-dimension signs
 * carry no cluster signal (asserted in PipelineSpec).
 *
 * Null array or any null element → null.
 */
case class RandProjBitsExpr(child: Expression, first: Int, bits: Int,
    seed: Long) extends UnaryExpression {
  require(first >= 0 && bits > 0, s"rproj_bits: first=$first bits=$bits")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input (cast explicitly; " +
        "an implicit whole-array cast would materialize a copy per row)")
  }
  override def nullSafeEval(v: Any): Any =
    GraftFunctions.randProjBitsData(v.asInstanceOf[ArrayData],
      VecExprs.isFloat(child), first, bits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val f = VecExprs.isFloat(child)
      s"""
         |${ev.value} = graft.functions.GraftFunctions.randProjBitsData(
         |  $a, $f, $first, $bits, ${seed}L);
         |if (${ev.value} == null) ${ev.isNull} = true;
       """.stripMargin
    })
  override protected def withNewChildInternal(newChild: Expression): RandProjBitsExpr =
    copy(child = newChild)
  override def prettyName: String = "rproj_bits"
}

/**
 * Product-quantization encode: split the embedding into `subspaces`
 * contiguous subvectors and emit, per subspace s, the index of the
 * nearest codebook row (squared L2 over that subspace, ties to the
 * SMALLEST index — strict `<` in the scan). The codebook is a
 * plan-time constant (flat row-major `codewords × dim` doubles,
 * embedded via `addReferenceObj` so codegen reads it directly — it is
 * sampled rows of the corpus, driver-collected once, ≈ KB-scale).
 * Output: array<int> of length `subspaces` — the 8-byte-per-vector
 * compressed representation that makes a 100 TB ANN scan memory-bound
 * instead of vector-math-bound (Jégou et al. 2011, TPAMI).
 *
 * The codebook parameter is an immutable ArraySeq (NOT a raw Array):
 * Array equality is reference-based, so an Array param would make two
 * structurally identical expressions never semanticEquals — silently
 * defeating canonicalization and common-subexpression elimination.
 * `cbArr` unwraps back to the underlying double[] zero-copy for
 * codegen/eval.
 */
case class PqCodesExpr(child: Expression,
    cbFlat: scala.collection.immutable.ArraySeq[Double],
    subspaces: Int) extends UnaryExpression {
  require(subspaces > 0 && cbFlat.nonEmpty, "pq_codes: empty codebook")
  private def cbArr: Array[Double] = cbFlat.unsafeArray match {
    case d: Array[Double] => d // ofDouble: zero-copy unwrap
    case _ => cbFlat.toArray // boxed ofRef construction: copy once
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input")
  }
  override def nullSafeEval(v: Any): Any =
    GraftFunctions.pqCodesData(v.asInstanceOf[ArrayData],
      VecExprs.isFloat(child), cbArr, subspaces)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
    val f = VecExprs.isFloat(child)
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.functions.GraftFunctions.pqCodesData(
       |  $a, $f, $cbRef, $subspaces);
       |if (${ev.value} == null) ${ev.isNull} = true;
     """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): PqCodesExpr =
    copy(child = newChild)
  override def prettyName: String = "pq_codes"
}

/** Per-probe PQ distance table: d(s, j) = squared L2 between the
  * probe's subspace-s subvector and codebook row j's — flat
  * array<double> of length subspaces × codewords, computed ONCE per
  * probe so the per-candidate ADC cost is `subspaces` lookups.
  * Codebook as ArraySeq for structural equality (see [[PqCodesExpr]]). */
case class PqDtableExpr(child: Expression,
    cbFlat: scala.collection.immutable.ArraySeq[Double],
    subspaces: Int) extends UnaryExpression {
  require(subspaces > 0 && cbFlat.nonEmpty, "pq_dtable: empty codebook")
  private def cbArr: Array[Double] = cbFlat.unsafeArray match {
    case d: Array[Double] => d // ofDouble: zero-copy unwrap
    case _ => cbFlat.toArray // boxed ofRef construction: copy once
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<float|double> input")
  }
  override def nullSafeEval(v: Any): Any =
    GraftFunctions.pqDtableData(v.asInstanceOf[ArrayData],
      VecExprs.isFloat(child), cbArr, subspaces)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cbArr, "double[]")
    val f = VecExprs.isFloat(child)
    nullSafeCodeGen(ctx, ev, a => s"""
       |${ev.value} = graft.functions.GraftFunctions.pqDtableData(
       |  $a, $f, $cbRef, $subspaces);
       |if (${ev.value} == null) ${ev.isNull} = true;
     """.stripMargin)
  }
  override protected def withNewChildInternal(newChild: Expression): PqDtableExpr =
    copy(child = newChild)
  override def prettyName: String = "pq_dtable"
}

/** Asymmetric-distance computation: Σ_s dtable[s·codewords + codes[s]]
  * accumulated in subspace order (double) — the innermost loop of the
  * PQ scan, `subspaces` array lookups and adds per candidate. */
case class PqAdcExpr(left: Expression, right: Expression,
    codewords: Int) extends BinaryExpression {
  require(codewords > 0, "pq_adc: codewords must be positive")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int> codes, array<double> dtable)")
    }
  override def nullSafeEval(codes: Any, dt: Any): Any =
    GraftFunctions.pqAdc(codes.asInstanceOf[ArrayData],
      dt.asInstanceOf[ArrayData], codewords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, d) =>
      s"graft.functions.GraftFunctions.pqAdc($c, $d, $codewords)")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdcExpr = copy(left = newLeft, right = newRight)
  override def prettyName: String = "pq_adc"
}

/** 60-bit SimHash of a space-tokenized text (majority vote over
  * md5-derived token hashes; see graft.pipeline.Dedup.simhash64). */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $other")
  }
  override def nullSafeEval(v: Any): Any =
    graft.pipeline.Dedup.simhash64(v.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.Dedup.simhash64($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}
