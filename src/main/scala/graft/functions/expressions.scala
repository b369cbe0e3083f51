package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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

/** 60-bit SimHash of a space-tokenized text (majority vote over
  * md5-derived token hashes; see graft.pipeline.Dedup.simhash64). */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    graft.pipeline.Dedup.simhash64(v.toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.pipeline.Dedup.simhash64($c.toString())")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}
