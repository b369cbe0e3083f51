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

  /** Codegen 60-bit SimHash (see SimHash64Expr). */
  def simhash64(c: Column): Column = col(SimHash64Expr(expr(c)))

  /** Register the functions for SQL use on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nt_escape", es => NtEscapeExpr(es.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", es => SimHash64Expr(es.head), "scala_udf")
  }
}

/** Session extension injecting the engine's functions at build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("nt_escape"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[NtEscapeExpr].getName, "nt_escape"),
        (es: Seq[Expression]) => NtEscapeExpr(es.head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[SimHash64Expr].getName, "simhash64"),
        (es: Seq[Expression]) => SimHash64Expr(es.head)))
  }
}
