// Scratch: HOF (aggregate+zip_with) vs codegen FloatDotExpr dot product.
package graft.tools

import graft.functions.GraftFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object VecDotProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val n = 2000000L
    val base = s.range(n).select(col("id"),
      transform(sequence(lit(1), lit(64)),
        i => (i * 31 + col("id") % 97).cast("float")).as("a"),
      transform(sequence(lit(1), lit(64)),
        i => (i * 17 + col("id") % 89).cast("float")).as("b"))
      .persist()
    base.count()
    def time(tag: String)(f: => Any): Unit = {
      // warm + 2 timed passes
      f
      (1 to 2).foreach { k =>
        val t0 = System.nanoTime()
        val r = f
        println(f"$tag pass$k: ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
      }
    }
    val hofDot = aggregate(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)
    val hofNorm = sqrt(aggregate(col("a"), lit(0.0),
      (acc, v) => acc + v.cast("double") * v.cast("double")))
    time("hof ")(base.select(sum(hofDot).as("x"))
      .collect().head.getDouble(0))
    time("expr")(base.select(sum(GraftFunctions.vec_dot(col("a"), col("b"))).as("x"))
      .collect().head.getDouble(0))
    time("hofnorm ")(base.select(sum(hofNorm).as("x"))
      .collect().head.getDouble(0))
    time("exprnorm")(base.select(sum(GraftFunctions.vec_norm(col("a"))).as("x"))
      .collect().head.getDouble(0))
    s.stop()
  }
}
