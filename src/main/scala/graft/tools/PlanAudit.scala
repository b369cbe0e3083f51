// Scratch: red-flag scan over executed plans of the bench queries.
package graft.tools
import org.apache.spark.sql.SparkSession
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(s, d)
        df.collect()
        val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
        val flags = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "singlePartition" -> p.contains("SinglePartition"),
          "scalaUDF" -> p.contains("ScalaUDF"),
          "bnlj-nonbcast" -> false).filter(_._2).map(_._1)
        val nEx = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
        println(f"AUDIT $n%-28s exchanges=$nEx flags=${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"AUDIT $n ERROR ${e.getMessage.take(80)}") }
    }
    s.stop()
  }
}
