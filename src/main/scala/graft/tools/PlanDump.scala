// Scratch: run named queries (sweep map or graph_dist map) and dump the
// EXECUTED plan of every action they trigger — the per-round plans of
// the iterative loops included — via a QueryExecutionListener. Used to
// produce the plans/r08 before/after evidence.
// usage: runMain graft.tools.PlanDump <sfDir> <outDir> [dist:]<query>...
package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

object PlanDump {
  def main(args: Array[String]): Unit = {
    val (dir, outDir, names) = (args(0), args(1), args.drop(2).toSeq)
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.maxPlanStringLength", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    val sb = new StringBuilder
    val listener = new QueryExecutionListener {
      override def onSuccess(fn: String, qe: QueryExecution, ns: Long): Unit =
        sb.synchronized {
          sb.append(f"\n==== action: $fn (${ns / 1e6}%.0f ms) ====\n")
            .append(qe.executedPlan.toString.take(20000)).append("\n")
        }
      override def onFailure(fn: String, qe: QueryExecution, e: Exception): Unit = ()
    }
    s.listenerManager.register(listener)
    names.foreach { spec =>
      val (n, fn) =
        if (spec.startsWith("dist:"))
          (spec.drop(5), graft.SparkEntry.distGraphQueries(spec.drop(5)))
        else (spec, graft.SparkEntry.queries(spec))
      sb.synchronized(sb.clear())
      // NOTE: for the iterative operators the loop RUNS during query
      // construction (the rounds are driver-side actions) — the
      // listener captures exactly those per-round executed plans
      val df = fn(s, dir)
      val head = new StringBuilder
      head.append(s"== $spec: final-plan explain(formatted) ==\n")
      head.append(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
      df.write.format("noop").mode("overwrite").save()
      Thread.sleep(3000) // listener bus drains asynchronously
      val body = sb.synchronized(sb.toString)
      Files.writeString(Paths.get(s"$outDir/${spec.replace(':', '_')}.txt"),
        head.toString + "\n\n== executed plans of every action (loop rounds included) ==\n" + body)
      println(s"PLANDUMP wrote $spec")
    }
    s.stop()
  }
}
