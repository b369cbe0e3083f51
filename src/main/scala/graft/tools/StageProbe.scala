// Scratch: per-stage task-time distribution of the bench pipeline.
package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

object StageProbe {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val n = if (args.length > 1) args(1).toInt else 32
    val s = SparkSession.builder().master(s"local[$n]")
      .config("spark.sql.shuffle.partitions", n)
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val taskTimes = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    val gcTimes = mutable.Map.empty[Int, Long]
    s.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
        taskTimes.getOrElseUpdate(e.stageId, mutable.ArrayBuffer.empty) += e.taskInfo.duration
        gcTimes(e.stageId) = gcTimes.getOrElse(e.stageId, 0L) + e.taskMetrics.jvmGCTime
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
        val si = e.stageInfo
        val ts = taskTimes.getOrElse(si.stageId, mutable.ArrayBuffer.empty).sorted
        if (ts.nonEmpty) {
          val wall = si.completionTime.get - si.submissionTime.get
          println(f"STAGE ${si.stageId}%3d wall ${wall / 1000.0}%7.2f s tasks ${ts.length}%4d " +
            f"min ${ts.head / 1000.0}%6.2f med ${ts(ts.length / 2) / 1000.0}%6.2f max ${ts.last / 1000.0}%6.2f " +
            f"sum ${ts.sum / 1000.0}%8.1f gc ${gcTimes.getOrElse(si.stageId, 0L) / 1000.0}%5.1f  ${si.name.take(60)}")
        }
      }
    })
    // warm
    graft.Bench.extractTriples(s, corpusDir)
    println("=== WARM RUN ===")
    val t0 = System.nanoTime()
    graft.Bench.extractTriples(s, corpusDir)
    println(f"TOTAL ${(System.nanoTime() - t0) / 1e9}%.2f s")
    s.stop()
  }
}
