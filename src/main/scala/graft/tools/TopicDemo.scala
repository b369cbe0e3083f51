// Scratch: drive the TopicCorpus pipeline end-to-end from the CLI.
package graft.tools

import graft.pipeline.{NerCorpus, TopicCorpus}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object TopicDemo {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // derive a topic graph + grounding + abstracts from the documents table
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val edges = docs.select(split(col("text"), " ").as("t"))
      .select(element_at(col("t"), 1).as("src"), element_at(col("t"), 2).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    val grounding = docs.select(element_at(split(col("text"), " "), 1).as("topic"),
      concat(lit("e"), col("doc_id") % 50).as("entity")).distinct()
    val abstracts = docs.limit(100).select(concat(lit("e"), col("doc_id") % 50).as("subject"),
      col("text").as("object"), lit("en").as("lang")).distinct()
    val roots = Seq("the").toDF("root")
    val counts = TopicCorpus.run(spark, edges, grounding, abstracts, roots, out)
    println(s"TOPIC_DEMO $counts")
    spark.stop()
  }
}
