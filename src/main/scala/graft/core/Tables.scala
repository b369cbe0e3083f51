package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Table access over a scale-factor directory of parquet tables.
 *
 * On a real deployment these reads become
 * `spark.read.format("iceberg").load(catalog.table)` with identical
 * downstream plans; parquet-on-dir keeps the same DSv2 pushdown
 * behavior (PushedFilters / ReadSchema visible in `.explain`).
 */
object Tables {
  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def events(s: SparkSession, d: String): DataFrame = t(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")

  /**
   * The `documents` corpus viewed as the `code_files` input table of the
   * north rule: (repo, path, commit, lang, content). Deterministic pure
   * projection — no shuffle, fully pushdown-friendly (only the columns
   * referenced downstream are read from parquet).
   */
  def codeFiles(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("source").as("repo"),
      concat(lit("doc/"), col("doc_id")).as("path"),
      md5(col("text")).as("commit"),
      col("lang"),
      col("text").as("content"),
      col("doc_id"))
}
