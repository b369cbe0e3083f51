package graft.pipeline

import graft.io.NTriples
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Final (subj, pred, obj) triple materialization — the NTriples storer
 * stage (UriUriNTriplesStorer / UriStringLiteralNTriplesStorer) plus the
 * partitioned write of the north rule.
 *
 * At scale the write is `partitionBy(lang, repo_prefix)` so downstream
 * consumers get partition pruning on both; on a cluster this is an
 * Iceberg `writeTo(...).append()` with identical partition spec.
 */
object TripleMaterialize {

  /** (s,o) rows -> NT lines; null rows skipped (storer :40-50). */
  def uriUriLines(df: DataFrame, pred: String,
      subjNs: String = "", objNs: String = ""): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.na.drop(Seq("subj", "obj"))
      .select(col("subj").cast("string"), col("obj").cast("string"))
      .as[(String, String)]
      .map { case (s, o) => NTriples.formatUriUri(s, o, pred, subjNs, objNs) }
      .toDF("line")
  }

  /** (s, lit, lang) rows -> NT literal lines. */
  def uriLiteralLines(df: DataFrame, pred: String, subjNs: String = ""): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.na.drop(Seq("subj", "obj"))
      .select(col("subj").cast("string"), col("obj").cast("string"),
        coalesce(col("lang"), lit("")).cast("string"))
      .as[(String, String, String)]
      .map { case (s, o, l) => NTriples.formatUriLiteral(s, o, l, pred, subjNs) }
      .toDF("line")
  }

  /** Partitioned triple write (parquet here; Iceberg on a cluster). */
  def write(triples: DataFrame, outDir: String): Unit =
    triples
      .withColumn("repo_prefix", substring(col("subj"), 1, 2))
      .write.mode("overwrite")
      .partitionBy("lang", "repo_prefix")
      .parquet(outDir)
}
