package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`). Brute-force cosine top-k is the exact baseline; the
 * scale path is sign-bit LSH bucketing (random-hyperplane style with a
 * deterministic projection), which turns the O(n·m) cross join into a
 * bucket-partitioned join.
 *
 * All vector math stays in Catalyst (`zip_with`/`aggregate` over array
 * columns — codegen'd), no UDF in the hot path.
 */
object Similarity {

  /** Dot product of two array<float|double> columns (double math). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm of an array column. */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /** Cosine similarity; 0 for zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val nn = norm(a) * norm(b)
    when(nn === 0, lit(0.0)).otherwise(d / nn)
  }

  /**
   * Exact top-k by cosine: probes × corpus (corpus side broadcast when
   * probes are the large side; here probes are few, so broadcast probes
   * and stream the corpus — one pass, no shuffle except the final
   * per-probe top-k aggregation).
   *
   * Norms are precomputed per SIDE before the pair join — `cosine(a,b)`
   * inline would recompute both norms once per PAIR (|P|x|C| times
   * instead of |P|+|C|), tripling the vector math in the hot loop.
   */
  def bruteForceTopK(probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val p = broadcast(probes.select(col("vec_id").as("probe_id"),
      col("embedding").as("pv"), norm(col("embedding")).as("pn")))
    val c = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("cv"), norm(col("embedding")).as("cn"))
    val scored = c.join(p, col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        when(col("pn") * col("cn") === 0, lit(0.0))
          .otherwise(dot(col("pv"), col("cv")) / (col("pn") * col("cn"))).as("cos"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /**
   * Sign-bit LSH bucket key: the sign pattern of the first `bits`
   * dimensions (a deterministic axis-aligned hyperplane family; on a
   * real deployment swap in seeded random projections — same plan shape).
   */
  def signBucket(emb: Column, bits: Int): Column =
    array_join(transform(slice(emb, 1, bits),
      v => when(v >= 0, lit("1")).otherwise(lit("0"))), "")

  /**
   * Bucketed ANN: join probes to candidates within the same sign bucket,
   * then exact cosine + per-probe top-k. Recall < 1 by design; the
   * bucket join shuffles on small keys instead of cross-joining.
   */
  def lshTopK(probes: DataFrame, corpus: DataFrame, k: Int, bits: Int = 8): DataFrame = {
    val p = probes.select(col("vec_id").as("probe_id"), col("embedding").as("pv"),
      norm(col("embedding")).as("pn"),
      signBucket(col("embedding"), bits).as("bucket"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("cv"),
      norm(col("embedding")).as("cn"),
      signBucket(col("embedding"), bits).as("bucket"))
    val scored = p.join(c, Seq("bucket"))
      .filter(col("probe_id") =!= col("cand_id"))
      .select(col("probe_id"), col("cand_id"),
        when(col("pn") * col("cn") === 0, lit(0.0))
          .otherwise(dot(col("pv"), col("cv")) / (col("pn") * col("cn"))).as("cos"))
    val w = Window.partitionBy(col("probe_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
