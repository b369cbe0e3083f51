package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Explicit skew control for popular-entity joins (north rule: "salted
 * repartition joins for skewed popular-entity linking").
 *
 * The reference never handles skew (SURVEY §4 — Pig's skewed join is
 * unused); at 10^12-file scale a handful of ubiquitous surface forms
 * ("the shuffle problem": one key = 30% of mentions) would pin one
 * reducer. Two tools:
 *
 *  1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`) —
 *     works for sort-merge joins, but not when the hot key comes out of
 *     a `groupBy`.
 *  2. Explicit salting (this object): the big side gets a deterministic
 *     salt in [0, S); the small side is replicated ×S; the join key
 *     becomes (key, salt), spreading one hot key over S tasks. Results
 *     are exactly identical to the unsalted join.
 */
object Skew {

  /**
   * Salted equi-join of a skewed `big` relation with a `small` relation
   * on `key`. `saltSource` must be a big-side column with per-row
   * spread (e.g. a row id); the salt is `pmod(xxhash64(saltSource), S)`
   * — deterministic, so re-runs partition identically (resumability).
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int,
      saltSource: Column, joinType: String = "inner"): DataFrame = {
    val bigS = big.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
    val smallS = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /**
   * SELECTIVE salting: only rows whose key is in `hotKeys` (from the
   * Misra-Gries detector, Aggregators.MisraGries / q66) get salted —
   * the cold majority joins plainly, so the small side is replicated
   * xS only for the handful of hot keys instead of for every key.
   * This is the composition the 10^12-file pipeline runs: one cheap
   * sketch pass finds the ubiquitous surface forms, and exactly those
   * spread over S tasks. Results identical to the unsalted join
   * (tested).
   */
  def saltedJoinHotKeys(big: DataFrame, small: DataFrame, key: String,
      hotKeys: Seq[String], salts: Int, saltSource: Column,
      joinType: String = "inner"): DataFrame = {
    if (hotKeys.isEmpty) return big.join(small, Seq(key), joinType)
    // null-safe: a NULL key is never hot but MUST reach the cold branch
    // (plain `isin` evaluates NULL there, so `!isHot` would drop the
    // row from BOTH branches and break outer-join identity)
    val isHot = coalesce(col(key).isin(hotKeys.map(k => k: Any): _*), lit(false))
    val cold = big.filter(!isHot).join(small.filter(!isHot), Seq(key), joinType)
    val hot = saltedJoin(big.filter(isHot), small.filter(isHot), key, salts,
      saltSource, joinType)
    // align column order (join key position differs per branch input)
    cold.unionByName(hot)
  }

  /**
   * Skew-safe two-phase count: pre-aggregate on (key, salt) so no single
   * reduce task owns a hot key's full count, then sum partials. Result
   * is identical to `groupBy(key).count()`; the extra phase matters once
   * per-key counts exceed what one task's partial-agg hashmap absorbs.
   */
  def saltedCount(df: DataFrame, key: String, salts: Int, saltSource: Column): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))
}
