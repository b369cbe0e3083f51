package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal joins. Spark has no built-in AS-OF join; this is the
 * compose-existing-ops realization (custom-operator preference (a)):
 * union the two sides, sort within key by (time, side) so a build row
 * at time t sorts before a probe row at the same t (<= semantics, the
 * same tie rule as DuckDB's ASOF JOIN which oracles it), and carry the
 * latest build payload forward with a running `last(ignoreNulls)`
 * window. ONE shuffle on the key, no per-row range probe, no
 * interval-explosion — the formulation that survives a 100x scale-up
 * (a naive theta-join `b.ts <= p.ts` is O(|B||P|) per key).
 */
object Temporal {

  /**
   * For each `probe` row, attach the most recent `build` row with
   * `build.time <= probe.time` for the same `key` (null columns when
   * none exists — left-join semantics). `build` must have exactly
   * (key, time, payload...) columns; payload columns come back
   * prefixed. Ties inside `build` at the same (key, time) should be
   * pre-aggregated away by the caller for determinism.
   */
  def asofJoin(probe: DataFrame, build: DataFrame, key: String = "user_id",
      time: String = "ts", prefix: String = "asof_"): DataFrame = {
    val bVals = build.columns.filterNot(c => c == key || c == time).toSeq
    val payload = struct(
      (col(time).as(s"$prefix$time") +: bVals.map(c => col(c).as(s"$prefix$c"))): _*)
    val bPayloaded = build.select(col(key), col(time), lit(0).as("_side"), payload.as("_p"))
    val payloadType = bPayloaded.schema("_p").dataType
    val others = probe.columns.filterNot(c => c == key || c == time).toSeq
    val bAll = bPayloaded.select(
      Seq(col(key), col(time), col("_side"), col("_p")) ++
        others.map(c => lit(null).cast(probe.schema(c).dataType).as(c)): _*)
    val pAll = probe.select(
      Seq(col(key), col(time), lit(1).as("_side"),
        lit(null).cast(payloadType).as("_p")) ++ others.map(col): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time).asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bAll.unionByName(pAll)
      .withColumn("_asof", last(col("_p"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(Seq(col(key), col(time)) ++ others.map(col) :+ expr("_asof.*"): _*)
  }

  /**
   * Range (interval-containment) join: probe rows matched to every
   * interval of the same key with `start <= time <= end`. Realized as a
   * BUCKETED equi-join — intervals explode into the fixed-width time
   * buckets they span, the probe carries its single bucket, and the
   * join runs on (key, bucket) with an exact containment post-filter.
   * Turns an unexecutable-at-scale theta join (O(|P||I|) per key) into
   * one shuffle whose fan-out is interval_width / bucket_width.
   * Non-key/time column names must be disjoint between the two sides.
   */
  def rangeJoin(probe: DataFrame, intervals: DataFrame, key: String = "user_id",
      time: String = "ts", start: String = "start_ts", end: String = "end_ts",
      bucketSeconds: Long = 1800L): DataFrame = {
    val pb = probe.withColumn("_bkt",
      floor(unix_timestamp(col(time)) / bucketSeconds))
    val ib = intervals
      .withColumn("_bkt", explode(sequence(
        floor(unix_timestamp(col(start)) / bucketSeconds),
        floor(unix_timestamp(col(end)) / bucketSeconds))))
    pb.join(ib, Seq(key, "_bkt"))
      .filter(col(time) >= col(start) && col(time) <= col(end))
      .drop("_bkt")
  }
}
