package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-key aggregations (SURVEY §2 "Spill-aware
  * … skewed keys → salting or AQE skew-join").
  *
  * A hot grouping key concentrates its rows in one reducer; salting
  * splits each key into `buckets` sub-keys for the first (map-side
  * combinable) aggregation, then re-aggregates the partials without a
  * skewed shuffle — stage 2's cardinality is keys × buckets, which is
  * tiny regardless of row skew.
  *
  * The salt must be deterministic per row (not `rand()`): re-executed
  * tasks must salt identically or retries double-count. Here it is a
  * hash of a caller-supplied unique row id.
  *
  * For joins, prefer AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default); salting an
  * aggregate like this is for when the *partial aggregate itself*
  * skews.
  */
object Salt {

  /** Salted two-stage sum/count aggregation.
    *
    * @param rowId   any per-row unique column (drives the salt)
    * @param buckets sub-keys per grouping key
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], rowId: Column,
      valueCol: Column, buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(rowId), lit(buckets)))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__n"), sum(valueCol).as("__s"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__n")).as("n"), sum(col("__s")).as("total"))
  }

  /** Salted join for a skewed big side: each big-side row gets a
    * deterministic salt in [0, buckets); the small side is replicated
    * `buckets` times; the join runs on (key, salt), so one hot key's
    * rows spread across `buckets` reducers instead of one. Result is
    * row-identical to the plain join (every big row still meets every
    * matching small row exactly once — at the one salt it carries).
    *
    * This is the manual form of what AQE skew-join does at runtime;
    * keep it for engines/paths where AQE cannot see the skew (e.g.
    * skew introduced by an upstream explode in the same stage).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      rowId: Column, buckets: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(rowId), lit(buckets.toLong)))
    val rep = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedBig.join(rep, Seq(key, "__salt")).drop("__salt")
  }

  /** Session confs under which AQE's runtime skew-join splitter can
    * SEE skew at test scale: the detection threshold scales from the
    * 256 MB production default down to `thresholdBytes`, the advisory
    * split target to half of it. Broadcast is disabled because the
    * demo's two sides are both facts — at production scale neither
    * fits a broadcast, so SMJ is the honest plan to protect. Factor 2
    * (default 5) because local test partitions are few and uniform.
    */
  def aqeSkewConfs(thresholdBytes: Long): Map[String, String] = Map(
    // enough reduce partitions to isolate the hot key (a 4-partition
    // test session folds ~8 keys per partition and the hot one never
    // clears 2x the median — the bench session already runs 32)
    "spark.sql.shuffle.partitions" -> "32",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
      thresholdBytes.toString,
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
      (thresholdBytes / 2).toString,
    "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1024",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  /** Build and EXECUTE a frame under temporary session confs, restoring
    * the previous values afterwards; returns the materialized result
    * and the FINAL adaptive physical plan. AQE re-plans per stage at
    * runtime — a skew split exists only in the executed plan, never in
    * an explain-before-run — so the plan string is captured after the
    * eager localCheckpoint. The confs must wrap CONSTRUCTION too
    * (planning-time confs like the broadcast threshold are read when
    * the plan is built), hence the by-name `build`.
    */
  def runWithConfs(s: org.apache.spark.sql.SparkSession,
      confs: Map[String, String])(build: => DataFrame): (DataFrame, String) = {
    val old = confs.keys.map(k => k -> s.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      val df = build
      val mat = df.localCheckpoint(true)
      (mat, df.queryExecution.executedPlan.toString())
    } finally old.foreach { case (k, prev) =>
      prev.fold(s.conf.unset(k))(v => s.conf.set(k, v))
    }
  }
}
