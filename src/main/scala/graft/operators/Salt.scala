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
}
