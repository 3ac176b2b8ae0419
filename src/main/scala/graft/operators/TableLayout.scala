package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical layout for the serving/core tables — the Spark analogue of
  * the reference's BigQuery layout decisions (SURVEY §1.3):
  *
  *   - time-series tables: day-partitioned on the load timestamp +
  *     sorted by key within partitions (terraform/bigquery.tf:50-57
  *     day partitioning + game_id clustering)
  *   - serving tables: integer range-bucketed on the key
  *     (game_profile.sqlx:15 `RANGE_BUCKET(game_id,
  *     GENERATE_ARRAY(0, 1000000, 1000))`) so a point lookup prunes
  *     to one directory and min/max stats skip within it
  *
  * Partition pruning is asserted at the plan level in TableLayoutSpec
  * — the measured effect in the reference is 273.5 MB → 1.9 MB per
  * lookup (game_profile.sqlx:9-16); the mechanism here is identical:
  * the predicate must appear under PartitionFilters, not pushed data
  * filters.
  */
object TableLayout {

  /** Day-partitioned append layout for time-series tables. */
  def writeTimeSeries(df: DataFrame, path: String, tsCol: String,
      keyCol: String): Unit =
    df.withColumn("load_date", to_date(col(tsCol)))
      .repartition(col("load_date"))
      .sortWithinPartitions(keyCol)
      .write.partitionBy("load_date").mode("append").parquet(path)

  /** Range-bucketed layout for key-addressed serving tables. */
  def writeRangeBucketed(df: DataFrame, path: String, keyCol: String,
      bucketSize: Long): Unit =
    df.withColumn("key_bucket", floor(col(keyCol) / bucketSize))
      .repartition(col("key_bucket"))
      .sortWithinPartitions(keyCol)
      .write.partitionBy("key_bucket").mode("overwrite").parquet(path)

  /** Point lookup that hits exactly one partition: the bucket
    * predicate prunes directories, the key predicate rides the
    * sorted-within-partition min/max stats.
    */
  def pointLookup(spark: SparkSession, path: String, keyCol: String,
      key: Long, bucketSize: Long): DataFrame =
    spark.read.parquet(path)
      .filter(col("key_bucket") === key / bucketSize && col(keyCol) === key)

  /** Day-range scan over a time-series table (partition-pruned). */
  def dayRange(spark: SparkSession, path: String, from: String,
      to: String): DataFrame =
    spark.read.parquet(path)
      .filter(col("load_date") >= lit(from) && col("load_date") <= lit(to))
}
