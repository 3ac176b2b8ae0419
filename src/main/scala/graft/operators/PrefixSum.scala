package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running sum (prefix scan) — the scale-safe form of
  * `sum(x) OVER (PARTITION BY g ORDER BY o ROWS UNBOUNDED PRECEDING)`.
  *
  * Spark's window computes each PARTITION BY group in ONE task, so a
  * skewed group (English in a 100 TB corpus, one tenant in a billing
  * feed) serializes onto a single core no matter how many executors
  * the cluster has. The classic two-pass scan fixes that:
  *
  *   1. range-repartition by (group, order) — every partition holds a
  *      contiguous, BALANCED slice of the global order (the range
  *      partitioner splits big groups across many partitions);
  *   2. local scan: the same window, but keyed by (slice, group) —
  *      each window group is now one balanced range slice, never a
  *      whole data group;
  *   3. slice offsets: per-(group, slice) totals — a map-side-combined
  *      aggregate, rows = slices × groups, not data — cumulated over
  *      slice order and BROADCAST back; final value = local + offset.
  *
  * Wall-clock is two balanced shuffles of the data plus one tiny
  * aggregate, independent of group skew. The order column must be
  * unique within each group (the same precondition that makes the
  * single-window cumsum well defined; ties across a slice boundary
  * would otherwise split nondeterministically).
  *
  * Reference shape: the per-language greedy packing manifest
  * (t12_sequence_packing) — identical semantics, gated equal by the
  * same oracle.
  */
object PrefixSum {

  /** Running sum of `valueCol` ordered by `orderCol` within each
    * `partCols` group, as new column `outCol`. `slices` bounds the
    * scan parallelism (default: the session's shuffle partitions).
    */
  def runningSum(df: DataFrame, partCols: Seq[String], orderCol: String,
      valueCol: String, outCol: String, slices: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (slices > 0) slices
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val rangeCols = (partCols :+ orderCol).map(col)
    // _slice is stable AFTER the range exchange: equal (group, order)
    // keys land in one partition, and partition ids follow the range
    // order, so slice k holds keys strictly below slice k+1
    val sliced = df.repartitionByRange(n, rangeCols: _*)
      .withColumn("_slice", spark_partition_id())
    val localW = Window.partitionBy(("_slice" +: partCols).map(col): _*)
      .orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = sliced.withColumn("_local", sum(col(valueCol)).over(localW))
    // rows = slices × groups — broadcastable at any data volume; the
    // offset window's groups are per data-group over ≤`n` tiny rows
    val offsetW = Window.partitionBy(partCols.map(col): _*)
      .orderBy("_slice")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = sliced.groupBy(("_slice" +: partCols).map(col): _*)
      .agg(sum(col(valueCol)).as("_slice_total"))
      .withColumn("_offset", sum(col("_slice_total")).over(offsetW))
      .drop("_slice_total")
    local
      .join(broadcast(offsets), "_slice" +: partCols, "left")
      .withColumn(outCol, col("_local") + coalesce(col("_offset"), lit(0)))
      .drop("_slice", "_local", "_offset")
  }
}
