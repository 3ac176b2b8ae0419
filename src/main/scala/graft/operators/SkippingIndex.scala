package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-skipping secondary index — the stats-manifest discipline of a
  * lakehouse table format, as a stored table: one row per data FILE
  * with min/max (and row count) for the indexed columns, maintained
  * beside the data (`<path>__idx`). A reader consults the index with
  * its predicate's interval and plans a scan over ONLY the files whose
  * [min, max] box intersects it.
  *
  * Why this beats parquet footers alone at 100 TB: footer stats still
  * cost one open+read per file (a million small reads on a million
  * files, per query); the index is ONE tiny columnar read that prunes
  * BEFORE any data-file IO, which is exactly what Delta/Iceberg keep
  * in their manifests. Composes with [[TableLayout.writeZOrdered]]:
  * z-ordering is what makes the per-file boxes narrow in every indexed
  * column, so the index actually skips (on an unsorted layout every
  * box spans the full range and nothing prunes).
  *
  * The pruned file list passes through the driver — that is manifest
  * PLANNING metadata (one short string per kept file, the same
  * driver-side cost every lakehouse reader pays), never data rows.
  *
  * Maintenance contract: rebuild after rewrites ([[TableStore.compact]],
  * `applyDeletes`, a z-order re-cluster) — the same moment a lakehouse
  * would emit a new manifest. [[prunedScan]] fails loudly if a data
  * file is missing from the index (stale index = wrong-results risk,
  * surfaced as an error instead).
  */
object SkippingIndex {

  private def idxPath(path: String): String = path + "__idx"

  /** Scan the table once and store per-file min/max/count for `cols`.
    * One map-side-combinable aggregate keyed by file name; the index
    * is one row per FILE (bounded by file count, never by row count).
    */
  def build(spark: SparkSession, path: String, cols: Seq[String]): Unit = {
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"))
    } :+ count(lit(1)).as("n_rows")
    val idx = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
    TableStore.overwrite(idx, idxPath(path))
  }

  /** Plan a scan over only the files whose [min, max] box intersects
    * the interval predicates `ranges: col -> (lo, hi)` (inclusive).
    * Interval intersection is exactly the footer-stats test, run
    * against the stored index instead of a million footers. The
    * returned DataFrame still carries no row filter — callers apply
    * their real predicate on top (the index only bounds IO).
    */
  def prunedScan(spark: SparkSession, path: String,
      ranges: Map[String, (Any, Any)]): DataFrame = {
    val idx = TableStore.read(spark, idxPath(path))
    val keep = ranges.foldLeft(idx) { case (d, (c, (lo, hi))) =>
      d.filter(col(s"${c}_max") >= lit(lo) && col(s"${c}_min") <= lit(hi))
    }
    // planning metadata through the driver: one URI per KEPT file
    val files = keep.select("file").collect().map(_.getString(0))
    val total = spark.read.parquet(path).inputFiles.length
    require(idxCount(spark, path) == total,
      s"skipping index is stale: indexes ${idxCount(spark, path)} files, " +
        s"table has $total — rebuild with SkippingIndex.build")
    if (files.isEmpty)
      // no file can match: an empty frame with the table's schema
      spark.read.parquet(path).limit(0)
    else spark.read.parquet(files: _*)
  }

  /** Number of files the index covers (spec surface + staleness guard). */
  def idxCount(spark: SparkSession, path: String): Long =
    TableStore.read(spark, idxPath(path)).count()

  /** The kept-file count a given range set would scan (spec surface —
    * the measured pruning effectiveness).
    */
  def plannedFiles(spark: SparkSession, path: String,
      ranges: Map[String, (Any, Any)]): Long = {
    val idx = TableStore.read(spark, idxPath(path))
    ranges.foldLeft(idx) { case (d, (c, (lo, hi))) =>
      d.filter(col(s"${c}_max") >= lit(lo) && col(s"${c}_min") <= lit(hi))
    }.count()
  }
}
