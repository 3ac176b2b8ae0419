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

  /** Scan the table once and store per-file min/max/nullCount for
    * `cols`. One map-side-combinable aggregate keyed by file name; the
    * index is one row per FILE (bounded by file count, never by row
    * count). Null counts are what let a reader prune IS NULL /
    * IS NOT NULL (Delta's nullCount stat): a file with zero nulls can
    * never match IS NULL, an all-null file never matches IS NOT NULL.
    */
  def build(spark: SparkSession, path: String, cols: Seq[String]): Unit = {
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"))
    } :+ count(lit(1)).as("n_rows")
    // n_total_files rides every row: EMPTY data files (a hash
    // repartition with fewer keys than partitions writes some) have no
    // rows to index — and can never match a predicate — but the
    // staleness guard must still account for them
    val total = spark.read.parquet(path).inputFiles.length
    val idx = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("n_total_files", lit(total))
    TableStore.overwrite(idx, idxPath(path))
  }

  /** Staleness guard shared by both index kinds: the index is valid
    * iff the table's file count equals the build-time count AND every
    * indexed file still exists (basename compare — rewrites mint new
    * UUID part names, so any rewrite flips at least one check). Files
    * with no index row are the build-time EMPTY files: nothing to
    * match, safely never scanned.
    */
  private def requireFresh(spark: SparkSession, path: String,
      idx: DataFrame, what: String): Unit = {
    val current = spark.read.parquet(path).inputFiles
      .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    val rows = idx.select("file", "n_total_files").collect()
    val indexed = rows.map { r =>
      val f = r.getString(0); f.substring(f.lastIndexOf('/') + 1)
    }.toSet
    val storedTotal = rows.headOption.map(_.getInt(1)).getOrElse(0)
    require(storedTotal == current.size && indexed.subsetOf(current),
      s"$what is stale: built over $storedTotal files " +
        s"(${indexed.size} non-empty), table now has ${current.size} " +
        s"(${indexed.diff(current).size} indexed files gone) — rebuild")
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
    requireFresh(spark, path, idx, "skipping index")
    val keep = ranges.foldLeft(idx) { case (d, (c, (lo, hi))) =>
      d.filter(col(s"${c}_max") >= lit(lo) && col(s"${c}_min") <= lit(hi))
    }
    // planning metadata through the driver: one URI per KEPT file
    val files = keep.select("file").collect().map(_.getString(0))
    if (files.isEmpty)
      // no file can match: an empty frame with the table's schema
      spark.read.parquet(path).limit(0)
    else spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Number of files the index covers (spec surface + staleness guard). */
  def idxCount(spark: SparkSession, path: String): Long =
    TableStore.read(spark, idxPath(path)).count()

  /** Plan an IVM BASE PROBE over only the files whose key boxes
    * intersect the delta's key range — the "lakehouse accelerates the
    * base probes with data skipping on the delta's key range" story
    * (Ivm's class doc), composed: the delta is batch-sized, so its
    * per-key [min, max] is one tiny aggregate through the driver
    * (planning metadata, like the file list itself), and the returned
    * frame is safe wherever the consumer only needs base rows whose
    * keys occur in the delta — `joinViewDelta`'s single-sided probes
    * (inner joins on the keys) and `applyDeltaWithExtrema`'s rescan
    * (rescanned groups' keys are delta keys, and every row of a kept
    * group lies in a kept file because point keys intersect any box
    * that contains them). A delta with only NULL keys (or no rows)
    * probes nothing — NULL keys never match an inner join and a
    * group-key NULL still folds into the aggregate path, not the
    * rescan probe of a range scan; callers with NULL group keys keep
    * the full-scan path.
    */
  def probeForDelta(spark: SparkSession, path: String, delta: DataFrame,
      keyCols: Seq[String]): DataFrame = {
    val aggCols = keyCols.zipWithIndex.flatMap { case (c, i) =>
      Seq(min(col(c)).as(s"lo$i"), max(col(c)).as(s"hi$i"))
    }
    val bounds = delta.agg(aggCols.head, aggCols.tail: _*).head()
    val ranges = keyCols.indices.flatMap { i =>
      val (lo, hi) = (bounds.get(bounds.fieldIndex(s"lo$i")),
        bounds.get(bounds.fieldIndex(s"hi$i")))
      if (lo == null || hi == null) None
      else Some(keyCols(i) -> ((lo.asInstanceOf[Any], hi.asInstanceOf[Any])))
    }.toMap
    if (ranges.size < keyCols.size)
      // schema-only empty frame (a limit(0) over the scan would still
      // report the table's files as planned inputs)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        spark.read.parquet(path).schema)
    else prunedScan(spark, path, ranges)
  }

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

  // ------------------------------------------------ bloom file index

  private def bloomPath(path: String, c: String): String =
    s"${path}__bloom_$c"

  /** Per-file Bloom index for POINT lookups on a column the layout is
    * NOT clustered by — the case min/max skipping is blind to: when
    * every file spans the full value range, interval intersection
    * keeps everything, but a Bloom filter still rules a key out of
    * most files. This is Delta's Bloom file index / Parquet's
    * bloom_filter_enabled, kept in the manifest table so the probe is
    * one tiny read, not a footer open per file.
    *
    * Representation: the SET of hit bit positions (k=`hashes` probes
    * per value, `bits`-wide table), stored as a sorted int array per
    * file — the same pruning decision as a packed bitset, chosen here
    * because it stays queryable with plain array predicates (the
    * production form is the packed bitset as one binary cell; the
    * membership test and false-positive math are identical). Build is
    * one narrow explode + one map-side-combinable collect_set keyed by
    * file. (bits, hashes) ride in the index rows so probes can never
    * run with mismatched parameters.
    *
    * Guarantee: false positives only — a kept file may lack the key
    * (read and filtered anyway), but a skipped file provably cannot
    * contain it, so pruned results are exact. Same staleness contract
    * as [[prunedScan]]: rebuilt after rewrites, fails loudly if the
    * file set drifted.
    */
  def buildBloom(spark: SparkSession, path: String, c: String,
      bits: Int = 1 << 16, hashes: Int = 4): Unit = {
    val total = spark.read.parquet(path).inputFiles.length
    val probes = (0 until hashes).map(j =>
      pmod(xxhash64(col(c), lit(j)), lit(bits)).cast("int"))
    val idx = spark.read.parquet(path)
      .select(input_file_name().as("file"), explode(array(probes: _*)).as("p"))
      .groupBy("file")
      .agg(sort_array(collect_set(col("p"))).as("bits_set"))
      .withColumn("bits", lit(bits)).withColumn("hashes", lit(hashes))
      .withColumn("n_total_files", lit(total))
    TableStore.overwrite(idx, bloomPath(path, c))
  }

  /** Scan only the files whose Bloom filter may contain `value` in
    * column `c`. Callers still apply the real equality predicate —
    * the index only bounds IO (false positives read-and-filter away).
    */
  def bloomScan(spark: SparkSession, path: String, c: String,
      value: Any): DataFrame = {
    val idx = TableStore.read(spark, bloomPath(path, c))
    requireFresh(spark, path, idx, s"bloom index on $c")
    val params = idx.select("bits", "hashes").head()
    val (bits, hashes) = (params.getInt(0), params.getInt(1))
    val keep = (0 until hashes).foldLeft(idx) { (d, j) =>
      d.filter(array_contains(col("bits_set"),
        pmod(xxhash64(lit(value), lit(j)), lit(bits)).cast("int")))
    }
    val files = keep.select("file").collect().map(_.getString(0))
    if (files.isEmpty) spark.read.parquet(path).limit(0)
    else spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Kept-file count for a bloom probe (spec surface). */
  def bloomPlannedFiles(spark: SparkSession, path: String, c: String,
      value: Any): Long = {
    val idx = TableStore.read(spark, bloomPath(path, c))
    val params = idx.select("bits", "hashes").head()
    (0 until params.getInt(1)).foldLeft(idx) { (d, j) =>
      d.filter(array_contains(col("bits_set"),
        pmod(xxhash64(lit(value), lit(j)), lit(params.getInt(0))).cast("int")))
    }.count()
  }
}
