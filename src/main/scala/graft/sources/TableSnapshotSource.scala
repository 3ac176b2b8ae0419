package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, TableScan}
import org.apache.spark.sql.types.StructType

import graft.operators.TableStore

/** `spark.read.format("graft-table")` — the lakehouse snapshot store
  * as a FIRST-CLASS Spark data source, built the way Delta Lake builds
  * its reader: a custom [[FileIndex]] behind a plain
  * [[HadoopFsRelation]] + ParquetFileFormat. Everything downstream of
  * the file listing is Spark's native vectorized parquet path —
  * whole-stage codegen, footer predicate pushdown, column pruning —
  * while the listing itself is snapshot-resolved and STATS-PRUNED:
  *
  *   - `versionAsOf` / `timestampAsOf` / `tag` / `branch` options pick
  *     the snapshot (same committed-marker discipline and loud
  *     failures as [[TableStore.readVersion]] / `readAsOf` /
  *     `readTag` / `readBranch`);
  *   - if a [[graft.operators.SkippingIndex]] was built over the
  *     snapshot's data directory, the query's OWN pushed-down data
  *     filters are evaluated against the per-file min/max boxes inside
  *     [[FileIndex.listFiles]], so `df.filter($"user_id" === 7)` plans
  *     a scan over only the intersecting files — no manual `ranges`
  *     map, no separate `prunedScan` call. The pruning is planning
  *     metadata on the driver (one short row per file), exactly the
  *     manifest read every lakehouse reader pays.
  *
  * Scale shape (the 100 TB question): snapshot resolution is
  * O(versions) marker stats; the file listing is ONE directory list of
  * the pinned version (never a recursive walk of the table's whole
  * history); stats pruning replaces a million parquet-footer opens
  * with one bounded driver-side index read. A stale or absent index
  * degrades to "keep every file" — never to wrong results — because
  * the real row-level predicate still runs inside the scan (the index
  * only bounds IO).
  *
  * Reference anchor: this is the read side of the reference's
  * warehouse tables (BigQuery resolves partitions + clustering blocks
  * from table metadata before scanning; `src/pipeline/fetch_games.py`
  * readers never list storage themselves). Re-expressed Spark-first as
  * the FileIndex seam, which is where Spark puts exactly this
  * decision.
  */
class TableSnapshotSource extends RelationProvider
    with CreatableRelationProvider with DataSourceRegister
    with org.apache.spark.sql.connector.catalog.TableProvider {

  override def shortName(): String = "graft-table"

  // ---- streaming half: `spark.readStream.format("graft-table")` ----
  // ONE source name covers snapshot reads, versioned writes, batch
  // CDC, and the commit-log stream (Delta's surface shape). The DSv2
  // Table advertises MICRO_BATCH_READ ONLY, so every BATCH read/write
  // falls back to the V1 relations below (loadV2Source/save return
  // None without BATCH_READ/BATCH_WRITE) while readStream resolves to
  // the changefeed machinery in [[Changefeed]] (the one read path for
  // snapshots + time travel + batch CDC + the commit-log stream).
  override def inferSchema(
      options: org.apache.spark.sql.util.CaseInsensitiveStringMap): StructType = {
    val path = options.get("path")
    // a WRITE to a not-yet-existing table probes the provider for a
    // schema before the V1 fallback decision — answer empty instead
    // of failing the probe (nothing batch-side ever reads this)
    if (path == null ||
        TableStore.committedVersions(SparkSession.active, path).isEmpty)
      new StructType()
    else Changefeed.schemaOf(path)
  }

  override def getTable(schema: StructType,
      partitioning: Array[org.apache.spark.sql.connector.expressions.Transform],
      properties: java.util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.Table =
    new ChangefeedTable(properties.get("path"), schema)

  /** `df.write.format("graft-table").mode(…).save(path)` — SaveMode
    * mapped onto the store's versioned-publish semantics (every write
    * is a NEW committed snapshot; readers never observe a partial
    * table):
    *   - Overwrite     = truncate-load: the new version IS `df`
    *   - Append        = an O(appended bytes) add-files commit
    *     ([[TableStore.publishVersionAppend]] — the parent's files are
    *     chained, never rewritten); concurrent appends serialize
    *     optimistically with a bounded retry. First write on an empty
    *     table is the initial snapshot.
    *   - ErrorIfExists = first publish only, loud otherwise
    *   - Ignore        = no-op when the table already has a version
    * The publish note records the mode for the history surface (s41).
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], raw: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      sys.error("graft-table: a table `path` is required"))
    val existing = TableStore.currentVersion(spark, path)
    // `zorderBy` = "a,b": cluster the write on the Morton value of the
    // two columns (optionally ",bits,nFiles") so the per-file boxes —
    // and therefore the skipping index `indexColumns` builds — are
    // narrow in BOTH dimensions. One extra row-preserving shuffle.
    val data = parameters.get("zorderby").map { spec =>
      spec.split(",").map(_.trim) match {
        case Array(a, b) => graft.operators.TableLayout.zOrdered(raw, a, b)
        case Array(a, b, bits) =>
          graft.operators.TableLayout.zOrdered(raw, a, b, bits.toInt)
        case Array(a, b, bits, nf) =>
          graft.operators.TableLayout.zOrdered(raw, a, b, bits.toInt, nf.toInt)
        case _ => sys.error(
          s"graft-table: zorderBy must be 'colA,colB[,bits[,nFiles]]', got $spec")
      }
    }.getOrElse(raw)
    val written: Option[Long] = mode match {
      case SaveMode.Overwrite =>
        Some(TableStore.publishVersion(spark, path, data,
          note = "mode=overwrite"))
      case SaveMode.Append =>
        if (existing.isEmpty)
          Some(TableStore.publishVersion(spark, path, data,
            note = "mode=append"))
        else {
          var tries = 0
          var v: Option[Long] = None
          while (v.isEmpty) {
            try v = Some(TableStore.publishVersionAppend(spark, path, data,
              note = "mode=append"))
            catch {
              case _: TableStore.ConcurrentVersionException if tries < 10 =>
                tries += 1
            }
          }
          v
        }
      case SaveMode.ErrorIfExists =>
        if (existing.isDefined) sys.error(
          s"graft-table: table at $path already exists (version ${existing.get})")
        Some(TableStore.publishVersion(spark, path, data, note = "mode=create"))
      case SaveMode.Ignore =>
        if (existing.isEmpty)
          Some(TableStore.publishVersion(spark, path, data, note = "mode=create"))
        else None
    }
    // `indexColumns` = "c1,c2": build the skipping index over the
    // version's OWN new dir right after commit — appends index only
    // their delta (the incremental-stats discipline: index cost is
    // O(appended bytes), and the read side prunes per dir)
    parameters.get("indexcolumns").filter(_ => written.isDefined)
      .foreach { cols =>
        val dir = TableStore.versionDataDirs(spark, path, written.get).last
        graft.operators.SkippingIndex.build(spark, dir,
          cols.split(",").map(_.trim).filter(_.nonEmpty).toIndexedSeq)
      }
    createRelation(sqlContext, parameters - "indexcolumns" - "zorderby")
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      sys.error("graft-table: a table `path` is required"))

    val pinned = Seq("versionasof", "timestampasof", "tag", "branch")
      .flatMap(k => parameters.get(k).map(k -> _))
    require(pinned.size <= 1,
      s"graft-table: versionAsOf / timestampAsOf / tag / branch are " +
        s"mutually exclusive, got ${pinned.map(_._1).mkString(", ")}")

    // `readChangeFeed=true` + `startingVersion` [+ `endingVersion`,
    // default latest] + `changeKeys` — Delta's batch CDF surface on
    // the same source name, delegating to the store's own
    // [[TableStore.changesBetween]] (keyed snapshot diff: insert /
    // delete / update_preimage / update_postimage rows). O(changes)
    // output; the computation reads exactly the two pinned snapshots.
    if (parameters.get("readchangefeed").exists(_.toBoolean)) {
      require(pinned.isEmpty,
        "graft-table: readChangeFeed and snapshot pins are mutually exclusive")
      val from = parameters.getOrElse("startingversion", sys.error(
        "graft-table: readChangeFeed requires startingVersion")).toLong
      val to = parameters.get("endingversion").map(_.toLong)
        .orElse(TableStore.currentVersion(spark, path))
        .getOrElse(sys.error(s"graft-table: no published version at $path"))
      val keys = parameters.getOrElse("changekeys", sys.error(
        "graft-table: readChangeFeed requires changeKeys " +
          "(comma-separated key columns)"))
        .split(",").map(_.trim).filter(_.nonEmpty).toIndexedSeq
      val changes = TableStore.changesBetween(spark, path, from, to, keys,
        allowEvolution = parameters.get("allowevolution").exists(_.toBoolean))
      return new BaseRelation with TableScan {
        override def sqlContext: SQLContext = spark.sqlContext
        override def schema: StructType = changes.schema
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
          changes.rdd
      }
    }

    // snapshot resolution — each arm reuses the store's own public
    // resolution rules so the source can never disagree with the API
    // reads (readVersion / readAsOf / readTag / readBranch). A
    // resolution is a DIRECTORY LIST: one dir for full-snapshot / CAS
    // commits, the whole base chain for append commits.
    val dataDirs: Seq[String] = pinned.headOption match {
      case None =>
        TableStore.snapshotDataDirs(spark, path, None)
      case Some(("versionasof", v)) =>
        TableStore.snapshotDataDirs(spark, path, Some(v.toLong))
      case Some(("timestampasof", ts)) =>
        val times = TableStore.commitTimes(spark, path)
        require(times.nonEmpty, s"graft-table: no published version at $path")
        val eligible = times.takeWhile(_._2 <= ts.toLong)
        require(eligible.nonEmpty,
          s"graft-table: $ts predates the first commit (${times.head._2}) at $path")
        TableStore.snapshotDataDirs(spark, path, Some(eligible.last._1))
      case Some(("tag", name)) =>
        val v = TableStore.tags(spark, path).getOrElse(name,
          sys.error(s"graft-table: no tag '$name' at $path"))
        TableStore.snapshotDataDirs(spark, path, Some(v))
      case Some(("branch", branchPath)) =>
        // the branch's current state: its own latest version, or the
        // parent's base if nothing was written on the branch yet
        val (parent, base) = TableStore.branchBase(spark, branchPath)
        if (TableStore.committedVersions(spark, branchPath).nonEmpty)
          TableStore.snapshotDataDirs(spark, branchPath, None)
        else TableStore.snapshotDataDirs(spark, parent, Some(base))
      case Some((k, _)) => sys.error(s"graft-table: unknown option $k")
    }

    val fs = new Path(dataDirs.head)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val filesByDir: Seq[(String, Seq[FileStatus])] = dataDirs.map { d =>
      d -> fs.listStatus(new Path(d)).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .sortBy(_.getPath.getName)
    }
    val files = filesByDir.flatMap(_._2)
    require(files.nonEmpty,
      s"graft-table: snapshot at ${dataDirs.mkString(",")} has no parquet data files")

    // one footer read for the schema (appends are schema-checked at
    // publish time, so any file of the chain carries the column set)
    val dataSchema = spark.read.parquet(files.head.getPath.toString).schema

    val index = new SnapshotFileIndex(dataDirs.map(new Path(_)), files,
      SnapshotFileIndex.loadStats(spark, filesByDir))
    HadoopFsRelation(index, new StructType(), dataSchema, None,
      new ParquetFileFormat, Map.empty)(spark)
  }
}

/** The snapshot's pinned file list, with min/max data skipping wired
  * into [[listFiles]]: Spark hands every file-source scan its
  * partition + data filters at planning time, and whatever this
  * returns IS the scan's input. Stats come from the snapshot's
  * [[graft.operators.SkippingIndex]] table when one exists and is
  * fresh; otherwise every file is kept (correct, just unpruned).
  */
private[sources] class SnapshotFileIndex(
    dirs: Seq[Path],
    files: Seq[FileStatus],
    stats: Map[String, Option[SnapshotFileIndex.FileStats]]) extends FileIndex {

  override def rootPaths: Seq[Path] = dirs

  override def partitionSchema: StructType = new StructType()

  override def inputFiles: Array[String] =
    files.map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_.getLen).sum

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept = files.filter { f =>
      stats.get(f.getPath.toString) match {
        // file not covered by any fresh index (no index built over its
        // dir, or that dir's index is stale): keep — never prune blind
        case None => true
        // a fresh index with NO row for this file = the file was EMPTY
        // at build time: nothing to scan, safe to drop outright
        case Some(None) => false
        case Some(Some(st)) =>
          dataFilters.forall(SnapshotFileIndex.mayMatch(_, st))
      }
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }
}

private[sources] object SnapshotFileIndex {

  /** One file's index row: row count, per-column [min, max] boxes and
    * (when the index carries them — older indexes may not) per-column
    * null counts. Null counts are what prune IS NULL / IS NOT NULL.
    */
  final case class FileStats(nRows: Long,
      boxes: Map[String, (Any, Any)], nulls: Map[String, Long])

  /** Load skipping-index stats PER CHAIN DIRECTORY, keyed by the
    * file's FULL PATH: each dir may carry its own `<dir>__idx` (appends index
    * their new files incrementally; the base snapshot keeps its own) —
    * a dir whose index is absent or STALE (built over a different file
    * set; rewrites mint new part names, so any rewrite flips the
    * check) contributes nothing, so its files are kept unpruned. The
    * value is `Some(stats)` for an indexed file, `None` for a file a
    * FRESH index proves was empty at build time (droppable). Absent /
    * stale never fails the read: pruning is an optimization, the
    * row-level filter still runs in the scan.
    */
  def loadStats(spark: SparkSession,
      filesByDir: Seq[(String, Seq[FileStatus])])
      : Map[String, Option[FileStats]] =
    filesByDir.flatMap { case (dataDir, files) =>
      dirStats(spark, dataDir, files) match {
        case None => Nil
        // key the RESULT by the dir-qualified path, not the basename:
        // two chain dirs could in principle hold identically-named
        // part files, and a basename-keyed toMap would silently let
        // one file be pruned with the other's stats
        case Some(byFile) => files.map { f =>
          f.getPath.toString -> byFile.get(f.getPath.getName)
        }
      }
    }.toMap

  private def dirStats(spark: SparkSession, dataDir: String,
      files: Seq[FileStatus]): Option[Map[String, FileStats]] = {
    val idxDir = new Path(dataDir + "__idx")
    val fs = idxDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(idxDir)) return None
    val idx = spark.read.parquet(idxDir.toString)
    val cols = idx.schema.fieldNames
    val statCols = cols.filter(_.endsWith("_min")).map(_.stripSuffix("_min"))
      .filter(c => cols.contains(s"${c}_max"))
    val rows = idx.collect()
    val current = files.map(_.getPath.getName).toSet
    val indexed = rows.map { r =>
      val f = r.getAs[String]("file"); f.substring(f.lastIndexOf('/') + 1)
    }.toSet
    val storedTotal = rows.headOption
      .map(_.getAs[Number]("n_total_files").intValue).getOrElse(0)
    if (storedTotal != current.size || !indexed.subsetOf(current)) None
    else Some(rows.map { r =>
      val base = r.getAs[String]("file")
      val name = base.substring(base.lastIndexOf('/') + 1)
      val boxes = statCols.map(c =>
        c -> (r.getAs[Any](s"${c}_min"), r.getAs[Any](s"${c}_max"))).toMap
      val nulls = statCols.flatMap { c =>
        if (cols.contains(s"${c}_nulls"))
          Option(r.getAs[Any](s"${c}_nulls"))
            .map(v => c -> v.asInstanceOf[Number].longValue)
        else None
      }.toMap
      name -> FileStats(r.getAs[Number]("n_rows").longValue, boxes, nulls)
    }.toMap)
  }

  /** Conservative per-file predicate test: may ANY row of a file with
    * these [min, max] boxes satisfy `e`? Unknown shapes answer true
    * (keep the file) — the index must never prune a file the real
    * filter could match. A null min/max means the column is all-null
    * in that file, so no non-null comparison can match.
    */
  def mayMatch(e: Expression, st: FileStats): Boolean = {
    val ranges = st.boxes
    e match {
      case And(l, r) => mayMatch(l, st) && mayMatch(r, st)
      case Or(l, r) => mayMatch(l, st) || mayMatch(r, st)
      case Not(EqualTo(a: AttributeReference, l: Literal)) =>
        // a != v can only be pruned when the file is CONSTANT v
        boxTest(a, ranges) { case (lo, hi) =>
          !(cmp(lo, ext(l)).contains(0) && cmp(hi, ext(l)).contains(0))
        }
      case EqualTo(a: AttributeReference, l: Literal) => inBox(a, l, ranges)
      case EqualTo(l: Literal, a: AttributeReference) => inBox(a, l, ranges)
      case EqualNullSafe(a: AttributeReference, l: Literal) if l.value != null =>
        inBox(a, l, ranges)
      case GreaterThan(a: AttributeReference, l: Literal) =>
        boxTest(a, ranges) { case (_, hi) => cmp(hi, ext(l)).exists(_ > 0) }
      case GreaterThan(l: Literal, a: AttributeReference) =>
        boxTest(a, ranges) { case (lo, _) => cmp(lo, ext(l)).exists(_ < 0) }
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        boxTest(a, ranges) { case (_, hi) => cmp(hi, ext(l)).exists(_ >= 0) }
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        boxTest(a, ranges) { case (lo, _) => cmp(lo, ext(l)).exists(_ <= 0) }
      case LessThan(a: AttributeReference, l: Literal) =>
        boxTest(a, ranges) { case (lo, _) => cmp(lo, ext(l)).exists(_ < 0) }
      case LessThan(l: Literal, a: AttributeReference) =>
        boxTest(a, ranges) { case (_, hi) => cmp(hi, ext(l)).exists(_ > 0) }
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        boxTest(a, ranges) { case (lo, _) => cmp(lo, ext(l)).exists(_ <= 0) }
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        boxTest(a, ranges) { case (_, hi) => cmp(hi, ext(l)).exists(_ >= 0) }
      case In(a: AttributeReference, list) if list.forall(_.isInstanceOf[Literal]) =>
        list.exists(l => inBox(a, l.asInstanceOf[Literal], ranges))
      case InSet(a: AttributeReference, hset) =>
        boxTest(a, ranges) { case (lo, hi) =>
          hset.exists { v =>
            val x = CatalystTypeConverters.convertToScala(v, a.dataType)
            cmp(lo, x).exists(_ <= 0) && cmp(hi, x).exists(_ >= 0)
          }
        }
      case StartsWith(a: AttributeReference, l: Literal) if l.value != null =>
        // strings with prefix p live in [p, succ(p)): overlap test
        // against the box; an unbounded successor (all-U+FFFF prefix)
        // only needs the lower test
        ext(l) match {
          case p: String => boxTest(a, ranges) { case (lo, hi) =>
            cmp(hi, p).exists(_ >= 0) &&
              prefixSuccessor(p).forall(s => cmp(lo, s).exists(_ < 0))
          }
          case _ => true
        }
      // null-count rules (Delta's nullCount stat): a file with zero
      // nulls can never satisfy IS NULL; an all-null file never
      // satisfies IS NOT NULL. Indexes built before null counts
      // existed simply lack the entry -> keep.
      case IsNull(a: AttributeReference) =>
        st.nulls.get(a.name).forall(_ > 0L)
      case IsNotNull(a: AttributeReference) =>
        st.nulls.get(a.name).forall(_ < st.nRows)
      case _ => true
    }
  }

  /** The smallest string ABOVE every string with prefix `p`: bump the
    * last bumpable CODE POINT and drop what follows (Spark's parquet
    * filter pushdown plays the same trick). None when every char is
    * U+FFFF — no finite upper bound exists.
    */
  private def prefixSuccessor(p: String): Option[String] = {
    // code points, not UTF-16 units: the bound must be correct under
    // the stats' UTF-8 byte order (cmpUtf8). The bump skips the
    // surrogate block so the result stays a valid string; the bound
    // is then merely looser, never wrong. None when every code point
    // is U+10FFFF (no finite upper bound exists).
    val cps = p.codePoints.toArray
    val i = cps.lastIndexWhere(_ != 0x10FFFF)
    if (i < 0) None
    else {
      val next = if (cps(i) == 0xD7FF) 0xE000 else cps(i) + 1
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < i) { sb.appendCodePoint(cps(j)); j += 1 }
      sb.appendCodePoint(next)
      Some(sb.toString)
    }
  }

  /** Literal's external (Scala) value for comparison with collected
    * stats rows (UTF8String -> String, internal days -> java Date, …).
    */
  private def ext(l: Literal): Any =
    CatalystTypeConverters.convertToScala(l.value, l.dataType)

  private def inBox(a: AttributeReference, l: Literal,
      ranges: Map[String, (Any, Any)]): Boolean =
    boxTest(a, ranges) { case (lo, hi) =>
      val v = ext(l)
      cmp(lo, v).exists(_ <= 0) && cmp(hi, v).exists(_ >= 0)
    }

  /** Run `test` against the column's (min, max) box; columns the index
    * doesn't cover keep the file, an all-null box (null stats) prunes
    * any value comparison.
    */
  private def boxTest(a: AttributeReference,
      ranges: Map[String, (Any, Any)])(
      test: ((Any, Any)) => Boolean): Boolean =
    ranges.get(a.name) match {
      case None => true
      case Some((null, null)) => false
      case Some(box) => test(box)
    }

  /** Ordering across the external value domains the stats can hold.
    * The analyzer has already cast the predicate's literal to the
    * column's type, so both sides are normally the SAME runtime class;
    * numerics additionally compare across widths. None = incomparable
    * (caller keeps the file).
    */
  private def cmp(x: Any, y: Any): Option[Int] = (x, y) match {
    case (null, _) | (_, null) => None
    // NaN / ±Infinity have no BigDecimal form and no total order vs
    // finite stats — incomparable, caller keeps the file
    case (a: java.lang.Double, _) if a.isNaN || a.isInfinite => None
    case (_, b: java.lang.Double) if b.isNaN || b.isInfinite => None
    case (a: java.lang.Float, _) if a.isNaN || a.isInfinite => None
    case (_, b: java.lang.Float) if b.isNaN || b.isInfinite => None
    case (a: java.lang.Number, b: java.lang.Number) =>
      Some(new java.math.BigDecimal(a.toString)
        .compareTo(new java.math.BigDecimal(b.toString)))
    case (a: String, b: String) => Some(cmpUtf8(a, b))
    case (a: java.sql.Timestamp, b: java.sql.Timestamp) => Some(a.compareTo(b))
    case (a: java.sql.Date, b: java.sql.Date) => Some(a.compareTo(b))
    case (a: java.time.Instant, b: java.time.Instant) => Some(a.compareTo(b))
    case (a: java.time.LocalDate, b: java.time.LocalDate) => Some(a.compareTo(b))
    case (a: java.lang.Boolean, b: java.lang.Boolean) => Some(a.compareTo(b))
    case _ => None
  }

  /** Code-point lexicographic compare == UTF8String's binary (UTF-8
    * byte) order, which is the collation Spark's min/max stats were
    * computed under. `String.compareTo` is UTF-16 code-UNIT order,
    * which disagrees for supplementary-plane characters (surrogates
    * 0xD800-0xDFFF sort below BMP 0xE000-0xFFFF in UTF-16 but encode
    * above them in UTF-8) — comparing stats with it could prune a
    * file that contains matching rows.
    */
  private def cmpUtf8(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }
}
