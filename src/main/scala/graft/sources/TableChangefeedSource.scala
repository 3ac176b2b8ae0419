package graft.sources

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

import graft.operators.TableStore

/** TABLE CHANGEFEED — a [[TableStore]] table as a Structured
  * Streaming SOURCE: Delta's `spark.readStream.table(...)` semantics
  * re-expressed over the marker store. Offsets ARE committed version
  * numbers, so:
  *
  *   - each committed version becomes (part of) exactly one
  *     micro-batch, in commit order — for a FOLD table the rows are
  *     the signed deltas, i.e. the table's own CDC events;
  *   - the feed is MARKER-AWARE: an orphan `v=N` dir from a crashed
  *     publish has no committed marker and is invisible (the same
  *     atomicity readers get), so a consumer can never observe a
  *     torn publish;
  *   - versions published while the stream runs surface at the next
  *     poll (`latestOffset` re-reads the marker list — O(versions)
  *     driver metadata, no data IO);
  *   - the initial offset replays every committed version whose DATA
  *     still exists (retention-reclaimed history is skipped, exactly
  *     like Delta's `startingVersion` defaulting past vacuumed
  *     commits).
  *
  * Scale shape: one InputPartition per parquet FILE per version
  * (listing on the driver, row IO on executors — the FixtureDataSource
  * discipline), column pruning pushed into the reader, and the
  * `_version` metadata column (Delta's `_commit_version`) emitted as
  * a per-partition constant.
  *
  * Usage:
  * `spark.readStream.format("graft.sources.TableChangefeedSource")
  * .load(tablePath)`.
  *
  * Supported column types: BIGINT, INT, DOUBLE, FLOAT, STRING,
  * BOOLEAN (the fold-table row shapes); anything else fails loudly at
  * schema inference rather than mis-reading bytes.
  */
class TableChangefeedSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TableChangefeedSource.schemaOf(options.get("path"))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ChangefeedTable(properties.get("path"), schema)
}

object TableChangefeedSource {

  /** The Delta `_commit_version` analogue. */
  val VersionCol = "_version"

  private[sources] def activeConf: Configuration =
    SparkSession.active.sparkContext.hadoopConfiguration

  private[sources] def confMapOf(conf: Configuration): Map[String, String] = {
    val it = conf.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
    b.result()
  }

  /** Declared schema = the latest surviving version's parquet footer
    * (one footer read — never a per-file inference sweep) plus the
    * `_version` metadata column.
    */
  def schemaOf(path: String): StructType = {
    val spark = SparkSession.active
    val vs = TableStore.committedVersions(spark, path)
    require(vs.nonEmpty, s"changefeed: no published version at $path")
    val files = vs.reverse.iterator
      .map(v => TableStore.versionFiles(spark, path, v))
      .find(_.nonEmpty)
      .getOrElse(sys.error(s"changefeed: no surviving data files at $path"))
    val conf = activeConf
    val footer = org.apache.parquet.hadoop.ParquetFileReader
      .open(HadoopInputFile.fromPath(new Path(files.head), conf))
    val msg = try footer.getFileMetaData.getSchema finally footer.close()
    val fields = msg.getFields.asScala.map { f =>
      require(f.isPrimitive,
        s"changefeed: unsupported nested column '${f.getName}' at $path")
      val p = f.asPrimitiveType()
      val dt = p.getPrimitiveTypeName match {
        case INT64 => LongType
        case INT32 => IntegerType
        case DOUBLE => DoubleType
        case FLOAT => FloatType
        case BOOLEAN => BooleanType
        case BINARY => StringType // fold-table strings (UTF8-annotated)
        case other =>
          sys.error(s"changefeed: unsupported parquet type $other " +
            s"for column '${f.getName}' at $path")
      }
      StructField(f.getName, dt, nullable = true)
    }.toSeq
    StructType(fields :+ StructField(VersionCol, LongType, nullable = false))
  }
}

private class ChangefeedTable(path: String, declared: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"changefeed($path)"
  override def schema(): StructType = declared
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val maxV = Option(options.get("maxVersionsPerTrigger")).map(_.toLong)
    maxV.foreach(m => require(m >= 1,
      s"maxVersionsPerTrigger must be >= 1, got $m"))
    new ChangefeedScanBuilder(path, declared, maxV)
  }
}

private class ChangefeedScanBuilder(path: String, full: StructType,
    maxVersions: Option[Long])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new ChangefeedScan(path, required, maxVersions)
}

private class ChangefeedScan(path: String, required: StructType,
    maxVersions: Option[Long]) extends Scan {
  override def readSchema(): StructType = required
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new ChangefeedStream(path, required, maxVersions)
}

private case class VersionOffset(v: Long) extends Offset {
  override def json(): String = s"""{"version":$v}"""
}

private class ChangefeedStream(path: String, required: StructType,
    maxVersions: Option[Long])
    extends MicroBatchStream with SupportsAdmissionControl {
  private def spark = SparkSession.active

  /** `maxVersionsPerTrigger`: bound how many COMMITS one micro-batch
    * admits — Delta's maxFilesPerTrigger discipline in version units.
    * This is what makes replaying a long-lived table's history safe
    * at scale: a 10k-commit backfill proceeds as 10k/m bounded
    * batches instead of one unbounded initial batch.
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val cur = TableStore.currentVersion(spark, path)
      .getOrElse(sys.error(s"changefeed: no published version at $path"))
    val s = start.asInstanceOf[VersionOffset].v
    VersionOffset(maxVersions.fold(cur)(m => math.min(cur, s + m)))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Everything committed whose data still exists replays from the
    * start; retention-reclaimed prefixes are skipped.
    */
  override def initialOffset(): Offset = {
    val vs = TableStore.committedVersions(spark, path)
    require(vs.nonEmpty, s"changefeed: no published version at $path")
    val firstAlive = vs.find(v =>
      TableStore.versionFiles(spark, path, v).nonEmpty).getOrElse(vs.last)
    VersionOffset(firstAlive - 1)
  }

  override def latestOffset(): Offset =
    VersionOffset(TableStore.currentVersion(spark, path)
      .getOrElse(sys.error(s"changefeed: no published version at $path")))

  override def deserializeOffset(json: String): Offset = {
    val m = """\{"version":(-?\d+)\}""".r
    json.trim match {
      case m(v) => VersionOffset(v.toLong)
      case other => sys.error(s"changefeed: bad offset json '$other'")
    }
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[VersionOffset].v
    val e = end.asInstanceOf[VersionOffset].v
    val committed = TableStore.committedVersions(spark, path)
    committed.filter(v => v > s && v <= e).flatMap { v =>
      TableStore.versionFiles(spark, path, v)
        .map(f => ChangefeedPartition(f, v): InputPartition)
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ChangefeedReaderFactory(required,
      TableChangefeedSource.confMapOf(TableChangefeedSource.activeConf))

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private case class ChangefeedPartition(file: String, version: Long)
    extends InputPartition

private class ChangefeedReaderFactory(required: StructType,
    confMap: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[ChangefeedPartition]
    new ChangefeedReader(p.file, p.version, required, confMap)
  }
}

/** Executor-side row reader: parquet-hadoop's Group API over ONE file
  * (the partition), projecting just the required columns and stamping
  * the partition's commit version.
  */
private class ChangefeedReader(file: String, version: Long,
    required: StructType, confMap: Map[String, String])
    extends PartitionReader[InternalRow] {

  private val conf = {
    val c = new Configuration(false)
    confMap.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val reader: ParquetReader[Group] =
    ParquetReader.builder(new GroupReadSupport(), new Path(file))
      .withConf(conf).build()
  private var current: Group = _

  override def next(): Boolean = {
    current = reader.read()
    current != null
  }

  override def get(): InternalRow = {
    val vals = required.fields.map { f =>
      if (f.name == TableChangefeedSource.VersionCol) version: Any
      else if (current.getType.containsField(f.name) &&
          current.getFieldRepetitionCount(f.name) > 0) {
        f.dataType match {
          case LongType => current.getLong(f.name, 0)
          case IntegerType => current.getInteger(f.name, 0)
          case DoubleType => current.getDouble(f.name, 0)
          case FloatType => current.getFloat(f.name, 0)
          case BooleanType => current.getBoolean(f.name, 0)
          case StringType => UTF8String.fromString(current.getString(f.name, 0))
          case other =>
            sys.error(s"changefeed: unsupported read type $other")
        }
      } else null
    }
    InternalRow.fromSeq(vals.toIndexedSeq)
  }

  override def close(): Unit = reader.close()
}
