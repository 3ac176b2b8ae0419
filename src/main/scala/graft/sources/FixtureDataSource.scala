package graft.sources

import java.util
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSourceV2 connector for landed BGG fixture payloads: a directory
  * of `<game_id>.json` files becomes a table
  * `(game_id BIGINT, response_data STRING, file_name STRING)` — the
  * raw_responses landing shape (SURVEY §2.1 S1: "a custom
  * DataSourceV2 TableProvider for the fixture files").
  *
  * Usage: `spark.read.format("graft.sources.FixtureDataSource")
  * .load(dir)`.
  *
  * Scale shape: one InputPartition per file (file listing on the
  * driver, payload IO on executors), column pruning pushed into the
  * reader (`SupportsPushDownRequiredColumns`) so `SELECT game_id`
  * never reads payload bytes.
  */
class FixtureDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FixtureDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FixtureTable(properties.get("path"))
}

object FixtureDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("game_id", LongType, nullable = false),
    StructField("response_data", StringType, nullable = true),
    StructField("file_name", StringType, nullable = false)))
}

private class FixtureTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"fixtures($path)"
  override def schema(): StructType = FixtureDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FixtureScanBuilder(path)
}

private class FixtureScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = FixtureDataSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new FixtureScan(path, required)
}

private class FixtureScan(path: String, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val hPath = new Path(path)
    // session Hadoop conf, not a blank one — custom filesystems /
    // credentials configured on the session must reach the listing
    val fs = hPath.getFileSystem(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
    fs.listStatus(hPath)
      .filter { s =>
        // only `<numeric game_id>.json` participates; anything else in
        // the landing dir is skipped at listing time instead of
        // failing the whole scan mid-read
        s.isFile && s.getPath.getName.endsWith(".json") &&
          s.getPath.getName.stripSuffix(".json").forall(_.isDigit) &&
          s.getPath.getName.stripSuffix(".json").nonEmpty
      }
      .sortBy(_.getPath.getName)
      .map(s => FixturePartition(s.getPath.toString): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the session conf to executor-side readers (Configuration
    // itself is not serializable)
    val confMap = {
      val conf = org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration
      val it = conf.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    new FixtureReaderFactory(required.fieldNames, confMap)
  }
}

private case class FixturePartition(file: String) extends InputPartition

private class FixtureReaderFactory(columns: Array[String],
    confMap: Map[String, String]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new FixtureReader(partition.asInstanceOf[FixturePartition].file, columns, confMap)
}

private class FixtureReader(file: String, columns: Array[String],
    confMap: Map[String, String]) extends PartitionReader[InternalRow] {
  private var done = false
  private var row: InternalRow = _

  override def next(): Boolean =
    if (done) false
    else {
      val p = new Path(file)
      val name = p.getName
      val gameId = name.stripSuffix(".json").toLong
      // payload bytes are read ONLY when response_data is required
      def payload: String = {
        val conf = new org.apache.hadoop.conf.Configuration(false)
        confMap.foreach { case (k, v) => conf.set(k, v) }
        val fs = p.getFileSystem(conf)
        val in = fs.open(p)
        try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
        finally in.close()
      }
      val values: Array[Any] = columns.map {
        case "game_id" => gameId
        case "response_data" => UTF8String.fromString(payload)
        case "file_name" => UTF8String.fromString(name)
      }
      row = InternalRow.fromSeq(values.toIndexedSeq)
      done = true
      true
    }

  override def get(): InternalRow = row
  override def close(): Unit = ()
}
