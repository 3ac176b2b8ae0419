package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Synthetic test tables (TESTDATA.md): TPC-H-ish star schema plus an
  * `events` stream table, `documents` + `embeddings` for the
  * training-data operators. One parquet file per table under a
  * scale-factor directory.
  *
  * At 100 TB these would be partitioned/bucketed parquet (or a lakehouse
  * table format); the loader stays a single `spark.read.parquet` either
  * way — layout decisions live in [[graft.operators.TableLayout]].
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Range-clustering key per stageable table (keeps per-file min/max
    * stats selective for key predicates after re-sharding).
    */
  private val shardKey: Map[String, String] = Map(
    "customer" -> "c_custkey", "part" -> "p_partkey",
    "orders" -> "o_orderkey", "lineitem" -> "l_orderkey",
    "events" -> "event_id", "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  /** Stage tables bigger than this; smaller ones decode in ~ms anyway.
    * Low enough that the sf0.01 correctness gate exercises the staged
    * path too (its ~1.04 MB lineitem crosses the line) — staging must
    * never be a bench-only code path the gate doesn't see.
    */
  private val StageThresholdBytes: Long = 512L << 10
  // 16 shards, not one per core: at sf0.1 row counts the extra task
  // overhead of 32 smaller files measurably outweighs the decode
  // parallelism (measured: q6 0.17->0.21 s, q9 0.70->0.79 s); at real
  // scale the equivalent knob is files >= provisioned scan parallelism
  private val NShards = 16

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // every catalog query loads through here — make graft's native
    // functions (vector_distance, graft_char_hash) resolvable
    graft.functions.GraftFunctions.register(spark)
    val df = spark.read.parquet(stagedOrOriginal(spark, sfDir, name))
    if (name == "events") normalizeTs(df) else df
  }

  /** Normalize `events.ts` to session-zoned TimestampType regardless of
    * how the driver generated the parquet — the physical type has
    * DRIFTED across testdata generations, and a hard-coded assumption
    * silently breaks every events query when it does (round 6: 69
    * catalog rows lost to a TIMESTAMP(µs) regen against nanos-as-long
    * code). Dispatch on the type actually loaded:
    *   - nanos-long (legacy flag turns TIMESTAMP(NANOS) into BIGINT):
    *     exact integer division to µs — double division would lose
    *     precision at 1e18, and the data has no sub-µs components;
    *   - TIMESTAMP_NTZ (µs, isAdjustedToUTC=false — what pyarrow's
    *     timestamp[us] becomes under Spark's NTZ inference): cast to
    *     TimestampType, identity on the micros under the UTC sessions
    *     every graft entrypoint pins;
    *   - already TimestampType: pass through.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** The driver's tables are written as ONE parquet row group each, and
    * a row group is the unit of scan parallelism — a 600k-row table
    * decodes on a single core no matter how many executors exist, which
    * at any scale is the wrong layout (SURVEY §1.3: layout is an engine
    * decision). The engine therefore COMPACTS big inputs once, on first
    * touch, into an NShards-file range-clustered copy (content-identical
    * rows; range clustering keeps min/max file skipping for key
    * predicates) and scans that. Staging is atomic (write to a temp dir,
    * rename) and shared across processes; the one-time cost is paid
    * inside the same benched session that profits from it. The oracle
    * keeps reading the original files, so correctness still gates the
    * staged copy against the untouched input.
    */
  private def stagedOrOriginal(spark: SparkSession, sfDir: String,
      name: String): String = {
    val original = s"$sfDir/$name.parquet"
    if (!shardKey.contains(name)) return original
    // deployment knob for disk-constrained hosts: the staged copy is
    // a pure scan-layout optimization (content-identical), so a host
    // that cannot afford a second copy of its largest input reads the
    // original instead (the sf100 audit's i4 leg needs the ~13 GB
    // this frees for its transient version store)
    if (sys.props.contains("graft.tables.stage.disable")) return original
    val src = new java.io.File(original)
    if (!src.isFile || src.length < StageThresholdBytes) return original
    // cache key = full path hash + source size + mtime: a regenerated
    // input (same path, new data) must MISS, or every query would
    // silently read stale staged rows while the oracle reads the new
    // originals; the hash also keeps distinct dirs from colliding
    val pathTag = Integer.toHexString(src.getAbsolutePath.hashCode)
    val stageRoot = new java.io.File(s"/tmp/graft_stage/$pathTag")
    // NShards is part of the key: a config change must re-stage, not
    // silently read the old layout
    val dest = new java.io.File(stageRoot,
      s"$name-${src.length}-${src.lastModified}-n$NShards")
    if (!new java.io.File(dest, "_SUCCESS").isFile) synchronized {
      if (!new java.io.File(dest, "_SUCCESS").isFile) {
        val tmp = new java.io.File(stageRoot,
          s".$name.tmp-${ProcessHandle.current().pid()}")
        spark.read.parquet(original)
          .repartitionByRange(NShards, org.apache.spark.sql.functions.col(shardKey(name)))
          .write.mode("overwrite").parquet(tmp.getAbsolutePath)
        if (!tmp.renameTo(dest)) {
          // another process won the race; drop our copy, use theirs
          Option(tmp.listFiles()).foreach(_.foreach(_.delete()))
          tmp.delete()
        }
      }
    }
    if (new java.io.File(dest, "_SUCCESS").isFile) dest.getAbsolutePath
    else original
  }

  /** Register all tables as temp views (used by SQL-form tests). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))

  /** Total bytes of a parquet input at `path` — the volume the
    * volume-sized operators (d15's window width, i4's shuffle count)
    * derive their partition counts from. A single local file reports
    * its length; a DIRECTORY-style dataset (multi-file parquet, the
    * normal shape everywhere but this sandbox) reports the sum of its
    * leaf data files — `File.length` on a directory is a meaningless
    * dir-entry size (~4 KB) that would silently clamp every derived
    * width to its floor and reinstate the linear per-task growth the
    * sizing exists to prevent. Metadata/marker files (`_SUCCESS`,
    * `.crc`) are skipped; missing paths size 0 (callers clamp to a
    * floor anyway).
    */
  def inputBytes(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isFile) {
        if (f.getName.startsWith("_") || f.getName.startsWith(".")) 0L
        else f.length
      } else
        Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(new java.io.File(path))
  }
}
