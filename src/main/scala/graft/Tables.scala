package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}

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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // every catalog query loads through here — make graft's native
    // functions (vector_distance, graft_char_hash) resolvable
    graft.functions.GraftFunctions.register(spark)
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // The events table is written as parquet TIMESTAMP(NANOS), which
    // Spark 4 refuses to map to TimestampType. We read nanos as a long
    // (legacy flag, set in the session builders) and convert with exact
    // integer division — double division would lose precision at 1e18.
    // The test data carries no sub-microsecond components, so this is
    // lossless and matches DuckDB's ns→µs read.
    if (name == "events")
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register all tables as temp views (used by SQL-form tests). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
