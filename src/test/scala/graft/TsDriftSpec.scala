package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Regression guard for testdata schema drift on `events.ts` (round 6:
  * a TIMESTAMP(µs) regeneration against nanos-as-long code lost 69
  * catalog rows batch-side and silently collapsed streaming windows
  * 1000×). The contract: whatever physical form the driver writes —
  * nanos-long, TIMESTAMP_NTZ, or TimestampType — [[Tables.normalizeTs]]
  * yields the SAME session-zoned TimestampType instants, and both the
  * batch loader and the streaming reader go through it.
  */
class TsDriftSpec extends SparkSpec {

  private val micros = Seq(
    1735689600000000L, // 2025-01-01 00:00:00 UTC
    1735693201500000L, // +1h1.5ms — sub-second survives every path
    1767225599999999L) // 2025-12-31 23:59:59.999999

  test("normalizeTs: nanos-long, TIMESTAMP_NTZ and TimestampType converge") {
    import TestSpark.spark.implicits._
    val asNanosLong = micros.map(_ * 1000L).toDF("ts")
    val asTimestamp = micros.toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    val asNtz = asTimestamp.select(col("ts").cast(TimestampNTZType).as("ts"))
    assert(asNanosLong.schema("ts").dataType == LongType)
    assert(asNtz.schema("ts").dataType == TimestampNTZType)

    val normalized = Seq(asNanosLong, asNtz, asTimestamp).map(Tables.normalizeTs)
    normalized.foreach(df =>
      assert(df.schema("ts").dataType == TimestampType, df.schema.treeString))
    val instants = normalized.map(
      _.select(unix_micros(col("ts"))).as[Long].collect().toSeq.sorted)
    assert(instants.forall(_ == micros.sorted),
      s"paths disagree: $instants vs $micros")
  }

  test("batch loader and streaming reader agree on the CURRENT testdata") {
    val sf = "/root/testdata/sf0.001"
    val batch = Tables.load(spark, sf, "events")
    assert(batch.schema("ts").dataType == TimestampType,
      "batch events.ts must normalize to TimestampType: " + batch.schema.treeString)
    val stream = streaming.EventStream.readEvents(spark, sf)
    assert(stream.schema("ts").dataType == TimestampType,
      "streamed events.ts must normalize to TimestampType: " + stream.schema.treeString)
    // same instants end to end: min/max over the batch path must match
    // a batch read of whatever the stream schema decodes
    val (lo, hi) = batch.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    val viaFooter = Tables.normalizeTs(
      spark.read.schema(spark.read.parquet(s"$sf/events.parquet").schema)
        .parquet(s"$sf/events.parquet"))
    val (lo2, hi2) = viaFooter.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert((lo, hi) == (lo2, hi2), s"batch $lo..$hi vs footer-schema $lo2..$hi2")
  }
}
