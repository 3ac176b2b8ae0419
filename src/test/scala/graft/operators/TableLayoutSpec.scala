package graft.operators

import java.nio.file.Files
import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._

/** Layout + pruning proof: the bucket predicate must land in
  * PartitionFilters (directory pruning), not just PushedFilters.
  */
class TableLayoutSpec extends SparkSpec {

  test("range-bucketed point lookup prunes to one partition") {
    import TestSpark.spark.implicits._
    val path = Files.createTempDirectory("graft_layout").toString + "/t"
    val df = (0L until 10000L).map(i => (i, s"row$i")).toDF("game_id", "payload")
    TableLayout.writeRangeBucketed(df, path, "game_id", 1000L)

    val lookup = TableLayout.pointLookup(spark, path, "game_id", 4242L, 1000L)
    val plan = lookup.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters:"), plan)
    assert(plan.contains("key_bucket"), plan)
    // 10 buckets on disk; the scan lists exactly one
    assert(plan.contains("(key_bucket#") || plan.contains("key_bucket"), plan)
    val row = lookup.collect()
    assert(row.length == 1 && row.head.getAs[String]("payload") == "row4242")
    // pruning effectiveness: selected partitions carry ~1/10 of files
    val files = lookup.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.metrics.get("numFiles")).map(_.value)
    assert(files.forall(_ <= 2), s"expected <=2 files read, got $files")
  }

  test("time-series layout partitions by day and prunes day ranges") {
    import TestSpark.spark.implicits._
    val path = Files.createTempDirectory("graft_layout_ts").toString + "/t"
    val rows = (0 until 96).map { h =>
      (h.toLong % 7, java.sql.Timestamp.valueOf(f"2026-01-${1 + h / 24}%02d $h%02d:00:00".replace(f"$h%02d:", f"${h % 24}%02d:")))
    }
    val df = rows.toDF("game_id", "load_timestamp")
    TableLayout.writeTimeSeries(df, path, "load_timestamp", "game_id")

    val scan = TableLayout.dayRange(spark, path, "2026-01-02", "2026-01-03")
    val plan = scan.queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters:"), plan)
    assert(scan.count() == 48)
  }
}
