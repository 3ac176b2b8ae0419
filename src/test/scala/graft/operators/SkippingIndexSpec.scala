package graft.operators

import java.nio.file.Files
import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._

/** Stats-manifest pruning semantics: the index must be IO-invisible
  * (pruned scan + predicate == full scan + predicate), actually prune
  * on a z-ordered layout, and fail loudly when stale.
  */
class SkippingIndexSpec extends SparkSpec {

  private def grid(path: String): Unit = {
    val g = TestSpark.spark.range(64L * 64L)
      .select((col("id") % 64).as("x"), expr("id div 64").as("y"))
    TableLayout.writeZOrdered(g, path, "x", "y", bits = 6, nFiles = 16)
  }

  test("pruned scan equals the full-scan result and skips most files") {
    val base = Files.createTempDirectory("graft_skip_idx").toString
    val path = s"$base/t"
    grid(path)
    SkippingIndex.build(spark, path, Seq("x", "y"))
    assert(SkippingIndex.idxCount(spark, path) == 16)
    val ranges = Map[String, (Any, Any)]("x" -> (16L, 23L), "y" -> (16L, 23L))
    val kept = SkippingIndex.plannedFiles(spark, path, ranges)
    assert(kept <= 4, s"2-D box should plan <=4 of 16 files, planned $kept")
    val pruned = SkippingIndex.prunedScan(spark, path, ranges)
      .filter(col("x").between(16, 23) && col("y").between(16, 23))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = spark.read.parquet(path)
      .filter(col("x").between(16, 23) && col("y").between(16, 23))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pruned == full && full.size == 64)
  }

  test("an empty-intersection predicate plans zero files and returns the schema") {
    val base = Files.createTempDirectory("graft_skip_idx0").toString
    val path = s"$base/t"
    grid(path)
    SkippingIndex.build(spark, path, Seq("x", "y"))
    val ranges = Map[String, (Any, Any)]("x" -> (1000L, 2000L))
    assert(SkippingIndex.plannedFiles(spark, path, ranges) == 0)
    val df = SkippingIndex.prunedScan(spark, path, ranges)
    assert(df.columns.toSeq == Seq("x", "y") && df.count() == 0)
  }

  test("a stale index (table rewritten underneath) fails loudly instead of wrong results") {
    val base = Files.createTempDirectory("graft_skip_stale").toString
    val path = s"$base/t"
    grid(path)
    SkippingIndex.build(spark, path, Seq("x", "y"))
    // a compaction-style rewrite changes the file set; the index now
    // covers files that no longer exist
    TableStore.rewrite(spark, path, spark.read.parquet(path).repartition(4))
    val e = intercept[IllegalArgumentException] {
      SkippingIndex.prunedScan(spark, path,
        Map[String, (Any, Any)]("x" -> (0L, 63L)))
    }
    assert(e.getMessage.contains("stale"), e.getMessage)
    // rebuild repairs it
    SkippingIndex.build(spark, path, Seq("x", "y"))
    assert(SkippingIndex.prunedScan(spark, path,
      Map[String, (Any, Any)]("x" -> (0L, 63L))).count() == 64L * 64L)
  }
}
