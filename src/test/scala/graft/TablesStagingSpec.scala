package graft

import org.apache.spark.sql.functions._

/** The scan-parallelism staging in [[Tables.load]] must be invisible
  * semantically: a staged table is the same multiset of rows as the
  * original single-row-group file, only re-sharded. Checked on the one
  * sf0.01 table that crosses the staging threshold (lineitem), against
  * a direct read of the untouched input.
  */
class TablesStagingSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  test("staged lineitem is row-identical to the original file") {
    val staged = Tables.load(spark, sfDir, "lineitem")
    val original = spark.read.parquet(s"$sfDir/lineitem.parquet")
    assert(staged.schema == original.schema)
    // content equality as multisets: anti-joins both ways over all cols
    val cols = original.columns.toSeq
    assert(staged.join(original, cols, "left_anti").isEmpty)
    assert(original.join(staged, cols, "left_anti").isEmpty)
    assert(staged.count() == original.count())
    // and the staging actually happened (the point of the test):
    // multiple input files under the stage dir = parallel row groups
    val files = staged.inputFiles
    assert(files.forall(_.contains("graft_stage")), files.take(3).mkString(", "))
    assert(files.length > 1, s"expected multiple shards, got ${files.length}")
  }

  test("small tables are not staged") {
    val files = Tables.load(spark, sfDir, "nation").inputFiles
    assert(files.forall(!_.contains("graft_stage")), files.mkString(", "))
  }
}
