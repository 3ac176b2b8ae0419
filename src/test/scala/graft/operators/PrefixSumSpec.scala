package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed prefix scan must equal the single-window running
  * sum exactly — and must actually SPLIT a skewed group across slices
  * (the whole point: no per-group single task).
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = {
    // one dominant group (like English in a web corpus) + small ones
    val rows = (1 to 400).map(i => ("en", i.toLong, (i % 7 + 1).toLong)) ++
      (1 to 30).map(i => ("de", i.toLong, (i % 5 + 1).toLong)) ++
      (1 to 3).map(i => ("fi", i.toLong, 2L))
    rows.toDF("g", "o", "v")
  }

  test("runningSum equals the single-window cumsum, any slice count") {
    val df = skewed
    val w = Window.partitionBy("g").orderBy("o")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df.withColumn("run", sum($"v").over(w))
      .select("g", "o", "run").collect().map(r =>
        (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (slices <- Seq(1, 3, 8)) {
      val got = PrefixSum.runningSum(df, Seq("g"), "o", "v", "run", slices)
        .select("g", "o", "run").collect()
      assert(got.length == expected.size, s"slices=$slices row count")
      got.foreach { r =>
        val k = (r.getString(0), r.getLong(1))
        assert(r.getLong(2) == expected(k), s"slices=$slices at $k")
      }
    }
  }

  test("a dominant group is split across slices (no single-task scan)") {
    val spans = skewed.repartitionByRange(8, $"g", $"o")
      .withColumn("_slice", spark_partition_id())
      .groupBy("g").agg(countDistinct($"_slice").as("n_slices"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spans("en") > 1,
      s"the skewed group must span multiple range slices, got $spans")
  }

  test("result carries no scratch columns and keeps input columns") {
    val out = PrefixSum.runningSum(skewed, Seq("g"), "o", "v", "run", 4)
    assert(out.columns.sorted.toSeq == Seq("g", "o", "run", "v"))
  }
}
