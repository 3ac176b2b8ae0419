package graft.operators

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._

/** Co-located joins via bucketing (SURVEY §4 "Clustering / data
  * layout", prompt: "bucketing for co-located joins"): two tables
  * bucketed + sorted on the join key join WITHOUT any Exchange — the
  * shuffle happened once at write time and is amortized over every
  * subsequent join. This is the layout for the core game-keyed
  * tables at 100 TB (every join in the analytics DAG is on game_id).
  */
class BucketingSpec extends SparkSpec {

  test("join of two bucketed tables plans no Exchange") {
    import TestSpark.spark.implicits._
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    ev.select("event_id", "user_id", "value")
      .write.mode("overwrite")
      .bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("ev_bucketed")
    ev.groupBy("user_id").agg(count(lit(1)).as("n"))
      .write.mode("overwrite")
      .bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("stats_bucketed")

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("ev_bucketed")
        .join(spark.table("stats_bucketed"), Seq("user_id"))
      val plan = joined.queryExecution.executedPlan.toString()
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == ev.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
