package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The band-join optimizer rule, exercised through a real optimizer
  * pass (experimental.extraOptimizations — the GraftExtensions hook
  * injects the same rule into new sessions).
  */
class BandJoinRewriteSpec extends SparkSpec {

  private def bandJoinDf = {
    val p = graft.Tables.load(spark, "/root/testdata/sf0.001", "part")
      .select("p_partkey", "p_retailprice")
    val a = p.select(col("p_partkey").as("a_key"), col("p_retailprice").as("a_price"))
    val b = p.select(col("p_partkey").as("b_key"), col("p_retailprice").as("b_price"))
    a.join(b, col("b_price") >= col("a_price") - 0.5 &&
      col("b_price") <= col("a_price") + 0.5 &&
      col("b_key") =!= col("a_key"))
  }

  test("pure band theta join is rewritten to a bucketed equi-join") {
    // without the rule: nested-loop territory
    val naivePlan = bandJoinDf.queryExecution.executedPlan.toString()
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"), naivePlan)
    val naiveCount = bandJoinDf.count()

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandJoinRewrite
    try {
      val rewritten = bandJoinDf
      val plan = rewritten.queryExecution.executedPlan.toString()
      assert(plan.contains("Generate explode"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      assert(rewritten.count() == naiveCount)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BandJoinRewrite)
    }
  }

  test("SQL decimal band widths fire the rule, and boundary values survive") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandJoinRewrite
    try {
      // values sitting EXACTLY on band edges at a width (0.3) that is
      // not binary-representable — the adversarial case for the
      // floor(x/w) bucketing
      val vals = (0 to 40).map(i => i * 0.3) ++ Seq(0.2999999999999999, 0.30000000000000004)
      import spark.implicits._
      vals.zipWithIndex.toDF("x", "id").createOrReplaceTempView("band_vals")
      // SQL literal 0.3 parses as DECIMAL(1,1) — the rule must match
      // Literal(Decimal) (it previously only matched Double)
      val q =
        """SELECT a.id AS ia, b.id AS ib FROM band_vals a JOIN band_vals b
          |  ON b.x BETWEEN a.x - 0.3 AND a.x + 0.3 AND b.id != a.id""".stripMargin
      val df = spark.sql(q)
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("Generate explode"), plan)
      // ground truth from the naive pair scan, no rule involved
      val expected = (for {
        (x1, i1) <- vals.zipWithIndex; (x2, i2) <- vals.zipWithIndex
        if i1 != i2 && x2 >= x1 - 0.3 && x2 <= x1 + 0.3
      } yield (i1, i2)).size
      assert(df.count() == expected)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BandJoinRewrite)
    }
  }

  test("timestamp bands fire the rule; boundary timestamps survive") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandJoinRewrite
    try {
      import spark.implicits._
      // timestamps spaced EXACTLY 30 min apart — every adjacent pair
      // sits precisely on the ±30 min band edge, the adversarial case
      // for the unix_micros bucketing
      val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      val ts = (0 until 40).map(i =>
        (new java.sql.Timestamp(t0 + i * 30L * 60 * 1000), i.toLong))
      val df0 = ts.toDF("ts", "id")
      val a = df0.select(col("ts").as("a_ts"), col("id").as("a_id"))
      val b = df0.select(col("ts").as("b_ts"), col("id").as("b_id"))
      val j = a.join(b,
        col("b_ts") >= col("a_ts") - expr("INTERVAL 30 MINUTES") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 30 MINUTES") &&
          col("b_id") =!= col("a_id"))
      val plan = j.queryExecution.executedPlan.toString()
      assert(plan.contains("Generate explode"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      // each element pairs with its immediate neighbours only
      val expected = (for {
        (_, i1) <- ts; (_, i2) <- ts
        if i1 != i2 && math.abs(i1 - i2) <= 1
      } yield 1).size
      assert(j.count() == expected)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BandJoinRewrite)
    }
  }

  test("SQL INTERVAL BETWEEN form fires the timestamp rewrite") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandJoinRewrite
    try {
      val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      ev.createOrReplaceTempView("bjr_events")
      val df = spark.sql(
        """SELECT a.event_id, b.event_id AS b_id FROM bjr_events a JOIN bjr_events b
          |  ON b.ts BETWEEN a.ts - INTERVAL 10 MINUTES AND a.ts + INTERVAL 10 MINUTES
          | AND b.event_id != a.event_id""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("Generate explode"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), plan)
      // ground truth: the same join WITHOUT the rule attached
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BandJoinRewrite)
      val naive = spark.sql(
        """SELECT a.event_id, b.event_id AS b_id FROM bjr_events a JOIN bjr_events b
          |  ON b.ts BETWEEN a.ts - INTERVAL 10 MINUTES AND a.ts + INTERVAL 10 MINUTES
          | AND b.event_id != a.event_id""".stripMargin)
      assert(df.count() == naive.count())
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BandJoinRewrite)
    }
  }

  test("joins with an equi conjunct are left untouched") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ BandJoinRewrite
    try {
      val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      val a = ev.select(col("user_id"), col("value").as("va"))
      val b = ev.select(col("user_id").as("ub"), col("value").as("vb"))
      val j = a.join(b, col("user_id") === col("ub") &&
        col("vb") >= col("va") - 1.0 && col("vb") <= col("va") + 1.0)
      val plan = j.queryExecution.executedPlan.toString()
      assert(!plan.contains("Generate explode"), plan)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == BandJoinRewrite)
    }
  }
}
