package graft.queries

import org.apache.spark.sql.functions._

/** Sketch-family aggregates — the approximate operators a 100 TB
  * pipeline substitutes for their exact forms (SURVEY §2.4's A2/A14 at
  * the scale where exact is a luxury): HyperLogLog++ distinct counts
  * and quantile sketches.
  *
  * Gate design: an approximate value cannot be hash-compared against a
  * DuckDB oracle (different sketch implementations), so — like
  * `f16_uuid` — the gated projection carries the EXACT value (oracle-
  * checkable) plus a boolean asserting the sketch landed inside its
  * documented error bound; the oracle states `true`. The exact twin in
  * the projection is the test harness, not the production shape: at
  * scale the sketch runs alone.
  *
  * Determinism note: HLL++ register-merge is a commutative max, so the
  * approx count is identical under any partitioning. The quantile
  * sketch's compression IS merge-order-sensitive, which is exactly why
  * only its rank-bound boolean (guaranteed regardless of merge order)
  * is gated, never the raw approx value.
  */
object SketchOps {

  val all: Seq[Q] = Seq(

    // HLL++ distinct with rsd 2%, gated within 5% of exact. Scale: the
    // sketch is a fixed few-KB state per group, map-side combinable —
    // the shuffle carries registers, not user ids.
    Q("a17_hll_distinct",
      "approx_count_distinct (HLL++) per type, gated within 5% of exact",
      """SELECT event_type, count(DISTINCT user_id) AS exact_distinct,
        |       true AS hll_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_distinct"),
          approx_count_distinct(col("user_id"), 0.02).as("hll"))
        .select(col("event_type"), col("exact_distinct"),
          (abs(col("hll") - col("exact_distinct"))
            <= col("exact_distinct") * 0.05).as("hll_ok"))
        .orderBy("event_type")
    },

    // Quantile sketch: approx p50 must land between the exact p45 and
    // p55 (a rank-error bound the sketch guarantees at accuracy 10k
    // regardless of merge order). n is the oracle-checkable exact side.
    Q("a18_approx_quantiles",
      "percentile_approx p50 per type, gated inside the exact p45..p55 rank band",
      """SELECT event_type, count(*) AS n, true AS p50_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          expr("percentile_approx(value, 0.5, 10000)").as("p50_approx"),
          expr("percentile(value, array(0.45, 0.55))").as("band"))
        .select(col("event_type"), col("n"),
          (col("p50_approx") >= col("band").getItem(0) &&
            col("p50_approx") <= col("band").getItem(1)).as("p50_ok"))
        .orderBy("event_type")
    })
}
