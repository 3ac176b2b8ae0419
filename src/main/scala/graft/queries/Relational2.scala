package graft.queries

import org.apache.spark.sql.functions._

/** Second tranche of SURVEY.md §2 operators: ordered array/string
  * aggregation (A5-A7), the scalar-function families (F1-F18), the
  * band self-join (J5) in its scale-safe bucketed form, and the
  * config-driven union (U3).
  */
object Relational2 {

  /** U3: refresh-policy-style config (discriminator, filter threshold)
    * — the reference builds one UNION ALL branch per config row
    * (response_refresher.py:151-209).
    */
  private val UnionConfig: Seq[(String, String, Double)] = Seq(
    ("high_value", "purchase", 50.0),
    ("mid_value", "purchase", 20.0),
    ("clicks", "click", 0.0))

  /** x3's hot-key fact-fact join shape, shared with PlanSpec's
    * skew-split gate: shard key k where k=0 carries ~1/3 of all rows
    * on BOTH sides, joined un-salted and aggregated on a non-join key.
    */
  private[graft] def x3SkewShape(ev: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    def k = when(col("user_id") % 3 === 0, lit(0L))
      .otherwise(col("user_id") % 32)
    // the repartition models the many-mapper reality of any real scan:
    // AQE splits a skewed reduce partition by MAP-OUTPUT ranges, so a
    // single-file local fixture (one map task) would leave it nothing
    // to split — at 100 TB the scan has thousands of mappers and this
    // exchange does not exist
    val l = ev.select(k.as("k"), col("event_type"), col("value"))
      .repartition(8)
    val r = ev.filter(col("event_id") % 100 === 0).select(k.as("k"))
    l.join(r, "k")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_pairs"), dsum(col("value")).as("total"))
  }

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // A5 — ARRAY_AGG IGNORE NULLS as a *set*: BQ order is
    // nondeterministic (games_features.sqlx:15-55), so the engine
    // contract is sorted-distinct. The gate output is the CSV-joined
    // form — the driver's compare only handles scalar cells; the array
    // aggregation itself still runs in the plan.
    Q("a5_array_agg_set",
      "sorted-distinct array aggregation per key (CSV-flattened for the gate)",
      """SELECT user_id,
        |  array_to_string(list_sort(list_distinct(list(event_type))), '|') AS types_csv
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy("user_id")
        .agg(array_join(sort_array(collect_set(col("event_type"))), "|").as("types_csv"))
        .orderBy("user_id")
    },

    // ---------------------------------------------------------------
    // A6 — ARRAY_AGG(STRUCT(...) ORDER BY k) (game_profile.sqlx:23-34):
    // explicit ordering via sort key embedded in the struct.
    Q("a6_array_agg_struct",
      "per-key ordered array of top-3 structs (value desc, id asc), re-exploded to scalar rows for the gate",
      """SELECT user_id, rn AS rnk, event_id, value FROM (
        |  SELECT user_id, event_id, value, row_number() OVER (
        |    PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events WHERE event_type = 'purchase')
        |WHERE rn <= 3 ORDER BY user_id, rnk""".stripMargin) { (s, d) =>
      t(s, d, "events").filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(expr(
          """transform(
            |  slice(array_sort(collect_list(struct(-value AS nv, event_id, value))), 1, 3),
            |  s_ -> struct(s_.event_id AS event_id, s_.value AS value))""".stripMargin)
          .as("top_events"))
        .select(col("user_id"), posexplode(col("top_events")))
        .select(col("user_id"), (col("pos") + 1).cast("long").as("rnk"),
          col("col.event_id").as("event_id"), col("col.value").as("value"))
        .orderBy("user_id", "rnk")
    },

    // ---------------------------------------------------------------
    // A7 — STRING_AGG(expr, ', ' ORDER BY rank)
    // (best_player_counts.sqlx:58-59): CSV of ordered values.
    Q("a7_string_agg_ordered",
      "ordered CSV aggregation per key",
      """SELECT user_id,
        |  array_to_string(
        |    list_transform(
        |      list_slice(list_sort(list({'nv': -value, 'event_id': event_id})), 1, 3),
        |      s_ -> cast(s_.event_id as varchar)), ', ') AS top_ids_csv
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      t(s, d, "events").filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(expr(
          """array_join(
            |  transform(
            |    slice(array_sort(collect_list(struct(-value AS nv, event_id))), 1, 3),
            |    s_ -> cast(s_.event_id as string)), ', ')""".stripMargin)
          .as("top_ids_csv"))
        .orderBy("user_id")
    },

    // ---------------------------------------------------------------
    // F1/F2/F3/F5/F6 — arithmetic with ÷0 guard, ROUND, SAFE_CAST,
    // LN, COALESCE (best_player_counts.sqlx:10-33, games_features:74).
    Q("f1_scalar_math",
      "guarded percentage math, round, try_cast, ln",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice = 0 THEN 0.0
        |       ELSE round(100.0 * cast(o_shippriority + 1 as double)
        |                  / cast(o_totalprice as double), 2) END AS pct,
        |  try_cast(o_orderpriority as integer) AS prio_num,
        |  round(ln(o_totalprice + 1), 6) AS ln_price,
        |  coalesce(try_cast(substr(o_orderpriority, 1, 1) as integer), -1) AS prio_digit
        |FROM (SELECT o_orderkey, o_totalprice, o_orderpriority, 0 AS o_shippriority
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .withColumn("o_shippriority", lit(0))
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") === 0, 0.0)
            .otherwise(round(lit(100.0) * (col("o_shippriority") + 1).cast("double")
              / col("o_totalprice").cast("double"), 2)).as("pct"),
          // ANSI-off legacy cast: null-on-malformed like try_cast, but
          // parses without throwing — try_cast's ANSI-with-catch path
          // costs a thrown exception per malformed row, which at 100 TB
          // is the whole CPU budget (~4s of this query's bench time at
          // sf0.1 was exception unwinding)
          col("o_orderpriority").cast("int").as("prio_num"),
          round(log(col("o_totalprice") + 1), 6).as("ln_price"),
          coalesce(substring(col("o_orderpriority"), 1, 1).cast("int"), lit(-1))
            .as("prio_digit"))
        .orderBy("o_orderkey")
    },

    // ---------------------------------------------------------------
    // F8/F7 — STRUCT constructor + null-struct guard
    // (game_profile.sqlx:99-113).
    Q("f8_struct_nullguard",
      "null-guarded struct column, fields projected back to scalars for the gate",
      """SELECT c.c_custkey,
        |  o.o_custkey IS NOT NULL AS has_stats,
        |  CASE WHEN o.o_custkey IS NULL THEN NULL ELSE o.n END AS n_orders,
        |  CASE WHEN o.o_custkey IS NULL THEN NULL ELSE o.mx END AS max_price
        |FROM customer c
        |LEFT JOIN (SELECT o_custkey, count(*) AS n, max(o_totalprice) AS mx
        |           FROM orders GROUP BY o_custkey) o
        |  ON c.c_custkey = o.o_custkey
        |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), max(col("o_totalprice")).as("mx"))
      t(s, d, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"),
          when(col("o_custkey").isNull, lit(null))
            .otherwise(struct(col("n").as("n_orders"), col("mx").as("max_price")))
            .as("order_stats"))
        .select(col("c_custkey"),
          col("order_stats").isNotNull.as("has_stats"),
          col("order_stats.n_orders").as("n_orders"),
          col("order_stats.max_price").as("max_price"))
        .orderBy("c_custkey")
    },

    // ---------------------------------------------------------------
    // F10/F11 — interval arithmetic + date diffs
    // (response_fetcher.py:62, bgg_predictions.sqlx:45-46).
    Q("f10_time_arith",
      "interval subtraction, day diff, hour extraction",
      """SELECT event_id, ts - INTERVAL 36 HOUR AS ts_lag,
        |  date_diff('day', TIMESTAMP '2024-01-01 00:00:00', ts) AS days_in,
        |  extract(hour FROM ts) AS hr
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        (col("ts") - expr("INTERVAL 36 HOURS")).as("ts_lag"),
        datediff(col("ts"), lit("2024-01-01 00:00:00").cast("timestamp")).as("days_in"),
        hour(col("ts")).cast("long").as("hr"))
        .orderBy("event_id")
    },

    // ---------------------------------------------------------------
    // F15/F17 — UNNEST to rows + RANGE_BUCKET partition key
    // (response_fetcher.py:70-71; game_profile.sqlx:15).
    Q("f15_explode_bucket",
      "explode an array column to rows, integer range-bucketing",
      """SELECT o_orderkey, unnest([1, 2, 3]) AS slot,
        |  cast(floor(o_orderkey / 1000) as bigint) AS key_bucket
        |FROM orders WHERE o_orderkey <= 100
        |ORDER BY o_orderkey, slot""".stripMargin) { (s, d) =>
      t(s, d, "orders").filter(col("o_orderkey") <= 100)
        .select(col("o_orderkey"),
          explode(array(lit(1), lit(2), lit(3))).as("slot"),
          floor(col("o_orderkey") / 1000).as("key_bucket"))
        .orderBy("o_orderkey", "slot")
    },

    // ---------------------------------------------------------------
    // J5 — the band self-join (game_neighbors.sqlx:53-65), in the
    // bucketed form that survives scale: bucket the band column at
    // band width, explode each left row into its bucket ± 1, equi-join
    // on the bucket, re-check the true band predicate. Turns an O(n^2)
    // theta join into a shuffle-bounded equi-join.
    Q("j5_band_join_bucketed",
      "band self-join via bucket-explode equi-join (scale-safe theta join)",
      """SELECT a.p_partkey, count(*) AS n_close
        |FROM part a JOIN part b
        |  ON b.p_partkey != a.p_partkey
        | AND b.p_retailprice BETWEEN a.p_retailprice - 0.5 AND a.p_retailprice + 0.5
        |GROUP BY a.p_partkey ORDER BY a.p_partkey""".stripMargin) { (s, d) =>
      val p = t(s, d, "part").select("p_partkey", "p_retailprice")
      val width = 0.5
      val a = p.select(col("p_partkey").as("a_key"), col("p_retailprice").as("a_price"))
        .withColumn("bucket",
          explode(array((-1 to 1).map(o => floor(col("a_price") / width) + o): _*)))
      val b = p.select(col("p_partkey").as("b_key"), col("p_retailprice").as("b_price"))
        .withColumn("bucket", floor(col("b_price") / width))
      a.join(b, Seq("bucket"))
        .filter(col("b_key") =!= col("a_key")
          && col("b_price").between(col("a_price") - width, col("a_price") + width))
        .groupBy(col("a_key").as("p_partkey"))
        .agg(count(lit(1)).as("n_close"))
        .orderBy("p_partkey")
    },

    // ---------------------------------------------------------------
    // J4 + F6/F7/F8 + A5/A6 — the game_profile assembly shape
    // (game_profile.sqlx:115-119): left-join independent aggregate
    // blocks into one nested serving row; struct nulled when its
    // block is absent, arrays coalesced to empty.
    Q("j4_profile_assembly",
      "serving-row assembly: left-joined blocks, null-guarded struct, coalesced arrays (gate output flattened)",
      s"""WITH u AS (SELECT DISTINCT user_id FROM events),
         |b1 AS (SELECT user_id, count(*) AS n, ${dsumSql("value")} AS total
         |       FROM events WHERE event_type = 'purchase' GROUP BY user_id),
         |b2 AS (SELECT user_id,
         |         list_sort(list_distinct(list(event_type))) AS types
         |       FROM events GROUP BY user_id)
         |SELECT u.user_id,
         |  b1.user_id IS NOT NULL AS has_purchases,
         |  CASE WHEN b1.user_id IS NULL THEN NULL ELSE b1.n END AS n_purchases,
         |  CASE WHEN b1.user_id IS NULL THEN NULL ELSE b1.total END AS total_spent,
         |  array_to_string(coalesce(b2.types, []), '|') AS event_types_csv
         |FROM u LEFT JOIN b1 ON u.user_id = b1.user_id
         |       LEFT JOIN b2 ON u.user_id = b2.user_id
         |ORDER BY u.user_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val u = ev.select("user_id").distinct()
      val b1 = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("total"))
        .withColumnRenamed("user_id", "b1_user_id")
      val b2 = ev.groupBy("user_id")
        .agg(sort_array(collect_set(col("event_type"))).as("types"))
        .withColumnRenamed("user_id", "b2_user_id")
      u.join(b1, col("user_id") === col("b1_user_id"), "left")
        .join(b2, col("user_id") === col("b2_user_id"), "left")
        .select(col("user_id"),
          when(col("b1_user_id").isNull, lit(null))
            .otherwise(struct(col("n").as("n_purchases"), col("total").as("total_spent")))
            .as("purchases"),
          coalesce(col("types"), array().cast("array<string>")).as("event_types"))
        .select(col("user_id"),
          col("purchases").isNotNull.as("has_purchases"),
          col("purchases.n_purchases").as("n_purchases"),
          col("purchases.total_spent").as("total_spent"),
          array_join(col("event_types"), "|").as("event_types_csv"))
        .orderBy("user_id")
    },

    // ---------------------------------------------------------------
    // P10 — latest-version filter via scalar subquery
    // (bgg_game_embeddings.sqlx:10-13): stays distributed as a
    // broadcast 1-row aggregate, no driver collect.
    Q("p10_latest_version",
      "filter to the max 'version' via broadcast scalar subquery",
      """SELECT vec_id, label FROM embeddings
        |WHERE label = (SELECT max(label) FROM embeddings)
        |ORDER BY vec_id""".stripMargin) { (s, d) =>
      val e = t(s, d, "embeddings")
      val mx = e.agg(max(col("label")).as("max_label"))
      e.crossJoin(broadcast(mx))
        .filter(col("label") === col("max_label"))
        .select("vec_id", "label")
        .orderBy("vec_id")
    },

    // ---------------------------------------------------------------
    // F18-adjacent — typed JSON parsing of a stored payload column
    // (the reference re-parses stringified payloads,
    // response_processor.py:254-265): from_json with an explicit
    // schema, never inference (SURVEY §1.2).
    Q("f18_json_parse",
      "from_json with explicit schema over the stored payload column",
      """SELECT event_id, cast(json_extract(props, '$.k') as bigint) AS k,
        |  cast(json_extract(props, '$.k') as bigint) % 10 AS k_mod
        |FROM events WHERE event_type = 'purchase'
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      t(s, d, "events").filter(col("event_type") === "purchase")
        .withColumn("j", from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k BIGINT")))
        .select(col("event_id"), col("j.k").as("k"),
          (col("j.k") % 10).as("k_mod"))
        .orderBy("event_id")
    },

    // ---------------------------------------------------------------
    // F16 — GENERATE_UUID (raw_responses.record_id). The values are
    // nondeterministic, so the gate checks STRUCTURE instead: every
    // generated id must be a well-formed v4 UUID and all ids distinct.
    // That summary is deterministic, so the oracle can state it.
    Q("f16_uuid",
      "uuid() per ingested row, verified structurally (format + distinctness)",
      """SELECT n AS n_rows, n AS n_distinct, n AS n_wellformed
        |FROM (SELECT least(count(*), 100) AS n FROM events)""".stripMargin) { (s, d) =>
      t(s, d, "events").orderBy("event_id").limit(100)
        .select(expr("uuid()").as("record_id"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("record_id")).as("n_distinct"),
          sum(when(col("record_id").rlike(
            "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}-[0-9a-f]{12}$"),
            1L).otherwise(0L)).as("n_wellformed"))
    },

    // ---------------------------------------------------------------
    // W1 at scale: dedup-to-latest as a max(struct) aggregate instead
    // of a window (SURVEY §4 "Dedup-to-latest before join"). Same
    // result as w1_dedup_latest, but partial aggregation combines
    // map-side — the shuffle carries one row per key, not the whole
    // table, and there is no per-partition sort. At 100 TB this is the
    // difference between shuffling ~n rows and shuffling ~k keys.
    Q("w3_dedup_maxstruct",
      "dedup-to-latest via max(struct) aggregate (map-side combinable)",
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy("user_id")
        .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
          col("value"))).as("m"))
        .select(col("user_id"), col("m.event_id").as("event_id"),
          col("m.event_type").as("event_type"), col("m.value").as("value"))
        .orderBy("user_id")
    },

    // ---------------------------------------------------------------
    // J5 again, but written as the NAIVE theta join and rewritten
    // automatically by graft.plans.BandJoinRewrite — proving the
    // optimizer rule inside the correctness gate (same oracle shape
    // as j5_band_join_bucketed's manual form).
    Q("j5b_band_join_auto",
      "naive band theta join auto-rewritten by the optimizer rule",
      """SELECT a.p_partkey, count(*) AS n_close
        |FROM part a JOIN part b
        |  ON b.p_retailprice BETWEEN a.p_retailprice - 0.5 AND a.p_retailprice + 0.5
        | AND b.p_partkey != a.p_partkey
        |GROUP BY a.p_partkey ORDER BY a.p_partkey""".stripMargin) { (s, d) =>
      if (!s.experimental.extraOptimizations.contains(graft.plans.BandJoinRewrite))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ graft.plans.BandJoinRewrite
      val p = t(s, d, "part").select("p_partkey", "p_retailprice")
      val a = p.select(col("p_partkey").as("a_key"), col("p_retailprice").as("a_price"))
      val b = p.select(col("p_partkey").as("b_key"), col("p_retailprice").as("b_price"))
      a.join(b, col("b_price") >= col("a_price") - 0.5 &&
          col("b_price") <= col("a_price") + 0.5 &&
          col("b_key") =!= col("a_key"))
        .groupBy(col("a_key").as("p_partkey"))
        .agg(count(lit(1)).as("n_close"))
        .orderBy("p_partkey")
    },

    // ---------------------------------------------------------------
    // Skew path: salted two-stage aggregation. The oracle is the
    // PLAIN aggregate — salting must be result-identical (decimal
    // partials keep the double exact across the extra stage).
    Q("x1_salted_agg",
      "salted two-stage aggregation == plain aggregate (skew mitigation)",
      s"""SELECT user_id, count(*) AS n, ${dsumSql("value")} AS total
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      graft.operators.Salt.saltedSumCount(
        t(s, d, "events"), Seq("user_id"), col("event_id"),
        col("value").cast(DecimalType(30, 2)), buckets = 8)
        .select(col("user_id"), col("n"),
          col("total").cast(DoubleType).as("total"))
        .orderBy("user_id")
    },

    // ---------------------------------------------------------------
    // Beyond-reference: ROLLUP — subtotals + grand total in one pass
    // (partial-agg friendly: Spark expands grouping sets before the
    // shuffle, so map-side combine still applies). grouping() flags
    // disambiguate real NULL keys from subtotal rows.
    Q("a13_rollup",
      "rollup subtotals with grouping flags and decimal-exact sums",
      s"""SELECT c_mktsegment, c_nationkey,
         |  cast(grouping(c_mktsegment) as bigint) AS g_seg,
         |  cast(grouping(c_nationkey) as bigint) AS g_nat,
         |  count(*) AS n, ${dsumSql("c_acctbal")} AS total_bal
         |FROM customer
         |GROUP BY ROLLUP (c_mktsegment, c_nationkey)
         |ORDER BY g_seg, g_nat, c_mktsegment, c_nationkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .rollup("c_mktsegment", "c_nationkey")
        .agg(grouping(col("c_mktsegment")).cast("long").as("g_seg"),
          grouping(col("c_nationkey")).cast("long").as("g_nat"),
          count(lit(1)).as("n"),
          dsum(col("c_acctbal")).as("total_bal"))
        .select("c_mktsegment", "c_nationkey", "g_seg", "g_nat", "n", "total_bal")
        .orderBy("g_seg", "g_nat", "c_mktsegment", "c_nationkey")
    },

    // ---------------------------------------------------------------
    // Beyond-reference: AS-OF join — "state at event time" (each event
    // joined to the user's latest purchase at-or-before its ts). The
    // naive form is a theta join (quadratic); the scale form used here
    // is the classic union-merge: tag both sides, ONE shuffle+sort per
    // user, carry the last-seen purchase forward with
    // last(ignoreNulls) over an unbounded-preceding frame. The oracle
    // is DuckDB's native ASOF LEFT JOIN — deterministic because
    // (user_id, ts) is unique among purchases. At equal timestamps the
    // purchase sorts before its own event row (kind 0 < 1), matching
    // ASOF's inclusive `>=`.
    Q("j13_asof_join",
      "as-of join (latest purchase at-or-before each event) via union-merge",
      """WITH p AS (SELECT user_id, ts AS p_ts, event_id AS p_id, value AS p_value
        |           FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id, p.p_id AS prev_purchase_id, p.p_value AS prev_purchase_value
        |FROM events e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.p_ts
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("ts"), lit(0).as("kind"),
        lit(null).cast("long").as("event_id"),
        col("event_id").as("p_id"), col("value").as("p_value"))
      val e = ev.select(
        col("user_id"), col("ts"), lit(1).as("kind"), col("event_id"),
        lit(null).cast("long").as("p_id"), lit(null).cast("double").as("p_value"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("kind"), col("p_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      p.unionByName(e)
        .withColumn("prev_purchase_id", last(col("p_id"), ignoreNulls = true).over(w))
        .withColumn("prev_purchase_value", last(col("p_value"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .select(col("event_id"), col("prev_purchase_id"), col("prev_purchase_value"))
        .orderBy("event_id")
    },

    // ---------------------------------------------------------------
    // As-of join with a match TOLERANCE (pandas merge_asof(tolerance=))
    // — j13's carry-forward answers "the latest purchase ever before
    // this event", but attribution semantics usually want "within the
    // last 30 minutes, else NO match": the carried value must be
    // nulled when it is too old, not silently used. Same one-shuffle
    // union-merge as j13 (the purchase timestamp rides along as a
    // third carried column), plus one comparison — no second shuffle,
    // no theta join. The oracle applies the identical post-condition
    // to DuckDB's native ASOF result.
    Q("j16_asof_tolerance",
      "as-of join with 30-minute tolerance: stale matches null out (merge_asof semantics)",
      """WITH p AS (SELECT user_id, ts AS p_ts, event_id AS p_id, value AS p_value
        |           FROM events WHERE event_type = 'purchase')
        |SELECT e.event_id,
        |  CASE WHEN p.p_ts >= e.ts - INTERVAL 30 MINUTE THEN p.p_id END
        |    AS prev_purchase_id,
        |  CASE WHEN p.p_ts >= e.ts - INTERVAL 30 MINUTE THEN p.p_value END
        |    AS prev_purchase_value
        |FROM events e ASOF LEFT JOIN p
        |  ON e.user_id = p.user_id AND e.ts >= p.p_ts
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val ev = t(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase").select(
        col("user_id"), col("ts"), lit(0).as("kind"),
        lit(null).cast("long").as("event_id"),
        col("event_id").as("p_id"), col("value").as("p_value"),
        col("ts").as("p_ts_m"))
      val e = ev.select(
        col("user_id"), col("ts"), lit(1).as("kind"), col("event_id"),
        lit(null).cast("long").as("p_id"), lit(null).cast("double").as("p_value"),
        lit(null).cast("timestamp").as("p_ts_m"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("kind"), col("p_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      p.unionByName(e)
        .withColumn("m_id", last(col("p_id"), ignoreNulls = true).over(w))
        .withColumn("m_value", last(col("p_value"), ignoreNulls = true).over(w))
        .withColumn("m_ts", last(col("p_ts_m"), ignoreNulls = true).over(w))
        .filter(col("kind") === 1)
        .withColumn("fresh",
          col("m_ts") >= col("ts") - expr("INTERVAL 30 MINUTES"))
        .select(col("event_id"),
          when(col("fresh"), col("m_id")).as("prev_purchase_id"),
          when(col("fresh"), col("m_value")).as("prev_purchase_value"))
        .orderBy("event_id")
    },

    // ---------------------------------------------------------------
    // Beyond-reference window FRAMES: rolling 7-row money sum per user.
    // The frame sum goes through decimal (exact partials) and casts
    // back, so both engines agree bitwise on every row of the running
    // aggregate — the same dsum discipline, per-frame.
    Q("w4_rolling_frame",
      "rolling 7-row decimal-exact sum + frame count per user",
      """SELECT event_id, user_id,
        |  cast(sum(cast(value as decimal(30,2))) OVER w as double) AS rolling_sum,
        |  count(*) OVER w AS n_in_frame
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-6, Window.currentRow)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast(DecimalType(30, 2))).over(w)
            .cast(DoubleType).as("rolling_sum"),
          count(lit(1)).over(w).as("n_in_frame"))
        .orderBy("event_id")
    },

    // ---------------------------------------------------------------
    // Beyond-reference analytics: lag/lead navigation — per-user
    // previous value, next event id, and the delta (single IEEE
    // subtraction, deterministic cross-engine).
    Q("w5_lag_lead",
      "lag/lead navigation with null-guarded delta per user",
      """SELECT event_id, user_id,
        |  lag(value) OVER w AS prev_value,
        |  lead(event_id) OVER w AS next_event_id,
        |  value - lag(value) OVER w AS delta
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("event_id"), 1).over(w).as("next_event_id"),
          (col("value") - lag(col("value"), 1).over(w)).as("delta"))
        .orderBy("event_id")
    },

    // ---------------------------------------------------------------
    // Beyond-reference: exact interpolated percentiles (median/p90)
    // per group. Both engines define quantiles as linear interpolation
    // at q*(n-1); results are rounded to 6 decimals to pin potential
    // 1-ulp interpolation differences. Scale note: exact percentiles
    // need the group's values together (one shuffle); the streaming/
    // huge-cardinality alternative is approx_percentile (t-digest),
    // which is sketch-mergeable — same trade as count-distinct vs HLL.
    Q("a14_percentiles",
      "exact interpolated median/p90 per group (rounded to 6 decimals)",
      """SELECT c_mktsegment,
        |  round(quantile_cont(c_acctbal, 0.5), 6) AS median_bal,
        |  round(quantile_cont(c_acctbal, 0.9), 6) AS p90_bal
        |FROM customer GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .groupBy("c_mktsegment")
        .agg(
          round(expr("percentile(c_acctbal, 0.5)"), 6).as("median_bal"),
          round(expr("percentile(c_acctbal, 0.9)"), 6).as("p90_bal"))
        .orderBy("c_mktsegment")
    },

    // ---------------------------------------------------------------
    // Skew-join path: salt the (skewed) big side, replicate the small
    // side buckets× — the manual form of AQE skew splitting, for skew
    // AQE can't see. The oracle is the PLAIN join: salting must be
    // row-identical.
    Q("x2_salted_join",
      "salted skewed join == plain join (replicated small side)",
      """SELECT e.event_id, c.c_mktsegment
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      graft.operators.Salt.saltedJoin(
        t(s, d, "events").select(col("event_id"), col("user_id").as("c_custkey")),
        t(s, d, "customer").select("c_custkey", "c_mktsegment"),
        "c_custkey", col("event_id"), buckets = 8)
        .select("event_id", "c_mktsegment")
        .orderBy("event_id")
    },

    // ---------------------------------------------------------------
    // AQE runtime skew-join — x2's problem WITHOUT the manual salt:
    // a fact-fact join whose key is dominated by one hot shard (k=0
    // carries ~1/3 of all rows on both sides). At 100 TB this is the
    // difference between a babysat job (someone hand-salts every hot
    // key) and a self-healing one: AQE measures the actual shuffle
    // partition sizes at runtime and splits the hot partition into
    // advisory-sized pieces, each joined against a duplicate of the
    // matching right partition — the same row multiset, so the gate
    // is a plain join+agg oracle. The post-join aggregation groups on
    // event_type, NOT the join key, so the split never violates a
    // downstream distribution requirement (grouping on the join key
    // would let Catalyst reuse the join's partitioning, which a skew
    // split must not break — that shape needs forceOptimizeSkewedJoin
    // and an extra exchange). Detection thresholds scale with the
    // fixture (production keeps the 256 MB default); PlanSpec pins
    // the skew=true split shape at sf0.001.
    Q("x3_aqe_skew_join",
      "AQE runtime skew-split of a hot-key fact-fact join == plain join+agg (no manual salt)",
      """WITH l AS (SELECT CASE WHEN user_id % 3 = 0 THEN 0 ELSE user_id % 32 END AS k,
        |                  event_type, value FROM events),
        |r AS (SELECT CASE WHEN user_id % 3 = 0 THEN 0 ELSE user_id % 32 END AS k
        |      FROM events WHERE event_id % 100 = 0)
        |SELECT l.event_type, count(*) AS n_pairs,
        |       cast(sum(cast(l.value as decimal(30,2))) as double) AS total
        |FROM l JOIN r ON l.k = r.k
        |GROUP BY l.event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val (res, _) = graft.operators.Salt.runWithConfs(s,
        graft.operators.Salt.aqeSkewConfs(thresholdBytes = 16384))(
        x3SkewShape(t(s, d, "events")))
      res.orderBy("event_type")
    },

    // ---------------------------------------------------------------
    // U3 — dynamic UNION ALL from config (response_refresher.py:151-209).
    // The naive form scans the fact table once PER CONFIG ENTRY (the
    // oracle below states it that way); the engine evaluates every
    // entry's predicate in one pass — each row explodes into the tags
    // it matches — so the scan and shuffle count is independent of the
    // config size. A 50-entry config at 100 TB is one read, not fifty.
    Q("u3_config_union",
      "config-driven union of filtered aggregates (single-scan tag explode)",
      UnionConfig.map { case (tag, typ, minV) =>
        s"""SELECT '$tag' AS bucket, user_id, count(*) AS n
           |FROM events WHERE event_type = '$typ' AND value >= $minV
           |GROUP BY user_id""".stripMargin
      }.mkString("SELECT * FROM (\n", "\nUNION ALL\n", "\n) ORDER BY bucket, user_id")) { (s, d) =>
      // precondition of the explode form: one row per (tag, user) —
      // duplicate tags in the config would merge counts that the
      // UNION ALL semantics keep as separate rows
      require(UnionConfig.map(_._1).distinct.size == UnionConfig.size,
        "u3 config tags must be distinct")
      val tags = array(UnionConfig.map { case (tag, typ, minV) =>
        when(col("event_type") === typ && col("value") >= minV, lit(tag))
      }: _*)
      t(s, d, "events")
        .select(col("user_id"), explode(array_compact(tags)).as("bucket"))
        .groupBy("bucket", "user_id").agg(count(lit(1)).as("n"))
        .select("bucket", "user_id", "n")
        .orderBy("bucket", "user_id")
    }
  )
}
