package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Relational operator catalog — one named query per operator family in
  * SURVEY.md §2 (scans S*, predicates P*, joins J*, aggregations A*,
  * windows W*, sorts/limits O*, set-ops U*, scalar functions F*),
  * re-expressed over the synthetic TPC-H-ish test tables.
  *
  * Every query ends with a deterministic ORDER BY over a unique key so
  * the written parquet is canonical; the oracle SQL carries the same
  * ORDER BY. Aggregated doubles go through [[graft.queries.dsum]] for
  * cross-engine bit-determinism.
  */
object Relational {

  private val ships = "TIMESTAMP '1997-01-01 00:00:00'"
  private val mid   = "TIMESTAMP '2024-01-15 00:00:00'"

  val all: Seq[Q] = Seq(

    // ------------------------------------------------------------------
    // S3/S4 — scans: explicit projection (column pruning reaches the
    // parquet ReadSchema) and key point-lookup (predicate pushdown).
    // Ref: readers/games.py:23-64 (SURVEY §2.1 S3, S4).
    Q("s3_scan_project",
      "projection + filter pushed down to the parquet scan",
      s"""SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         |FROM lineitem
         |WHERE l_shipdate >= $ships AND l_returnflag = 'R'
         |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01 00:00:00").cast("timestamp")
          && col("l_returnflag") === "R")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
    },

    Q("s4_point_lookup",
      "parameterized point lookup on the table key",
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey = 42
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderkey") === 42)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // ------------------------------------------------------------------
    // A* + F1 — the flagship grouped aggregation (TPC-H Q1 shape):
    // map-side partial agg, decimal-exact money sums, deterministic avg.
    Q("q1_pricing_summary",
      "grouped aggregation with exact decimal money sums (partial-agg friendly)",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS sum_disc_price,
         |  ${davgSql("l_quantity")} AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ------------------------------------------------------------------
    // P1 — SELECT DISTINCT projection (games_active.sqlx:13-38).
    Q("p1_distinct",
      "distinct projection",
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin) { (s, d) =>
      t(s, d, "customer").select("c_mktsegment", "c_nationkey").distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    },

    // P3 — null/threshold predicate (filter_categories.sqlx:13).
    Q("p3_null_threshold",
      "IS NOT NULL + threshold predicate",
      """SELECT c_custkey, c_acctbal FROM customer
        |WHERE c_acctbal IS NOT NULL AND c_acctbal > 0
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .filter(col("c_acctbal").isNotNull && col("c_acctbal") > 0)
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    },

    // P4 — vote-floor + IN-list (best_player_counts.sqlx:35-36).
    Q("p4_inlist",
      "IN-list + threshold predicate",
      """SELECT p_partkey, p_brand, p_size FROM part
        |WHERE p_size IN (1, 5, 9, 14) AND p_retailprice > 950
        |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      t(s, d, "part")
        .filter(col("p_size").isin(1, 5, 9, 14) && col("p_retailprice") > 950)
        .select("p_partkey", "p_brand", "p_size")
        .orderBy("p_partkey")
    },

    // P5 — disjunctive thresholds (best_player_counts.sqlx:50).
    Q("p5_disjunctive",
      "OR of two threshold predicates",
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |WHERE o_totalprice >= 400000 OR o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .filter(col("o_totalprice") >= 400000 || col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .orderBy("o_orderkey")
    },

    // P6/A10 — high-watermark predicate with a scalar subquery
    // (games_active.sqlx:43). Spark: 1-row aggregate cross-joined in
    // (stays distributed, no driver collect).
    Q("p6_watermark",
      "high-watermark filter via scalar subquery over self",
      """SELECT event_id, user_id, event_type, value FROM events
        |WHERE ts > (SELECT max(ts) - INTERVAL 3 DAY FROM events)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val wm = ev.agg((max(col("ts")) - expr("INTERVAL 3 DAYS")).as("wm"))
      ev.crossJoin(broadcast(wm))
        .filter(col("ts") > col("wm"))
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    },

    // ------------------------------------------------------------------
    // J1 — inner join to latest-timestamp (dedup-to-current,
    // games_active.sqlx:39-42). Two-column equi join against a grouped
    // max; at scale both sides shuffle on user_id — no broadcast.
    Q("j1_latest_inner",
      "2-col equi join against per-key MAX (dedup-to-current)",
      """WITH latest AS (SELECT user_id, max(ts) AS ts FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, e.event_type, e.value
        |FROM events e JOIN latest USING (user_id, ts)
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val latest = ev.groupBy("user_id").agg(max(col("ts")).as("ts"))
      ev.join(latest, Seq("user_id", "ts"))
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    },

    // J2 — multi-way left join of per-key aggregates
    // (games_features.sqlx:92-98).
    Q("j2_multi_left_agg",
      "left joins of several per-key aggregate blocks",
      s"""WITH o AS (
         |  SELECT o_custkey, count(*) AS n_orders,
         |         ${dsumSql("o_totalprice")} AS total_spent,
         |         min(o_orderdate) AS first_order
         |  FROM orders GROUP BY o_custkey),
         |urgent AS (
         |  SELECT o_custkey, count(*) AS n_urgent FROM orders
         |  WHERE o_orderpriority = '1-URGENT' GROUP BY o_custkey)
         |SELECT c.c_custkey, c.c_name, o.n_orders, o.total_spent,
         |       o.first_order, urgent.n_urgent
         |FROM customer c
         |LEFT JOIN o ON c.c_custkey = o.o_custkey
         |LEFT JOIN urgent ON c.c_custkey = urgent.o_custkey
         |ORDER BY c.c_custkey""".stripMargin) { (s, d) =>
      val c = t(s, d, "customer")
      val ord = t(s, d, "orders")
      val o = ord.groupBy("o_custkey").agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total_spent"),
        min(col("o_orderdate")).as("first_order"))
        .withColumnRenamed("o_custkey", "ok1")
      val urgent = ord.filter(col("o_orderpriority") === "1-URGENT")
        .groupBy("o_custkey").agg(count(lit(1)).as("n_urgent"))
        .withColumnRenamed("o_custkey", "ok2")
      c.join(o, c("c_custkey") === col("ok1"), "left")
        .join(urgent, c("c_custkey") === col("ok2"), "left")
        .select(c("c_custkey"), c("c_name"), col("n_orders"),
          col("total_spent"), col("first_order"), col("n_urgent"))
        .orderBy("c_custkey")
    },

    // J3 — dimension snowflake joins; small dims broadcast
    // (filter_categories.sqlx:10-12).
    Q("j3_snowflake",
      "3-way snowflake join with broadcast dimensions",
      s"""SELECT r_name, n_name, count(*) AS n_custs,
         |       ${dsumSql("c_acctbal")} AS total_bal
         |FROM region
         |JOIN nation ON r_regionkey = n_regionkey
         |JOIN customer ON n_nationkey = c_nationkey
         |GROUP BY r_name, n_name
         |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(broadcast(t(s, d, "nation")), col("n_nationkey") === col("c_nationkey"))
        .join(broadcast(t(s, d, "region")), col("r_regionkey") === col("n_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_custs"), dsum(col("c_acctbal")).as("total_bal"))
        .orderBy("r_name", "n_name")
    },

    // J6 — left anti join (unprocessed = raw MINUS ledger,
    // response_processor.py:161-163).
    Q("j6_anti",
      "anti join: keys absent from the other side",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    },

    // J7 — semi join (EXISTS, response_refresher.py:195-199).
    Q("j7_semi",
      "semi join: keys present in the other side",
      """SELECT c_custkey, c_nationkey FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 300000).select("o_custkey"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_nationkey")
        .orderBy("c_custkey")
    },

    // J8 — composite-key equi join (user_collection_predictions.sqlx:35-38).
    Q("j8_composite_key",
      "inner join on a composite key (USING two columns)",
      """WITH stats AS (
        |  SELECT user_id, event_type, count(*) AS n_same
        |  FROM events GROUP BY user_id, event_type)
        |SELECT e.event_id, e.user_id, e.event_type, stats.n_same
        |FROM events e JOIN stats USING (user_id, event_type)
        |WHERE e.event_type = 'purchase'
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val stats = ev.groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("n_same"))
      ev.join(stats, Seq("user_id", "event_type"))
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "event_type", "n_same")
        .orderBy("event_id")
    },

    // J9 — cross join with a 1-row aggregate subquery
    // (readers/games.py:200-217). Broadcast of the single row.
    Q("j9_cross_scalar",
      "cross join against a broadcast 1-row aggregate",
      s"""SELECT p_partkey, p_retailprice,
         |       p_retailprice - g.avg_price AS price_diff
         |FROM part, (SELECT ${dsumSql("p_retailprice")} / cast(count(*) as double)
         |            AS avg_price FROM part) g
         |ORDER BY p_partkey""".stripMargin) { (s, d) =>
      val p = t(s, d, "part")
      val g = p.agg((dsum(col("p_retailprice")) / count(lit(1)).cast("double"))
        .as("avg_price"))
      p.crossJoin(broadcast(g))
        .select(col("p_partkey"), col("p_retailprice"),
          (col("p_retailprice") - col("avg_price")).as("price_diff"))
        .orderBy("p_partkey")
    },

    // J10 — in-list as a driving table via UNNEST
    // (response_fetcher.py:68-72).
    Q("j10_unnest_inlist",
      "literal id-list unnested to a driving table, semi join",
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey IN (SELECT unnest([1, 5, 7, 11, 42]))
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      import s.implicits._
      val ids = Seq(1L, 5L, 7L, 11L, 42L).toDF("o_custkey")
      t(s, d, "orders")
        .join(broadcast(ids), Seq("o_custkey"), "left_semi")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // J11 — snapshot left join for change detection
    // (game_features_hash.sqlx:31-46): classify new/changed/unchanged.
    Q("j11_change_detect",
      "old-vs-new snapshot left join classifying new/changed/unchanged",
      s"""WITH old AS (
         |  SELECT user_id, count(*) AS c FROM events WHERE ts < $mid GROUP BY user_id),
         |cur AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id)
         |SELECT cur.user_id,
         |  CASE WHEN old.user_id IS NULL THEN 'new'
         |       WHEN old.c <> cur.c THEN 'changed'
         |       ELSE 'unchanged' END AS status
         |FROM cur LEFT JOIN old ON cur.user_id = old.user_id
         |ORDER BY cur.user_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val old = ev.filter(col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
        .groupBy("user_id").agg(count(lit(1)).as("c"))
        .withColumnsRenamed(Map("user_id" -> "old_user_id", "c" -> "old_c"))
      val cur = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
      cur.join(old, cur("user_id") === old("old_user_id"), "left")
        .select(cur("user_id"),
          when(col("old_user_id").isNull, "new")
            .when(col("old_c") =!= cur("c"), "changed")
            .otherwise("unchanged").as("status"))
        .orderBy("user_id")
    },

    // J12 — left join to first-occurrence + date arithmetic
    // (bgg_predictions.sqlx:44-48 is_new_1d/7d).
    Q("j12_first_seen_age",
      "left join to per-key first timestamp + day-diff flags",
      s"""WITH first_seen AS (
         |  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id)
         |SELECT e.event_id, e.user_id,
         |  cast(date_diff('day', f.first_ts, e.ts) as integer) AS days_since_first,
         |  date_diff('day', f.first_ts, e.ts) <= 7 AS is_new_7d
         |FROM events e JOIN first_seen f ON e.user_id = f.user_id
         |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val first = ev.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
        .withColumnRenamed("user_id", "f_user_id")
      ev.join(first, ev("user_id") === col("f_user_id"))
        .select(col("event_id"), ev("user_id"),
          datediff(col("ts"), col("first_ts")).as("days_since_first"),
          (datediff(col("ts"), col("first_ts")) <= 7).as("is_new_7d"))
        .orderBy("event_id")
    },

    // ------------------------------------------------------------------
    // A1 — GROUP BY + MIN/MAX (games_active.sqlx:7-11).
    Q("a1_groupby_minmax",
      "per-key min/max/count",
      """SELECT user_id, min(ts) AS first_ts, max(ts) AS last_ts, count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy("user_id")
        .agg(min(col("ts")).as("first_ts"), max(col("ts")).as("last_ts"),
          count(lit(1)).as("n"))
        .orderBy("user_id")
    },

    // A2 — COUNT(DISTINCT) (filter_categories.sqlx:9). Exact here;
    // approx_count_distinct is the documented 100 TB escape hatch.
    Q("a2_count_distinct",
      "exact distinct count per group",
      """SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))
        .orderBy("event_type")
    },

    // A3 — conditional counts / COUNTIF (client.py:273-275).
    Q("a3_conditional_count",
      "filtered conditional counts per group",
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'error') AS n_errors,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
        |  count(*) AS n
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy("user_id")
        .agg(
          count_if(col("event_type") === "error").as("n_errors"),
          count_if(col("event_type") === "purchase").as("n_purchases"),
          count(lit(1)).as("n"))
        .orderBy("user_id")
    },

    // A4 + F12 — AVG over a regex-extracted numeric (client.py:276-277).
    Q("a4_avg_regex_extract",
      "regexp_extract to int, deterministic average per group",
      """SELECT event_type,
        |  cast(sum(cast(regexp_extract(props, 'k": ([0-9]+)', 1) as bigint)) as double)
        |    / cast(count(*) as double) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy("event_type")
        .agg((sum(regexp_extract(col("props"), "k\": ([0-9]+)", 1).cast(LongType))
          .cast("double") / count(lit(1)).cast("double")).as("avg_k"))
        .orderBy("event_type")
    },

    // A8 — conditional MIN/MAX (best_player_counts.sqlx:60-63).
    Q("a8_conditional_minmax",
      "MIN/MAX over CASE-guarded values",
      """SELECT user_id,
        |  min(CASE WHEN event_type = 'purchase' THEN value END) AS min_purchase,
        |  max(CASE WHEN event_type = 'purchase' THEN value END) AS max_purchase
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy("user_id")
        .agg(
          min(when(col("event_type") === "purchase", col("value"))).as("min_purchase"),
          max(when(col("event_type") === "purchase", col("value"))).as("max_purchase"))
        .orderBy("user_id")
    },

    // A9 — boolean flag aggregate (best_player_counts.sqlx:64-65).
    Q("a9_bool_flag",
      "COUNT(CASE)>0 boolean flag per group",
      """SELECT user_id,
        |  count(CASE WHEN event_type = 'purchase' THEN 1 END) > 0 AS has_purchase,
        |  count(CASE WHEN event_type = 'error' THEN 1 END) > 0 AS has_error
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      t(s, d, "events").groupBy("user_id")
        .agg(
          (count(when(col("event_type") === "purchase", 1)) > 0).as("has_purchase"),
          (count(when(col("event_type") === "error", 1)) > 0).as("has_error"))
        .orderBy("user_id")
    },

    // ------------------------------------------------------------------
    // W1 — dedup-to-latest via ROW_NUMBER (bgg_predictions.sqlx:36,49):
    // unique tiebreak (event_id DESC) pins determinism.
    Q("w1_dedup_latest",
      "ROW_NUMBER()=1 dedup-to-latest with explicit tiebreak",
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn = 1
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "event_type", "value")
        .orderBy("user_id")
    },

    // W2 — per-group top-k ranking (best_player_counts.sqlx:47-48,
    // game_neighbors.sqlx:67-72).
    Q("w2_topk_per_group",
      "per-group top-k by rank with deterministic tiebreak",
      """SELECT user_id, event_id, value, cast(rn as integer) AS rnk FROM (
        |  SELECT user_id, event_id, value, row_number() OVER (
        |    PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        |  FROM events WHERE event_type = 'purchase') WHERE rn <= 2
        |ORDER BY user_id, rnk""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("value").desc, col("event_id"))
      t(s, d, "events").filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "value")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .select(col("user_id"), col("event_id"), col("value"),
          col("rn").cast(IntegerType).as("rnk"))
        .orderBy("user_id", "rnk")
    },

    // ------------------------------------------------------------------
    // O1 — global top-N (game_dropdown_options.sqlx:14-15): Spark plans
    // TakeOrderedAndProject, no full sort at scale.
    Q("o1_global_topn",
      "global ORDER BY ... LIMIT N (TakeOrderedAndProject)",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // O2 — top-N entities by count (filter_categories.sqlx:15-16).
    Q("o2_topn_entities",
      "aggregate then top-N with name tiebreak",
      """SELECT p_brand, count(*) AS game_count FROM part
        |GROUP BY p_brand ORDER BY game_count DESC, p_brand LIMIT 10""".stripMargin) { (s, d) =>
      t(s, d, "part").groupBy("p_brand").agg(count(lit(1)).as("game_count"))
        .orderBy(col("game_count").desc, col("p_brand"))
        .limit(10)
    },

    // O4/O5 — multi-key presentation sort + batch limit
    // (response_refresher.py:223-228).
    Q("o4_multikey_batch",
      "multi-key sort with LIMIT batch",
      """SELECT event_id, user_id, event_type FROM events
        |ORDER BY event_type DESC, ts ASC, event_id LIMIT 50""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select("event_id", "user_id", "event_type", "ts")
        .orderBy(col("event_type").desc, col("ts").asc, col("event_id"))
        .limit(50)
        .select("event_id", "user_id", "event_type")
    },

    // ------------------------------------------------------------------
    // U1 — UNION ALL with discriminator column
    // (filter_options_combined.sqlx:6-23).
    Q("u1_union_discriminator",
      "UNION ALL of typed sub-tables with entity_type discriminator",
      """SELECT * FROM (
        |  SELECT 'brand' AS entity_type, p_brand AS name, count(*) AS n
        |  FROM part GROUP BY p_brand
        |  UNION ALL
        |  SELECT 'segment' AS entity_type, c_mktsegment AS name, count(*) AS n
        |  FROM customer GROUP BY c_mktsegment
        |  UNION ALL
        |  SELECT 'priority' AS entity_type, o_orderpriority AS name, count(*) AS n
        |  FROM orders GROUP BY o_orderpriority)
        |ORDER BY entity_type, name""".stripMargin) { (s, d) =>
      val brands = t(s, d, "part").groupBy("p_brand").agg(count(lit(1)).as("n"))
        .select(lit("brand").as("entity_type"), col("p_brand").as("name"), col("n"))
      val segs = t(s, d, "customer").groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .select(lit("segment").as("entity_type"), col("c_mktsegment").as("name"), col("n"))
      val prios = t(s, d, "orders").groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .select(lit("priority").as("entity_type"), col("o_orderpriority").as("name"), col("n"))
      brands.unionByName(segs).unionByName(prios)
        .orderBy("entity_type", "name")
    }
  )
}
