package graft.queries

import org.apache.spark.sql.functions._

/** Third tranche of relational operators, beyond the reference's own
  * surface (SURVEY.md §2.3/§2.4/§2.5/§2.7 families, widened): full
  * outer join, INTERSECT/EXCEPT set ops, pivot/unpivot, the ranking
  * window family, CUBE grouping sets, and exact statistical moments.
  *
  * The reference expresses set-difference as anti joins and never
  * needs a full outer join or pivot (SURVEY §2.3/§2.7 "not present"
  * notes) — these close that gap so a user can run the standard
  * relational algebra end to end on this engine.
  */
object Relational3 {

  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** One pivoted count cell: count(when(...)) counts only matches. */
  private def countWhen(et: String) =
    count(when(col("event_type") === et, 1)).as(s"n_$et")

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // Full outer join: per-user purchase totals ⟗ click totals. Both
    // sides are aggregates missing different users, so unmatched rows
    // survive from each side. At scale this is a plain shuffled hash
    // join on the (already aggregated, so small) per-key rows.
    Q("j14_full_outer",
      "full outer join of two per-user aggregates with both-side misses",
      s"""WITH p AS (SELECT user_id, count(*) AS n_purch, ${dsumSql("value")} AS spent
         |           FROM events WHERE event_type = 'purchase' GROUP BY user_id),
         |c AS (SELECT user_id, count(*) AS n_click
         |      FROM events WHERE event_type = 'click' GROUP BY user_id)
         |SELECT coalesce(p.user_id, c.user_id) AS user_id,
         |  p.user_id IS NOT NULL AS has_purch,
         |  c.user_id IS NOT NULL AS has_click,
         |  coalesce(p.n_purch, 0) AS n_purch,
         |  coalesce(p.spent, 0.0) AS spent,
         |  coalesce(c.n_click, 0) AS n_click
         |FROM p FULL OUTER JOIN c ON p.user_id = c.user_id
         |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val p = ev.filter(col("event_type") === "purchase").groupBy("user_id")
        .agg(count(lit(1)).as("n_purch"), dsum(col("value")).as("spent"))
        .withColumnRenamed("user_id", "p_user")
      val c = ev.filter(col("event_type") === "click").groupBy("user_id")
        .agg(count(lit(1)).as("n_click"))
        .withColumnRenamed("user_id", "c_user")
      p.join(c, col("p_user") === col("c_user"), "full_outer")
        .select(coalesce(col("p_user"), col("c_user")).as("user_id"),
          col("p_user").isNotNull.as("has_purch"),
          col("c_user").isNotNull.as("has_click"),
          coalesce(col("n_purch"), lit(0L)).as("n_purch"),
          coalesce(col("spent"), lit(0.0)).as("spent"),
          coalesce(col("n_click"), lit(0L)).as("n_click"))
        .orderBy("user_id")
    },

    // ---------------------------------------------------------------
    // INTERSECT — users present in BOTH behavior sets. Spark plans
    // this as a left-semi over distinct inputs; same dedup semantics
    // as SQL INTERSECT (not INTERSECT ALL).
    Q("u4_intersect",
      "set intersection of two projections (INTERSECT semantics)",
      """SELECT user_id FROM events WHERE event_type = 'purchase'
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'view'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      ev.filter(col("event_type") === "purchase").select("user_id")
        .intersect(ev.filter(col("event_type") === "view").select("user_id"))
        .orderBy("user_id")
    },

    // ---------------------------------------------------------------
    // EXCEPT — users who clicked but never purchased. The reference
    // writes this shape as a left anti join (J6); EXCEPT adds the
    // distinct-projection semantics on top.
    Q("u5_except",
      "set difference of two projections (EXCEPT semantics)",
      """SELECT user_id FROM events WHERE event_type = 'click'
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      ev.filter(col("event_type") === "click").select("user_id")
        .except(ev.filter(col("event_type") === "purchase").select("user_id"))
        .orderBy("user_id")
    },

    // ---------------------------------------------------------------
    // PIVOT — event_type rows to per-type count columns, as ONE
    // conditional aggregation. Spark's `.pivot()` API (even with an
    // explicit value list) plans TWO aggregations — groupBy(key,
    // pivot_col) then a pivotfirst re-agg — i.e. an extra shuffle of
    // the whole keyspace (verified in PlanSpec). The when()-projected
    // form is the scale-correct pivot: one partial+final aggregate,
    // map-side combinable, one shuffle. The value list is explicit
    // either way: schema must not depend on the data.
    Q("p11_pivot",
      "pivot rows to typed count columns (single-shuffle conditional agg)",
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click')    AS n_click,
        |  count(*) FILTER (WHERE event_type = 'error')    AS n_error,
        |  count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |  count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
        |  count(*) FILTER (WHERE event_type = 'view')     AS n_view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .groupBy("user_id")
        .agg(countWhen(EventTypes.head), EventTypes.tail.map(countWhen): _*)
        .orderBy("user_id")
    },

    // ---------------------------------------------------------------
    // UNPIVOT — melt the pivoted counts back to (user_id, metric, n)
    // rows: the pivot→unpivot round trip, minus the zero cells the
    // pivot materialized (kept: they are real information the melt
    // preserves). Spark's native unpivot is a narrow map — no shuffle.
    Q("u6_unpivot",
      "unpivot typed count columns back to rows (pivot round trip)",
      """WITH p AS (
        |  SELECT user_id,
        |    count(*) FILTER (WHERE event_type = 'click')    AS n_click,
        |    count(*) FILTER (WHERE event_type = 'error')    AS n_error,
        |    count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |    count(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
        |    count(*) FILTER (WHERE event_type = 'view')     AS n_view
        |  FROM events GROUP BY user_id)
        |SELECT user_id, metric, n FROM (
        |  SELECT user_id, 'n_click' AS metric, n_click AS n FROM p
        |  UNION ALL SELECT user_id, 'n_error', n_error FROM p
        |  UNION ALL SELECT user_id, 'n_purchase', n_purchase FROM p
        |  UNION ALL SELECT user_id, 'n_signup', n_signup FROM p
        |  UNION ALL SELECT user_id, 'n_view', n_view FROM p)
        |ORDER BY user_id, metric""".stripMargin) { (s, d) =>
      val pivoted = t(s, d, "events")
        .groupBy("user_id")
        .agg(countWhen(EventTypes.head), EventTypes.tail.map(countWhen): _*)
      pivoted.unpivot(
        ids = Array(col("user_id")),
        values = EventTypes.map(et => col(s"n_$et")).toArray,
        variableColumnName = "metric",
        valueColumnName = "n")
        .orderBy("user_id", "metric")
    },

    // ---------------------------------------------------------------
    // The ranking window family beyond ROW_NUMBER (the only one the
    // reference uses, SURVEY §2.5): dense_rank / percent_rank /
    // cume_dist / ntile over one ordered partition. The ORDER BY
    // includes the unique o_orderkey tiebreak, so every function is
    // deterministic and percent_rank's single IEEE division is
    // bit-identical cross-engine.
    Q("w6_rank_family",
      "dense_rank / percent_rank / cume_dist / ntile over one window",
      """SELECT o_orderkey, o_custkey,
        |  dense_rank()   OVER w AS drnk,
        |  percent_rank() OVER w AS prnk,
        |  cume_dist()    OVER w AS cdist,
        |  ntile(4)       OVER w AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          cume_dist().over(w).as("cdist"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("o_orderkey")
    },

    // ---------------------------------------------------------------
    // Value-window navigation: first/last/nth event value per user
    // ordered by time. last_value needs the explicit full-partition
    // frame — the default frame stops at CURRENT ROW, which silently
    // returns the running last, a classic window bug pinned here by
    // the oracle.
    Q("w7_value_windows",
      "first_value / last_value / nth_value over full-partition frames",
      """SELECT event_id, user_id,
        |  first_value(value) OVER w AS first_v,
        |  last_value(value)  OVER w AS last_v,
        |  nth_value(value, 2) OVER w AS second_v
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          first(col("value")).over(w).as("first_v"),
          last(col("value")).over(w).as("last_v"),
          nth_value(col("value"), 2).over(w).as("second_v"))
        .orderBy("event_id")
    },

    // ---------------------------------------------------------------
    // CUBE — all 2^k grouping-set combinations (a13_rollup covers the
    // hierarchical prefix sets). Spark expands grouping sets BELOW the
    // shuffle, so map-side partial aggregation still applies to every
    // set — the scan stays single-pass.
    Q("a15_cube",
      "cube subtotals over two dimensions with grouping flags",
      s"""SELECT c_mktsegment, c_nationkey,
         |  cast(grouping(c_mktsegment) as bigint) AS g_seg,
         |  cast(grouping(c_nationkey) as bigint) AS g_nat,
         |  count(*) AS n, ${dsumSql("c_acctbal")} AS total_bal
         |FROM customer
         |GROUP BY CUBE (c_mktsegment, c_nationkey)
         |ORDER BY g_seg, g_nat, c_mktsegment, c_nationkey""".stripMargin) { (s, d) =>
      t(s, d, "customer")
        .cube("c_mktsegment", "c_nationkey")
        .agg(grouping(col("c_mktsegment")).cast("long").as("g_seg"),
          grouping(col("c_nationkey")).cast("long").as("g_nat"),
          count(lit(1)).as("n"),
          dsum(col("c_acctbal")).as("total_bal"))
        .select("c_mktsegment", "c_nationkey", "g_seg", "g_nat", "n", "total_bal")
        .orderBy("g_seg", "g_nat", "c_mktsegment", "c_nationkey")
    },

    // ---------------------------------------------------------------
    // The canonical 3-way fact join + top-N (TPC-H Q3 shape): filtered
    // dimension broadcast into the fact join, big-big equi-join on the
    // order key, decimal-exact revenue, TakeOrdered top-10. This is
    // the bread-and-butter analytics plan whose shape must survive
    // 100x: dim filter first, broadcast, one shuffle for the big join,
    // partial aggregation, bounded result.
    Q("q3_shipping_priority",
      "3-way join + grouped revenue + top-10 (TPC-H Q3 shape)",
      s"""SELECT l_orderkey,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
         |  o_orderdate
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
         |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin) { (s, d) =>
      val cut = lit("1998-03-15 00:00:00").cast("timestamp")
      val cust = t(s, d, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = t(s, d, "orders").filter(col("o_orderdate") < cut)
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val li = t(s, d, "lineitem").filter(col("l_shipdate") > cut)
        .select("l_orderkey", "l_extendedprice", "l_discount")
      ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },

    // ---------------------------------------------------------------
    // The deep snowflake (TPC-H Q5 shape): 6 tables, two big-big
    // shuffled joins (customer-orders, orders-lineitem) and three
    // broadcast sides (region, nation, and supplier pruned by region
    // first — supplier shrinks 5x before it broadcasts, customer does
    // NOT broadcast: it grows with the fact side). The co-nation
    // constraint (customer and supplier in the same nation) rides the
    // supplier join condition.
    Q("q5_region_volume",
      "6-way snowflake join with co-nation constraint (TPC-H Q5 shape)",
      s"""SELECT n_name,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      val asiaNations = t(s, d, "nation")
        .join(broadcast(t(s, d, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val supp = t(s, d, "supplier")
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      val ord = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01 00:00:00").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01 00:00:00").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
      ord.join(cust, col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "lineitem")
          .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey")
          && col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // ---------------------------------------------------------------
    // TPC-H Q18 (large-volume customers): the HAVING-subquery shape —
    // aggregate lineitem per order, keep rare heavy orders, semi-join
    // that small key set back into the fact joins. Scale story: the
    // qualifying-keys aggregate is map-side combinable and its output
    // is tiny (46 keys at sf0.01), so Catalyst broadcasts it into BOTH
    // fact probes — the orders and lineitem scans are each reduced
    // before the customer join; no full fact-fact shuffle survives.
    // l_quantity is integer-valued, so the HAVING sum is exact in
    // double regardless of partial-agg order (gated as BIGINT anyway).
    Q("q18_large_orders",
      "TPC-H Q18 shape: HAVING-filtered order keys semi-joined into the fact joins",
      """WITH heavy AS (
        |  SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |SELECT c_name, c_custkey, o_orderkey, o_orderdate,
        |  CAST(ROUND(o_totalprice * 100) AS BIGINT) AS totalprice_cents,
        |  CAST(sum(l_quantity) AS BIGINT) AS total_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM heavy)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin) { (s, d) =>
      val heavy = t(s, d, "lineitem")
        .groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 300)
        .select(col("l_orderkey").as("heavy_key"))
      val ord = t(s, d, "orders")
        .join(broadcast(heavy), col("o_orderkey") === col("heavy_key"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      val li = t(s, d, "lineitem").select("l_orderkey", "l_quantity")
      ord
        .join(t(s, d, "customer").select(col("c_custkey"), col("c_name")),
          col("c_custkey") === col("o_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(sum(col("l_quantity")).cast("long").as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderdate"), col("o_orderkey"))
        .limit(100)
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"),
          round(col("o_totalprice") * 100).cast("long").as("totalprice_cents"),
          col("total_qty"))
    },

    // ---------------------------------------------------------------
    // Outlier detection from exact moments: per-type z-scores computed
    // from integer-cent sums (a16's discipline), top-20 by |z|. The
    // stats are a tiny broadcast back over the stream — the scan is
    // one pass for stats, one for scoring, both narrow.
    Q("e3_outliers",
      "top-20 per-type z-score outliers from exact integer-sum moments",
      """WITH c AS (SELECT event_id, event_type,
        |             cast(round(value * 100) as bigint) AS cents
        |           FROM events),
        |g AS (SELECT event_type, count(*) AS n, sum(cents) AS sc,
        |             sum(cast(cents as decimal(38,0)) * cents) AS scc
        |      FROM c GROUP BY event_type)
        |SELECT event_id, c.event_type,
        |  round((cast(cents as double) - cast(sc as double) / cast(n as double))
        |        / (sqrt(cast(cast(n as decimal(38,0)) * scc - cast(sc as decimal(38,0)) * cast(sc as decimal(38,0)) as double))
        |           / cast(n as double)), 6) AS z
        |FROM c JOIN g ON c.event_type = g.event_type
        |ORDER BY abs(z) DESC, event_id
        |LIMIT 20""".stripMargin) { (s, d) =>
      val c = t(s, d, "events").selectExpr(
        "event_id", "event_type", "cast(round(value * 100) as bigint) AS cents")
      // cast BEFORE the multiply: a long cents² wraps past ~$30M values
      // (non-ANSI Spark wraps silently; the oracle would error — a
      // divergence, not a caught failure)
      val g = c.groupBy("event_type").agg(
        count(lit(1)).as("n"), sum(col("cents")).as("sc"),
        sum(col("cents").cast("decimal(38,0)") * col("cents")).as("scc"))
      c.join(broadcast(g), Seq("event_type"))
        .withColumn("z", expr(
          """round((cast(cents as double) - cast(sc as double) / cast(n as double))
            |      / (sqrt(cast(cast(n as decimal(38,0)) * scc - cast(sc as decimal(38,0)) * cast(sc as decimal(38,0)) as double))
            |         / cast(n as double)), 6)""".stripMargin))
        .select("event_id", "event_type", "z")
        .orderBy(abs(col("z")).desc, col("event_id"))
        .limit(20)
    },

    // ---------------------------------------------------------------
    // Exact statistical moments (variance / correlation). Built-in
    // stddev/corr accumulate doubles in partial-aggregation order, so
    // their low-order bits differ run to run AND engine to engine —
    // unusable under a hash gate, and silently irreproducible at
    // scale. Discipline instead: scale the 2-decimal money column to
    // exact integer cents, sum xi / xi² / xi·yi as exact integers
    // (decimal(38,0) where bigint could overflow — Σ(cents²) at 100 TB
    // is ~1e25), and only THEN do a fixed, parenthesized sequence of
    // IEEE ops. Every double op is a single correctly-rounded
    // operation on identical inputs → bit-identical cross-engine, and
    // the integer sums stay map-side combinable like any other sum.
    Q("a16_moments",
      "exact integer-sum variance and correlation (reproducible moments)",
      """WITH c AS (SELECT l_returnflag,
        |             cast(l_quantity as bigint) AS q,
        |             cast(round(l_extendedprice * 100) as bigint) AS p
        |           FROM lineitem),
        |g AS (SELECT l_returnflag, count(*) AS n,
        |        sum(q) AS sq, sum(p) AS sp,
        |        sum(cast(q * q as decimal(38,0))) AS sqq,
        |        sum(cast(p * p as decimal(38,0))) AS spp,
        |        sum(cast(q * p as decimal(38,0))) AS sqp
        |      FROM c GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  round(cast(sq as double) / cast(n as double), 6) AS mean_qty,
        |  round(sqrt(cast(cast(n as decimal(38,0)) * sqq - cast(sq as decimal(38,0)) * cast(sq as decimal(38,0)) as double))
        |        / cast(n as double), 6) AS sd_qty,
        |  round(sqrt(cast(cast(n as decimal(38,0)) * spp - cast(sp as decimal(38,0)) * cast(sp as decimal(38,0)) as double))
        |        / cast(n as double) / 100.0, 6) AS sd_price,
        |  round(cast(cast(n as decimal(38,0)) * sqp - cast(sq as decimal(38,0)) * cast(sp as decimal(38,0)) as double)
        |        / (sqrt(cast(cast(n as decimal(38,0)) * sqq - cast(sq as decimal(38,0)) * cast(sq as decimal(38,0)) as double))
        |           * sqrt(cast(cast(n as decimal(38,0)) * spp - cast(sp as decimal(38,0)) * cast(sp as decimal(38,0)) as double))),
        |        6) AS corr_qty_price
        |FROM g ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val c = t(s, d, "lineitem").selectExpr(
        "l_returnflag",
        "cast(l_quantity as bigint) AS q",
        "cast(round(l_extendedprice * 100) as bigint) AS p")
      // the cast to decimal happens PER ROW, inside the sum: a long
      // sum of cents² overflows silently around 1e19 (per-row products
      // still fit a long; their 100 TB total does not)
      val g = c.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"),
        sum(col("q")).as("sq"), sum(col("p")).as("sp"),
        sum((col("q") * col("q")).cast("decimal(38,0)")).as("sqq"),
        sum((col("p") * col("p")).cast("decimal(38,0)")).as("spp"),
        sum((col("q") * col("p")).cast("decimal(38,0)")).as("sqp"))
      g.selectExpr(
        "l_returnflag", "n",
        "round(cast(sq as double) / cast(n as double), 6) AS mean_qty",
        """round(sqrt(cast(cast(n as decimal(38,0)) * sqq - cast(sq as decimal(38,0)) * cast(sq as decimal(38,0)) as double))
          |      / cast(n as double), 6) AS sd_qty""".stripMargin,
        """round(sqrt(cast(cast(n as decimal(38,0)) * spp - cast(sp as decimal(38,0)) * cast(sp as decimal(38,0)) as double))
          |      / cast(n as double) / 100.0, 6) AS sd_price""".stripMargin,
        """round(cast(cast(n as decimal(38,0)) * sqp - cast(sq as decimal(38,0)) * cast(sp as decimal(38,0)) as double)
          |      / (sqrt(cast(cast(n as decimal(38,0)) * sqq - cast(sq as decimal(38,0)) * cast(sq as decimal(38,0)) as double))
          |         * sqrt(cast(cast(n as decimal(38,0)) * spp - cast(sp as decimal(38,0)) * cast(sp as decimal(38,0)) as double))),
          |      6) AS corr_qty_price""".stripMargin)
        .orderBy("l_returnflag")
    },

    // ---------------------------------------------------------------
    // Interval-overlap join, grid-bucketed — the range-join shape j5's
    // band rewrite cannot express (two sets of variable-length
    // INTERVALS, overlap predicate `a.s <= w.we AND w.ws <= a.e`).
    // Naively this is a theta join (nested loop). The scale form maps
    // every interval to the 6-hour grid cells it covers, equi-joins on
    // the cell, re-checks the exact predicate, and dedups pairs that
    // share multiple cells — candidate count is bounded by cells-per-
    // interval × cell occupancy, never |A|×|B|. PlanSpec gates the
    // no-nested-loop shape. Here A = per-(user, day) activity spans,
    // B = 4 staggered 2-hour windows per day; the same code path
    // handles two fact-sized sides (the grid cell is the shuffle key).
    Q("j15_interval_overlap",
      "interval-overlap join via 6-hour grid cells: users active per window",
      """WITH days AS (SELECT DISTINCT cast(ts as date) AS d FROM events),
        |w AS (SELECT d, k,
        |        cast(d as timestamp) + (k * 6) * INTERVAL 1 HOUR
        |          + k * INTERVAL 1 MINUTE AS ws,
        |        cast(d as timestamp) + (k * 6) * INTERVAL 1 HOUR
        |          + k * INTERVAL 1 MINUTE + INTERVAL 2 HOUR AS we
        |      FROM days, (SELECT unnest(range(0, 4)) AS k)),
        |a AS (SELECT user_id, cast(ts as date) AS d, min(ts) AS s, max(ts) AS e
        |      FROM events GROUP BY 1, 2)
        |SELECT w.d, w.k, count(DISTINCT a.user_id) AS n_users
        |FROM w JOIN a ON a.s <= w.we AND w.ws <= a.e
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val a = ev.groupBy(col("user_id"), to_date(col("ts")).as("ad"))
        .agg(min("ts").as("s"), max("ts").as("e"))
      val w = ev.select(to_date(col("ts")).as("d")).distinct()
        .select(col("d"), explode(sequence(lit(0), lit(3))).as("k"))
        .selectExpr("d", "k",
          "timestampadd(MINUTE, k, timestampadd(HOUR, 6 * k, cast(d as timestamp))) AS ws")
        .selectExpr("d", "k", "ws", "timestampadd(HOUR, 2, ws) AS we")
      // grid cells: 6 h = 21600 s of epoch time; an interval covers
      // cells floor(start/21600)..floor(end/21600)
      def cells(s0: String, e0: String) =
        expr(s"sequence(floor(unix_timestamp($s0) / 21600), " +
          s"floor(unix_timestamp($e0) / 21600))")
      val ac = a.select(col("user_id"), col("s"), col("e"),
        explode(cells("s", "e")).as("cell"))
      val wc = w.select(col("d"), col("k"), col("ws"), col("we"),
        explode(cells("ws", "we")).as("cell"))
      wc.join(ac, Seq("cell"))
        .filter(col("s") <= col("we") && col("ws") <= col("e"))
        .select("d", "k", "user_id")
        // no pre-distinct: countDistinct dedups multi-cell pairs per
        // group already; a distinct here would add a second full
        // aggregation over the largest intermediate in the query
        .groupBy("d", "k")
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy("d", "k")
    },

    // ---------------------------------------------------------------
    // j15's manual grid, automated: a symmetric TIMESTAMP band join
    // written naively (BETWEEN ± INTERVAL, no equi conjunct) and
    // planned by BandJoinRewrite's timestamp extension — the rule
    // buckets both sides at the interval width over unix_micros and
    // joins on the bucket, so the plan is a shuffled equi-join whose
    // cost is the band density, never the O(n·m) nested loop the
    // naive predicate would otherwise force. BandJoinRewriteSpec pins
    // the plan shape (Generate explode, no BNLJ/cartesian) and the
    // exact-boundary completeness.
    Q("j15b_time_band_auto",
      "naive +/-30min timestamp band join auto-rewritten to a time-bucket equi-join",
      """SELECT a.event_id, count(*) AS n_close
        |FROM events a JOIN events b
        |  ON b.ts BETWEEN a.ts - INTERVAL 30 MINUTE AND a.ts + INTERVAL 30 MINUTE
        |WHERE a.event_type = 'error' AND b.event_type = 'purchase'
        |GROUP BY a.event_id ORDER BY a.event_id""".stripMargin) { (s, d) =>
      if (!s.experimental.extraOptimizations.contains(graft.plans.BandJoinRewrite))
        s.experimental.extraOptimizations =
          s.experimental.extraOptimizations :+ graft.plans.BandJoinRewrite
      val ev = t(s, d, "events")
      val a = ev.filter(col("event_type") === "error")
        .select(col("event_id").as("a_id"), col("ts").as("a_ts"))
      val b = ev.filter(col("event_type") === "purchase")
        .select(col("ts").as("b_ts"))
      a.join(b, col("b_ts") >= col("a_ts") - expr("INTERVAL 30 MINUTES") &&
          col("b_ts") <= col("a_ts") + expr("INTERVAL 30 MINUTES"))
        .groupBy(col("a_id").as("event_id"))
        .agg(count(lit(1)).as("n_close"))
        .orderBy("event_id")
    },

    // ---------------------------------------------------------------
    // Column profiling — the data-quality scan every landed table
    // gets before it is trusted: per column, null count, exact
    // distinct count, min/max. The engine computes ALL columns in ONE
    // scan (multiple count-distincts plan as a single Expand pass —
    // rows × |columns| before partial aggregation, the standard
    // trade; at extreme scale swap exact distincts for a17's HLL).
    // Min/max surface as strings; the double column goes through a
    // decimal(18,2) cast so both engines format identically (the
    // repo's no-gated-float-formatting rule).
    Q("a19_data_profile",
      "one-scan column profile of orders: nulls, distincts, min/max",
      """SELECT 'o_custkey' AS c, count(*) AS n,
        |  count(*) - count(o_custkey) AS n_null,
        |  count(DISTINCT o_custkey) AS n_distinct,
        |  cast(min(o_custkey) as varchar) AS min_s,
        |  cast(max(o_custkey) as varchar) AS max_s
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
        |  count(DISTINCT o_orderkey),
        |  cast(min(o_orderkey) as varchar), cast(max(o_orderkey) as varchar)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
        |  count(DISTINCT o_orderpriority),
        |  min(o_orderpriority), max(o_orderpriority)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |  count(DISTINCT o_orderstatus),
        |  min(o_orderstatus), max(o_orderstatus)
        |FROM orders
        |UNION ALL
        |SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
        |  count(DISTINCT o_totalprice),
        |  cast(cast(min(o_totalprice) as decimal(18,2)) as varchar),
        |  cast(cast(max(o_totalprice) as decimal(18,2)) as varchar)
        |FROM orders
        |ORDER BY c""".stripMargin) { (s, d) =>
      val cols = Seq("o_custkey", "o_orderkey", "o_orderpriority",
        "o_orderstatus", "o_totalprice")
      def mm(f: String => org.apache.spark.sql.Column)(c: String) =
        if (c == "o_totalprice") f(c).cast("decimal(18,2)").cast("string")
        else f(c).cast("string")
      val aggs: Seq[org.apache.spark.sql.Column] =
        count(lit(1)).as("n") +: cols.flatMap { c =>
          Seq(count(col(c)).as(s"cnt_$c"),
            countDistinct(col(c)).as(s"nd_$c"),
            mm(x => min(col(x)))(c).as(s"min_$c"),
            mm(x => max(col(x)))(c).as(s"max_$c"))
        }
      val a = t(s, d, "orders").agg(aggs.head, aggs.tail: _*)
      val rows = array(cols.map(c => struct(lit(c).as("c"), col("n").as("n"),
        (col("n") - col(s"cnt_$c")).as("n_null"),
        col(s"nd_$c").as("n_distinct"),
        col(s"min_$c").as("min_s"), col(s"max_$c").as("max_s"))): _*)
      a.select(explode(rows).as("r")).select("r.*").orderBy("c")
    },

    // ---------------------------------------------------------------
    // Native session windows — the BUILT-IN gap sessionization
    // (st2 implements the same semantics via flatMapGroupsWithState;
    // this is the operator you reach for first: one groupBy, codegen,
    // streaming-ready unchanged). Session boundary follows Spark's
    // [start, start+gap) convention — a gap of EXACTLY 30 minutes
    // starts a new session, hence `>=` in the oracle's island rule
    // (st2's custom sessionizer uses `>`, the other defensible
    // convention; the catalog pins both so neither regresses).
    // Scale shape: one shuffle by user_id; session merge is the
    // aggregation itself, no self-join, no window-function pass.
    Q("w8_session_window",
      "native session_window(30 min) == SQL gaps-and-islands with >= rule",
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |g AS (
        |  SELECT user_id, ts,
        |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM o)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL 30 MINUTE AS session_end_gap,
        |       count(*) AS n_events
        |FROM g GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end_gap"), col("n_events"))
        .orderBy("user_id", "session_start")
    },

    // ---------------------------------------------------------------
    // TPC-H Q14 shape — promotion revenue share: a conditional
    // aggregate ratio over one fact-dim join. The plan property: BOTH
    // the promo and total revenue come from ONE pass (two conditional
    // sums in the same partial+final aggregate), never two scans or a
    // self-join; `part` broadcasts. Exact decimal sums; the share is
    // one IEEE division at the end.
    Q("q14_promo_share",
      "promotion revenue share: two conditional sums in one pass (TPC-H Q14 shape)",
      s"""SELECT round(100.0 * (
         |    ${dsumSql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 6)}
         |  ) / (
         |    ${dsumSql("l_extendedprice * (1 - l_discount)", 6)}
         |  ), 6) AS promo_share
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= DATE '1996-01-01'
         |  AND l_shipdate < DATE '1996-02-01'""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1996-02-01").cast("date"))
        .select("l_partkey", "l_extendedprice", "l_discount")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      li.join(broadcast(t(s, d, "part").select("p_partkey", "p_type")),
          col("l_partkey") === col("p_partkey"))
        .agg(
          dsum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0)), 6)
            .as("promo"),
          dsum(rev, 6).as("total"))
        .select(round(lit(100.0) * col("promo") / col("total"), 6)
          .as("promo_share"))
    },

    // ---------------------------------------------------------------
    // TPC-H Q16 shape — supplier diversity per product segment with a
    // NOT-IN exclusion: distinct suppliers per (brand, type, size)
    // after anti-joining the excluded supplier set (negative balance
    // — Q16's complaints filter on this schema). Plan properties: the
    // exclusion is a tiny BROADCAST anti-join (never a full shuffle
    // of partsupp-shaped data), and the distinct count shuffles the
    // (group, supplier) pairs exactly once.
    Q("q16_supplier_diversity",
      "distinct suppliers per (brand, type, size) with NOT-IN exclusion (TPC-H Q16 shape)",
      """WITH ex AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_size IN (11, 18, 25, 32)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM ex)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, d) =>
      val ex = t(s, d, "supplier").filter(col("s_acctbal") < 0)
        .select("s_suppkey")
      t(s, d, "lineitem").select("l_partkey", "l_suppkey")
        .join(broadcast(ex), col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(broadcast(t(s, d, "part")
          .filter(col("p_size").isin(11, 18, 25, 32))
          .select("p_partkey", "p_brand", "p_type", "p_size")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct("l_suppkey").as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // ---------------------------------------------------------------
    // TPC-H Q21 shape — the EXISTS + NOT-EXISTS chain: suppliers who
    // were the SOLE late shipper on a multi-supplier order. Three
    // references to the same fact resolve as one semi-join (another
    // supplier shipped the order) and one anti-join (no OTHER
    // supplier shipped late) against the late-line base — the classic
    // correlated-subquery pair the optimizer must turn into
    // key-bounded hash joins, NOT per-row re-scans. At scale both
    // probes shuffle on l_orderkey, the same key as the base — one
    // partitioning reused three times.
    Q("q21_sole_late_supplier",
      "sole-late-shipper per multi-supplier order via semi + anti fact self-probes (TPC-H Q21 shape)",
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey FROM lineitem
        |  WHERE l_shipdate >= DATE '1998-06-01'),
        |base AS (
        |  SELECT DISTINCT lt.l_orderkey, lt.l_suppkey
        |  FROM late lt
        |  WHERE EXISTS (SELECT 1 FROM lineitem l2
        |                WHERE l2.l_orderkey = lt.l_orderkey
        |                  AND l2.l_suppkey != lt.l_suppkey)
        |    AND NOT EXISTS (SELECT 1 FROM late l3
        |                    WHERE l3.l_orderkey = lt.l_orderkey
        |                      AND l3.l_suppkey != lt.l_suppkey))
        |SELECT l_suppkey AS s_suppkey, count(*) AS numwait
        |FROM base GROUP BY l_suppkey
        |ORDER BY numwait DESC, s_suppkey LIMIT 20""".stripMargin) { (s, d) =>
      val li = t(s, d, "lineitem").select("l_orderkey", "l_suppkey")
      val lateLines = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-06-01").cast("date"))
        .select("l_orderkey", "l_suppkey")
      val base = lateLines.distinct()
      val others = li
        .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("o_supp"))
      val lateOthers = lateLines
        .select(col("l_orderkey").as("ok3"), col("l_suppkey").as("lo_supp"))
      base
        .join(others, base("l_orderkey") === col("ok2") &&
          col("l_suppkey") =!= col("o_supp"), "left_semi")
        .join(lateOthers, base("l_orderkey") === col("ok3") &&
          col("l_suppkey") =!= col("lo_supp"), "left_anti")
        .groupBy(col("l_suppkey").as("s_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_suppkey"))
        .limit(20)
    },

    // ---------------------------------------------------------------
    // TPC-H Q11 shape — HAVING against a global-scalar fraction:
    // suppliers whose revenue exceeds 1/200 of TOTAL revenue. The
    // plan property: the global total is a 1-row aggregate that comes
    // back as a BROADCAST (hinted crossJoin), so the HAVING is a
    // per-group filter against a broadcast scalar — never a second
    // shuffle, never a rescan of the fact, and the per-supplier and
    // global aggregates share one map-side-combinable pass shape.
    // Exact decimal sums on both sides; the threshold compare is in
    // decimal-derived doubles (identical in both engines).
    Q("q11_important_suppliers",
      "suppliers above 1/200 of total revenue (TPC-H Q11 group-vs-global-scalar shape)",
      s"""WITH s AS (
         |  SELECT l_suppkey,
         |    ${dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue
         |  FROM lineitem GROUP BY l_suppkey),
         |tot AS (SELECT ${dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS total
         |        FROM lineitem)
         |SELECT s.l_suppkey AS s_suppkey, round(s.revenue, 2) AS revenue
         |FROM s, tot WHERE s.revenue > tot.total / 200.0
         |ORDER BY revenue DESC, s_suppkey""".stripMargin) { (s, d) =>
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val li = t(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      val bySupp = li.groupBy("l_suppkey").agg(dsum(rev, 6).as("revenue"))
      val tot = li.agg(dsum(rev, 6).as("total"))
      bySupp.crossJoin(broadcast(tot))
        .filter(col("revenue") > col("total") / 200.0)
        .select(col("l_suppkey").as("s_suppkey"),
          round(col("revenue"), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("s_suppkey"))
    },

    // ---------------------------------------------------------------
    // Time-based RANGE window frame — the windowing mode w4's ROWS
    // frame cannot express: each event aggregates its user's TRAILING
    // HOUR (whatever number of rows that is — bursty minutes widen,
    // quiet hours narrow), the frame every rate-limit / rolling-rate
    // metric actually needs. Spark states it as rangeBetween over
    // epoch seconds (-3600, 0]; the oracle as RANGE INTERVAL 1 HOUR
    // PRECEDING — identical inclusive-bound semantics, and RANGE's
    // all-peers rule makes equal-timestamp rows share a frame in both
    // engines. One shuffle by user, one ordered pass with a sliding
    // frame pointer — same cost class as any windowed query; decimal
    // sum keeps the frame total order-exact.
    Q("w9_time_range_frame",
      "trailing-1-hour RANGE frame per user: time-based rolling sum + event rate",
      """SELECT event_id, user_id,
        |  cast(sum(cast(value as decimal(30,2))) OVER w as double) AS hour_sum,
        |  count(*) OVER w AS n_last_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.types.{DecimalType, DoubleType}
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").cast("long"))
        .rangeBetween(-3600, Window.currentRow)
      t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          sum(col("value").cast(DecimalType(30, 2))).over(w)
            .cast(DoubleType).as("hour_sum"),
          count(lit(1)).over(w).as("n_last_hour"))
        .orderBy("event_id")
    },

    // ---------------------------------------------------------------
    // Point-in-VARIABLE-interval join — the IP-to-geo / value-to-tier
    // lookup shape: each customer owns a price band around their
    // exact mean order price (centers vary per row, so j5's
    // fixed-width band bucketing cannot apply), and the query counts
    // the orders landing inside each band. The band HALF-WIDTH is
    // density-derived — (price range) × 500 / |orders| — the c12
    // occupancy-capping discipline: expected in-band orders per
    // customer is then a CONSTANT (~1000) at any corpus size, so
    // total candidate and result mass stay O(n), where a fixed
    // fraction of a fixed price range would make both quadratic
    // (measured: 19× wall at 10× before the cap; the state-audit
    // ratio gate caught it). Scale form: the interval side explodes
    // to the grid cells it covers (cell width == half-width → ≤3
    // each), the point side maps to exactly ONE cell — so unlike
    // j15's interval×interval grid there are no duplicate candidate
    // pairs and no dedup pass. One equi-join on the cell + exact
    // re-check; never a nested loop (GovernanceSpec gates it). The
    // oracle is DuckDB's native BETWEEN range join (IEJoin), so the
    // gate proves the grid decomposition complete at exact band
    // boundaries.
    Q("j18_point_in_range",
      "per-customer price band vs all orders: density-capped grid-cell point-in-interval join",
      s"""WITH w AS (
         |  SELECT (max(o_totalprice) - min(o_totalprice)) * 500.0
         |           / cast(count(*) as double) AS half
         |  FROM orders),
         |b AS (
         |  SELECT o_custkey AS cid,
         |    ${davgSql("o_totalprice")} AS av
         |  FROM orders GROUP BY o_custkey)
         |SELECT b.cid AS o_custkey, count(*) AS n_peer
         |FROM b CROSS JOIN w
         |JOIN orders o
         |  ON o.o_totalprice BETWEEN b.av - w.half AND b.av + w.half
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders").select("o_custkey", "o_totalprice")
      val w = o.agg(((max(col("o_totalprice")) - min(col("o_totalprice")))
        * 500.0 / count(lit(1)).cast("double")).as("half"))
      val bands = o.groupBy("o_custkey")
        .agg(davg(col("o_totalprice")).as("av"))
        .crossJoin(broadcast(w))
        .select(col("o_custkey").as("cid"),
          (col("av") - col("half")).as("lo"),
          (col("av") + col("half")).as("hi"), col("half"))
      val bandCells = bands.select(col("cid"), col("lo"), col("hi"),
        explode(sequence(floor(col("lo") / col("half")).cast("long"),
          floor(col("hi") / col("half")).cast("long"))).as("cell"))
      val pointCells = o.crossJoin(broadcast(w))
        .select(col("o_totalprice").as("p"),
          floor(col("o_totalprice") / col("half")).cast("long").as("cell"))
      bandCells.join(pointCells, Seq("cell"))
        .filter(col("p") >= col("lo") && col("p") <= col("hi"))
        .groupBy(col("cid").as("o_custkey"))
        .agg(count(lit(1)).as("n_peer"))
        .orderBy("o_custkey")
    }
  )
}
