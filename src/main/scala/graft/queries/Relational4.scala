package graft.queries

import org.apache.spark.sql.functions._

/** Fourth relational tranche: the remaining classic TPC-H join/agg
  * shapes expressible on this schema (Q7 nation-pair volume, Q10
  * returned-item reporting, Q13 customer order-count distribution,
  * Q17 small-quantity revenue, Q19 disjunctive-predicate revenue,
  * Q22 dormant high-balance customers). None exist in the reference's
  * surface (its analytics are single-fact BGG models — SURVEY §2.3);
  * they are here because they pin the join/agg plan shapes a general
  * engine must get right at 100 TB: dimension broadcasts, one-shuffle
  * fact aggregation, outer-join-then-reaggregate, correlated-scalar
  * rewrites, OR-of-ANDs pushdown, and anti-join + broadcast-scalar
  * HAVING.
  */
object Relational4 {

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // TPC-H Q7 shape — cross-nation shipping volume by year between
    // one nation pair, both directions. Plan properties: supplier,
    // customer, and nation are all BROADCAST (the fact never shuffles
    // for them); the only fact shuffle is the lineitem⋈orders join on
    // l_orderkey; the nation-pair filter applies to the broadcast
    // sides BEFORE the fact join, so non-qualifying lineitem rows die
    // at the first probe, not in the aggregate.
    Q("q7_nation_volume",
      "cross-nation revenue by (supp_nation, cust_nation, year) for one nation pair (TPC-H Q7 shape)",
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         |  CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
         |   OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin) { (s, d) =>
      val nations = t(s, d, "nation")
        .filter(col("n_name").isin("NATION_1", "NATION_2"))
        .select("n_nationkey", "n_name")
      val supp = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = t(s, d, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(nations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
          rev.as("rev"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(dsum(col("rev"), 6).as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // ---------------------------------------------------------------
    // TPC-H Q10 shape — returned-item reporting: top 20 customers by
    // revenue lost to returns in one quarter. Plan properties: the
    // date filter prunes orders BEFORE the fact join (predicate on
    // the build side), customer and nation broadcast, and the top-20
    // is a TakeOrdered over the aggregated (per-customer, so small)
    // rows — never a global sort of the fact.
    Q("q10_returned_items",
      "top 20 customers by returned-revenue in a quarter (TPC-H Q10 shape)",
      s"""SELECT c_custkey, c_name,
         |  ${dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
         |  c_acctbal, n_name
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation   ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= DATE '1996-01-01'
         |  AND o_orderdate < DATE '1996-04-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      val orders = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
          col("o_orderdate") < lit("1996-04-01").cast("date"))
        .select("o_orderkey", "o_custkey")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, d, "lineitem")
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), rev.as("rev"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, d, "customer")
          .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(col("rev"), 6).as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // ---------------------------------------------------------------
    // TPC-H Q13 shape — customer distribution by order count,
    // INCLUDING zero-order customers: a filtered LEFT outer join then
    // two aggregations (per-customer count, then histogram of
    // counts). Plan properties: the priority filter lives in the JOIN
    // condition (a WHERE would silently turn the outer join inner and
    // drop the zero bucket); the second aggregate runs over
    // customer-cardinality rows, so its shuffle is tiny.
    Q("q13_custdist",
      "customer histogram by non-urgent order count, zero bucket included (TPC-H Q13 shape)",
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      val cust = t(s, d, "customer").select("c_custkey")
      val ord = t(s, d, "orders").select("o_custkey", "o_orderkey", "o_orderpriority")
      cust
        .join(ord, col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT", "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // ---------------------------------------------------------------
    // TPC-H Q17 shape — small-quantity revenue for one product
    // segment: lineitems whose quantity is below 20% of their part's
    // average. The correlated scalar subquery rewrites to ONE
    // aggregate + rejoin on l_partkey: the per-part averages are
    // computed only for the (tiny, brand-filtered) partkey set — a
    // broadcast semi-filter prunes the fact scan BEFORE the average,
    // and the avg-side rejoin is a broadcast of part-cardinality
    // rows. Never a per-row re-scan, never an average over the
    // unfiltered fact.
    Q("q17_small_qty_revenue",
      "avg yearly revenue from below-avg-quantity lineitems of one brand/type (TPC-H Q17 shape)",
      s"""SELECT round(${dsumSql("l_extendedprice", 6)} / 7.0, 4) AS avg_yearly
         |FROM lineitem
         |JOIN part ON p_partkey = l_partkey
         |WHERE p_brand = 'Brand#11' AND p_type = 'SMALL'
         |  AND l_quantity < 0.2 * (
         |    SELECT ${davgSql("l2.l_quantity", 6)} FROM lineitem l2
         |    WHERE l2.l_partkey = p_partkey)""".stripMargin) { (s, d) =>
      val parts = t(s, d, "part")
        .filter(col("p_brand") === "Brand#11" && col("p_type") === "SMALL")
        .select("p_partkey")
      val li = t(s, d, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
      val perPart = li.groupBy(col("l_partkey").as("ap_partkey"))
        .agg(davg(col("l_quantity"), 6).as("avg_qty"))
      li.join(broadcast(perPart), col("l_partkey") === col("ap_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg(round(dsum(col("l_extendedprice"), 6) / 7.0, 4).as("avg_yearly"))
    },

    // ---------------------------------------------------------------
    // TPC-H Q19 shape — revenue under an OR of three conjunctive
    // (brand, size-range, quantity-range) branches. Plan properties:
    // part broadcasts; the disjunction splits into a part-side
    // residual (brand/size — evaluated once per broadcast row) and a
    // fact-side residual (quantity — pushed to the lineitem scan as
    // a range union), so the join output carries only candidate
    // rows. One pass, no union-of-three-scans.
    Q("q19_disjunctive_revenue",
      "revenue under OR-of-ANDs brand/size/quantity predicates (TPC-H Q19 shape)",
      s"""SELECT ${dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS revenue
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |        AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |        AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
         |        AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
      val branch = (brand: String, sizeHi: Int, qLo: Int, qHi: Int) =>
        col("p_brand") === brand &&
          col("p_size").between(1, sizeHi) &&
          col("l_quantity").between(qLo, qHi)
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, d, "lineitem")
        // fact-side residual: the union of the three quantity ranges
        // prunes the scan before the join probe
        .filter(col("l_quantity").between(1, 30))
        .select(col("l_partkey"), col("l_quantity"), rev.as("rev"))
        .join(broadcast(t(s, d, "part")
          .filter(col("p_brand").isin("Brand#12", "Brand#23", "Brand#34"))
          .select("p_partkey", "p_brand", "p_size")),
          col("p_partkey") === col("l_partkey"))
        .filter(branch("Brand#12", 15, 1, 11) ||
          branch("Brand#23", 25, 10, 20) ||
          branch("Brand#34", 35, 20, 30))
        .agg(dsum(col("rev"), 6).as("revenue"))
    },

    // ---------------------------------------------------------------
    // TPC-H Q22 shape — dormant high-balance customers: acctbal above
    // the average POSITIVE balance (a broadcast global scalar) and no
    // orders at all (anti join), grouped by nation. Plan properties:
    // the scalar is a 1-row aggregate broadcast into the filter (no
    // second customer shuffle); the anti join probes orders'
    // o_custkey — at scale that side aggregates to distinct custkeys
    // before the join, keeping the probe build bounded by customer
    // cardinality, not order count.
    Q("q22_dormant_customers",
      "nations' count+balance of above-avg-balance customers with no orders (TPC-H Q22 shape)",
      s"""WITH avg_bal AS (
         |  SELECT ${davgSql("c_acctbal", 6)} AS a FROM customer
         |  WHERE c_acctbal > 0.0)
         |SELECT n_name, count(*) AS numcust,
         |  ${dsumSql("c_acctbal", 6)} AS totacctbal
         |FROM customer JOIN nation ON c_nationkey = n_nationkey, avg_bal
         |WHERE c_acctbal > a
         |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
      val avgBal = t(s, d, "customer")
        .filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal"), 6).as("a"))
      val custKeysWithOrders = t(s, d, "orders").select("o_custkey").distinct()
      t(s, d, "customer")
        .select("c_custkey", "c_acctbal", "c_nationkey")
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("a"))
        .join(custKeysWithOrders, col("c_custkey") === col("o_custkey"),
          "left_anti")
        .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal"), 6).as("totacctbal"))
        .orderBy("n_name")
    },

    // ---------------------------------------------------------------
    // TPC-H Q4 shape — order-priority checking: orders in a quarter
    // with at least one LATE line (shipped >90 days after order
    // date). The correlated EXISTS becomes a hash LEFT SEMI join on
    // the order key whose lateness predicate is a join residual — the
    // date filter prunes orders before the probe, and the semi join
    // stops at the first matching line per order (no line-count
    // inflation to undo).
    Q("q4_priority_fulfillment",
      "orders per priority with >=1 line shipped 90+ days late (TPC-H Q4 shape)",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= DATE '1996-01-01'
        |  AND o_orderdate < DATE '1996-04-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
          col("o_orderdate") < lit("1996-04-01").cast("date"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .join(t(s, d, "lineitem").select("l_orderkey", "l_shipdate"),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // ---------------------------------------------------------------
    // TPC-H Q6 shape — the pure-pushdown revenue scan: no join at
    // all, three range predicates that must ALL reach the parquet
    // reader (PushedFilters gate), a 2-column read schema, and one
    // map-side-combinable decimal sum. At 100 TB this query is a
    // row-group-skipping exercise — min/max stats on l_shipdate kill
    // most files before decode.
    Q("q6_forecast_revenue",
      "predicate-only revenue scan, all filters pushed to parquet (TPC-H Q6 shape)",
      s"""SELECT ${dsumSql("l_extendedprice * l_discount", 6)} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= DATE '1996-01-01'
         |  AND l_shipdate < DATE '1997-01-01'
         |  AND l_discount BETWEEN 0.05 AND 0.07
         |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1997-01-01").cast("date") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue"))
    },

    // ---------------------------------------------------------------
    // TPC-H Q8 shape — national market share: one nation's fraction
    // of a region's revenue per year, as a conditional-sum ratio in
    // ONE aggregate pass (the q14 trick applied over a 5-way join).
    // Plan properties: customer-side region membership and the
    // supplier-side nation tag both ride broadcasts; the share
    // numerator is a CASE inside the same partial+final aggregate —
    // never a second scan or a self-join of per-year totals.
    Q("q8_market_share",
      "one nation's share of a region's revenue per year, one-pass conditional ratio (TPC-H Q8 shape)",
      s"""SELECT CAST(year(l_shipdate) AS BIGINT) AS o_year,
         |  round((
         |    ${dsumSql("CASE WHEN sn.n_name = 'NATION_6' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 6)}
         |  ) / (
         |    ${dsumSql("l_extendedprice * (1 - l_discount)", 6)}
         |  ), 6) AS mkt_share
         |FROM lineitem
         |JOIN orders   ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN region   ON cn.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE r_name = 'EUROPE'
         |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val custInRegion = t(s, d, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_regionkey")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")
          .filter(col("r_name") === "EUROPE").select("r_regionkey")),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey")
      val suppNation = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(t(s, d, "nation")
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select("s_suppkey", "supp_nation")
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"), rev.as("rev"))
        .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
        .join(t(s, d, "orders").select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custInRegion), col("o_custkey") === col("c_custkey"),
          "left_semi")
        .groupBy(year(col("l_shipdate")).cast("long").as("o_year"))
        .agg(
          dsum(when(col("supp_nation") === "NATION_6", col("rev")).otherwise(lit(0.0)), 6)
            .as("num"),
          dsum(col("rev"), 6).as("den"))
        .select(col("o_year"), round(col("num") / col("den"), 6).as("mkt_share"))
        .orderBy("o_year")
    },

    // ---------------------------------------------------------------
    // TPC-H Q9 shape — product profit by supplier nation and year.
    // This schema has no partsupp/supplycost, so profit is the
    // documented proxy: revenue minus 80% of the part's list price
    // per unit — the SHAPE is Q9's (part-name LIKE filter, supplier
    // nation tag, two broadcast dims into one fact pass, group by
    // nation × year). The LIKE filter prunes part on the broadcast
    // build side before the probe.
    Q("q9_product_profit",
      "profit proxy by supplier nation and year with part-name LIKE filter (TPC-H Q9 shape)",
      s"""SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
         |  ${dsumSql("l_extendedprice * (1 - l_discount) - 0.8 * p_retailprice * l_quantity", 6)} AS profit
         |FROM lineitem
         |JOIN part     ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation   ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin) { (s, d) =>
      val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
        lit(0.8) * col("p_retailprice") * col("l_quantity")
      t(s, d, "lineitem")
        .select("l_partkey", "l_suppkey", "l_shipdate", "l_extendedprice",
          "l_discount", "l_quantity")
        .join(broadcast(t(s, d, "part")
          .filter(col("p_name").like("%red%"))
          .select("p_partkey", "p_retailprice")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("l_shipdate")).cast("long").as("o_year"))
        .agg(dsum(profit, 6).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // ---------------------------------------------------------------
    // TPC-H Q12 shape — late-shipment priority audit: lines shipped
    // 60+ days after their order date in one year, counted into
    // high/low priority classes per return flag (the schema's stand-in
    // for ship mode). Both class counts come from CASE arms in ONE
    // partial+final aggregate over one fact-fact join on the order
    // key; the year filter prunes the lineitem side before the join.
    Q("q12_late_priority_classes",
      "high/low-priority late-line counts per return flag, one pass (TPC-H Q12 shape)",
      """SELECT l_returnflag,
        |  cast(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) as bigint) AS high_line_count,
        |  cast(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |           THEN 1 ELSE 0 END) as bigint) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= DATE '1997-01-01'
        |  AND l_shipdate < DATE '1998-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
          col("l_shipdate") < lit("1998-01-01").cast("date"))
        .select("l_orderkey", "l_shipdate", "l_returnflag")
        .join(t(s, d, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority"),
          col("o_orderkey") === col("l_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // ---------------------------------------------------------------
    // TPC-H Q15 shape — top supplier(s) by quarterly revenue: the
    // revenue view aggregates once, its global max comes back as a
    // broadcast scalar (the q11 pattern), and supplier enriches the
    // (tiny) winner set by broadcast. Ties are kept, exactly as Q15's
    // view-equality semantics require — no LIMIT-1 shortcut that
    // would silently drop a tied winner.
    Q("q15_top_supplier",
      "supplier(s) with max quarterly revenue via broadcast-scalar view equality (TPC-H Q15 shape)",
      s"""WITH revenue AS (
         |  SELECT l_suppkey AS supplier_no,
         |    ${dsumSql("l_extendedprice * (1 - l_discount)", 6)} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= DATE '1996-01-01'
         |    AND l_shipdate < DATE '1996-04-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val revenue = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1996-04-01").cast("date"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(dsum(rev, 6).as("total_revenue"))
      val top = revenue.agg(max(col("total_revenue")).as("max_rev"))
      revenue
        .crossJoin(broadcast(top))
        .filter(col("total_revenue") === col("max_rev"))
        .join(broadcast(t(s, d, "supplier").select("s_suppkey", "s_name")),
          col("supplier_no") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    // ---------------------------------------------------------------
    // TPC-H Q2 shape — cheapest supplier per part: the correlated
    // min-cost subquery, adapted to this schema (no partsupp, so unit
    // cost is observed l_extendedprice/l_quantity from shipments).
    // The per-part argmin resolves to ONE aggregate + a min-struct
    // pick — (unit_cost, suppkey) lexicographic min gives the minimum
    // cost with the deterministic smallest-supplier tiebreak, no
    // second scan, no per-part re-probe. Region membership rides a
    // broadcast; the only fact shuffle is the (part, supplier) agg.
    Q("q2_min_cost_supplier",
      "cheapest observed supplier per part with argmin tiebreak (TPC-H Q2 shape)",
      """WITH asia AS (
        |  SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'),
        |unit AS (
        |  SELECT l_partkey, l_suppkey,
        |    min(l_extendedprice / l_quantity) AS u
        |  FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  WHERE p_size = 15 AND p_type = 'STANDARD'
        |    AND l_suppkey IN (SELECT s_suppkey FROM asia)
        |  GROUP BY 1, 2),
        |best AS (SELECT l_partkey, min(u) AS mu FROM unit GROUP BY 1)
        |SELECT u.l_partkey AS p_partkey, min(u.l_suppkey) AS s_suppkey,
        |       b.mu AS unit_cost
        |FROM unit u JOIN best b ON u.l_partkey = b.l_partkey AND u.u = b.mu
        |GROUP BY 1, 3 ORDER BY 1""".stripMargin) { (s, d) =>
      val asia = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(t(s, d, "nation").select("n_nationkey", "n_regionkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")
          .filter(col("r_name") === "ASIA").select("r_regionkey")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey")
      val perPair = t(s, d, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(broadcast(t(s, d, "part")
          .filter(col("p_size") === 15 && col("p_type") === "STANDARD")
          .select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(asia), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("u"))
      perPair
        .groupBy(col("l_partkey").as("p_partkey"))
        .agg(min(struct(col("u"), col("l_suppkey"))).as("m"))
        .select(col("p_partkey"), col("m.l_suppkey").as("s_suppkey"),
          col("m.u").as("unit_cost"))
        .orderBy("p_partkey")
    },

    // ---------------------------------------------------------------
    // TPC-H Q20 shape — excess shippers: the IN-subquery chain
    // (parts of a type → per-supplier shipped quantity in a year →
    // threshold → suppliers of target nations) resolved to one
    // semi-pruned fact aggregate + broadcast dims. At scale the only
    // shuffle is the per-supplier quantity aggregate; everything else
    // is a broadcast probe or a threshold filter on supplier-
    // cardinality rows.
    Q("q20_excess_shippers",
      "suppliers of target nations shipping >500 units of a part type in a year (TPC-H Q20 shape)",
      s"""WITH sq AS (
         |  SELECT l_suppkey, ${dsumSql("l_quantity")} AS qty
         |  FROM lineitem
         |  JOIN part ON p_partkey = l_partkey
         |  WHERE p_type = 'PROMO'
         |    AND l_shipdate >= DATE '1997-01-01'
         |    AND l_shipdate < DATE '1998-01-01'
         |  GROUP BY 1)
         |SELECT s_suppkey, s_name, qty
         |FROM supplier
         |JOIN sq ON s_suppkey = l_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE n_name IN ('NATION_3', 'NATION_4') AND qty > 500
         |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val sq = t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("date") &&
          col("l_shipdate") < lit("1998-01-01").cast("date"))
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(broadcast(t(s, d, "part")
          .filter(col("p_type") === "PROMO").select("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(dsum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 500)
      sq.join(broadcast(t(s, d, "supplier")
          .select("s_suppkey", "s_name", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(t(s, d, "nation")
          .filter(col("n_name").isin("NATION_3", "NATION_4"))
          .select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name", "qty")
        .orderBy("s_suppkey")
    }
  )
}
