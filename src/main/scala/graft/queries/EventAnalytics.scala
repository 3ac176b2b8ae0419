package graft.queries

import org.apache.spark.sql.functions._

/** Event-pipeline analytics over the `events` stream table: ordered
  * funnel conversion and cohort retention — the two queries every
  * event warehouse serves daily. Both are pure composition of
  * operators already proved in the catalog (conditional min-aggs,
  * semi-join step gating, date bucketing, distinct counts), arranged
  * in the shapes that survive scale: per-step aggregates are
  * map-side combinable and each step join is key-bounded.
  */
object EventAnalytics {

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // Ordered funnel: signup → view (at-or-after the signup) →
    // purchase (at-or-after that view). Each step is a key-bounded
    // join against the previous step's 1-row-per-user aggregate, so
    // step k scans only step k-1 survivors — the funnel narrows the
    // data, not just the numbers. Conversion is a single IEEE division
    // on exact counts.
    Q("e1_funnel",
      "ordered 3-step funnel (signup -> view -> purchase) with conversion rate",
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'view' AND e.ts >= s1.t1 GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY e.user_id)
        |SELECT (SELECT count(*) FROM s1) AS n_signup,
        |       (SELECT count(*) FROM s2) AS n_viewed,
        |       (SELECT count(*) FROM s3) AS n_converted,
        |       round(cast((SELECT count(*) FROM s3) as double)
        |             / cast((SELECT count(*) FROM s1) as double), 6) AS conversion""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = ev.filter(col("event_type") === "view")
        .join(s1, Seq("user_id"))
        .filter(col("ts") >= col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, Seq("user_id"))
        .filter(col("ts") >= col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      s1.agg(count(lit(1)).as("n_signup"))
        .crossJoin(broadcast(s2.agg(count(lit(1)).as("n_viewed"))))
        .crossJoin(broadcast(s3.agg(count(lit(1)).as("n_converted"))))
        .select(col("n_signup"), col("n_viewed"), col("n_converted"),
          round(col("n_converted").cast("double") / col("n_signup").cast("double"), 6)
            .as("conversion"))
    },

    // ---------------------------------------------------------------
    // Cohort retention: users grouped by first-seen day, activity
    // counted per (cohort, day-offset) cell. The first-seen aggregate
    // joins back key-bounded; the cell count is a distinct count per
    // grid cell. Output is the full retention triangle.
    Q("e2_cohort_retention",
      "cohort-by-first-day retention triangle (distinct active users per offset)",
      """WITH f AS (SELECT user_id, min(cast(ts as date)) AS d0
        |           FROM events GROUP BY user_id)
        |SELECT f.d0 AS cohort_day,
        |       date_diff('day', f.d0, cast(e.ts as date)) AS day_offset,
        |       count(DISTINCT e.user_id) AS n_active
        |FROM events e JOIN f ON e.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val f = ev.groupBy("user_id").agg(min(to_date(col("ts"))).as("d0"))
      ev.join(f, Seq("user_id"))
        .select(col("d0").as("cohort_day"),
          datediff(to_date(col("ts")), col("d0")).cast("long").as("day_offset"),
          col("user_id"))
        .groupBy("cohort_day", "day_offset")
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("cohort_day", "day_offset")
    },

    // ---------------------------------------------------------------
    // Event-transition matrix: per-user next-event via lead() (tie
    // broken by the unique event_id, so the sequence — and therefore
    // every count — is deterministic), then (from, to) counts with
    // row-normalized probabilities. Scale shape: the lead() window
    // shuffles once by user_id; the (from, to) aggregate is map-side
    // combinable; the normalizing sum runs as a window over the
    // ~|event_types|² aggregated rows — negligible at any scale.
    Q("e4_transition_matrix",
      "per-user event-type transition counts + row-normalized probabilities",
      """WITH nx AS (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |                           ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |SELECT event_type, next_type, count(*) AS n,
        |  round(cast(count(*) as double)
        |    / cast(sum(count(*)) OVER (PARTITION BY event_type) as double), 6) AS p
        |FROM nx WHERE next_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val wu = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val wt = Window.partitionBy("event_type")
      t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(wu))
        .filter(col("next_type").isNotNull)
        .groupBy("event_type", "next_type")
        .agg(count(lit(1)).as("n"))
        .withColumn("p", round(col("n").cast("double")
          / sum(col("n")).over(wt).cast("double"), 6))
        .orderBy("event_type", "next_type")
    },

    // ---------------------------------------------------------------
    // Sequential pattern matching — the MATCH_RECOGNIZE shape: each
    // user's event history becomes an ordered code string (one char
    // per event, total order by (ts, event_id)) and the funnel
    // pattern `view (click|error)* purchase` is counted as
    // non-overlapping regex matches over it. This is how sequence
    // analytics engines run row-pattern queries: the per-key sequence
    // build is ONE shuffle (the same sort any windowed query pays)
    // and the pattern automaton then runs narrow, per row. e1 gates
    // the aggregate funnel; this gates the per-user OCCURRENCE
    // COUNTING with order and adjacency constraints that aggregate
    // step-joins cannot express (an intervening 'signup'/'view'
    // breaks a run here; e1 would still count it). The regex is
    // anchored-free and backtracking-trivial (single literal head,
    // bounded class body), so Java and RE2 agree on leftmost
    // non-overlapping semantics.
    Q("e5_pattern_match",
      "MATCH_RECOGNIZE-shape: per-user ordered event string, non-overlapping v[ce]*p funnel runs",
      """WITH seq AS (
        |  SELECT user_id, count(*) AS n_events,
        |    string_agg(left(event_type, 1), '' ORDER BY ts, event_id) AS s
        |  FROM events GROUP BY user_id)
        |SELECT user_id, n_events,
        |  CAST(len(regexp_extract_all(s, 'v[ce]*p')) AS BIGINT) AS n_runs,
        |  (len(regexp_extract_all(s, 'v[ce]*p')) > 0) AS converted
        |FROM seq ORDER BY user_id""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("code"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          // one sorted fold builds the ordered sequence: struct sort
          // by (ts, event_id) is the same total order the oracle's
          // ORDER BY states; the collect is per-user event counts —
          // the same bound any sessionization holds
          array_join(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("code")))),
            x => x.getField("code")), "").as("s"))
        .select(col("user_id"), col("n_events"),
          size(expr("regexp_extract_all(s, 'v[ce]*p', 0)")).cast("long")
            .as("n_runs"),
          (size(expr("regexp_extract_all(s, 'v[ce]*p', 0)")) > 0)
            .as("converted"))
        .orderBy("user_id")
    },

    // ---------------------------------------------------------------
    // Time-boxed funnel (the windowFunnel semantics): e1 counts the
    // ordered signup→view→purchase chain with NO deadline; here every
    // later step must also land within 7 DAYS of the user's first
    // signup — the conversion-window constraint every growth metric
    // actually carries (a purchase a month later is not campaign
    // attribution). Depth per user = furthest step reached inside the
    // window; output is the depth histogram. Same scale shape as e1:
    // each step is a key-bounded join against the previous step's
    // 1-row-per-user aggregate; the deadline is a per-row predicate
    // riding those joins, costing nothing extra.
    Q("e7_windowed_funnel",
      "7-day windowed funnel depth histogram (signup -> view -> purchase within the window)",
      """WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |            WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'view' AND e.ts >= s1.t1
        |         AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |       JOIN s2 ON e.user_id = s2.user_id
        |       JOIN s1 ON e.user_id = s1.user_id
        |       WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        |         AND e.ts <= s1.t1 + INTERVAL 7 DAY GROUP BY e.user_id),
        |d AS (SELECT s1.user_id,
        |        CASE WHEN s3.user_id IS NOT NULL THEN 3
        |             WHEN s2.user_id IS NOT NULL THEN 2
        |             ELSE 1 END AS depth
        |      FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        |              LEFT JOIN s3 ON s1.user_id = s3.user_id)
        |SELECT depth, count(*) AS n_users
        |FROM d GROUP BY depth ORDER BY depth""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val s1 = ev.filter(col("event_type") === "signup")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val s2 = ev.filter(col("event_type") === "view")
        .join(s1, Seq("user_id"))
        .filter(col("ts") >= col("t1") &&
          col("ts") <= col("t1") + expr("INTERVAL 7 DAY"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, Seq("user_id")).join(s1, Seq("user_id"))
        .filter(col("ts") >= col("t2") &&
          col("ts") <= col("t1") + expr("INTERVAL 7 DAY"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      s1.join(s2.select(col("user_id"), lit(1).as("h2")), Seq("user_id"), "left")
        .join(s3.select(col("user_id"), lit(1).as("h3")), Seq("user_id"), "left")
        .select(when(col("h3").isNotNull, 3)
          .when(col("h2").isNotNull, 2).otherwise(1).as("depth"))
        .groupBy("depth").agg(count(lit(1)).as("n_users"))
        .orderBy("depth")
    },

    // ---------------------------------------------------------------
    // In-engine grouped OLS — per-event-type trend of value over time,
    // fitted from SUFFICIENT STATISTICS: n, Σt, Σv, Σtv, Σt², Σv² are
    // the whole model, and every one is an INTEGER sum (t = whole
    // hours since the window start; v = exact cents via round(×100) —
    // the data is 2-decimal money, so the cast is lossless). Integer
    // partials are map-side combinable and order-invariant, so the fit
    // is bit-identical at any partition count; floats appear only in
    // the final per-group projection (slope/intercept/r from exact
    // ints — a handful of IEEE ops, deterministic in both engines).
    // This is the grouped-ML-without-an-ML-runtime shape: one scan,
    // one keyed aggregate, models for every group in parallel. All
    // magnitudes are long-safe: |Σtv| < n·max_t·max_vc ≈ 1e4·1e3·1e4
    // = 1e11 at sf0.01 and still < 2^63 headroom at 1e9-row groups;
    // the r numerator squares in DOUBLE (exact-int-derived, < 2^53).
    Q("a22_grouped_ols",
      "per-type OLS trend (value ~ hours) from exact integer sufficient statistics",
      """WITH p AS (
        |  SELECT event_type,
        |    cast(floor(date_diff('second', TIMESTAMP '2024-01-01 00:00:00', ts) / 3600.0) AS BIGINT) AS t,
        |    cast(round(value * 100) AS BIGINT) AS vc
        |  FROM events),
        |s AS (SELECT event_type, count(*) AS n,
        |        cast(sum(t) AS BIGINT) AS st, cast(sum(vc) AS BIGINT) AS sv,
        |        cast(sum(t * vc) AS BIGINT) AS stv,
        |        cast(sum(t * t) AS BIGINT) AS stt,
        |        cast(sum(vc * vc) AS BIGINT) AS svv
        |      FROM p GROUP BY event_type)
        |SELECT event_type, n,
        |  round(cast(n * stv - st * sv AS double)
        |    / (cast(n * stt - st * st AS double) * 100.0), 6) AS slope,
        |  round(cast(sv AS double) / (cast(n AS double) * 100.0)
        |    - (cast(n * stv - st * sv AS double)
        |       / (cast(n * stt - st * st AS double) * 100.0))
        |      * (cast(st AS double) / cast(n AS double)), 6) AS intercept,
        |  round(cast(n * stv - st * sv AS double)
        |    / sqrt(cast(n * stt - st * st AS double)
        |           * cast(n * svv - sv * sv AS double)), 6) AS r
        |FROM s ORDER BY event_type""".stripMargin) { (s, d) =>
      val p = t(s, d, "events").select(col("event_type"),
        floor((col("ts").cast("long")
          - lit(java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond))
          .cast("double") / 3600.0).cast("long").as("t"),
        round(col("value") * 100).cast("long").as("vc"))
      val st = p.groupBy("event_type").agg(
        count(lit(1)).as("n"),
        sum("t").as("st"), sum("vc").as("sv"),
        sum(col("t") * col("vc")).as("stv"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("vc") * col("vc")).as("svv"))
      val num = (col("n") * col("stv") - col("st") * col("sv")).cast("double")
      val dent = (col("n") * col("stt") - col("st") * col("st")).cast("double")
      val denv = (col("n") * col("svv") - col("sv") * col("sv")).cast("double")
      val slope = num / (dent * 100.0)
      st.select(col("event_type"), col("n"),
          round(slope, 6).as("slope"),
          round(col("sv").cast("double") / (col("n").cast("double") * 100.0)
            - slope * (col("st").cast("double") / col("n").cast("double")), 6)
            .as("intercept"),
          round(num / sqrt(dent * denv), 6).as("r"))
        .orderBy("event_type")
    },

    // ---------------------------------------------------------------
    // Association rules — market-basket analysis over per-user event
    // baskets: for every ordered type pair (a → b), support = users
    // with both / all users, confidence = P(b | a), lift =
    // conf / P(b). The candidate space is the DISTINCT per-user type
    // set, so pair explosion is bounded by |types|² per user (≤ 25
    // here) REGARDLESS of event volume — the reason basket mining is
    // linear where naive event-pair joins are quadratic: collapse to
    // baskets FIRST, then pair within the basket. Ratios are exact
    // integer counts divided once at the end (per-row IEEE, both
    // engines agree); rounded to 6.
    Q("e8_assoc_rules",
      "market-basket rules over per-user event-type sets: support / confidence / lift",
      """WITH u AS (SELECT DISTINCT user_id, event_type FROM events),
        |nu AS (SELECT count(DISTINCT user_id) AS n FROM events),
        |tc AS (SELECT event_type, count(*) AS c FROM u GROUP BY event_type),
        |pairs AS (SELECT a.user_id, a.event_type AS ante, b.event_type AS cons
        |          FROM u a JOIN u b ON a.user_id = b.user_id
        |          WHERE a.event_type != b.event_type),
        |pc AS (SELECT ante, cons, count(*) AS both FROM pairs GROUP BY ante, cons)
        |SELECT pc.ante, pc.cons, pc.both,
        |  round(cast(pc.both AS double) / cast(nu.n AS double), 6) AS support,
        |  round(cast(pc.both AS double) / cast(ta.c AS double), 6) AS confidence,
        |  round((cast(pc.both AS double) / cast(ta.c AS double))
        |    / (cast(tb.c AS double) / cast(nu.n AS double)), 6) AS lift
        |FROM pc JOIN tc ta ON ta.event_type = pc.ante
        |        JOIN tc tb ON tb.event_type = pc.cons, nu
        |ORDER BY ante, cons""".stripMargin) { (s, d) =>
      val u = t(s, d, "events").select("user_id", "event_type").distinct()
      val nu = u.agg(countDistinct("user_id").as("n"))
      val tc = u.groupBy("event_type").agg(count(lit(1)).as("c"))
      val a = u.select(col("user_id"), col("event_type").as("ante"))
      val b = u.select(col("user_id"), col("event_type").as("cons"))
      val pc = a.join(b, "user_id")
        .filter(col("ante") =!= col("cons"))
        .groupBy("ante", "cons").agg(count(lit(1)).as("both"))
      pc.join(broadcast(tc.select(col("event_type").as("ante"), col("c").as("ca"))), "ante")
        .join(broadcast(tc.select(col("event_type").as("cons"), col("c").as("cb"))), "cons")
        .crossJoin(broadcast(nu))
        .select(col("ante"), col("cons"), col("both"),
          round(col("both").cast("double") / col("n").cast("double"), 6)
            .as("support"),
          round(col("both").cast("double") / col("ca").cast("double"), 6)
            .as("confidence"),
          round((col("both").cast("double") / col("ca").cast("double"))
            / (col("cb").cast("double") / col("n").cast("double")), 6)
            .as("lift"))
        .orderBy("ante", "cons")
    },

    // ---------------------------------------------------------------
    // Calendar-spine gap filling — time-series resampling: daily
    // per-type activity with MISSING DAYS materialized as zeros, the
    // step every downstream window/trend consumer needs (a rolling
    // average over a table with holes is silently wrong). The spine
    // is GENERATED (sequence over the observed [min, max] date range
    // × the distinct type set — |days|·|types| rows regardless of
    // event volume, from two broadcast 1-row/|types|-row aggregates),
    // and the fact side collapses to its daily aggregate BEFORE the
    // spine left-joins it — the join is dimension-sized on both
    // sides at any scale.
    Q("e6_gap_fill",
      "daily per-type counts on a generated calendar spine, missing days filled with zeros",
      s"""WITH b AS (SELECT min(cast(ts AS date)) AS lo, max(cast(ts AS date)) AS hi
         |           FROM events),
         |spine AS (SELECT cast(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY)) AS date) AS day
         |          FROM b),
         |types AS (SELECT DISTINCT event_type FROM events),
         |daily AS (SELECT cast(ts AS date) AS day, event_type, count(*) AS c,
         |            ${dsumSql("value")} AS total
         |          FROM events GROUP BY 1, 2)
         |SELECT s.day, t.event_type,
         |  coalesce(d.c, 0) AS n, coalesce(d.total, 0.0) AS total,
         |  (d.c IS NULL) AS filled
         |FROM spine s CROSS JOIN types t
         |LEFT JOIN daily d ON d.day = s.day AND d.event_type = t.event_type
         |ORDER BY s.day, t.event_type""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val b = ev.agg(min(to_date(col("ts"))).as("lo"),
        max(to_date(col("ts"))).as("hi"))
      val spine = b.select(explode(expr(
        "sequence(lo, hi, interval 1 day)")).as("day"))
      val types = ev.select(col("event_type")).distinct()
      val daily = ev.groupBy(to_date(col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("c"), dsum(col("value")).as("total"))
      spine.crossJoin(broadcast(types))
        .join(daily, Seq("day", "event_type"), "left")
        .select(col("day"), col("event_type"),
          coalesce(col("c"), lit(0L)).as("n"),
          coalesce(col("total"), lit(0.0)).as("total"),
          col("c").isNull.as("filled"))
        .orderBy("day", "event_type")
    },

    // ---------------------------------------------------------------
    // E9 — rolling distinct users (DAU + trailing-7-day WAU): the
    // engagement board every product warehouse serves. COUNT DISTINCT
    // cannot ride a running window frame, and the naive day-grid ×
    // events BETWEEN join is O(days · corpus). The scale form inverts
    // it: each (user, active-day) pair explodes to the ≤7 FORWARD
    // days it counts toward — O(7 · active-pairs), linear at any
    // history length — then one distinct-count per (day, window).
    // Trailing days beyond the observed range are clipped so the
    // board covers exactly the observed days (both engines state the
    // same clip). At extreme scale the distinct swaps for a20's
    // mergeable HLL partials per day; the shape is identical.
    Q("e9_rolling_active_users",
      "per-day DAU + trailing-7-day WAU via forward-day explode, never day x corpus",
      """WITH au AS (SELECT DISTINCT cast(ts as date) AS d, user_id FROM events),
        |bounds AS (SELECT min(cast(ts as date)) AS lo, max(cast(ts as date)) AS hi
        |           FROM events),
        |contrib AS (
        |  SELECT unnest(range(0, 7)) AS k, d, user_id FROM au),
        |w AS (
        |  SELECT d + cast(k as int) AS day, user_id
        |  FROM contrib CROSS JOIN bounds
        |  WHERE d + cast(k as int) <= hi),
        |wau AS (SELECT day, count(DISTINCT user_id) AS wau7 FROM w GROUP BY 1),
        |dau AS (SELECT d AS day, count(*) AS dau FROM au GROUP BY 1)
        |SELECT day, coalesce(dau, 0) AS dau, wau7
        |FROM wau LEFT JOIN dau USING (day)
        |ORDER BY day""".stripMargin) { (s, d) =>
      val ev = t(s, d, "events")
      val au = ev.select(to_date(col("ts")).as("d"), col("user_id")).distinct()
      val bounds = ev.agg(max(to_date(col("ts"))).as("hi"))
      val w = au.select(col("d"), col("user_id"),
          explode(sequence(lit(0), lit(6))).as("k"))
        .crossJoin(broadcast(bounds))
        .select(date_add(col("d"), col("k")).as("day"), col("user_id"),
          col("hi"))
        .filter(col("day") <= col("hi"))
      val wau = w.groupBy("day")
        .agg(countDistinct(col("user_id")).as("wau7"))
      val dau = au.groupBy(col("d").as("day"))
        .agg(count(lit(1)).as("dau"))
      wau.join(dau, Seq("day"), "left")
        .select(col("day"), coalesce(col("dau"), lit(0L)).as("dau"),
          col("wau7"))
        .orderBy("day")
    }
  )
}
