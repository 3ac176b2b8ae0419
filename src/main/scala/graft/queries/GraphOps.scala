package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.XSql
import graft.functions.XSql.{Dialect, Spark => SqlSpark, Duck => SqlDuck}

/** Graph analytics over data-derived edge sets — the iterative
  * message-passing family (PageRank here; connected components already
  * ships as `operators/ConnectedComponents` under d7).
  *
  * Scale design: every iteration is ONE equi-join (ranks ⨝ edges on
  * src) plus ONE keyed aggregate (sum of contributions by dst) — the
  * Pregel-as-joins shape that runs PageRank at web scale. Edges carry
  * their out-degree from a single upfront aggregate, so iterations
  * never recompute it. The graph itself comes from the LSH band join
  * (bounded candidate generation, never all-pairs) — the same edge
  * set d3 verifies.
  *
  * Determinism at scale: ranks are FIXED-POINT BIGINTs (units of
  * 1e-12), not doubles. Integer sums are order-invariant, so the
  * result is bit-identical at ANY partition count / merge order —
  * where a double-sum PageRank drifts in low-order bits between runs.
  * Total rank mass is ~1e12, so every partial sum fits a long with
  * ~6 orders of headroom at any corpus size; the per-edge division
  * floor loses mass (never gains), bounded by deg per node per round —
  * invisible at rank granularity 1e-12.
  */
object GraphOps {

  private def wordsE(implicit d: Dialect) = XSql.words("text")

  /** Fixed-point scale: 1.0 of rank mass == 1e12. */
  private val S = 1000000000000L

  /** Vertex-count ceiling under which the triangle family's degree
    * table may be broadcast into the orientation join. 4M vertices ≈
    * 200 MB of hashed relation (16 B of key+degree plus ~32 B of map
    * overhead per entry) — comfortable on any executor profile that
    * runs this engine. Overridable per deployment via
    * -Dgraft.graph.degree.broadcast.max.vertices. */
  private[queries] def degBroadcastMaxVertices: Long =
    sys.props.getOrElse("graft.graph.degree.broadcast.max.vertices",
      "4000000").toLong

  /** Degree-ordered oriented adjacency lists — the shared front half
    * of the triangle family (g3 exact, g6 DOULION-sampled). Orients
    * each undirected edge from its lower (degree, id) endpoint — caps
    * every out-list at O(√m) (Suri–Vassilvitskii) — and folds the
    * oriented edges STRAIGHT into sorted adjacency lists: one
    * shuffle, no materialized directed-edge table.
    *
    * The degree join is VOLUME-AWARE, not hinted unconditionally:
    * `deg` is vertex-dimension-sized — tens of MB at every audited
    * scale, but O(10⁹) rows × ~50 B of hashed-relation overhead at a
    * 100 TB part-key graph, where a hard broadcast() hint is a driver
    * OOM that no AQE threshold can override. So measure first (the
    * count reads the already-checkpointed partitions, no recompute),
    * then decide: hint the broadcast under the ceiling; above it
    * leave the join unhinted, so the initial plan is a shuffle
    * equi-join and AQE may still downgrade to broadcast from the
    * RUNTIME bytes if they allow. The i4 discipline — size to
    * measured volume, never to a constant (PlanSpec gates both
    * regimes). */
  private[graft] def orientedAdjPlan(e: DataFrame): DataFrame = {
    // checkpointed so the two dimension builds below read the |V|-row
    // result instead of re-running the 2·|E|-row degree shuffle each
    val deg = e.select(col("u").as("id")).unionByName(e.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    val nV = deg.count()
    def sized(dim: DataFrame): DataFrame =
      if (nV <= degBroadcastMaxVertices) broadcast(dim) else dim
    e.join(sized(deg.select(col("id").as("u"), col("deg").as("du"))), Seq("u"))
      .join(sized(deg.select(col("id").as("v"), col("deg").as("dv"))), Seq("v"))
      .select(
        when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
          struct(col("u").as("id"), col("v").as("o_dst")))
          .otherwise(struct(col("v").as("id"), col("u").as("o_dst"))).as("o"))
      .select(col("o.id").as("src"), col("o.o_dst").as("dst"))
      .groupBy("src").agg(sort_array(collect_list(col("dst"))).as("nbrs"))
  }

  private[queries] def orientedAdj(e: DataFrame): DataFrame =
    // checkpoint the adjacency fold: the intersection stage below
    // reads it twice (explode side + probe side)
    orientedAdjPlan(e).localCheckpoint()

  /** Triangle count by ADJACENCY INTERSECTION, not wedge
    * materialization: triangles(a<b<c in (deg,id) order) = Σ over
    * oriented edges (x,y) of |N+(x) ∩ N+(y)| — each triangle counted
    * exactly once, via its (a,b) edge (c sits in both out-lists; the
    * other two edges find no common OUT-neighbor). Exploding the
    * adjacency table re-derives the oriented edges WITH the src
    * side's list already attached (it is the row being exploded), so
    * the only movement is ONE hash join keyed on dst: O(m) skinny
    * rows plus O(m) bounded-list entries — where the wedge self-join
    * this replaces shuffled O(Σ outdeg²) = O(m^1.5) wedge rows into
    * its closing probe (measured 504M wedge rows vs 30M edges at 100×
    * bench volume; 61 s → ~35 s wall). graft_intersect_size is the
    * codegen sort-merge count over the pre-sorted lists — no per-pair
    * allocation, the quadratic term is pure local CPU. */
  private[graft] def intersectionTriangles(adj: DataFrame, outCol: String,
      scaleUp: Long = 1L): DataFrame =
    adj.select(col("nbrs").as("nu"), explode(col("nbrs")).as("dst"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("nv")), Seq("dst"))
      .select(expr("graft_intersect_size(nu, nv)").as("k"))
      .agg((sum(col("k")) * scaleUp).cast("long").as(outCol))
      .select(coalesce(col(outCol), lit(0L)).as(outCol))

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // PageRank (damping 0.85, 3 rounds) over the verified near-dup
    // graph: nodes = docs with >= 1 verified LSH pair, undirected
    // edges. High rank == the doc sits in a dense duplication
    // neighborhood — the centrality signal crawl pipelines use to
    // pick canonical copies. No dangling nodes by construction
    // (every node of an undirected edge has out-degree >= 1), so the
    // update is exactly r' = (0.15/n + 0.85 * sum_in(r/deg)) in
    // 1e-12 fixed point, all-BIGINT: `div` floors identically in
    // Spark and DuckDB, and the corpus size n rides a broadcast
    // 1-row aggregate (never a driver-side collect).
    Q("g1_pagerank",
      "fixed-point PageRank (d=0.85, 3 rounds) over the verified LSH near-dup graph",
      {
        implicit val dl: Dialect = SqlDuck
        val teleport = s"(15 * ${S}) // (100 * nn.n)"
        def iter(prev: String, out: String): String =
          s"""$out AS (
             |  SELECT e.dst AS id, cast($teleport
             |      + (85 * sum(p.r // e.deg)) // 100 AS BIGINT) AS r
             |  FROM edges e JOIN $prev p ON p.id = e.src, nn
             |  GROUP BY e.dst, nn.n)""".stripMargin
        s"""WITH w AS (SELECT doc_id, ${XSql.wordHashes(wordsE)} AS wh FROM documents),
           |sh AS (SELECT doc_id, ${XSql.shingleHashes("wh")} AS sh FROM w),
           |sig AS (SELECT doc_id, sh, ${XSql.minhashSig("sh")} AS sig FROM sh),
           |bands AS (SELECT doc_id, sh, unnest(${XSql.bandKeys("sig")}) AS band_key,
           |                 unnest(range(0, ${XSql.LshBands})) AS band_idx FROM sig),
           |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |         FROM bands a JOIN bands b
           |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
           |          AND a.doc_id < b.doc_id),
           |pairs AS (SELECT c.doc_a, c.doc_b FROM cand c
           |          JOIN sh sa ON sa.doc_id = c.doc_a
           |          JOIN sh sb ON sb.doc_id = c.doc_b
           |          WHERE ${XSql.jaccard("sa.sh", "sb.sh")} >= 0.5),
           |ed AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
           |       UNION ALL SELECT doc_b, doc_a FROM pairs),
           |deg AS (SELECT src, count(*) AS deg FROM ed GROUP BY src),
           |edges AS (SELECT ed.src, ed.dst, deg.deg FROM ed JOIN deg ON deg.src = ed.src),
           |nn AS (SELECT count(*) AS n FROM deg),
           |r0 AS (SELECT src AS id, cast(${S} // nn.n AS BIGINT) AS r FROM deg, nn),
           |${iter("r0", "r1")},
           |${iter("r1", "r2")},
           |${iter("r2", "r3")}
           |SELECT d.src AS doc_id, d.deg, r3.r AS rank_fp,
           |       cast(r3.r AS double) / 1e12 AS rank
           |FROM r3 JOIN deg d ON d.src = r3.id
           |ORDER BY rank_fp DESC, doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val sh = t(s, d, "documents")
        .withColumn("sh", expr(XSql.shinglesOfText("text")))
        .select("doc_id", "sh")
      val pairs = graft.operators.Lsh.verifiedPairs(sh, 0.5)
        .select("doc_a", "doc_b")
      val edges0 = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      val deg = edges0.groupBy("src").agg(count(lit(1)).as("deg"))
      // degree attached ONCE; iterations reuse this edge table (cached:
      // recomputing it would re-run the LSH band join per round)
      val edges = edges0.join(deg, "src").cache()
      val nDf = deg.agg(count(lit(1)).as("n"))
      val r0 = deg.select(col("src").as("id"))
        .crossJoin(broadcast(nDf))
        .select(col("id"), expr(s"cast($S div n AS BIGINT)").as("r"))
      val r3 = (1 to 3).foldLeft(r0) { (prev, _) =>
        edges.join(prev, edges("src") === prev("id"))
          .select(col("dst"), expr("r div deg").as("contrib"))
          .groupBy("dst").agg(sum("contrib").as("inc"))
          .crossJoin(broadcast(nDf))
          .select(col("dst").as("id"),
            expr(s"cast((15 * $S) div (100 * n) + (85 * inc) div 100 AS BIGINT)")
              .as("r"))
      }
      r3.join(deg, r3("id") === deg("src"))
        .select(col("src").as("doc_id"), col("deg"),
          col("r").as("rank_fp"),
          (col("r").cast("double") / lit(1e12)).as("rank"))
        .orderBy(col("rank_fp").desc, col("doc_id"))
    },

    // ---------------------------------------------------------------
    // Weighted PageRank — the realistic variant: edges carry their
    // verified Jaccard as an INTEGER weight (round(jacc*1000) ∈
    // [500,1000] at the 0.5 threshold), and each node distributes its
    // rank proportionally to edge weight: contribution along (u,v) is
    // (r_u · w_uv) div strength_u, strength = Σ w per node. Same
    // order-invariant all-BIGINT contract as g1 — the only new
    // magnitude is r·w ≤ 1e12·1000 = 1e15, still 3 orders inside
    // int64 — and the same two-pass iteration shape (one equi-join,
    // one keyed sum). Strength rides the edge table from one upfront
    // aggregate, exactly like g1's degree.
    Q("g2_weighted_pagerank",
      "similarity-weighted fixed-point PageRank over the verified LSH near-dup graph",
      {
        implicit val dl: Dialect = SqlDuck
        val teleport = s"(15 * ${S}) // (100 * nn.n)"
        def iter(prev: String, out: String): String =
          s"""$out AS (
             |  SELECT e.dst AS id, cast($teleport
             |      + (85 * sum((p.r * e.w) // e.strength)) // 100 AS BIGINT) AS r
             |  FROM edges e JOIN $prev p ON p.id = e.src, nn
             |  GROUP BY e.dst, nn.n)""".stripMargin
        s"""WITH w AS (SELECT doc_id, ${XSql.wordHashes(wordsE)} AS wh FROM documents),
           |sh AS (SELECT doc_id, ${XSql.shingleHashes("wh")} AS sh FROM w),
           |sig AS (SELECT doc_id, sh, ${XSql.minhashSig("sh")} AS sig FROM sh),
           |bands AS (SELECT doc_id, sh, unnest(${XSql.bandKeys("sig")}) AS band_key,
           |                 unnest(range(0, ${XSql.LshBands})) AS band_idx FROM sig),
           |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |         FROM bands a JOIN bands b
           |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
           |          AND a.doc_id < b.doc_id),
           |pairs AS (SELECT c.doc_a, c.doc_b,
           |            cast(round(${XSql.jaccard("sa.sh", "sb.sh")} * 1000) AS BIGINT) AS w
           |          FROM cand c
           |          JOIN sh sa ON sa.doc_id = c.doc_a
           |          JOIN sh sb ON sb.doc_id = c.doc_b
           |          WHERE ${XSql.jaccard("sa.sh", "sb.sh")} >= 0.5),
           |ed AS (SELECT doc_a AS src, doc_b AS dst, w FROM pairs
           |       UNION ALL SELECT doc_b, doc_a, w FROM pairs),
           |st AS (SELECT src, cast(sum(w) AS BIGINT) AS strength FROM ed GROUP BY src),
           |edges AS (SELECT ed.src, ed.dst, ed.w, st.strength
           |          FROM ed JOIN st ON st.src = ed.src),
           |nn AS (SELECT count(*) AS n FROM st),
           |r0 AS (SELECT src AS id, cast(${S} // nn.n AS BIGINT) AS r FROM st, nn),
           |${iter("r0", "r1")},
           |${iter("r1", "r2")},
           |${iter("r2", "r3")}
           |SELECT s.src AS doc_id, s.strength, r3.r AS rank_fp,
           |       cast(r3.r AS double) / 1e12 AS rank
           |FROM r3 JOIN st s ON s.src = r3.id
           |ORDER BY rank_fp DESC, doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val sh = t(s, d, "documents")
        .withColumn("sh", expr(XSql.shinglesOfText("text")))
        .select("doc_id", "sh")
      val pairs = graft.operators.Lsh.verifiedPairs(sh, 0.5)
        .select(col("doc_a"), col("doc_b"),
          round(col("jacc") * 1000).cast("long").as("w"))
      val edges0 = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"), col("w"))
        .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"), col("w")))
      val st = edges0.groupBy("src").agg(sum("w").as("strength"))
      val edges = edges0.join(st, "src").cache()
      val nDf = st.agg(count(lit(1)).as("n"))
      val r0 = st.select(col("src").as("id"))
        .crossJoin(broadcast(nDf))
        .select(col("id"), expr(s"cast($S div n AS BIGINT)").as("r"))
      val r3 = (1 to 3).foldLeft(r0) { (prev, _) =>
        edges.join(prev, edges("src") === prev("id"))
          .select(col("dst"), expr("(r * w) div strength").as("contrib"))
          .groupBy("dst").agg(sum("contrib").as("inc"))
          .crossJoin(broadcast(nDf))
          .select(col("dst").as("id"),
            expr(s"cast((15 * $S) div (100 * n) + (85 * inc) div 100 AS BIGINT)")
              .as("r"))
      }
      r3.join(st, r3("id") === st("src"))
        .select(col("src").as("doc_id"), col("strength"),
          col("r").as("rank_fp"),
          (col("r").cast("double") / lit(1e12)).as("rank"))
        .orderBy(col("rank_fp").desc, col("doc_id"))
    },

    // ---------------------------------------------------------------
    // Triangle counting over the co-purchase graph (parts that share
    // an order), via DEGREE-ORDERED ORIENTATION — the distributed
    // algorithm (Suri–Vassilvitskii style) whose wedge stage is
    // bounded: each undirected edge is directed from its lower-
    // (degree, id) endpoint, capping every out-degree at O(√m), so
    // the out-neighbor-pair self-join generates O(m^1.5) wedges
    // worst-case instead of Σdeg² — the difference between a job
    // that finishes and a hot-node explosion on a power-law graph.
    // Every step is an equi-join (src self-join, then (v,w) closing
    // probe); no cartesian anywhere. The oracle counts the same
    // triangles the naive id-ordered way — the count is orientation-
    // invariant, so agreement checks the algorithm, not the layout.
    Q("g3_triangle_count",
      "co-purchase triangle count: degree-ordered orientation + adjacency-list intersection",
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_orderkey % 4 = 1),
        |e AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        |SELECT cast((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
        |       cast((SELECT count(*)
        |             FROM e e1
        |             JOIN e e2 ON e2.u = e1.v
        |             JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS BIGINT)
        |         AS n_triangles""".stripMargin) { (s, d) =>
      // per-order pair generation (ONE groupBy + local explode) instead
      // of the orderkey self-join: same distinct pair set, one shuffle
      // fewer. cache(): the edge set feeds degrees, orientation and the
      // n_edges count inside the one final action.
      val e = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 4 === 1)
        .groupBy("l_orderkey").agg(collect_set(col("l_partkey")).as("ps"))
        .select(explode(col("ps")).as("u"), col("ps"))
        .select(col("u"), explode(col("ps")).as("v"))
        .filter(col("u") < col("v"))
        .distinct()
        .cache()
      // orientation + adjacency fold + intersection count: the shared
      // volume-aware pipeline (scale rationale on orientedAdj /
      // intersectionTriangles above)
      val tri = intersectionTriangles(orientedAdj(e), "n_triangles")
      e.agg(count(lit(1)).as("n_edges"))
        .crossJoin(broadcast(tri))
    },

    // ---------------------------------------------------------------
    // DOULION (Tsourakakis et al., KDD'09): triangle counting on a
    // p-SAMPLED edge set, estimate = sampled count / p³ — the standard
    // scale path when the exact count's Σoutdeg² term is too hot. The
    // sample here is DETERMINISTIC (universal hash of the edge key mod
    // 4, the same integer-hash discipline as the MinHash family), so
    // the DuckDB oracle reproduces the estimate BIT-EXACTLY — the gate
    // checks the whole sampling+counting algorithm, not a lucky draw.
    // Accuracy is a measured artifact, not a hope: with T triangles
    // surviving independently at p³, relative stderr ≈ sqrt((1/p³−1)/T)
    // — ~0.1% on the 100× audit graph (T≈40M), committed alongside the
    // exact g3 in the scale audit. Wall: the sampled graph has p·m
    // edges and ~p²·Σoutdeg² wedge work — the 1/16 knob that keeps the
    // heaviest graph query inside an interactive budget at any scale.
    Q("g6_triangle_doulion",
      "DOULION sampled triangle estimate (deterministic p=1/4 edge sample, /p^3 scale-up)",
      """WITH li AS (
        |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        |  WHERE l_orderkey % 4 = 1),
        |e0 AS (
        |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |e AS (
        |  SELECT u, v FROM e0
        |  WHERE ((u * 2654435761 + v * 40503) % 2147483647) % 4 = 0)
        |SELECT cast((SELECT count(*) FROM e) AS BIGINT) AS n_sampled_edges,
        |       cast((SELECT count(*) * 64
        |             FROM e e1
        |             JOIN e e2 ON e2.u = e1.v
        |             JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v) AS BIGINT)
        |         AS n_triangles_est""".stripMargin) { (s, d) =>
      val keep = ((col("u") * lit(2654435761L) + col("v") * lit(40503L))
        % lit(2147483647L)) % 4 === 0
      val e = t(s, d, "lineitem")
        .filter(col("l_orderkey") % 4 === 1)
        .groupBy("l_orderkey").agg(collect_set(col("l_partkey")).as("ps"))
        .select(explode(col("ps")).as("u"), col("ps"))
        .select(col("u"), explode(col("ps")).as("v"))
        .filter(col("u") < col("v"))
        .distinct()
        .filter(keep)
        .cache()
      // identical pipeline to g3 on the sampled graph (orientation by
      // SAMPLED degree — any consistent total order is correct);
      // /p³ = ×64 scale-up folded into the final aggregate
      val tri = intersectionTriangles(orientedAdj(e), "n_triangles_est",
        scaleUp = 64L)
      e.agg(count(lit(1)).as("n_sampled_edges"))
        .crossJoin(broadcast(tri))
    },

    // ---------------------------------------------------------------
    // Hierarchy FLATTEN — the classic warehouse parent-child op
    // (org charts, category trees, BOM rollups): every node resolves
    // its ROOT and DEPTH. The naive translation iterates depth-many
    // self-joins (a 20-level tree = 20 shuffles); the distributed
    // shape is POINTER DOUBLING: each round every node's known
    // ancestor jumps to that ancestor's known ancestor, doubling the
    // resolved distance — ceil(log2(depth)) rounds total, each ONE
    // keyed self-join of the node-sized state. The same log-round
    // discipline as ConnectedComponents' star contraction; rounds are
    // fixed (idempotent once a node reaches its root), so the driver
    // never inspects data. The forest here derives from customer keys
    // (parent = key div 7, keys < 7 are roots — depth ~ log7(n), so
    // the doubling bound is tiny while the oracle's recursive CTE
    // walks it level by level).
    Q("g4_hierarchy_flatten",
      "parent-child hierarchy resolved to (root, depth) via log-round pointer doubling",
      s"""WITH RECURSIVE h AS (
         |  SELECT c_custkey AS node, c_custkey AS root,
         |    cast(0 AS BIGINT) AS depth
         |  FROM customer WHERE c_custkey < 7
         |  UNION ALL
         |  SELECT c.c_custkey, h.root, h.depth + 1
         |  FROM customer c JOIN h ON c.c_custkey // 7 = h.node
         |  WHERE c.c_custkey >= 7)
         |SELECT node, root, depth FROM h ORDER BY node""".stripMargin) { (s, d) =>
      val nodes = t(s, d, "customer").select(col("c_custkey").as("node"))
      var st = nodes.select(col("node"),
        when(col("node") < 7, col("node"))
          .otherwise(expr("node div 7")).as("anc"),
        when(col("node") < 7, lit(0L)).otherwise(lit(1L)).as("d"),
        (col("node") < 7).as("done"))
        .localCheckpoint()
      // depth <= log7(max key); 5 doubling rounds resolve up to 2^5
      // levels — far past any key range the fixture can produce, and
      // extra rounds are no-ops on resolved nodes
      for (_ <- 1 to 5) {
        val b = st.select(col("node").as("b_node"), col("anc").as("b_anc"),
          col("d").as("b_d"), col("done").as("b_done"))
        st = st.join(b, col("anc") === col("b_node"))
          .select(col("node"),
            when(col("done"), col("anc")).otherwise(col("b_anc")).as("anc"),
            when(col("done"), col("d")).otherwise(col("d") + col("b_d")).as("d"),
            (col("done") || col("b_done")).as("done"))
          .localCheckpoint()
      }
      st.select(col("node"), col("anc").as("root"), col("d").as("depth"))
        .orderBy("node")
    }
  )
}
