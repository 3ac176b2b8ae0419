package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation — the step a
  * production dedup pipeline needs AFTER pair discovery: near-dup
  * pairs (LSH-verified) form an undirected graph, and the keep/drop
  * policy operates on whole components ("keep the smallest doc_id of
  * each cluster"), not on individual pairs (pairwise greedy drops
  * break on chains A~B~C).
  *
  * Algorithm: every node starts labeled with its own id; each round
  * takes the min of its label and its neighbors' labels; fixpoint =
  * every node holds the smallest id reachable from it. The fixpoint is
  * a pure graph property, so the result is deterministic regardless of
  * execution/iteration order — which is what lets a DuckDB recursive
  * CTE state the same answer for the oracle.
  *
  * Scale shape: each round is one equi-join + one map-side-combinable
  * min-aggregate, O(diameter) rounds. Near-dup graphs are
  * short-diameter (clusters of copies), so 2-4 rounds in practice; if
  * an adversarial long-chain graph (crawl data is full of near-dup
  * chains) exhausts `maxIter`, the operator hands the edge set to the
  * alternating large-star/small-star contraction (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14 — same
  * join+min primitives, O(log² n) rounds) instead of failing.
  *
  * Storage discipline per round: every round's table is an eager
  * `localCheckpoint` — the same materialization the convergence probe
  * forces anyway, but the lineage is CUT, so round k+1 plans against a
  * constant-size plan (cached plans still nest the full history
  * through InMemoryRelation and cold planning cost grows with rounds).
  * `Dataset.unpersist` cannot free a checkpoint's blocks, so the
  * superseded round is freed DETERMINISTICALLY by unpersisting the
  * materialized RDD inside its `LogicalRDD` leaf ([[freeCheckpoint]])
  * — peak storage stays at two single-row-per-node tables no matter
  * how many rounds run.
  */
object ConnectedComponents {

  /** Deterministically release a `localCheckpoint`ed dataset's blocks:
    * the checkpointed plan is a [[LogicalRDD]] leaf holding the
    * materialized RDD — unpersist that RDD (Dataset.unpersist only
    * reaches CacheManager entries; checkpoint blocks otherwise wait
    * for the context cleaner to notice the RDD is unreachable).
    */
  private[operators] def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => df.unpersist()
    }

  /** edges: two long columns `a`, `b` (undirected, any orientation).
    * Returns (node, component) for every endpoint, component = min
    * reachable node id.
    */
  def minLabel(edges: DataFrame, a: String = "a", b: String = "b",
      maxIter: Int = 50): DataFrame = {
    // partitioned ONCE by the per-round join key: the cached
    // partitioning is reused every iteration, so only the label table
    // moves through each round's shuffle — at scale this halves the
    // per-round network cost
    val sym = edges.select(col(a).as("src"), col(b).as("dst"))
      .unionByName(edges.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .repartition(col("dst"))
      .cache()
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("component", col("node"))
      .cache()
    // empty edge set → empty components (the sum-probe below would
    // read sum(∅) = NULL and throw instead)
    if (labels.isEmpty) { sym.unpersist(); return labels }
    var it = 0
    var converged = false
    // labels only ever DECREASE, so Σ(component) is strictly monotone
    // down until the fixpoint: an unchanged sum == converged. The probe
    // is a tiny map-side-combinable aggregate (exact decimal — ids sum
    // past a long at 100 TB), replacing a join of two n-row tables per
    // round with an O(1)-output scan of the table we must materialize
    // anyway.
    var prevSum = BigDecimal(-1)
    while (!converged && it < maxIter) {
      // neighbor labels flow one hop; min with own label
      val nbr = sym.join(labels, sym("dst") === labels("node"))
        .select(sym("src").as("node"), col("component"))
      val next = labels.unionByName(nbr)
        .groupBy("node").agg(min("component").as("component"))
        .localCheckpoint()
      val curSum = BigDecimal(
        next.agg(sum(col("component").cast("decimal(38,0)")))
          .head().getDecimal(0))
      if (it == 0) labels.unpersist() else freeCheckpoint(labels)
      labels = next
      converged = curSum == prevSum
      prevSum = curSum
      it += 1
    }
    sym.unpersist()
    if (converged) labels
    else {
      // the iteration cap means the labels have NOT reached the
      // fixpoint — a graph with diameter > maxIter. Contract it with
      // the O(log² n)-round star algorithm instead; the fixpoint is
      // the same pure graph property, so the result is identical.
      val nodes = labels.select("node")
      starContract(
        edges.select(col(a).as("p"), col(b).as("q")), nodes)
    }
  }

  /** INCREMENTAL maintenance of a min-label component fixpoint — the
    * graph twin of the Ivm signed-delta rule: given `baseLabels` (a
    * converged (node, component) table for the old edge set) and a
    * batch of NEW edges, produce the fixpoint of (old ∪ new) while
    * touching only delta-derived state.
    *
    * Correctness rests on contraction: each old component behaves as
    * one super-node (its label), so the merged fixpoint equals the
    * fixpoint of the CONTRACTED delta graph (new edges with endpoints
    * mapped through their base labels; unlabeled endpoints map to
    * themselves) composed back onto the base labels. Labels are min
    * node ids, and each base label IS the min of its part, so the
    * contracted solve yields the true global min per merged cluster.
    *
    * Scale shape: two keyed equi-joins to contract (O(|Δ|) rows probe
    * the label table), a [[minLabel]] solve over O(|Δ|) contracted
    * edges — NEVER the base graph — and one keyed left join to
    * relabel. At a 100 TB corpus with a daily crawl increment this is
    * the difference between relabeling everything and an O(batch)
    * tick, exactly the changelog-consumer contract i3/i4 gate for
    * aggregates and joins. Property-checked against the full
    * recompute in IncrementalComponentsSpec.
    */
  def incrementalMinLabel(baseLabels: DataFrame, deltaEdges: DataFrame,
      a: String = "a", b: String = "b"): DataFrame = {
    val lbl = baseLabels.select(col("node"), col("component"))
    val e0 = deltaEdges.select(col(a).as("ea"), col(b).as("eb"))
    val contracted = e0
      .join(lbl.select(col("node").as("ea"), col("component").as("ca")),
        Seq("ea"), "left")
      .join(lbl.select(col("node").as("eb"), col("component").as("cb")),
        Seq("eb"), "left")
      .select(coalesce(col("ca"), col("ea")).as("p"),
        coalesce(col("cb"), col("eb")).as("q"))
      // an edge inside one existing component contracts to a self-loop
      // and carries no new connectivity
      .filter(col("p") =!= col("q"))
    val remap = minLabel(contracted, "p", "q")
      .select(col("node").as("old_label"), col("component").as("new_label"))
    val oldFinal = lbl
      .join(remap, lbl("component") === remap("old_label"), "left")
      .select(lbl("node"),
        coalesce(remap("new_label"), lbl("component")).as("component"))
    // delta endpoints the base graph never saw (new docs, or old docs
    // with no old-old edge): they entered the contracted solve as raw
    // ids
    val rawNodes = e0.select(col("ea").as("node"))
      .unionByName(e0.select(col("eb").as("node")))
      .distinct()
      .join(lbl.select("node"), Seq("node"), "left_anti")
    val newFinal = rawNodes
      .join(remap, rawNodes("node") === remap("old_label"), "left")
      .select(rawNodes("node"),
        coalesce(remap("new_label"), rawNodes("node")).as("component"))
    oldFinal.unionByName(newFinal)
  }

  /** Alternating large-star/small-star contraction (Kiveris et al.,
    * SoCC'14). Input: raw undirected edges (p, q) in any orientation
    * plus the distinct node set; output: (node, component) with
    * component = min reachable id — the same fixpoint as [[minLabel]].
    *
    *   large-star(u): attach every neighbor v > u to m(u) = min(N(u)∪u)
    *   small-star(u): attach u and its neighbors v < u to their min
    *
    * Both emit canonical (larger, smaller) pairs built from one
    * groupBy-min + one equi-join each — the identical shuffle
    * primitives as the propagation rounds, just O(log² n) of them.
    * Convergence: the edge multiset is a fixpoint (checked cheaply by
    * count + exact decimal sums, then confirmed exactly with a
    * set-difference probe before trusting it).
    */
  private[operators] def starContract(rawEdges: DataFrame,
      nodes: DataFrame, maxRounds: Int = 64): DataFrame = {
    def sym(e: DataFrame): DataFrame =
      e.select(col("p").as("u"), col("q").as("v"))
        .unionByName(e.select(col("q").as("u"), col("p").as("v")))
        .distinct()

    def largeStar(adj: DataFrame): DataFrame = {
      val m = adj.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("mn"))
      adj.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("p"), col("mn").as("q"))
        .filter(col("p") =!= col("q")).distinct()
    }

    def smallStar(adj: DataFrame): DataFrame = {
      val smaller = adj.filter(col("v") < col("u"))
      val m = smaller.groupBy("u").agg(min("v").as("mn"))
      val vEdges = smaller.join(m, "u")
        .select(col("v").as("p"), col("mn").as("q"))
      val uEdges = m.select(col("u").as("p"), col("mn").as("q"))
      vEdges.unionByName(uEdges)
        .filter(col("p") =!= col("q")).distinct()
    }

    var e = rawEdges.filter(col("p") =!= col("q"))
      .select(greatest(col("p"), col("q")).as("p"),
        least(col("p"), col("q")).as("q"))
      .distinct().localCheckpoint()
    var round = 0
    var stable = false
    def sig(d: DataFrame): (Long, BigDecimal, BigDecimal) = {
      val r = d.agg(count(lit(1)),
        sum(col("p").cast("decimal(38,0)")),
        sum(col("q").cast("decimal(38,0)"))).head()
      (r.getLong(0),
        Option(r.getDecimal(1)).map(BigDecimal(_)).getOrElse(BigDecimal(0)),
        Option(r.getDecimal(2)).map(BigDecimal(_)).getOrElse(BigDecimal(0)))
    }
    var prev = sig(e)
    while (!stable && round < maxRounds) {
      // same storage discipline as the propagation loop (class doc)
      val next = smallStar(sym(largeStar(sym(e)))).localCheckpoint()
      val cur = sig(next)
      if (cur == prev) {
        // signature fixpoint — confirm exactly before trusting it
        // (one anti-join on a star-shaped edge table, runs once)
        stable = next.exceptAll(e).isEmpty
      }
      freeCheckpoint(e)
      e = next
      prev = cur
      round += 1
    }
    if (!stable)
      throw new IllegalStateException(
        s"star contraction did not converge in $maxRounds rounds")
    // converged edges are stars (node → component min); roots and
    // isolated nodes label themselves
    nodes.join(e.select(col("p").as("node"), col("q").as("parent")),
        Seq("node"), "left")
      .select(col("node"), coalesce(col("parent"), col("node")).as("component"))
  }
}
