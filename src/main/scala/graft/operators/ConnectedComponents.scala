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
  * short-diameter (clusters of copies), so 2-4 rounds in practice; a
  * 100 TB run with adversarial long chains would switch to
  * large-star/small-star (same join primitives, O(log n) rounds).
  * Labels are cached per round and the previous round is unpersisted —
  * peak state is two label tables of one row per node.
  */
object ConnectedComponents {

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
        .cache()
      val curSum = BigDecimal(
        next.agg(sum(col("component").cast("decimal(38,0)")))
          .head().getDecimal(0))
      labels.unpersist()
      labels = next
      converged = curSum == prevSum
      prevSum = curSum
      it += 1
    }
    sym.unpersist()
    // exiting via the iteration cap means the labels have NOT reached
    // the fixpoint — returning them would be silently wrong clusters.
    // Real graphs with diameter > maxIter need the large-star/small-star
    // variant (class doc); fail loudly rather than mislabel.
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds " +
          "(graph diameter too large for min-label propagation)")
    labels
  }
}
