package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.XSql.{Spark => SqlSpark}

/** Distributed Lloyd's k-means over `(vec_id: bigint, v: array<double>)`
  * — the training loop that produces the coarse centroids the IVF tier
  * (k3/k7) probes, factored out of the k9 query so the production and
  * gate-parity paths share every step except the mean.
  *
  * Scale shape (the 100 TB contract):
  *   - `assign`: ONE broadcast of k centroid rows over the vector scan;
  *     the k-way expansion is combined map-side by the partial
  *     min(struct(d2, cid)) before the vec_id shuffle. No driver loop
  *     inspects data; ties break to the smaller cid (bit-pinned fold
  *     distance, same order as the DuckDB oracle's row_number).
  *   - `meanUpdate` (PRODUCTION): per-(cid, dim) sum/count — plain
  *     combinable partials, so the shuffle after map-side combine is at
  *     most k·dims rows per task regardless of input size. Float sums
  *     are order-dependent in the low bits, which k-means itself never
  *     needs (the means only feed the next argmin).
  *   - `meanUpdateSorted` (GATE PARITY): per-(cid, dim) sorted left-fold
  *     — bit-identical to the oracle's list_sort+list_reduce, at the
  *     cost of holding one cluster-dimension's values in a collect_list.
  *     Correctness-gate only; [[KMeansSpec]] proves both paths converge
  *     to the same assignment.
  *   - `train`: FIXED round count; centroids (k rows) are eagerly
  *     localCheckpoint'ed each round so the plan stays round-bounded
  *     instead of doubling (the CC lesson, ConnectedComponents.scala).
  *
  * Reference anchor: the reference trains its embedding/clustering
  * models outside the warehouse (src/warehouse/readers/games.py serves
  * precomputed neighbors); this operator is the in-engine equivalent of
  * that index-build step.
  */
object KMeans {

  /** Deterministic init: the k smallest vec_ids (no RNG — determinism
    * across engines and rounds matters more than seeding quality; a
    * production swap is k-means|| which is also expressible as a fixed
    * number of assign-like passes).
    */
  def init(e: DataFrame, k: Int): DataFrame =
    e.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cid"), col("v").as("cv"))

  /** (vec_id, cid): nearest centroid per vector, broadcast + map-side
    * partial argmin.
    */
  def assign(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .withColumn("d2", expr(graft.functions.XSql.dist2("v", "cv")(SqlSpark)))
      .groupBy("vec_id").agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("vec_id"), col("m.cid").as("cid"))

  private def regroup(dimavg: DataFrame): DataFrame =
    dimavg.groupBy("cid")
      .agg(expr("transform(array_sort(collect_list(struct(i, m))), s_ -> s_.m)")
        .as("cv"))

  private def flat(e: DataFrame, a: DataFrame): DataFrame =
    e.join(a, "vec_id").select(col("cid"), posexplode(col("v")))
      .withColumnsRenamed(Map("pos" -> "i", "col" -> "val"))

  /** Production mean update: plain sum/count per (cid, dim) — map-side
    * combinable, never holds a cluster in memory.
    */
  def meanUpdate(e: DataFrame, a: DataFrame): DataFrame =
    regroup(flat(e, a).groupBy("cid", "i")
      .agg((sum(col("val")) / count(lit(1)).cast("double")).as("m")))

  /** Gate-parity mean update: sorted left-fold per (cid, dim), bit-
    * identical to the DuckDB oracle's list_sort + list_reduce.
    */
  def meanUpdateSorted(e: DataFrame, a: DataFrame): DataFrame =
    regroup(flat(e, a).groupBy("cid", "i")
      .agg((expr(SqlSpark.foldD(SqlSpark.arrSort("collect_list(val)"),
        "a_", "x_", "a_ + x_")) / count(lit(1)).cast("double")).as("m")))

  /** Centroids after `rounds` Lloyd updates from the deterministic
    * init. `gateParity = true` uses the sorted-fold mean (oracle
    * bit-parity); false uses the production sum/count mean.
    */
  def train(e: DataFrame, k: Int, rounds: Int,
      gateParity: Boolean = false): DataFrame = {
    var cents = init(e, k).localCheckpoint(true)
    (1 to rounds).foreach { _ =>
      val a = assign(e, cents)
      val next = if (gateParity) meanUpdateSorted(e, a) else meanUpdate(e, a)
      // k rows: eager checkpoint keeps the next round's plan flat and
      // costs one tiny job per round
      cents = next.localCheckpoint(true)
    }
    cents
  }
}
