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
  *   - `meanUpdate` (PRODUCTION): one sum column per dimension + a
  *     count in a single groupBy(cid) — plain combinable partials, so
  *     the shuffle after map-side combine is k rows of dims+1 doubles
  *     per task regardless of input size, and the input rows are never
  *     exploded by the dimensionality. Float sums are order-dependent
  *     in the low bits, which k-means itself never needs (the means
  *     only feed the next argmin).
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

  /** The fixed pick schedule of the farthest-point init: pass j adds
    * min(|chosen|, k - |chosen|) points, so the chosen set doubles
    * until it reaches k — ⌈log₂ k⌉ passes instead of k-1 (3 passes
    * for k=8). Shared by the Spark init and the oracle CTE generator.
    */
  def initSchedule(k: Int): Seq[Int] = {
    var s = 1
    val b = Seq.newBuilder[Int]
    while (s < k) { val m = math.min(s, k - s); b += m; s += m }
    b.result()
  }

  /** Deterministic k-means||-style seeding as a FIXED number of
    * assign-like passes (batched farthest-point traversal): start from
    * the smallest vec_id, then each pass adds the [[initSchedule]]
    * batch of points with the LARGEST min-distance² to the chosen set
    * (ties to the smaller vec_id — a duplicate of a chosen point can
    * be re-chosen only when every remaining min-distance is 0, in
    * which case the twin empties out in the first mean update). This
    * is the derandomized form of k-means++/|| — top-m argmax instead
    * of d²-weighted oversampling — so it keeps cross-engine
    * determinism while seeding from the data's extremes instead of
    * its id order (min-id init collapses all seeds into whatever
    * region the low ids happen to occupy, and Lloyd from such a seed
    * wastes its rounds migrating centroids out).
    *
    * Single-group convenience wrapper over [[initFarthestMulti]].
    */
  def initFarthest(e: DataFrame, k: Int): DataFrame =
    initFarthestMulti(e.withColumn("grp", lit(0)), k).drop("grp")

  /** Grouped farthest-point seeding over `(grp, vec_id, v)`: every
    * group advances one [[initSchedule]] batch per PASS, so seeding G
    * independent trainings (the PQ subquantizers) costs the same
    * ⌈log₂ k⌉ jobs as seeding one — G scans become one scan.
    *
    * Scale shape: each pass is ONE broadcast of the ≤ G·k chosen rows
    * over the vector scan + a map-side-combinable min per (grp,
    * vec_id) + a per-group top-m rank; no driver loop inspects data
    * values. The rank window sorts candidates within each group —
    * exact farthest-point; a production trade at extreme scale is
    * d²-weighted SAMPLING per pass (true k-means||), which drops the
    * sort at the cost of determinism.
    */
  def initFarthestMulti(e: DataFrame, k: Int): DataFrame = {
    import graft.functions.XSql
    import org.apache.spark.sql.expressions.Window
    val seed = e.groupBy("grp").agg(min(col("vec_id")).as("vec_id"))
    var chosen = e.join(broadcast(seed), Seq("grp", "vec_id"))
      .select(col("grp"), col("vec_id").as("cid"), col("v").as("cv"))
      .localCheckpoint(true)
    initSchedule(k).foreach { m =>
      val mind = e.join(broadcast(chosen), "grp")
        .withColumn("d2", expr(XSql.dist2("v", "cv")(SqlSpark)))
        .groupBy("grp", "vec_id").agg(min(col("d2")).as("mind2"))
      val w = Window.partitionBy("grp").orderBy(col("mind2").desc, col("vec_id"))
      val picks = mind.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= m).select("grp", "vec_id")
      val far = e.join(broadcast(picks), Seq("grp", "vec_id"))
        .select(col("grp"), col("vec_id").as("cid"), col("v").as("cv"))
      // ≤ G·k rows: eager checkpoint keeps each pass's plan flat
      chosen = chosen.unionByName(far).localCheckpoint(true)
    }
    chosen
  }

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

  /** Production mean update: one `sum(v[i])` column per dimension +
    * one count, all in a single groupBy(cid) — map-side combinable
    * partials, so the shuffle carries k rows of dims+1 doubles, and
    * the input is never exploded to rows × dims (the flat/posexplode
    * shape multiplies shuffle volume by the dimensionality; at 100 TB
    * that factor is the difference between a partial-agg and a second
    * dataset). `dims` is the fixed vector width — a schema-level
    * constant at every call site, never inferred with a data action.
    */
  def meanUpdate(e: DataFrame, a: DataFrame, dims: Int): DataFrame = {
    val sums = (0 until dims).map(i => sum(col("v")(i)).as(s"s_$i"))
    e.join(a, "vec_id").groupBy("cid")
      .agg(count(lit(1)).cast("double").as("n_"), sums: _*)
      .select(col("cid"),
        array((0 until dims).map(i => col(s"s_$i") / col("n_")): _*).as("cv"))
  }

  /** Gate-parity mean update: sorted left-fold per (cid, dim), bit-
    * identical to the DuckDB oracle's list_sort + list_reduce.
    */
  def meanUpdateSorted(e: DataFrame, a: DataFrame): DataFrame =
    regroup(flat(e, a).groupBy("cid", "i")
      .agg((expr(SqlSpark.foldD(SqlSpark.arrSort("collect_list(val)"),
        "a_", "x_", "a_ + x_")) / count(lit(1)).cast("double")).as("m")))

  /** Centroids after `rounds` Lloyd updates from the deterministic
    * [[initFarthest]] seeding. `gateParity = true` uses the sorted-
    * fold mean (oracle bit-parity; spec use only); false runs through
    * the grouped trainer with a single group — the production path.
    */
  def train(e: DataFrame, k: Int, rounds: Int, dims: Int,
      gateParity: Boolean = false): DataFrame =
    if (!gateParity) trainMulti(e.withColumn("grp", lit(0)), k, rounds, dims).drop("grp")
    else {
      var cents = initFarthest(e, k)
      (1 to rounds).foreach { _ =>
        val a = assign(e, cents)
        // k rows: eager checkpoint keeps the next round's plan flat
        // and costs one tiny job per round
        cents = meanUpdateSorted(e, a).localCheckpoint(true)
      }
      cents
    }

  // --------------------------------------------- grouped (multi) form
  //
  // The PQ tiers train G independent subquantizers over slices of the
  // same rows. Running them as G separate trainers costs G× the jobs
  // (each init pass / Lloyd round is its own tiny job — pure scheduler
  // overhead at test scale, G redundant scans at 100 TB). The grouped
  // form keys everything by `grp` and advances ALL trainings in each
  // single job: one scan seeds, assigns, and re-means every
  // subquantizer at once.

  /** Nearest centroid per (grp, vec_id) — [[assign]] keyed by group;
    * centroids (G·k rows) ride one broadcast.
    */
  def assignMulti(e: DataFrame, cents: DataFrame): DataFrame = {
    import graft.functions.XSql
    e.join(broadcast(cents), "grp")
      .withColumn("d2", expr(XSql.dist2("v", "cv")(SqlSpark)))
      .groupBy("grp", "vec_id").agg(min(struct(col("d2"), col("cid"))).as("m"))
      .select(col("grp"), col("vec_id"), col("m.cid").as("cid"))
  }

  /** [[meanUpdate]] keyed by group: one groupBy(grp, cid) with a sum
    * column per dimension — the shuffle carries G·k rows.
    */
  def meanUpdateMulti(e: DataFrame, a: DataFrame, dims: Int): DataFrame = {
    val sums = (0 until dims).map(i => sum(col("v")(i)).as(s"s_$i"))
    e.join(a, Seq("grp", "vec_id")).groupBy("grp", "cid")
      .agg(count(lit(1)).cast("double").as("n_"), sums: _*)
      .select(col("grp"), col("cid"),
        array((0 until dims).map(i => col(s"s_$i") / col("n_")): _*).as("cv"))
  }

  /** G independent k-means trainings in one scan per pass: input
    * `(grp, vec_id, v)`, output `(grp, cid, cv)`. Production mean
    * only (the gate-parity fold exists solely for k9's single
    * trainer).
    */
  def trainMulti(e: DataFrame, k: Int, rounds: Int, dims: Int): DataFrame = {
    var cents = initFarthestMulti(e, k)
    (1 to rounds).foreach { _ =>
      val a = assignMulti(e, cents)
      // G·k rows: eager checkpoint keeps the next round's plan flat
      cents = meanUpdateMulti(e, a, dims).localCheckpoint(true)
    }
    cents
  }
}
