package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental view maintenance for distributive aggregates — the
  * consumer side of [[TableStore.changesBetween]]'s changelog: a
  * materialized `GROUP BY keys → (count, decimal sums)` view is
  * brought from version N to N+1 by folding in the change rows, never
  * re-reading the base table. This is THE reason a warehouse keeps a
  * changelog at all: refreshing a derived table costs O(changes ∪
  * touched groups), not O(base), which at 100 TB is the difference
  * between a minutes-long merge and a full recompute.
  *
  * Mechanics: every change row carries a sign (+1 for
  * insert/update_postimage, -1 for delete/update_preimage), so a
  * group-moving update is nothing special — its preimage decrements
  * the old group while its postimage increments the new one. The
  * signed deltas collapse in ONE map-side-combinable aggregate keyed
  * by the view key, then merge into the view with a single key join;
  * groups whose count reaches zero vanish, groups first seen in the
  * delta appear. Count and decimal SUM are fully distributive —
  * exactly invertible under deletion — which is why the view schema
  * here is restricted to them (MIN/MAX are not invertible: a deleted
  * extremum forces a per-group rescan, the documented reason
  * production IVM engines track "maintainable" aggregates).
  *
  * Determinism: sums stay decimal-exact end to end (the same dsum
  * discipline as the query catalog), so maintained-vs-recomputed is
  * bit-equal, not approximately equal.
  */
object Ivm {

  /** Fold a changelog into a materialized aggregate view.
    *
    * @param view    materialized `keys ++ (n, sum_<c>...)` frame with
    *                `n: long` and decimal `sum_<c>` per `sumCols` entry
    *                (the shape [[aggregate]] produces)
    * @param changes [[TableStore.changesBetween]] output whose row
    *                columns include `keys` and `sumCols`
    */
  def applyDelta(view: DataFrame, changes: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame = {
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val delta = changes
      .withColumn("_sign", sign)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_sign")).as("_dn"),
        sumCols.map(c => sum(col(c).cast(DecimalType(30, 2)) * col("_sign"))
          .as(s"_dsum_$c")): _*)
    // one key join: untouched groups pass through, touched groups
    // adjust, emptied groups drop, new groups materialize
    view.join(delta, keys, "full_outer")
      .select(keys.map(col) ++
        Seq((coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L)))
          .as("n")) ++
        sumCols.map(c =>
          (coalesce(col(s"sum_$c"), lit(0).cast(DecimalType(30, 2))) +
            coalesce(col(s"_dsum_$c"), lit(0).cast(DecimalType(30, 2))))
            .cast(DecimalType(30, 2)).as(s"sum_$c")): _*)
      .filter(col("n") > 0)
  }

  /** The view shape [[applyDelta]] maintains, computed from scratch
    * (used to materialize v0 and, in specs, to prove maintained ==
    * recomputed).
    */
  def aggregate(base: DataFrame, keys: Seq[String],
      sumCols: Seq[String]): DataFrame =
    base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sumCols.map(c => sum(col(c).cast(DecimalType(30, 2)))
          .cast(DecimalType(30, 2)).as(s"sum_$c")): _*)
}
