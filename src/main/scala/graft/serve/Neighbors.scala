package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, XSql}

/** Precomputed k-NN table — the `game_neighbors` analogue
  * (definitions/game_neighbors.sqlx, SURVEY §2.3 J5 + §2.5 W2 +
  * §2.4 A6): candidate pairs from a blocking key, ranked per source by
  * exact distance, top-k collected into an ordered struct array.
  *
  * Candidate generation is (label, LSH-bucket)-bounded, not
  * label-all-pairs: the reference bounds its candidate set with a
  * complexity band (game_neighbors.sqlx:53-65) for exactly this
  * reason — a popular label at 100 TB is O(block²). Here each vector
  * gets an 8-plane hyperplane signature (the k2 machinery); the
  * neighbor side emits its own bucket plus the 8 hamming-1 flips, and
  * the pair join is an equi-join on (label, bucket). A pair within
  * hamming ≤ 1 matches EXACTLY one probe row (hamming 0 → the identity
  * probe, hamming 1 → the single matching flip), so no dedup pass is
  * needed. The rerank inside the candidate set is exact cosine.
  *
  * Scale shape: candidate blocks shrink from |label| to
  * |label ∩ bucket| (~1/256 of the label, probed 9×), the join stays
  * an equi-join (partition-prunable if bucket is a layout column), the
  * rank is a bounded window per source key, and the output is one
  * narrow row per source.
  *
  * Recall trade (vs the reference's exact-within-band scan): the
  * neighbor lists are ANN, not exact — a true neighbor whose bucket is
  * at hamming ≥ 2 is missed, and a vector whose (label, hamming ≤ 1)
  * neighborhood is empty drops out of the serving table entirely
  * (readers fall back to an empty `similar` list). Widening the probe
  * radius — or an exact per-label fallback for small labels — buys
  * recall back at candidate-set cost.
  */
object Neighbors {

  def precompute(emb: DataFrame, k: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val withBucket = emb.withColumn("bucket", expr("graft_lsh_bucket(v)"))
    val a = withBucket.select(col("label"), col("vec_id"), col("v"), col("bucket"))
    val probes = withBucket.select(col("label"),
      col("vec_id").as("n_vec_id"), col("v").as("n_v"),
      explode(array(col("bucket") +:
        (0 until XSql.LshPlanes).map(p => col("bucket").bitwiseXOR(lit(1L << p))): _*))
        .as("bucket"))
    val w = Window.partitionBy("vec_id").orderBy(col("dist"), col("n_vec_id"))
    a.join(probes, Seq("label", "bucket"))
      .filter(col("n_vec_id") =!= col("vec_id"))
      .withColumn("dist", expr("vector_distance(v, n_v, 'COSINE')"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy("vec_id")
      .agg(expr(
        """transform(
          |  array_sort(collect_list(struct(rn, n_vec_id, dist))),
          |  s_ -> struct(s_.n_vec_id AS vec_id, s_.dist AS dist))""".stripMargin)
        .as("similar"))
  }
}
