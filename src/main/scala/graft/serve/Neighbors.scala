package graft.serve

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Precomputed k-NN table — the `game_neighbors` analogue
  * (definitions/game_neighbors.sqlx, SURVEY §2.3 J5 + §2.5 W2 +
  * §2.4 A6): candidate pairs from a blocking key (label here; a
  * complexity band in the reference), ranked per source by distance,
  * top-k collected into an ordered struct array.
  *
  * Scale shape: the pair join is an equi-join on the blocking key (no
  * theta join), the rank is a bounded window per source key, and the
  * output is one narrow row per source — the serving table stays tiny
  * relative to the input.
  */
object Neighbors {

  def precompute(emb: DataFrame, k: Int): DataFrame = {
    GraftFunctions.register(emb.sparkSession)
    val a = emb.select(col("label"), col("vec_id"), col("v"))
    val b = emb.select(col("label"), col("vec_id").as("n_vec_id"), col("v").as("n_v"))
    val w = Window.partitionBy("vec_id").orderBy(col("dist"), col("n_vec_id"))
    a.join(b, Seq("label"))
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
