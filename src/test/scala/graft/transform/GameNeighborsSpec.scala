package graft.transform

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._

/** game_neighbors semantics: ratings floor, source-relative complexity
  * band, cosine ranking — and the BandJoinRewrite rule turning the
  * naive theta join into a bucketed equi-join on a real model.
  */
class GameNeighborsSpec extends SparkSpec {

  private val now = java.sql.Timestamp.valueOf("2026-03-01 00:00:00")

  private def sim = {
    import TestSpark.spark.implicits._
    // (game_id, name, year, complexity, users_rated, embedding)
    Seq(
      (1L, "A", 2000, 2.0, 500, Seq(1.0f, 0.0f)),
      (2L, "B", 2001, 2.5, 500, Seq(0.9f, 0.1f)),   // in band of A (0.75)
      (3L, "C", 2002, 3.5, 500, Seq(1.0f, 0.05f)),  // out of A's band
      (4L, "D", 2003, 2.2, 50, Seq(1.0f, 0.01f)),   // below ratings floor
      (5L, "E", 2004, 1.8, 500, Seq(0.0f, 1.0f))    // in band, orthogonal
    ).toDF("game_id", "name", "year_published", "complexity", "users_rated", "embedding")
  }

  test("floor + band + cosine ranking produce the expected neighbor lists") {
    val out = Models.gameNeighbors(sim,
      Seq(Models.SimilarityProfile(minUsersRated = 100, complexityBand = 0.75,
        dims = 64, topK = 10)), now)
      .orderBy("game_id").collect()
    // candidates: 1,2,3,5 (4 filtered by floor)
    // A(2.0): band [1.25, 2.75] -> B(2.5), E(1.8); nearest by cosine: B then E
    val a = out.find(_.getAs[Long]("game_id") == 1L).get
    val aSim = a.getSeq[org.apache.spark.sql.Row](a.fieldIndex("similar"))
    assert(aSim.map(_.getAs[Long]("game_id")).toSeq == Seq(2L, 5L))
    assert(aSim.head.getAs[Double]("distance") < 0.01)
    // C(3.5): band [2.75, 4.25] holds no candidates (B at 2.5 is out)
    // -> C has no row at all (inner-join semantics, like the reference)
    assert(!out.exists(_.getAs[Long]("game_id") == 3L))
    // profile metadata carried on the row
    assert(a.getAs[String]("profile") == "default")
    assert(a.getAs[Double]("complexity_band") == 0.75)
  }

  test("dims=64 uses `embedding`; profile metadata columns self-describe") {
    val out = Models.gameNeighbors(sim,
      Seq(Models.SimilarityProfile(name = "tuned", minUsersRated = 0,
        complexityBand = 10.0, topK = 2)), now).collect()
    assert(out.forall(_.getAs[String]("profile") == "tuned"))
    assert(out.forall(r =>
      r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("similar")).length <= 2))
  }

  test("BandJoinRewrite turns the model's theta join into an equi-join") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.BandJoinRewrite
    try {
      val df = Models.gameNeighbors(sim, Seq(Models.SimilarityProfile(
        minUsersRated = 100)), now)
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("Generate explode"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      // identical results through the rewritten plan
      val rewritten = df.orderBy("game_id").collect().map(_.toString).toSeq
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.BandJoinRewrite)
      val naive = Models.gameNeighbors(sim, Seq(Models.SimilarityProfile(
        minUsersRated = 100)), now).orderBy("game_id").collect().map(_.toString).toSeq
      assert(rewritten == naive)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.BandJoinRewrite)
    }
  }
}
