package graft.transform

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._

/** The registry/monitoring models: active-model gating with composite
  * keys and the 7-way deployed-models metadata union.
  */
class RegistryModelsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("user_collection_predictions: active gating + composite dedup") {
    import TestSpark.spark.implicits._
    val landing = Seq(
      ("u1", 1L, "own", "v1", 0.8, 1, 0.5, "m", "j1", ts("2026-01-01 00:00:00")),
      ("u1", 1L, "own", "v1", 0.9, 1, 0.5, "m", "j2", ts("2026-01-02 00:00:00")), // latest
      ("u1", 1L, "own", "v9", 0.1, 0, 0.5, "m", "j3", ts("2026-01-03 00:00:00")), // inactive version
      ("u2", 2L, "rate", "v1", 0.7, 1, 0.5, "m", "j1", ts("2026-01-01 00:00:00")) // no active model
    ).toDF("username", "game_id", "outcome", "model_version", "predicted_prob",
      "predicted_label", "threshold", "model_name", "job_id", "score_ts")
    val registry = Seq(
      ("u1", "own", "v1", "active", 2024, ts("2025-12-01 00:00:00")),
      ("u2", "rate", "v1", "retired", 2024, ts("2025-12-01 00:00:00"))
    ).toDF("username", "outcome", "model_version", "status",
      "finalize_through_year", "registered_at")

    val out = Models.userCollectionPredictions(landing, registry).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Double]("predicted_prob") == 0.9)
    assert(out.head.getAs[Int]("finalize_through_year") == 2024)
  }

  test("deployed_models: 5 prediction blocks + 2 embedding blocks union") {
    import TestSpark.spark.implicits._
    val landing = Seq(
      (1L, "hm", "h1", "he", "cm", "c1", "ce", "rm", "r1", "re",
        "um", "u1", "ue", "gm", "g1", "ge", ts("2026-01-05 00:00:00")),
      (2L, "hm", "h1", "he", "cm", "c1", "ce", "rm", "r1", "re",
        "um", "u1", "ue", "gm", "g1", "ge", ts("2026-01-06 00:00:00"))
    ).toDF("game_id",
      "hurdle_model_name", "hurdle_model_version", "hurdle_experiment",
      "complexity_model_name", "complexity_model_version", "complexity_experiment",
      "rating_model_name", "rating_model_version", "rating_experiment",
      "users_rated_model_name", "users_rated_model_version", "users_rated_experiment",
      "geek_rating_model_name", "geek_rating_model_version", "geek_rating_experiment",
      "score_ts")
    val ge = Seq((1L, "emb", 3, "umap", 64, ts("2026-01-07 00:00:00")))
      .toDF("game_id", "embedding_model", "embedding_version", "algorithm",
        "embedding_dim", "created_ts")
    val de = Seq((1L, "temb", 2, "tfidf", 32, "concat", ts("2026-01-08 00:00:00")))
      .toDF("game_id", "embedding_model", "embedding_version", "algorithm",
        "embedding_dim", "document_method", "created_ts")

    val out = Models.deployedModels(landing, ge, de).collect()
    assert(out.length == 7)
    val byType = out.map(r => r.getAs[String]("model_type") -> r).toMap
    assert(byType("hurdle").getAs[Long]("games_count") == 2L)
    assert(byType("hurdle").getAs[String]("algorithm") == null)
    assert(byType("game_embedding").getAs[Long]("embedding_dim") == 64L)
    assert(byType("text_embedding").getAs[String]("document_method") == "concat")
  }

  test("bgg_complexity_predictions dedups to the latest score") {
    import TestSpark.spark.implicits._
    val landing = Seq(
      (1L, "j1", 2.2, ts("2026-01-01 00:00:00")),
      (1L, "j2", 2.4, ts("2026-01-02 00:00:00"))
    ).toDF("game_id", "job_id", "predicted_complexity", "score_ts")
    val out = Models.bggComplexityPredictions(landing).collect()
    assert(out.length == 1 && out.head.getAs[Double]("predicted_complexity") == 2.4)
  }
}
