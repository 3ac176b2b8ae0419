package graft.transform

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._

/** The predictions-layer models: latest-score dedup with tiebreaks,
  * freshness flags, latest-version embedding filter.
  */
class PredictionsModelsSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("bgg_predictions: dedup to latest (score_ts, job_id), freshness flags") {
    import TestSpark.spark.implicits._
    val landing = Seq(
      (1L, "j1", 0.5, ts("2026-01-01 00:00:00")),
      (1L, "j3", 0.7, ts("2026-01-05 00:00:00")), // latest for game 1
      (1L, "j2", 0.6, ts("2026-01-05 00:00:00")), // same ts, lower job
      (2L, "j1", 0.9, ts("2026-02-27 00:00:00"))
    ).toDF("game_id", "job_id", "predicted_rating", "score_ts")
    val first = Models.gameFirstPrediction(landing)
    val out = Models.bggPredictions(landing, first,
      java.sql.Date.valueOf("2026-02-28")).orderBy("game_id").collect()

    assert(out.length == 2)
    assert(out(0).getAs[String]("job_id") == "j3")
    assert(out(0).getAs[Double]("predicted_rating") == 0.7)
    // game 1 first seen 2026-01-01 -> not new; game 2 first seen 02-27 -> new
    assert(!out(0).getAs[Boolean]("is_new_7d"))
    assert(out(1).getAs[Boolean]("is_new_1d") && out(1).getAs[Boolean]("is_new_7d"))
  }

  test("bgg_game_embeddings: latest version only, then latest per game") {
    import TestSpark.spark.implicits._
    val landing = Seq(
      (1L, Seq(0.1, 0.2), 1, "a", ts("2026-01-01 00:00:00")),
      (1L, Seq(0.3, 0.4), 2, "b", ts("2026-01-02 00:00:00")),
      (1L, Seq(0.5, 0.6), 2, "c", ts("2026-01-02 00:00:00")), // v2 tie -> job c
      (2L, Seq(0.7, 0.8), 1, "a", ts("2026-01-03 00:00:00"))  // only v1 -> dropped
    ).toDF("game_id", "embedding", "embedding_version", "job_id", "created_ts")
    val out = Models.bggGameEmbeddings(landing).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("game_id") == 1L)
    assert(out.head.getAs[String]("job_id") == "c")
  }

  test("bgg_description_embeddings: version filter, watermark strictly exclusive, full-landing version scalar") {
    import TestSpark.spark.implicits._
    val wm = ts("2026-01-03 00:00:00")
    val landing = Seq(
      (1L, Seq(0.5), 2L, ts("2026-01-05 00:00:00"), 6L),   // > wm: kept
      (2L, Seq(0.25), 2L, ts("2026-01-03 00:00:00"), 7L),  // == wm: SKIPPED
      (3L, Seq(0.75), 1L, ts("2026-01-06 00:00:00"), 8L),  // stale version
      (4L, Seq(1.0), 2L, ts("2026-01-01 00:00:00"), 9L)    // < wm: skipped
    ).toDF("game_id", "embedding", "embedding_version", "created_ts", "job_id")
    // the sqlx:30 watermark is created_ts > MAX(stored) — a row
    // stamped exactly AT the watermark is NOT reprocessed (the
    // reference's boundary semantics, mirrored deliberately)
    val inc = Models.bggDescriptionEmbeddings(landing, Some(wm)).collect()
    assert(inc.map(_.getAs[Long]("game_id")).toSet == Set(1L))
    // the version scalar comes from the FULL landing: a watermark
    // pass where only stale-version rows are new yields nothing,
    // it does not fall back to the stale version's rows
    val inc2 = Models.bggDescriptionEmbeddings(
      landing.filter(col("game_id") =!= 1L), Some(wm)).collect()
    assert(inc2.isEmpty)
    // full (no watermark): latest version only, newest row per game
    val full = Models.bggDescriptionEmbeddings(landing).collect()
    assert(full.map(_.getAs[Long]("game_id")).toSet == Set(1L, 2L, 4L))
  }

  test("bgg_game_coordinates: latest version only, then newest per game") {
    import TestSpark.spark.implicits._
    val landing = Seq(
      (1L, 0.125, 0.25, 1.5, -0.5, "m1", 1L, ts("2026-01-01 00:00:00")),
      (1L, 0.25, 0.75, 1.25, -0.25, "m2", 2L, ts("2026-01-02 00:00:00")),
      (1L, 0.5, 0.625, 1.0, -1.0, "m2", 2L, ts("2026-01-04 00:00:00")),
      (3L, 0.375, 0.875, 0.5, 0.75, "m1", 1L, ts("2026-01-05 00:00:00"))
    ).toDF("game_id", "umap_1", "umap_2", "pca_1", "pca_2",
      "embedding_model", "embedding_version", "created_ts")
    // game 3 exists only at the stale version -> dropped entirely;
    // game 1 keeps its NEWEST v2 row (created_ts dedup)
    val out = Models.bggGameCoordinates(landing).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("game_id") == 1L)
    assert(out.head.getAs[Double]("umap_1") == 0.5)
    assert(out.head.getAs[String]("embedding_model") == "m2")
    assert(out.head.getAs[Long]("embedding_version") == 2L)
  }
}
