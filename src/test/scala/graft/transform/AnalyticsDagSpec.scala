package graft.transform

import graft.{SparkSpec, TestSpark}
import graft.operators.TransformDag
import graft.operators.TransformDag.Node
import graft.parse.{BggParser, Flatten}
import org.apache.spark.sql.functions._

/** The full analytics layer wired as one TransformDag over parsed
  * fixtures — mirrors docs/lineage.md: core tables → games_active →
  * games_features → filters / dropdown / pcr / best_player_counts /
  * features_hash / game_profile.
  */
class AnalyticsDagSpec extends SparkSpec {

  private val ts1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private val now = java.sql.Timestamp.valueOf("2026-03-01 00:00:00")

  private def fullGame(id: Long, name: String, rated: Int, bayes: Double) =
    s"""{"items": {"item": {
       |  "@id": "$id", "@type": "boardgame",
       |  "name": {"@type": "primary", "@value": "$name"},
       |  "yearpublished": {"@value": "2001"},
       |  "minplayers": {"@value": "2"}, "maxplayers": {"@value": "5"},
       |  "description": "A game about $name",
       |  "link": [
       |    {"@type": "boardgamecategory", "@id": "10", "@value": "Strategy"},
       |    {"@type": "boardgamecategory", "@id": "11", "@value": "Economic"},
       |    {"@type": "boardgamemechanic", "@id": "20", "@value": "Drafting"},
       |    {"@type": "boardgamedesigner", "@id": "30", "@value": "Alice"},
       |    {"@type": "boardgamepublisher", "@id": "40", "@value": "PubCo"},
       |    {"@type": "boardgameartist", "@id": "50", "@value": "Bob"},
       |    {"@type": "boardgamefamily", "@id": "60", "@value": "Fam"}],
       |  "poll": {"@name": "suggested_numplayers", "results": [
       |    {"@numplayers": "3", "result": [
       |      {"@value": "Best", "@numvotes": "30"},
       |      {"@value": "Recommended", "@numvotes": "10"},
       |      {"@value": "Not Recommended", "@numvotes": "2"}]}]},
       |  "statistics": {"ratings": {
       |    "usersrated": {"@value": "$rated"},
       |    "average": {"@value": "7.2"},
       |    "bayesaverage": {"@value": "$bayes"},
       |    "averageweight": {"@value": "2.8"}}}
       |}}}""".stripMargin

  private lazy val out: Map[String, org.apache.spark.sql.DataFrame] = {
    import TestSpark.spark.implicits._
    val processed = Seq(
      BggParser.processGame(1L, fullGame(1, "Alpha", 100, 7.1), "boardgame", ts1).get,
      BggParser.processGame(2L, fullGame(2, "Beta", 10, 6.5), "boardgame", ts1).get)
    val core = Flatten.toTables(TestSpark.spark.createDataset(processed))
    def ent(kind: String, idCol: String) =
      (core(s"game_$kind"), core(kind), idCol)
    TransformDag.run(
      Seq(
        Node("games_active", Seq("games"),
          ins => Models.gamesActive(ins("games"), now)),
        Node("games_features", Seq("games_active"), ins =>
          Models.gamesFeatures(ins("games_active"), Map(
            "categories" -> ent("categories", "category_id"),
            "mechanics" -> ent("mechanics", "mechanic_id"),
            "publishers" -> ent("publishers", "publisher_id"),
            "designers" -> ent("designers", "designer_id"),
            "artists" -> ent("artists", "artist_id"),
            "families" -> ent("families", "family_id")), now)),
        Node("player_count_recommendations", Seq("games_active"),
          ins => Models.playerCountRecommendations(ins("games_active"),
            core("player_counts"))),
        Node("filter_categories", Seq("games_active"),
          ins => Models.filterEntities(core("categories"), core("game_categories"),
            ins("games_active"), "category_id", 500)),
        Node("filter_options_combined", Seq("filter_categories"),
          ins => Models.filterOptionsCombined(Seq(
            ("category", "category_id", ins("filter_categories"))))),
        Node("game_dropdown_options", Seq("games_active"),
          ins => Models.gameDropdownOptions(ins("games_active"))),
        Node("game_features_hash", Seq("games_features"),
          ins => Models.gameFeaturesHash(ins("games_features"), None, now)),
        Node("best_player_counts", Seq("games_active"),
          ins => Models.bestPlayerCounts(ins("games_active"),
            core("player_counts"), now)),
        Node("game_profile", Seq("games_features", "player_count_recommendations"),
          ins => Models.gameProfile(ins("games_features"),
            ins("player_count_recommendations"),
            Seq((1L, 1L, ts1, 7.25)).toDF(
              "job_id", "game_id", "score_ts", "predicted_rating"),
            Seq((1L, 0.25, 0.75, 1.5, -0.5, "umap-m2", 2L, ts1)).toDF(
              "game_id", "umap_1", "umap_2", "pca_1", "pca_2",
              "embedding_model", "embedding_version", "created_ts"),
            Seq((1L, ts1, true)).toDF("game_id", "fetch_timestamp", "success")))),
      sources = Map("games" -> core("games")))
  }

  test("games_features: arrays sorted, hurdle flag, log feature") {
    val f = out("games_features").filter(col("game_id") === 1).head()
    assert(f.getAs[scala.collection.Seq[String]]("categories").toSeq == Seq("Economic", "Strategy"))
    assert(f.getAs[scala.collection.Seq[String]]("designers").toSeq == Seq("Alice"))
    assert(f.getAs[Int]("hurdle") == 1)
    assert(out("games_features").filter(col("game_id") === 2).head()
      .getAs[Int]("hurdle") == 0)
    assert(math.abs(f.getAs[Double]("log_users_rated") - math.log(101)) < 1e-12)
  }

  test("filter tables + combined + dropdown shapes") {
    val fc = out("filter_categories").collect()
    assert(fc.length == 2 && fc.forall(_.getAs[Long]("game_count") == 2L))
    val combined = out("filter_options_combined").collect()
    assert(combined.forall(_.getString(0) == "category"))
    val dd = out("game_dropdown_options").collect()
    assert(dd.map(_.getLong(0)).toSeq == Seq(1L, 2L)) // by bayes desc
  }

  test("features hash: new rows stamped now; unchanged rows keep old ts") {
    val h1 = out("game_features_hash")
    assert(h1.collect().forall(_.getAs[java.sql.Timestamp]("last_updated") == now))
    // second run against the first: nothing changed -> timestamps kept
    val later = java.sql.Timestamp.valueOf("2026-04-01 00:00:00")
    val old = h1.select(col("game_id"), col("feature_hash").as("o_hash"),
      col("last_updated").as("o_last_updated"))
    val h2 = Models.gameFeaturesHash(out("games_features"), Some(old), later)
    assert(h2.collect().forall(_.getAs[java.sql.Timestamp]("last_updated") == now))
  }

  test("game_profile: nested player counts + null-guarded struct blocks") {
    val p1 = out("game_profile").filter(col("game_id") === 1).head()
    val pcs = p1.getSeq[org.apache.spark.sql.Row](p1.fieldIndex("player_counts"))
    assert(pcs.length == 1 && pcs.head.getAs[String]("player_count") == "3")
    assert(pcs.head.getAs[Double]("best_percentage") == 71.43)
    assert(p1.getAs[org.apache.spark.sql.Row]("provenance") != null)
    // predictions is the WHOLE landing row as a struct; embedding is
    // the six-field coordinates struct (game_profile.sqlx:99-108)
    val pred = p1.getAs[org.apache.spark.sql.Row]("predictions")
    assert(pred != null && pred.getAs[Double]("predicted_rating") == 7.25)
    val emb = p1.getAs[org.apache.spark.sql.Row]("embedding")
    assert(emb != null && emb.getAs[Double]("umap_1") == 0.25 &&
      emb.getAs[String]("embedding_model") == "umap-m2")
    // a game absent from all three single-row blocks: every struct NULL
    val p2 = out("game_profile").filter(col("game_id") === 2).head()
    assert(p2.getAs[org.apache.spark.sql.Row]("provenance") == null)
    assert(p2.getAs[org.apache.spark.sql.Row]("predictions") == null)
    assert(p2.getAs[org.apache.spark.sql.Row]("embedding") == null)
  }
}
