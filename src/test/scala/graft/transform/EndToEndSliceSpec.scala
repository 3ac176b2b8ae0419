package graft.transform

import graft.{SparkSpec, TestSpark}
import graft.operators.TransformDag
import graft.operators.TransformDag.Node
import graft.parse.{BggParser, Flatten}
import org.apache.spark.sql.functions._

/** SURVEY §7.2 — the minimum end-to-end slice, golden-checked:
  * fixture payload → parser → core tables → games_active →
  * best_player_counts → point lookup. Exercises the parser, two write
  * shapes, dedup-to-latest, window ranking, conditional string/array
  * aggregation and a serving read in one path.
  */
class EndToEndSliceSpec extends SparkSpec {

  private val ts1 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private val ts2 = java.sql.Timestamp.valueOf("2026-02-01 00:00:00")
  private val now = java.sql.Timestamp.valueOf("2026-03-01 00:00:00")

  private def catan(avg: String) =
    s"""{"items": {"item": {
       |  "@id": "13", "@type": "boardgame",
       |  "name": {"@type": "primary", "@value": "Catan"},
       |  "yearpublished": {"@value": "1995"},
       |  "minplayers": {"@value": "3"}, "maxplayers": {"@value": "4"},
       |  "poll": {"@name": "suggested_numplayers", "results": [
       |    {"@numplayers": "1", "result": [
       |      {"@value": "Best", "@numvotes": "1"},
       |      {"@value": "Recommended", "@numvotes": "1"},
       |      {"@value": "Not Recommended", "@numvotes": "1"}]},
       |    {"@numplayers": "2", "result": [
       |      {"@value": "Best", "@numvotes": "10"},
       |      {"@value": "Recommended", "@numvotes": "5"},
       |      {"@value": "Not Recommended", "@numvotes": "2"}]},
       |    {"@numplayers": "3", "result": [
       |      {"@value": "Best", "@numvotes": "20"},
       |      {"@value": "Recommended", "@numvotes": "10"},
       |      {"@value": "Not Recommended", "@numvotes": "0"}]},
       |    {"@numplayers": "4", "result": [
       |      {"@value": "Best", "@numvotes": "30"},
       |      {"@value": "Recommended", "@numvotes": "5"},
       |      {"@value": "Not Recommended", "@numvotes": "1"}]},
       |    {"@numplayers": "5", "result": [
       |      {"@value": "Best", "@numvotes": "1"},
       |      {"@value": "Recommended", "@numvotes": "2"},
       |      {"@value": "Not Recommended", "@numvotes": "10"}]},
       |    {"@numplayers": "4+", "result": [
       |      {"@value": "Best", "@numvotes": "4"},
       |      {"@value": "Recommended", "@numvotes": "4"},
       |      {"@value": "Not Recommended", "@numvotes": "4"}]}]},
       |  "statistics": {"ratings": {"average": {"@value": "$avg"},
       |    "usersrated": {"@value": "1000"}}}
       |}}}""".stripMargin

  private val quietGame =
    """{"items": {"item": {
      |  "@id": "99", "@type": "boardgame",
      |  "name": {"@type": "primary", "@value": "Quiet"},
      |  "minplayers": {"@value": "1"}, "maxplayers": {"@value": "2"}
      |}}}""".stripMargin

  test("fixture -> parser -> core -> games_active -> best_player_counts -> lookup") {
    import TestSpark.spark.implicits._
    // two loads of Catan (the second is current) + a game with no polls
    val processed = Seq(
      BggParser.processGame(13L, catan("7.0"), "boardgame", ts1).get,
      BggParser.processGame(13L, catan("7.5"), "boardgame", ts2).get,
      BggParser.processGame(99L, quietGame, "boardgame", ts2).get)
    val core = Flatten.toTables(TestSpark.spark.createDataset(processed))

    val out = TransformDag.run(
      Seq(
        Node("games_active", Seq("games"),
          ins => Models.gamesActive(ins("games"), now)),
        Node("best_player_counts", Seq("games_active", "player_counts"),
          ins => Models.bestPlayerCounts(ins("games_active"), ins("player_counts"), now))),
      sources = Map("games" -> core("games"),
        "player_counts" -> core("player_counts").dropDuplicates()))

    // dedup-to-latest picked the second load
    val active = out("games_active")
    assert(active.count() == 2)
    val catanActive = active.filter(col("game_id") === 13).head()
    assert(catanActive.getAs[Double]("average_rating") == 7.5)
    assert(catanActive.getAs[java.sql.Timestamp]("load_timestamp") == ts2)

    // golden row (hand-computed from the vote fixture):
    //  pc totals: 1->3 (dropped, <=5), 2->17, 3->30, 4->36, 5->13, 4+->12
    //  '4+' dropped by the IN filter; 5 dropped by the 40/70 thresholds
    //  best%:  2=58.82  3=66.67  4=83.33   -> best order 4,3,2
    //  pos%:   2=88.24  3=100.0  4=97.22   -> recommended order 3,4,2
    val row = out("best_player_counts").filter(col("game_id") === 13).head()
    assert(row.getAs[String]("best_player_counts") == "4, 3, 2")
    assert(row.getAs[String]("recommended_player_counts") == "3, 4, 2")
    assert(row.getAs[Long]("min_best_player_count") == 2L)
    assert(row.getAs[Long]("max_best_player_count") == 4L)
    assert(row.getAs[Long]("min_recommended_player_count") == 2L)
    assert(row.getAs[Long]("max_recommended_player_count") == 4L)
    assert(row.getAs[Boolean]("has_best_count"))
    assert(row.getAs[Boolean]("has_recommended_count"))

    // point lookup (S4) for the poll-less game: null CSVs, false flags
    val quiet = out("best_player_counts").filter(col("game_id") === 99)
      .limit(1).head()
    assert(quiet.getAs[String]("best_player_counts") == null)
    assert(!quiet.getAs[Boolean]("has_best_count"))
  }
}
