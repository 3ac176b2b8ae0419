package graft.parse

import graft.{SparkSpec, TestSpark}

/** Flatten + validation behavior (processor.py:400-710), including the
  * inbound-implementation exclusion and PK-duplicate detection.
  */
class FlattenSpec extends SparkSpec {

  private val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  private val monopolyJson =
    """{"items": {"item": {
      |  "@id": "1406", "@type": "boardgame",
      |  "name": [{"@type": "primary", "@value": "Monopoly"}],
      |  "link": [
      |    {"@type": "boardgameimplementation", "@id": "41186", "@value": "Monopoly City"},
      |    {"@type": "boardgameimplementation", "@id": "29316",
      |     "@value": "The Landlord's Game", "@inbound": "true"}],
      |  "statistics": {"ratings": {
      |    "average": {"@value": "4.4"}, "usersrated": {"@value": "1000"}}}
      |}}}""".stripMargin

  private def tables = {
    import TestSpark.spark.implicits._
    val g = BggParser.processGame(1406L, monopolyJson, "boardgame", ts).get
    Flatten.toTables(TestSpark.spark.createDataset(Seq(g)))
  }

  test("inbound implementations excluded from bridge, kept in dim") {
    val t = tables
    val bridge = t("game_implementations").collect()
    assert(bridge.length == 1)
    assert(bridge.head.getLong(0) == 1406L)
    assert(bridge.head.getLong(1) == 41186L)
    // dim keeps both directions
    assert(t("implementations").count() == 2)
  }

  test("games table has one row with the stat columns populated") {
    val g = tables("games").collect()
    assert(g.length == 1)
    val row = g.head
    assert(row.getAs[String]("primary_name") == "Monopoly")
    assert(row.getAs[Double]("average_rating") == 4.4)
    assert(row.getAs[Long]("users_rated") == 1000L)
  }

  test("all 22 tables are present") {
    assert(tables.size == 22)
  }

  test("validate: required columns, PK dups, all-null column") {
    import TestSpark.spark.implicits._
    val good = Seq((1L, "boardgame", "Game 1", ts), (2L, "boardgame", "Game 2", ts))
      .toDF("game_id", "type", "primary_name", "load_timestamp")
    assert(Flatten.validate(good, "games"))

    val missing = Seq((1L, "boardgame")).toDF("game_id", "type")
    assert(!Flatten.validate(missing, "games"))

    val dup = Seq((1L, "boardgame", "Game 1", ts), (1L, "boardgame", "Game 1", ts))
      .toDF("game_id", "type", "primary_name", "load_timestamp")
    assert(!Flatten.validate(dup, "games"))

    val allNull = Seq((1L, "boardgame", null.asInstanceOf[String], ts),
      (2L, "boardgame", null.asInstanceOf[String], ts))
      .toDF("game_id", "type", "primary_name", "load_timestamp")
    assert(!Flatten.validate(allNull, "games"))
  }
}
