package graft.parse

import org.scalatest.funsuite.AnyFunSuite
import BggParser._

/** Ports the reference's parser edge-case suite
  * (tests/test_processor.py) — the highest-value behavioral contract
  * of the ingest layer.
  */
class BggParserSpec extends AnyFunSuite {

  private def node(json: String) = parseJson(json)

  private val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  // ---------------------------------------------------------- safe casts

  test("safeInt: int passthrough keeps sign, negative string clamps to 0") {
    assert(safeInt(node("5")) == 5L)
    assert(safeInt(node("-5")) == -5L)          // int branch: unchanged
    assert(safeInt(node("\"-5\"")) == 0L)       // str branch: clamped
    assert(safeInt(node("\"42\"")) == 42L)
    assert(safeInt(node("\"garbage\"")) == 0L)
    assert(safeInt(node("""{"@value": "7"}""")) == 7L)
    assert(safeInt(node("""{"other": 1}""")) == 0L) // missing @value -> 0
    assert(safeInt(node("[1]")) == 0L)
    assert(safeInt(null) == 0L)
  }

  test("safeFloat: numbers pass through (sign kept), strings parse or 0") {
    assert(safeFloat(node("2.5")) == 2.5)
    assert(safeFloat(node("-2.5")) == -2.5)
    assert(safeFloat(node("\"-2.5\"")) == -2.5) // float branch: NOT clamped
    assert(safeFloat(node("\"x\"")) == 0.0)
    assert(safeFloat(node("""{"@value": "7.5"}""")) == 7.5)
    assert(safeFloat(node("[]")) == 0.0)
  }

  // ---------------------------------------------------------- names (T2)

  test("single primary name dict") {
    val (p, alts) = extractNames(node(
      """{"name": {"@type": "primary", "@value": "Birds and Binoculars", "@sortindex": "1"}}"""))
    assert(p == "Birds and Binoculars")
    assert(alts.isEmpty)
  }

  test("single alternate name dict") {
    val (p, alts) = extractNames(node(
      """{"name": {"@type": "alternate", "@value": "Birds", "@sortindex": "1"}}"""))
    assert(p == "Unknown")
    assert(alts.map(_.name) == Seq("Birds"))
  }

  test("bare string name becomes an alternate") {
    val (p, alts) = extractNames(node("""{"name": "Birds"}"""))
    assert(p == "Unknown")
    assert(alts.map(_.name) == Seq("Birds"))
  }

  test("list of names: primary extracted, others alternates") {
    val (p, alts) = extractNames(node(
      """{"name": [
        |  {"@type": "primary", "@value": "Catan"},
        |  {"@type": "alternate", "@value": "Settlers of Catan"}]}""".stripMargin))
    assert(p == "Catan")
    assert(alts.map(_.name) == Seq("Settlers of Catan"))
  }

  test("missing / non-list name shapes") {
    assert(extractNames(node("{}")) == ("Unknown", Nil))
    assert(extractNames(node("""{"name": 3}""")) == ("Unknown", Nil))
  }

  // ---------------------------------------------------------- year (T3)

  test("year from @value dict") {
    assert(extractYear(node("""{"yearpublished": {"@value": "1995"}}""")).contains(1995))
  }
  test("invalid year -> None") {
    assert(extractYear(node("""{"yearpublished": {"@value": "invalid"}}""")).isEmpty)
  }
  test("zero year -> None") {
    assert(extractYear(node("""{"yearpublished": {"@value": "0"}}""")).isEmpty)
    assert(extractYear(node("""{"yearpublished": "0"}""")).isEmpty)
  }
  test("bare string year") {
    assert(extractYear(node("""{"yearpublished": "1995"}""")).contains(1995))
  }
  test("negative year string -> None (not a digit string)") {
    assert(extractYear(node("""{"yearpublished": "-200"}""")).isEmpty)
  }

  // ---------------------------------------------------------- polls (T5)

  test("suggested_numplayers single result dict") {
    val (players, _, _) = extractPolls(node(
      """{"poll": {"@name": "suggested_numplayers", "results": {
        |  "@numplayers": "2",
        |  "result": [
        |    {"@value": "Best", "@numvotes": "10"},
        |    {"@value": "Recommended", "@numvotes": "5"},
        |    {"@value": "Not Recommended", "@numvotes": "2"}]}}}""".stripMargin))
    assert(players == Seq(PlayerCount("2", 10, 5, 2)))
  }

  test("language_dependence empty results") {
    val (_, langs, _) = extractPolls(node(
      """{"poll": {"@name": "language_dependence", "results": {}}}"""))
    assert(langs.isEmpty)
  }

  test("language_dependence string result is dropped") {
    val (_, langs, _) = extractPolls(node(
      """{"poll": {"@name": "language_dependence", "results": {"result": "No votes"}}}"""))
    assert(langs.isEmpty)
  }

  test("language_dependence single vote dict") {
    val (_, langs, _) = extractPolls(node(
      """{"poll": {"@name": "language_dependence", "results": {"result":
        |  {"@level": "1", "@value": "No necessary in-game text", "@numvotes": "5"}}}}""".stripMargin))
    assert(langs == Seq(LangDep(1, "No necessary in-game text", 5)))
  }

  // ---------------------------------------------------------- stats (T6)

  test("stats from string values") {
    val stats = extractStats(node(
      """{"statistics": {"ratings": {
        |  "usersrated": "100", "average": "7.5", "owned": "50",
        |  "trading": "10", "wanting": "5", "wishing": "15",
        |  "numcomments": "25", "numweights": "20", "averageweight": "2.5"}}}""".stripMargin))
    assert(stats("users_rated") == Left(100L))
    assert(stats("average") == Right(7.5))
    assert(stats("owned") == Left(50L))
    assert(stats("bayes_average") == Right(0.0)) // absent -> 0
  }

  test("ranks from string values; Not Ranked dropped") {
    val ranks = extractRanks(node(
      """{"statistics": {"ratings": {"ranks": {"rank": [
        |  {"@type": "subtype", "@name": "boardgame",
        |   "@friendlyname": "Board Game Rank", "@value": "100", "@bayesaverage": "7.5"},
        |  {"@type": "family", "@name": "x", "@friendlyname": "X", "@value": "Not Ranked"}
        |]}}}}""".stripMargin))
    assert(ranks == Seq(Ranking("subtype", "boardgame", "Board Game Rank", 100, 7.5)))
  }

  test("garbage rank values -> lenient 0") {
    val ranks = extractRanks(node(
      """{"statistics": {"ratings": {"ranks": {"rank":
        |  {"@type": "t", "@name": "n", "@friendlyname": "f",
        |   "@value": "soon", "@bayesaverage": "x"}}}}}""".stripMargin))
    assert(ranks == Seq(Ranking("t", "n", "f", 0, 0.0)))
  }

  // ---------------------------------------------------------- whole game

  private val catanJson =
    """{"items": {"item": {
      |  "@id": "13", "@type": "boardgame",
      |  "name": [
      |    {"@type": "primary", "@value": "Catan"},
      |    {"@type": "alternate", "@value": "Settlers of Catan"}],
      |  "yearpublished": {"@value": "1995"},
      |  "minplayers": {"@value": "3"}, "maxplayers": {"@value": "4"},
      |  "playingtime": {"@value": "120"}, "minage": {"@value": "10"},
      |  "description": "Build, trade, settle!",
      |  "thumbnail": "thumbnail.jpg", "image": "image.jpg",
      |  "link": [
      |    {"@type": "boardgamecategory", "@id": "1026", "@value": "Negotiation"},
      |    {"@type": "boardgamemechanic", "@id": "2072", "@value": "Dice Rolling"},
      |    {"@type": "boardgamefamily", "@id": "3", "@value": "Base Game"}],
      |  "statistics": {"ratings": {
      |    "average": {"@value": "7.5"}, "usersrated": {"@value": "1000"},
      |    "owned": {"@value": "500"}, "averageweight": {"@value": "2.5"}}}
      |}}}""".stripMargin

  test("processGame end-to-end on the Catan fixture") {
    val g = processGame(13L, catanJson, "boardgame", ts).get
    assert(g.primary_name == "Catan")
    assert(g.alternate_names.map(_.name) == Seq("Settlers of Catan"))
    assert(g.year_published.contains(1995))
    assert(g.min_players == 3 && g.max_players == 4)
    assert(g.playing_time == 120 && g.min_age == 10)
    assert(g.users_rated == 1000 && g.average_rating == 7.5)
    assert(g.owned_count == 500 && g.average_weight == 2.5)
    assert(g.categories.map(_.name) == Seq("Negotiation"))
    assert(g.mechanics.map(_.id) == Seq(2072L))
  }

  test("processGame: wrong id / empty items -> None") {
    assert(processGame(14L, catanJson, "boardgame", ts).isEmpty)
    assert(processGame(13L, """{"items": {}}""", "boardgame", ts).isEmpty)
  }

  test("processGame: multi-item response selects the matching id") {
    val multi =
      """{"items": {"item": [
        |  {"@id": "1", "name": {"@type": "primary", "@value": "One"}},
        |  {"@id": "2", "name": {"@type": "primary", "@value": "Two"}}]}}""".stripMargin
    assert(processGame(2L, multi, "boardgame", ts).get.primary_name == "Two")
  }

  test("processGame: scalar where object expected aborts to None") {
    val bad = """{"items": {"item": {"@id": "9", "minplayers": "3"}}}"""
    assert(processGame(9L, bad, "boardgame", ts).isEmpty)
  }

  test("processGame: non-numeric link id aborts to None") {
    val bad =
      """{"items": {"item": {"@id": "9",
        |  "link": {"@type": "boardgamecategory", "@id": "xyz", "@value": "C"}}}}""".stripMargin
    assert(processGame(9L, bad, "boardgame", ts).isEmpty)
  }

  test("inbound implementations flagged") {
    val links = extractLinks(node(
      """{"link": [
        |  {"@type": "boardgameimplementation", "@id": "41186", "@value": "Monopoly City"},
        |  {"@type": "boardgameimplementation", "@id": "29316",
        |   "@value": "The Landlord's Game", "@inbound": "true"}]}""".stripMargin))
    assert(links("implementations").map(e => (e.id, e.inbound)) ==
      Seq((41186L, false), (29316L, true)))
  }
}
