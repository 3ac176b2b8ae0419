package graft.parse

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Typed model of one parsed game — the target of the row-level
  * "parser operator" (reference: processor.py:300-398 `process_game`).
  */
final case class AltName(name: String, name_type: String, sort_index: Long)
final case class LinkEntity(id: Long, name: String, inbound: Boolean)
final case class PlayerCount(player_count: String, best_votes: Long,
    recommended_votes: Long, not_recommended_votes: Long)
final case class LangDep(level: Long, description: String, votes: Long)
final case class SuggestedAge(age: String, votes: Long)
final case class Ranking(ranking_type: String, ranking_name: String,
    friendly_name: String, value: Long, bayes_average: Double)

final case class ProcessedGame(
    game_id: Long,
    game_type: String,
    primary_name: String,
    alternate_names: Seq[AltName],
    year_published: Option[Int],
    min_players: Long,
    max_players: Long,
    playing_time: Long,
    min_playtime: Long,
    max_playtime: Long,
    min_age: Long,
    description: String,
    thumbnail: String,
    image: String,
    categories: Seq[LinkEntity],
    mechanics: Seq[LinkEntity],
    families: Seq[LinkEntity],
    expansions: Seq[LinkEntity],
    implementations: Seq[LinkEntity],
    designers: Seq[LinkEntity],
    artists: Seq[LinkEntity],
    publishers: Seq[LinkEntity],
    suggested_players: Seq[PlayerCount],
    language_dependence: Seq[LangDep],
    suggested_age: Seq[SuggestedAge],
    users_rated: Long,
    average_rating: Double,
    bayes_average: Double,
    standard_deviation: Double,
    median_rating: Double,
    owned_count: Long,
    trading_count: Long,
    wanting_count: Long,
    wishing_count: Long,
    num_comments: Long,
    num_weights: Long,
    average_weight: Double,
    rankings: Seq[Ranking],
    load_timestamp: java.sql.Timestamp)

/** Parser for the BGG item payload (the xmltodict-shaped nested
  * structure, here as JSON). Pure functions applied via `Dataset.map`
  * at the ingest boundary — not UDFs (SURVEY.md §2.9, §2.11).
  *
  * Semantics are ported exactly from the reference, including its
  * asymmetries (reference: src/data_processor/processor.py):
  *   - lenient casts return 0, never null (processor.py:13-57); an
  *     `int` passes through sign-preserved but a negative *string*
  *     clamps to 0
  *   - year extraction returns null for "0"/non-digit (py:149-164)
  *   - every field can be object / array / scalar (py:111-147)
  *   - a malformed value in a *required-to-parse* position (e.g.
  *     non-numeric @sortindex or @id, int() in Python) aborts the
  *     whole game -> None (the try/except at py:302-398)
  *   - "Not Ranked" rankings are dropped (py:88-100)
  *   - inbound implementations are excluded from the bridge at
  *     flatten time (py:497-505)
  */
object BggParser {

  private val mapper = new ObjectMapper()

  def parseJson(json: String): JsonNode = mapper.readTree(json)

  // ------------------------------------------------- lenient casts (T1)

  /** processor.py:13-34 — int passthrough (sign kept), string parse
    * with negative clamp to 0, dict recurses on @value, else 0.
    */
  def safeInt(v: JsonNode): Long = v match {
    case null => 0L
    case n if n.isIntegralNumber => n.asLong()
    case n if n.isTextual =>
      parseLong(n.asText()) match {
        case Some(x) if x >= 0 => x
        case Some(_) => 0L
        case None => 0L
      }
    case n if n.isObject => safeInt(n.get("@value"))
    case _ => 0L
  }

  /** processor.py:37-57 — number passthrough, string parse, dict
    * recursion; no negative clamping for floats.
    */
  def safeFloat(v: JsonNode): Double = v match {
    case null => 0.0
    case n if n.isNumber => n.asDouble()
    case n if n.isTextual => parseDouble(n.asText()).getOrElse(0.0)
    case n if n.isObject => safeFloat(n.get("@value"))
    case _ => 0.0
  }

  private def parseLong(s: String): Option[Long] =
    try Some(s.trim.toLong) catch { case _: NumberFormatException => None }

  private def parseDouble(s: String): Option[Double] =
    try Some(s.trim.toDouble) catch { case _: NumberFormatException => None }

  /** Python `int(x)` — throws on garbage (aborts the whole game). */
  private def strictInt(v: JsonNode, default: Long): Long =
    if (v == null) default
    else if (v.isIntegralNumber) v.asLong()
    else v.asText().trim.toLong

  private def text(v: JsonNode, default: String): String =
    if (v == null) default
    else if (v.isValueNode) v.asText()
    else v.toString

  private def asList(v: JsonNode): Seq[JsonNode] =
    if (v == null) Nil
    else if (v.isArray) v.elements().asScala.toSeq
    else Seq(v)

  // ------------------------------------------------- names (T2)

  /** processor.py:102-147. */
  def extractNames(item: JsonNode): (String, Seq[AltName]) = {
    val names = item.get("name")
    names match {
      case null => ("Unknown", Nil)
      case n if n.isObject =>
        val nameType = text(n.get("@type"), "alternate")
        val value = text(n.get("@value"), "Unknown")
        if (nameType == "primary") (value, Nil)
        else ("Unknown", Seq(AltName(value, nameType, strictInt(n.get("@sortindex"), 1))))
      case n if n.isTextual =>
        ("Unknown", Seq(AltName(n.asText(), "alternate", 1)))
      case n if !n.isArray => ("Unknown", Nil)
      case n =>
        var primary = "Unknown"
        val alts = Seq.newBuilder[AltName]
        n.elements().asScala.foreach {
          case e if e.isObject =>
            if (text(e.get("@type"), "alternate") == "primary")
              primary = text(e.get("@value"), "Unknown")
            else
              alts += AltName(text(e.get("@value"), "Unknown"),
                text(e.get("@type"), "alternate"), strictInt(e.get("@sortindex"), 1))
          case e if e.isTextual =>
            alts += AltName(e.asText(), "alternate", 1)
          case _ => ()
        }
        (primary, alts.result())
    }
  }

  // ------------------------------------------------- year (T3)

  /** processor.py:149-164 — "0" and non-digit strings -> null. */
  def extractYear(item: JsonNode): Option[Int] = {
    val year = item.get("yearpublished")
    if (year == null) None
    else if (year.isTextual) digitYear(year.asText())
    else digitYear(Option(year.get("@value")).map(_.asText()).orNull)
  }

  private def digitYear(s: String): Option[Int] =
    if (s != null && s.nonEmpty && s.forall(_.isDigit) && s.toInt > 0) Some(s.toInt)
    else None

  // ------------------------------------------------- links (T4)

  private val TypeMapping = Map(
    "boardgamecategory" -> "categories",
    "boardgamemechanic" -> "mechanics",
    "boardgamefamily" -> "families",
    "boardgameexpansion" -> "expansions",
    "boardgameimplementation" -> "implementations",
    "boardgamedesigner" -> "designers",
    "boardgameartist" -> "artists",
    "boardgamepublisher" -> "publishers")

  /** processor.py:166-212 — 8 entity kinds; @inbound only meaningful
    * for implementations; non-numeric @id aborts the game.
    */
  def extractLinks(item: JsonNode): Map[String, Seq[LinkEntity]] = {
    val links = asList(item.get("link"))
    if (links.isEmpty) Map.empty
    else {
      val acc = scala.collection.mutable.Map[String, Vector[LinkEntity]]()
        .withDefaultValue(Vector.empty)
      links.foreach { link =>
        TypeMapping.get(text(link.get("@type"), null)).foreach { kind =>
          val inbound = kind == "implementations" &&
            text(link.get("@inbound"), "false") == "true"
          acc(kind) = acc(kind) :+ LinkEntity(strictInt(link.get("@id"), 0),
            text(link.get("@value"), "Unknown"), inbound)
        }
      }
      TypeMapping.values.map(k => k -> acc(k).toSeq).toMap
    }
  }

  // ------------------------------------------------- polls (T5)

  /** processor.py:214-298. */
  def extractPolls(item: JsonNode): (Seq[PlayerCount], Seq[LangDep], Seq[SuggestedAge]) = {
    val players = Seq.newBuilder[PlayerCount]
    val langs = Seq.newBuilder[LangDep]
    val ages = Seq.newBuilder[SuggestedAge]
    asList(item.get("poll")).foreach { poll =>
      text(poll.get("@name"), null) match {
        case "suggested_numplayers" =>
          asList(poll.get("results")).foreach { result =>
            val numPlayers = Option(result.get("@numplayers")).map(_.asText()).orNull
            val votes = asList(result.get("result"))
            def votesFor(kind: String): Long =
              votes.collectFirst {
                case v if text(v.get("@value"), null) == kind =>
                  strictInt(v.get("@numvotes"), 0)
              }.getOrElse(0L)
            players += PlayerCount(numPlayers, votesFor("Best"),
              votesFor("Recommended"), votesFor("Not Recommended"))
          }
        case "language_dependence" =>
          val results = poll.get("results")
          val votes = if (results == null) Nil else {
            val r = results.get("result")
            if (r == null) Nil
            else if (r.isArray) r.elements().asScala.toSeq
            else if (r.isObject) Seq(r)
            else Nil // a bare string vote is dropped (py:277-281)
          }
          votes.filter(_.isObject).foreach { v =>
            langs += LangDep(strictInt(v.get("@level"), 0),
              text(v.get("@value"), ""), strictInt(v.get("@numvotes"), 0))
          }
        case "suggested_playerage" =>
          val results = poll.get("results")
          val votes = if (results == null) Nil else asList(results.get("result"))
          votes.foreach { v =>
            ages += SuggestedAge(text(v.get("@value"), ""), strictInt(v.get("@numvotes"), 0))
          }
        case _ => ()
      }
    }
    (players.result(), langs.result(), ages.result())
  }

  // ------------------------------------------------- stats & ranks (T6)

  /** processor.py:60-85 GameStats. */
  def extractStats(item: JsonNode): Map[String, Either[Long, Double]] = {
    val ratings = Option(item.get("statistics")).flatMap(s => Option(s.get("ratings")))
      .getOrElse(mapper.createObjectNode())
    def i(k: String) = Left(safeInt(ratings.get(k)))
    def f(k: String) = Right(safeFloat(ratings.get(k)))
    Map(
      "users_rated" -> i("usersrated"), "average" -> f("average"),
      "bayes_average" -> f("bayesaverage"), "stddev" -> f("stddev"),
      "median" -> f("median"), "owned" -> i("owned"), "trading" -> i("trading"),
      "wanting" -> i("wanting"), "wishing" -> i("wishing"),
      "num_comments" -> i("numcomments"), "num_weights" -> i("numweights"),
      "average_weight" -> f("averageweight"))
  }

  /** processor.py:88-100 GameRanks — "Not Ranked" dropped. */
  def extractRanks(item: JsonNode): Seq[Ranking] = {
    val ranks = Option(item.get("statistics"))
      .flatMap(s => Option(s.get("ratings")))
      .flatMap(r => Option(r.get("ranks")))
      .flatMap(r => Option(r.get("rank")))
      .map(asList).getOrElse(Nil)
    ranks.collect {
      case r if r.isObject && text(r.get("@value"), null) != "Not Ranked" =>
        Ranking(text(r.get("@type"), ""), text(r.get("@name"), ""),
          text(r.get("@friendlyname"), ""), safeInt(r.get("@value")),
          safeFloat(r.get("@bayesaverage")))
    }
  }

  // ------------------------------------------------- whole game (T7-T8)

  /** processor.py:300-398 — returns None on missing item or any parse
    * abort (the reference's blanket try/except).
    */
  def processGame(gameId: Long, responseJson: String, gameType: String,
      loadTs: java.sql.Timestamp): Option[ProcessedGame] =
    try {
      val root = parseJson(responseJson)
      val items = Option(root.get("items")).flatMap(i => Option(i.get("item")))
        .map(asList).getOrElse(Nil)
      items.find(i => text(i.get("@id"), null) == gameId.toString).map { item =>
        val (primary, alts) = extractNames(item)
        val links = extractLinks(item).withDefaultValue(Nil)
        val (players, langs, ages) = extractPolls(item)
        val stats = extractStats(item)
        def si(k: String) = stats(k).left.getOrElse(0L)
        def sf(k: String) = stats(k).toOption.getOrElse(0.0)
        def attr(k: String): Long = {
          val n = item.get(k)
          if (n == null) 0L
          else if (n.isObject) safeInt(n.get("@value"))
          // a scalar where a {@value: ...} object belongs is an
          // AttributeError in the reference -> aborts the game
          else throw new IllegalArgumentException(s"$k is not an object")
        }
        ProcessedGame(
          game_id = gameId, game_type = gameType, primary_name = primary,
          alternate_names = alts, year_published = extractYear(item),
          min_players = attr("minplayers"), max_players = attr("maxplayers"),
          playing_time = attr("playingtime"), min_playtime = attr("minplaytime"),
          max_playtime = attr("maxplaytime"), min_age = attr("minage"),
          description = text(item.get("description"), ""),
          thumbnail = text(item.get("thumbnail"), ""),
          image = text(item.get("image"), ""),
          categories = links("categories"), mechanics = links("mechanics"),
          families = links("families"), expansions = links("expansions"),
          implementations = links("implementations"), designers = links("designers"),
          artists = links("artists"), publishers = links("publishers"),
          suggested_players = players, language_dependence = langs,
          suggested_age = ages,
          users_rated = si("users_rated"), average_rating = sf("average"),
          bayes_average = sf("bayes_average"),
          standard_deviation = sf("stddev"), median_rating = sf("median"),
          owned_count = si("owned"), trading_count = si("trading"),
          wanting_count = si("wanting"), wishing_count = si("wishing"),
          num_comments = si("num_comments"), num_weights = si("num_weights"),
          average_weight = sf("average_weight"),
          rankings = extractRanks(item), load_timestamp = loadTs)
      }
    } catch { case scala.util.control.NonFatal(_) => None }
}
