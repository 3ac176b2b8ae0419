package graft.queries

import org.apache.spark.sql.functions._
import graft.parse.{BggParser, Flatten}

/** Oracle-gated end-to-end parser queries (T1–T10): fixture JSON (the
  * xmltodict shape from FIXTURES.md §2) → [[BggParser.processGame]] →
  * [[Flatten.toTables]] → an all-scalar per-game summary the driver's
  * DuckDB gate can hash. The oracle is a pinned VALUES table derived by
  * hand from the reference's parse semantics
  * (reference: src/data_processor/processor.py:300-617 and
  * tests/test_processor.py:139-459) — the parser has no SQL-expressible
  * twin, so the oracle states the expected output directly, exactly as
  * the reference's own test suite does.
  *
  * The six fixture payloads are chosen to force every asymmetry the
  * reference encodes:
  *   - game 13: full shape — primary+alternate names, inbound
  *     implementation (kept in the dim, EXCLUDED from the bridge,
  *     py:497-505), "Not Ranked" rank dropped (py:88-100), two
  *     player-count poll rows
  *   - game 822: lenient-cast floor — year "0" → NULL (py:149-164),
  *     negative *string* minplayers clamps to 0 (py:13-34), garbage
  *     playingtime → 0, no statistics block → all stats 0
  *   - game 9209: shape polymorphism — bare-string name becomes an
  *     alternate with primary "Unknown" (py:119-124), bare-string
  *     yearpublished, int-typed @value, single-object (non-array)
  *     language_dependence result and rank
  *   - game 174430: non-numeric @sortindex → Python int() raises →
  *     the WHOLE game is dropped (try/except at py:302-398)
  *   - game 224517: response contains a different item id → None
  *   - game 99999: scalar where a {"@value": …} object belongs →
  *     AttributeError in the reference → game dropped
  * Only 13 / 822 / 9209 survive — the 3-row output IS the abort test.
  *
  * Scale: parse is a pure per-row map at the ingest boundary (no
  * shuffle); the flatten counts group on game_id — the natural parallel
  * shape for a billion-row crawl. All gated columns are BIGINT/VARCHAR
  * (ratings exposed ×10 as BIGINT) per the repo's no-doubles-in-gated-
  * projections discipline.
  */
object ParserOps {

  private val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  /** (game_id, game_type, raw xmltodict-shaped JSON payload). */
  val fixtures: Seq[(Long, String, String)] = Seq(
    (13L, "boardgame",
      """{"items":{"item":{
        |"@id":"13","@type":"boardgame",
        |"name":[{"@type":"primary","@value":"Catan"},
        |        {"@type":"alternate","@value":"Settlers of Catan","@sortindex":"2"}],
        |"yearpublished":{"@value":"1995"},
        |"minplayers":{"@value":"3"},"maxplayers":{"@value":"4"},
        |"playingtime":{"@value":"120"},"minage":{"@value":"10"},
        |"description":"Build, trade, settle!",
        |"link":[
        | {"@type":"boardgamecategory","@id":"1026","@value":"Negotiation"},
        | {"@type":"boardgamemechanic","@id":"2072","@value":"Dice Rolling"},
        | {"@type":"boardgamefamily","@id":"3","@value":"Base Game"},
        | {"@type":"boardgameimplementation","@id":"29316","@value":"The Landlord's Game","@inbound":"true"},
        | {"@type":"boardgameimplementation","@id":"123","@value":"Catan 2.0"}],
        |"poll":[{"@name":"suggested_numplayers","results":[
        | {"@numplayers":"3","result":[
        |   {"@value":"Best","@numvotes":"10"},
        |   {"@value":"Recommended","@numvotes":"5"},
        |   {"@value":"Not Recommended","@numvotes":"2"}]},
        | {"@numplayers":"4","result":[
        |   {"@value":"Best","@numvotes":"20"},
        |   {"@value":"Recommended","@numvotes":"3"},
        |   {"@value":"Not Recommended","@numvotes":"1"}]}]}],
        |"statistics":{"ratings":{
        | "average":{"@value":"7.5"},"usersrated":{"@value":"1000"},
        | "bayesaverage":{"@value":"7.1"},"stddev":{"@value":"1.2"},
        | "owned":{"@value":"500"},"averageweight":{"@value":"2.5"},
        | "ranks":{"rank":[
        |  {"@type":"subtype","@id":"1","@name":"boardgame","@friendlyname":"Board Game Rank","@value":"100","@bayesaverage":"7.5"},
        |  {"@type":"family","@id":"5497","@name":"strategygames","@friendlyname":"Strategy Game Rank","@value":"Not Ranked","@bayesaverage":"0"}]}}}
        |}}}""".stripMargin),
    (822L, "boardgame",
      """{"items":{"item":{
        |"@id":"822","@type":"boardgame",
        |"name":{"@type":"primary","@value":"Carcassonne","@sortindex":"1"},
        |"yearpublished":{"@value":"0"},
        |"minplayers":{"@value":"-3"},
        |"playingtime":{"@value":"abc"}
        |}}}""".stripMargin),
    (9209L, "boardgame",
      """{"items":{"item":{
        |"@id":"9209","@type":"boardgame",
        |"name":"Ticket to Ride",
        |"yearpublished":"2004",
        |"minplayers":{"@value":2},"maxplayers":{"@value":"5"},
        |"minage":{"@value":"8"},
        |"poll":[
        | {"@name":"language_dependence","results":{"result":
        |   {"@level":"1","@value":"No necessary in-game text","@numvotes":"42"}}},
        | {"@name":"suggested_playerage","results":{"result":[
        |   {"@value":"8","@numvotes":"15"},{"@value":"10","@numvotes":"4"}]}}],
        |"statistics":{"ratings":{
        | "average":{"@value":"8.07"},"usersrated":{"@value":"garbage"},
        | "ranks":{"rank":
        |  {"@type":"subtype","@id":"1","@name":"boardgame","@friendlyname":"Board Game Rank","@value":"200","@bayesaverage":"6.8"}}}}
        |}}}""".stripMargin),
    (174430L, "boardgame",
      """{"items":{"item":{
        |"@id":"174430","@type":"boardgame",
        |"name":{"@type":"alternate","@value":"Gloomhaven alt","@sortindex":"x"}
        |}}}""".stripMargin),
    (224517L, "boardgame",
      """{"items":{"item":{"@id":"999","@type":"boardgame",
        |"name":{"@type":"primary","@value":"Wrong Item"}}}}""".stripMargin),
    (99999L, "boardgame",
      """{"items":{"item":{
        |"@id":"99999","@type":"boardgame",
        |"name":{"@type":"primary","@value":"Scalar Playtime"},
        |"playingtime":"120"
        |}}}""".stripMargin))

  val all: Seq[Q] = Seq(

    Q("t11_parse_flatten",
      "fixture JSON -> BggParser/Flatten -> per-game scalar summary (processor.py:300-617)",
      // Expected rows derived BY HAND from the reference semantics —
      // see the per-game traces in the object doc. Casts on the first
      // row pin every numeric column to BIGINT (DuckDB unifies VALUES
      // types from the rows), matching the Spark side's long counts.
      """SELECT * FROM (VALUES
        |  (CAST(13 AS BIGINT), 'boardgame', 'Catan', CAST(1995 AS BIGINT),
        |   CAST(3 AS BIGINT), CAST(4 AS BIGINT), CAST(120 AS BIGINT),
        |   CAST(10 AS BIGINT), CAST(1000 AS BIGINT), CAST(500 AS BIGINT),
        |   CAST(75 AS BIGINT), CAST(1 AS BIGINT), CAST(1 AS BIGINT),
        |   CAST(1 AS BIGINT), CAST(1 AS BIGINT), CAST(0 AS BIGINT),
        |   CAST(0 AS BIGINT), CAST(1 AS BIGINT), CAST(2 AS BIGINT),
        |   CAST(30 AS BIGINT)),
        |  (822, 'boardgame', 'Carcassonne', NULL,
        |   0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
        |  (9209, 'boardgame', 'Unknown', 2004,
        |   2, 5, 0, 8, 0, 0, 81, 1, 0, 0, 0, 1, 2, 1, 0, 0)
        |) AS t(game_id, game_type, primary_name, year_published,
        |       min_players, max_players, playing_time, min_age,
        |       users_rated, owned_count, avg_rating_x10,
        |       n_alt_names, n_categories, n_mechanics, n_implementations,
        |       n_lang_dep, n_ages, n_rankings, n_player_counts,
        |       best_votes_sum)
        |ORDER BY game_id""".stripMargin) { (s, _) =>
      import s.implicits._
      val parsed = s.createDataset(fixtures).flatMap { case (id, tpe, js) =>
        BggParser.processGame(id, js, tpe, ts)
      }
      val tables = Flatten.toTables(parsed)
      def cnt(tbl: String, as: String) =
        tables(tbl).groupBy("game_id").agg(count(lit(1)).as(as))
      val pc = tables("player_counts").groupBy("game_id")
        .agg(count(lit(1)).as("n_player_counts"),
          sum("best_votes").as("best_votes_sum"))
      val base = tables("games").select(
        col("game_id"), col("type").as("game_type"), col("primary_name"),
        col("year_published").cast("long").as("year_published"),
        col("min_players"), col("max_players"), col("playing_time"),
        col("min_age"), col("users_rated"), col("owned_count"),
        // ratings surface ×10 as BIGINT: round() then cast keeps the
        // gated projection float-free (values are one string parse and
        // one multiply away from the input — deterministic on one row)
        round(col("average_rating") * 10, 0).cast("long").as("avg_rating_x10"))
      val joined = Seq(
        cnt("alternate_names", "n_alt_names"),
        cnt("game_categories", "n_categories"),
        cnt("game_mechanics", "n_mechanics"),
        cnt("game_implementations", "n_implementations"),
        cnt("language_dependence", "n_lang_dep"),
        cnt("suggested_ages", "n_ages"),
        cnt("rankings", "n_rankings"))
        .foldLeft(base)((acc, c) => acc.join(broadcast(c), Seq("game_id"), "left"))
        .join(broadcast(pc), Seq("game_id"), "left")
      val countCols = Seq("n_alt_names", "n_categories", "n_mechanics",
        "n_implementations", "n_lang_dep", "n_ages", "n_rankings",
        "n_player_counts", "best_votes_sum")
      countCols.foldLeft(joined)((df, c) =>
        df.withColumn(c, coalesce(col(c), lit(0L))))
        .orderBy("game_id")
    })
}
