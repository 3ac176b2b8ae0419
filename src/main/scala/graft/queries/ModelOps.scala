package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.transform.Models

/** Oracle-gated transform-layer (Dataform) queries: fixture rows →
  * [[graft.transform.Models]] → all-scalar projection vs a DuckDB
  * oracle that INDEPENDENTLY re-implements the reference SQLX over the
  * same VALUES — the t11 pattern, but with a real SQL twin instead of a
  * pinned result (the models ARE SQL-expressible; the oracle should
  * derive, not restate).
  *
  * Covered models (the transform DAG's trunk):
  *   - t16 `games_active` (reference: definitions/games_active.sqlx:7-43)
  *     — dedup-to-latest join + DISTINCT; fixture has an exact-duplicate
  *     latest row to prove the DISTINCT and stale rows to prove the join.
  *   - t15 `best_player_counts` (definitions/best_player_counts.sqlx:25-66)
  *     — SAFE_CAST('4+'→NULL), vote floor, dual ranking windows,
  *     STRING_AGG ORDER BY (null-skipping, empty→NULL), conditional
  *     min/max, flag aggs. Fixture forces: both-qualify rows, a
  *     recommended-only row, a sub-floor row, a non-numeric count, an
  *     exact percentage tie broken by the engine's documented
  *     player_count_int tiebreak (stated identically in the oracle — BQ
  *     leaves the tie nondeterministic, the engine contract is
  *     determinism), a game with no qualifying rows, and a game with no
  *     player_counts rows at all.
  *   - t17 `games_features` (definitions/games_features.sqlx:8-99) —
  *     six ARRAY_AGG(name IGNORE NULLS) left-join aggregates (gated as
  *     sorted '|'-joined strings: BQ array order is nondeterministic,
  *     the engine contract is sorted — SURVEY §7.4 trap 3), hurdle flag,
  *     LN feature (gated ×1e6 as BIGINT), IFNULL-empty arrays for
  *     no-bridge and null-name-only games.
  *   - t18 incremental `games_features` — the watermark semi-join
  *     reduction (games_features.sqlx:8-12): only games past the
  *     watermark appear, and the per-entity aggregates are reduced
  *     BEFORE grouping; the oracle applies the same predicate to an
  *     unreduced plan, proving the reduction preserves semantics.
  *
  * Ratings are gated ×100 as BIGINT per the repo's no-doubles-in-gated-
  * projections discipline; fixture values keep every ROUND input far
  * from a .xx5 boundary so HALF_UP (Spark) vs round-half-away (DuckDB)
  * cannot diverge.
  *
  * Scale: fixture size is oracle-bounded, but the model code under test
  * is the production path — latest-per-key shuffles on game_id, the six
  * entity aggregates shuffle once each on game_id, and the incremental
  * path reduces every aggregate input with a semi-join before grouping
  * (the reference's 4h→8s lever, docs/dataform_operations.md:15).
  */
object ModelOps {

  private[queries] val now = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
  private val wmT1 = "2025-01-01 00:00:00" // incremental watermark = T1

  /** `games` time-series fixture. T1 < T2 < T3; game 1 has two stale
    * versions plus an exact-duplicate latest row, game 2/4 sit AT the
    * watermark (excluded incrementally), game 2 has NULL
    * year_published/bayes_average, game 4 has users_rated=0 (hurdle 0,
    * LN(1)=0).
    */
  final case class GameRow(
      game_id: Long, primary_name: String, year_published: Option[Long],
      average_rating: Double, average_weight: Double,
      bayes_average: Option[Double], users_rated: Long, num_weights: Long,
      min_players: Long, max_players: Long, min_playtime: Long,
      max_playtime: Long, min_age: Long, description: String,
      thumbnail: String, image: String, load_timestamp: java.sql.Timestamp)

  private[queries] def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private[queries] val T1 = ts("2025-01-01 00:00:00")
  private[queries] val T2 = ts("2025-02-01 00:00:00")
  private[queries] val T3 = ts("2025-03-01 00:00:00")

  val games: Seq[GameRow] = Seq(
    GameRow(1L, "Alpha", Some(1995L), 7.02, 2.40, Some(6.80), 900L, 140L,
      2L, 6L, 45L, 90L, 10L, "alpha v1", "thumb1a", "img1a", T1),
    GameRow(1L, "Alpha", Some(1995L), 7.20, 2.45, Some(6.95), 950L, 145L,
      2L, 6L, 45L, 90L, 10L, "alpha v2", "thumb1b", "img1b", T2),
    GameRow(1L, "Alpha", Some(1995L), 7.31, 2.50, Some(7.05), 1000L, 150L,
      2L, 6L, 45L, 90L, 10L, "alpha v3", "thumb1c", "img1c", T3),
    // exact duplicate of the latest row: games_active's DISTINCT must
    // collapse it (games_active.sqlx:13 SELECT DISTINCT)
    GameRow(1L, "Alpha", Some(1995L), 7.31, 2.50, Some(7.05), 1000L, 150L,
      2L, 6L, 45L, 90L, 10L, "alpha v3", "thumb1c", "img1c", T3),
    GameRow(2L, "Beta", None, 6.40, 1.75, None, 10L, 12L,
      1L, 4L, 20L, 40L, 8L, "beta", "thumb2", "img2", T1),
    GameRow(3L, "Gamma", Some(2010L), 8.25, 3.50, Some(7.80), 200L, 40L,
      1L, 5L, 60L, 120L, 12L, "gamma v1", "thumb3a", "img3a", T1),
    GameRow(3L, "Gamma", Some(2010L), 8.25, 3.50, Some(7.80), 200L, 40L,
      1L, 5L, 60L, 120L, 12L, "gamma v2", "thumb3b", "img3b", T2),
    GameRow(4L, "Delta", Some(2020L), 0.0, 0.0, None, 0L, 0L,
      2L, 2L, 10L, 10L, 6L, "delta", "thumb4", "img4", T1))

  /** (game_id, player_count, best, recommended, not_recommended).
    * Percentage inputs chosen so every ROUND lands far from .xx5:
    * 10/17→58.82, 20/24→83.33, '4+' SAFE_CASTs to NULL but is dropped by
    * the IN ('1'..'8') filter first, ('5','6') tie exactly (12/16=75.00,
    * 14/16=87.50 — binary-exact, a TRUE tie) to force the
    * player_count_int tiebreak, game 3's row fails both thresholds,
    * game 4 has no rows.
    */
  val playerCounts: Seq[(Long, String, Long, Long, Long)] = Seq(
    (1L, "2", 10L, 5L, 2L), (1L, "3", 20L, 3L, 1L), (1L, "4", 5L, 0L, 9L),
    (1L, "4+", 30L, 5L, 1L), (1L, "1", 2L, 1L, 1L),
    (1L, "5", 12L, 2L, 2L), (1L, "6", 12L, 2L, 2L),
    (2L, "2", 3L, 4L, 0L), (2L, "3", 0L, 6L, 1L), (2L, "5", 1L, 1L, 5L),
    (3L, "2", 1L, 1L, 10L))

  /** Entity dims/bridges: categories exercise a dangling bridge row
    * (dim id 99 absent → LEFT JOIN null → IGNORE NULLS drops it),
    * publishers exercise sort order (input Zed before Alpha), families
    * exercise a NULL dim name (bridge row exists, aggregate is empty),
    * designers have no bridge rows at all (IFNULL → empty).
    */
  val dims: Map[String, (String, Seq[(Long, Option[String])])] = Map(
    "categories" -> ("category_id", Seq(10L -> Some("Strategy"),
      11L -> Some("Economic"), 12L -> Some("Negotiation"))),
    "mechanics" -> ("mechanic_id", Seq(20L -> Some("Dice Rolling"),
      21L -> Some("Tile Placement"))),
    "publishers" -> ("publisher_id", Seq(30L -> Some("Zed Games"),
      31L -> Some("Alpha Press"))),
    "designers" -> ("designer_id", Seq(40L -> Some("Ann Designer"))),
    "artists" -> ("artist_id", Seq(50L -> Some("Art Smith"))),
    "families" -> ("family_id", Seq(60L -> None)))

  val bridges: Map[String, Seq[(Long, Long)]] = Map(
    "categories" -> Seq(1L -> 10L, 1L -> 11L, 1L -> 99L, 2L -> 12L),
    "mechanics" -> Seq(1L -> 20L, 3L -> 21L),
    "publishers" -> Seq(2L -> 30L, 2L -> 31L),
    "designers" -> Seq.empty,
    "artists" -> Seq(3L -> 50L),
    "families" -> Seq(1L -> 60L))

  // ---- Spark-side fixture DataFrames -------------------------------

  private[queries] def gamesDf(s: SparkSession): DataFrame = {
    import s.implicits._
    s.createDataset(games).toDF()
  }

  private[queries] def pcDf(s: SparkSession): DataFrame = {
    import s.implicits._
    playerCounts.toDF("game_id", "player_count", "best_votes",
      "recommended_votes", "not_recommended_votes")
  }

  private[queries] def entitiesMap(s: SparkSession)
      : Map[String, (DataFrame, DataFrame, String)] = {
    import s.implicits._
    dims.map { case (colName, (idCol, dimRows)) =>
      val dim = dimRows.toDF(idCol, "name")
      val bridge = bridges(colName).toDF("game_id", idCol)
      colName -> (bridge, dim, idCol)
    }
  }

  // ---- Shared oracle CTE fragments ---------------------------------

  private[queries] def sqlD(d: Double) = s"CAST($d AS DOUBLE)"
  private[queries] def sqlOptD(d: Option[Double]) =
    d.map(sqlD).getOrElse("CAST(NULL AS DOUBLE)")
  private[queries] def sqlOptL(l: Option[Long]) =
    l.map(_.toString).getOrElse("CAST(NULL AS BIGINT)")
  private[queries] def sqlS(s: String) = s"'${s.replace("'", "''")}'"
  private[queries] def sqlTs(t: java.sql.Timestamp) = s"TIMESTAMP '$t'"

  /** games + latest + ga CTEs — the games_active.sqlx shape.
    * `gs` is the games fixture generation, `p` a CTE-name prefix so two
    * generations can coexist in one oracle (t21's change detection).
    */
  private[queries] def gaCtesFor(gs: Seq[GameRow], p: String): String = {
    val rows = gs.map(g => "(" + Seq(
      g.game_id.toString, sqlS(g.primary_name), sqlOptL(g.year_published),
      sqlD(g.average_rating), sqlD(g.average_weight),
      sqlOptD(g.bayes_average), g.users_rated.toString,
      g.num_weights.toString, g.min_players.toString, g.max_players.toString,
      g.min_playtime.toString, g.max_playtime.toString, g.min_age.toString,
      sqlS(g.description), sqlS(g.thumbnail), sqlS(g.image),
      sqlTs(g.load_timestamp)).mkString(", ") + ")").mkString(",\n    ")
    s"""${p}games(game_id, primary_name, year_published, average_rating,
       |      average_weight, bayes_average, users_rated, num_weights,
       |      min_players, max_players, min_playtime, max_playtime, min_age,
       |      description, thumbnail, image, load_timestamp) AS (VALUES
       |    $rows),
       |${p}latest AS (
       |  SELECT game_id, MAX(load_timestamp) AS latest_ts
       |  FROM ${p}games GROUP BY game_id),
       |${p}ga AS (
       |  SELECT DISTINCT g.game_id, g.primary_name AS name, g.year_published,
       |    g.average_rating, g.average_weight, g.bayes_average,
       |    g.users_rated, g.num_weights, g.min_players, g.max_players,
       |    g.min_playtime, g.max_playtime, g.min_age, g.description,
       |    g.thumbnail, g.image, g.load_timestamp
       |  FROM ${p}games g
       |  JOIN ${p}latest l ON g.game_id = l.game_id
       |               AND g.load_timestamp = l.latest_ts)""".stripMargin
  }

  private[queries] def gaCtes: String = gaCtesFor(games, "")

  private def pcValues: String =
    playerCounts.map { case (gid, pc, b, r, n) =>
      s"($gid, ${sqlS(pc)}, $b, $r, $n)"
    }.mkString(",\n    ")

  /** Six per-entity aggregate CTEs + the final feature projection —
    * games_features.sqlx re-expressed in DuckDB; `wmPred` injects the
    * incremental watermark predicate (empty = full refresh).
    */
  private def featuresSql(wmPred: String): String = {
    val entityCtes = dims.keys.toSeq.sorted.map { e =>
      val (idCol, dimRows) = dims(e)
      val dimVals = dimRows.map { case (id, nm) =>
        s"($id, ${nm.map(sqlS).getOrElse("CAST(NULL AS VARCHAR)")})"
      }.mkString(", ")
      val bRows = bridges(e)
      val bridgeSql =
        if (bRows.isEmpty)
          s"SELECT CAST(NULL AS BIGINT) AS game_id, CAST(NULL AS BIGINT) AS $idCol WHERE 1=0"
        else "VALUES " + bRows.map { case (g, i) => s"($g, $i)" }.mkString(", ")
      s"""${e}_dim($idCol, name) AS (VALUES $dimVals),
         |${e}_bridge AS (SELECT * FROM ($bridgeSql) AS b_(game_id, $idCol)),
         |${e}_agg AS (
         |  SELECT b.game_id, STRING_AGG(d.name, '|' ORDER BY d.name) AS $e
         |  FROM ${e}_bridge b
         |  JOIN gtp ON b.game_id = gtp.game_id
         |  LEFT JOIN ${e}_dim d ON b.$idCol = d.$idCol
         |  GROUP BY b.game_id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $gaCtes,
       |gtp AS (SELECT game_id FROM ga $wmPred),
       |$entityCtes
       |SELECT g.game_id, g.name, g.year_published,
       |  CAST(ROUND(g.bayes_average * 100) AS BIGINT) AS geek_rating_x100,
       |  CAST(ROUND(g.average_weight * 100) AS BIGINT) AS complexity_x100,
       |  CAST(ROUND(g.average_rating * 100) AS BIGINT) AS rating_x100,
       |  g.users_rated,
       |  CASE WHEN g.users_rated >= 25 THEN 1 ELSE 0 END AS hurdle,
       |  CAST(ROUND(LN(g.users_rated + 1) * 1000000) AS BIGINT) AS log_users_rated_e6,
       |  g.num_weights, g.min_players, g.max_players, g.min_playtime,
       |  g.max_playtime, g.min_age, g.image, g.thumbnail, g.description,
       |  c.categories, m.mechanics, p.publishers, d.designers,
       |  a.artists, f.families,
       |  CAST(epoch(g.load_timestamp) AS BIGINT) AS load_epoch
       |FROM ga g
       |LEFT JOIN categories_agg c ON g.game_id = c.game_id
       |LEFT JOIN mechanics_agg m ON g.game_id = m.game_id
       |LEFT JOIN publishers_agg p ON g.game_id = p.game_id
       |LEFT JOIN designers_agg d ON g.game_id = d.game_id
       |LEFT JOIN artists_agg a ON g.game_id = a.game_id
       |LEFT JOIN families_agg f ON g.game_id = f.game_id
       |$wmPred
       |ORDER BY g.game_id""".stripMargin
  }

  /** Spark-side scalar projection of a gamesFeatures result (shared by
    * t17/t18). Arrays gate as sorted '|'-joins with empty→NULL to match
    * STRING_AGG's zero-item semantics.
    */
  private def projectFeatures(gf: DataFrame): DataFrame = {
    def arr(c: String) = nullif(array_join(col(c), "|"), lit("")).as(c)
    gf.select(col("game_id"), col("name"), col("year_published"),
      round(col("geek_rating") * 100).cast("long").as("geek_rating_x100"),
      round(col("complexity") * 100).cast("long").as("complexity_x100"),
      round(col("rating") * 100).cast("long").as("rating_x100"),
      col("users_rated"), col("hurdle"),
      round(col("log_users_rated") * 1000000).cast("long")
        .as("log_users_rated_e6"),
      col("num_weights"), col("min_players"), col("max_players"),
      col("min_playtime"), col("max_playtime"), col("min_age"),
      col("image"), col("thumbnail"), col("description"),
      arr("categories"), arr("mechanics"), arr("publishers"),
      arr("designers"), arr("artists"), arr("families"),
      unix_timestamp(col("load_timestamp")).as("load_epoch"))
      .orderBy("game_id")
  }

  val all: Seq[Q] = Seq(

    Q("t16_games_active",
      "games_active model: dedup-to-latest join + DISTINCT (games_active.sqlx:7-43)",
      s"""WITH $gaCtes
         |SELECT game_id, name, year_published,
         |  CAST(ROUND(average_rating * 100) AS BIGINT) AS rating_x100,
         |  CAST(ROUND(average_weight * 100) AS BIGINT) AS weight_x100,
         |  CAST(ROUND(bayes_average * 100) AS BIGINT) AS bayes_x100,
         |  users_rated, num_weights, min_players, max_players,
         |  min_playtime, max_playtime, min_age, description,
         |  CAST(epoch(load_timestamp) AS BIGINT) AS load_epoch
         |FROM ga ORDER BY game_id""".stripMargin) { (s, _) =>
      Models.gamesActive(gamesDf(s), now).select(
        col("game_id"), col("name"), col("year_published"),
        round(col("average_rating") * 100).cast("long").as("rating_x100"),
        round(col("average_weight") * 100).cast("long").as("weight_x100"),
        round(col("bayes_average") * 100).cast("long").as("bayes_x100"),
        col("users_rated"), col("num_weights"), col("min_players"),
        col("max_players"), col("min_playtime"), col("max_playtime"),
        col("min_age"), col("description"),
        unix_timestamp(col("load_timestamp")).as("load_epoch"))
        .orderBy("game_id")
    },

    Q("t15_best_player_counts",
      "best_player_counts model: SAFE_CAST, vote floors, dual rank windows, STRING_AGG ORDER BY, conditional min/max, flag aggs (best_player_counts.sqlx:25-66)",
      s"""WITH $gaCtes,
         |pcs(game_id, player_count, best_votes, recommended_votes,
         |    not_recommended_votes) AS (VALUES
         |    $pcValues),
         |norm AS (
         |  SELECT game_id, player_count,
         |    TRY_CAST(player_count AS BIGINT) AS player_count_int,
         |    best_votes, recommended_votes, not_recommended_votes
         |  FROM pcs),
         |thr AS (
         |  SELECT *,
         |    best_votes + recommended_votes + not_recommended_votes AS total_votes,
         |    CASE WHEN best_votes + recommended_votes + not_recommended_votes = 0
         |      THEN 0.0
         |      ELSE ROUND(CAST(best_votes AS DOUBLE)
         |        / CAST(best_votes + recommended_votes + not_recommended_votes AS DOUBLE) * 100, 2)
         |    END AS best_percentage,
         |    CASE WHEN best_votes + recommended_votes + not_recommended_votes = 0
         |      THEN 0.0
         |      ELSE ROUND(CAST(best_votes + recommended_votes AS DOUBLE)
         |        / CAST(best_votes + recommended_votes + not_recommended_votes AS DOUBLE) * 100, 2)
         |    END AS positive_percentage
         |  FROM norm
         |  WHERE best_votes + recommended_votes + not_recommended_votes > 5
         |    AND player_count IN ('1','2','3','4','5','6','7','8')),
         |ranked AS (
         |  SELECT *,
         |    ROW_NUMBER() OVER (PARTITION BY game_id
         |      ORDER BY best_percentage DESC, total_votes DESC, player_count_int) AS best_rank,
         |    ROW_NUMBER() OVER (PARTITION BY game_id
         |      ORDER BY positive_percentage DESC, total_votes DESC, player_count_int) AS recommended_rank
         |  FROM thr
         |  WHERE best_percentage >= 40 OR positive_percentage >= 70)
         |SELECT g.game_id, g.name, g.min_players, g.max_players,
         |  STRING_AGG(CASE WHEN best_rank <= 3 AND best_percentage >= 40
         |    THEN player_count END, ', ' ORDER BY best_rank) AS best_player_counts,
         |  STRING_AGG(CASE WHEN recommended_rank <= 5 AND positive_percentage >= 70
         |    THEN player_count END, ', ' ORDER BY recommended_rank) AS recommended_player_counts,
         |  MIN(CASE WHEN best_rank <= 3 AND best_percentage >= 40
         |    THEN player_count_int END) AS min_best_player_count,
         |  MAX(CASE WHEN best_rank <= 3 AND best_percentage >= 40
         |    THEN player_count_int END) AS max_best_player_count,
         |  MIN(CASE WHEN recommended_rank <= 5 AND positive_percentage >= 70
         |    THEN player_count_int END) AS min_recommended_player_count,
         |  MAX(CASE WHEN recommended_rank <= 5 AND positive_percentage >= 70
         |    THEN player_count_int END) AS max_recommended_player_count,
         |  CAST(COUNT(CASE WHEN best_rank <= 3 AND best_percentage >= 40
         |    THEN 1 END) > 0 AS BIGINT) AS has_best_count,
         |  CAST(COUNT(CASE WHEN recommended_rank <= 5 AND positive_percentage >= 70
         |    THEN 1 END) > 0 AS BIGINT) AS has_recommended_count
         |FROM ga g
         |LEFT JOIN ranked r ON g.game_id = r.game_id
         |GROUP BY g.game_id, g.name, g.min_players, g.max_players
         |ORDER BY g.game_id""".stripMargin) { (s, _) =>
      val ga = Models.gamesActive(gamesDf(s), now)
      Models.bestPlayerCounts(ga, pcDf(s), now).select(
        col("game_id"), col("name"), col("min_players"), col("max_players"),
        col("best_player_counts"), col("recommended_player_counts"),
        col("min_best_player_count"), col("max_best_player_count"),
        col("min_recommended_player_count"), col("max_recommended_player_count"),
        col("has_best_count").cast("long").as("has_best_count"),
        col("has_recommended_count").cast("long").as("has_recommended_count"))
        .orderBy("game_id")
    },

    Q("t17_games_features",
      "games_features model: six ARRAY_AGG left-join aggregates, hurdle, LN feature (games_features.sqlx:8-99)",
      featuresSql("")) { (s, _) =>
      val ga = Models.gamesActive(gamesDf(s), now)
      projectFeatures(Models.gamesFeatures(ga, entitiesMap(s), now))
    },

    Q("t18_features_incremental",
      "games_features incremental: watermark filter + per-entity semi-join input reduction equals predicate-on-full (games_features.sqlx:8-12)",
      featuresSql(s"WHERE load_timestamp > TIMESTAMP '$wmT1'")) { (s, _) =>
      val ga = Models.gamesActive(gamesDf(s), now)
      projectFeatures(
        Models.gamesFeatures(ga, entitiesMap(s), now, Some(ts(wmT1))))
    })
}
