package graft.parse

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Flattens `Dataset[ProcessedGame]` into the reference's 22 normalized
  * tables (processor.py:400-617 `prepare_for_bigquery`), Spark-first:
  * one typed dataset in, 22 DataFrames out via select / explode /
  * dropDuplicates — the Python set-dedup (§2.4 A12) becomes a
  * distinct, which shuffles only the narrow bridge keys.
  *
  * Inbound implementations are excluded from the bridge but kept in
  * the entity dim (processor.py:497-505).
  */
object Flatten {

  val EntityKinds: Seq[(String, String)] = Seq(
    "categories" -> "category_id",
    "mechanics" -> "mechanic_id",
    "families" -> "family_id",
    "expansions" -> "expansion_id",
    "implementations" -> "implementation_id",
    "designers" -> "designer_id",
    "artists" -> "artist_id",
    "publishers" -> "publisher_id")

  def toTables(games: Dataset[ProcessedGame]): Map[String, DataFrame] = {
    val df = games.toDF().cache()

    val gamesTable = df.select(
      col("game_id"), col("game_type").as("type"), col("primary_name"),
      col("year_published"), col("min_players"), col("max_players"),
      col("playing_time"), col("min_playtime"), col("max_playtime"),
      col("min_age"), col("description"), col("thumbnail"), col("image"),
      col("users_rated"), col("average_rating"), col("bayes_average"),
      col("standard_deviation"), col("median_rating"), col("owned_count"),
      col("trading_count"), col("wanting_count"), col("wishing_count"),
      col("num_comments"), col("num_weights"), col("average_weight"),
      col("load_timestamp"))

    val altNames = df
      .select(col("game_id"), explode(col("alternate_names")).as("n"))
      .select(col("game_id"), col("n.name").as("name"),
        col("n.sort_index").as("sort_index"))

    val entityTables = EntityKinds.flatMap { case (kind, idCol) =>
      val exploded = df.select(col("game_id"), explode(col(kind)).as("e"))
      val dim = exploded
        .select(col("e.id").as(idCol), col("e.name").as("name"))
        .dropDuplicates()
      val bridgeSrc =
        if (kind == "implementations") exploded.filter(!col("e.inbound"))
        else exploded
      val bridge = bridgeSrc
        .select(col("game_id"), col("e.id").as(idCol))
        .dropDuplicates()
      Seq(kind -> dim, s"game_$kind" -> bridge)
    }.toMap

    val playerCounts = df
      .select(col("game_id"), explode(col("suggested_players")).as("p"))
      .select(col("game_id"), col("p.player_count").as("player_count"),
        col("p.best_votes").as("best_votes"),
        col("p.recommended_votes").as("recommended_votes"),
        col("p.not_recommended_votes").as("not_recommended_votes"))

    val langDep = df
      .select(col("game_id"), explode(col("language_dependence")).as("l"))
      .select(col("game_id"), col("l.level").as("level"),
        col("l.description").as("description"), col("l.votes").as("votes"))

    val ages = df
      .select(col("game_id"), explode(col("suggested_age")).as("a"))
      .select(col("game_id"), col("a.age").as("age"), col("a.votes").as("votes"))

    val rankings = df
      .select(col("game_id"), col("load_timestamp"), explode(col("rankings")).as("r"))
      .select(col("game_id"), col("r.ranking_type").as("ranking_type"),
        col("r.ranking_name").as("ranking_name"),
        col("r.friendly_name").as("friendly_name"),
        col("r.value").as("value"), col("r.bayes_average").as("bayes_average"),
        col("load_timestamp"))

    Map(
      "games" -> gamesTable,
      "alternate_names" -> altNames,
      "player_counts" -> playerCounts,
      "language_dependence" -> langDep,
      "suggested_ages" -> ages,
      "rankings" -> rankings) ++ entityTables
  }

  /** processor.py:619-710 `validate_data`: required columns present,
    * no all-null column, primary-key uniqueness. Distributed: the
    * only action is one count per check, no collect.
    */
  def validate(df: DataFrame, tableName: String): Boolean = {
    val required: Map[String, Set[String]] = Map(
      "games" -> Set("game_id", "type", "primary_name", "load_timestamp"),
      "alternate_names" -> Set("game_id", "name"),
      "player_counts" -> Set("game_id", "player_count"),
      "language_dependence" -> Set("game_id", "level", "description"),
      "suggested_ages" -> Set("game_id", "age", "votes"),
      "rankings" -> Set("game_id", "ranking_type", "value")) ++
      EntityKinds.flatMap { case (kind, idCol) =>
        Seq(kind -> Set(idCol, "name"), s"game_$kind" -> Set("game_id", idCol))
      }

    val pk: Map[String, Seq[String]] = Map(
      "games" -> Seq("game_id", "load_timestamp"),
      "player_counts" -> Seq("game_id", "player_count"),
      "language_dependence" -> Seq("game_id", "level"),
      "suggested_ages" -> Seq("game_id", "age"),
      "rankings" -> Seq("game_id", "ranking_type", "ranking_name")) ++
      EntityKinds.flatMap { case (kind, idCol) =>
        Seq(kind -> Seq(idCol), s"game_$kind" -> Seq("game_id", idCol))
      }

    try {
      val cols = df.columns.toSet
      if (required.get(tableName).exists(req => !req.subsetOf(cols))) return false
      val n = df.count()
      if (n > 0) {
        // all-null column check (polars dtype==Null analogue)
        val nonNullCounts = df.select(df.columns.map(c =>
          count(col(c)).as(c)).toSeq: _*).head()
        if (df.columns.indices.exists(i => nonNullCounts.getLong(i) == 0L))
          return false
      }
      pk.get(tableName).forall { keys =>
        df.select(keys.map(col): _*).distinct().count() == n
      }
    } catch { case scala.util.control.NonFatal(_) => false }
  }
}
