package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Analytics-layer models — the Dataform SQLX definitions as DataFrame
  * functions (SURVEY §3.2). Clock injected for deterministic tests
  * (F9). Composed into a DAG via [[graft.operators.TransformDag]].
  */
object Models {

  /** `games_active` (definitions/games_active.sqlx): dedup the
    * append-only `games` time series to the latest row per game
    * (A1 + J1 + P1). Both sides of the join shuffle on game_id; the
    * aggregate side is one row per key.
    */
  def gamesActive(games: DataFrame, now: java.sql.Timestamp): DataFrame = {
    val latest = games.groupBy("game_id")
      .agg(max(col("load_timestamp")).as("load_timestamp"))
    games.join(latest, Seq("game_id", "load_timestamp"))
      .withColumnRenamed("primary_name", "name")
      .dropDuplicates()
      .withColumn("last_updated", lit(now))
  }

  /** `best_player_counts` (definitions/best_player_counts.sqlx) —
    * exact port including the BQ semantics traps (SURVEY §7.4):
    * SAFE_CAST -> null for "4+" strings, INT64/INT64 division is
    * FLOAT64 (cast before divide), STRING_AGG skips nulls and is
    * NULL for zero items. One deliberate deviation: the rank windows
    * add `player_count_int` as a final tiebreak (BQ leaves ties
    * nondeterministic; the engine contract is determinism).
    */
  def bestPlayerCounts(gamesActive: DataFrame, playerCounts: DataFrame,
      now: java.sql.Timestamp): DataFrame = {
    val total = col("best_votes") + col("recommended_votes") + col("not_recommended_votes")
    val norm = playerCounts.select(
      col("game_id"), col("player_count"),
      col("player_count").cast("long").as("player_count_int"), // SAFE_CAST (ANSI off)
      col("best_votes"), col("recommended_votes"), col("not_recommended_votes"))

    def pct(num: Column): Column =
      when(col("total_votes") === 0, 0.0)
        .otherwise(round(num.cast("double") / col("total_votes").cast("double") * 100, 2))

    val thresholds = norm
      .withColumn("total_votes", total)
      .filter(col("total_votes") > 5 &&
        col("player_count").isin((1 to 8).map(_.toString): _*))
      .withColumn("best_percentage", pct(col("best_votes")))
      .withColumn("positive_percentage", pct(col("best_votes") + col("recommended_votes")))

    val wBest = Window.partitionBy("game_id")
      .orderBy(col("best_percentage").desc, col("total_votes").desc,
        col("player_count_int"))
    val wRec = Window.partitionBy("game_id")
      .orderBy(col("positive_percentage").desc, col("total_votes").desc,
        col("player_count_int"))
    val ranked = thresholds
      .filter(col("best_percentage") >= 40 || col("positive_percentage") >= 70)
      .withColumn("best_rank", row_number().over(wBest))
      .withColumn("recommended_rank", row_number().over(wRec))

    val bestCond = col("best_rank") <= 3 && col("best_percentage") >= 40
    val recCond = col("recommended_rank") <= 5 && col("positive_percentage") >= 70

    /** STRING_AGG(CASE WHEN cond THEN v END, ', ' ORDER BY rank):
      * collect (rank, v) structs only where cond holds (collect_list
      * skips null structs), sort by rank, join; empty -> NULL.
      */
    def stringAggOrdered(cond: Column, rank: Column, v: Column): Column = {
      val arr = transform(
        array_sort(collect_list(when(cond, struct(rank.as("r"), v.as("v"))))),
        s => s.getField("v"))
      nullif(array_join(arr, ", "), lit(""))
    }

    gamesActive.select("game_id", "name", "min_players", "max_players")
      .join(ranked, Seq("game_id"), "left")
      .groupBy("game_id", "name", "min_players", "max_players")
      .agg(
        stringAggOrdered(bestCond, col("best_rank"), col("player_count"))
          .as("best_player_counts"),
        stringAggOrdered(recCond, col("recommended_rank"), col("player_count"))
          .as("recommended_player_counts"),
        min(when(bestCond, col("player_count_int"))).as("min_best_player_count"),
        max(when(bestCond, col("player_count_int"))).as("max_best_player_count"),
        min(when(recCond, col("player_count_int"))).as("min_recommended_player_count"),
        max(when(recCond, col("player_count_int"))).as("max_recommended_player_count"),
        (count(when(bestCond, 1)) > 0).as("has_best_count"),
        (count(when(recCond, 1)) > 0).as("has_recommended_count"))
      .withColumn("last_updated", lit(now))
  }
}
