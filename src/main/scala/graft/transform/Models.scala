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

  /** `games_features` (definitions/games_features.sqlx): the feature
    * serving row — scalars, derived ML features, and six entity-name
    * arrays collapsed from the bridge tables (J2 + A5 + F5/F6).
    * BQ's ARRAY_AGG order is nondeterministic; the engine contract is
    * sorted arrays (SURVEY §7.4 trap 3).
    */
  def gamesFeatures(gamesActive: DataFrame,
      entities: Map[String, (DataFrame, DataFrame, String)],
      now: java.sql.Timestamp,
      watermark: Option[java.sql.Timestamp] = None): DataFrame = {
    // Incremental mode (games_features.sqlx:8-12 + SURVEY §4
    // "join-input reduction"): restrict to games past the stored
    // watermark FIRST, and semi-join that set into every per-entity
    // aggregate BEFORE grouping — Catalyst will not invent this
    // reduction, and it is what turned the reference's 4h full scan
    // into an 8s run (docs/dataform_operations.md:15).
    val base = watermark match {
      case Some(wm) => gamesActive.filter(col("load_timestamp") > lit(wm))
      case None => gamesActive
    }
    // One aggregate, not one per entity: tag each (bridge ⋈ dim) with
    // its entity type, union, and collapse all six arrays in a SINGLE
    // game_id-keyed aggregate joined back to the base once. The same
    // rows move through the cluster as with six separate aggregates,
    // but in ONE exchange instead of six agg exchanges + six join
    // probes — at 100 TB that is 2 shuffles instead of ~12, and on
    // fixture-sized input it removes ~10 stages of scheduling/codegen
    // overhead. Dims are bounded vocabularies (categories/mechanics/…
    // stay thousands of rows at any corpus size) → broadcast.
    val toProcess = base.select("game_id")
    val withAggs =
      if (entities.isEmpty) base
      else {
        val entityCols = entities.keys.toSeq.sorted
        val tagged = entities.toSeq.map { case (colName, (bridge, dim, idCol)) =>
          bridge.join(broadcast(dim), Seq(idCol), "left")
            .select(col("game_id"), lit(colName).as("_etype"),
              col("name").as("_ename"))
        }.reduce(_ unionByName _)
        // Incremental join-input reduction applied ONCE on the union —
        // equivalent to reducing each bridge (same surviving rows).
        val reduced =
          if (watermark.isDefined)
            tagged.join(toProcess, Seq("game_id"), "left_semi")
          else tagged
        val aggExprs = entityCols.map(c =>
          sort_array(collect_list(when(col("_etype") === c, col("_ename"))))
            .as(c))
        val aggs = reduced.groupBy("game_id")
          .agg(aggExprs.head, aggExprs.tail: _*)
        base.join(aggs, Seq("game_id"), "left")
      }
    withAggs.select(
      (Seq(
        col("game_id"), col("name"), col("year_published"),
        col("bayes_average"), col("average_rating"), col("average_weight"),
        col("users_rated"),
        when(col("users_rated") >= 25, 1).otherwise(0).as("hurdle"),
        col("bayes_average").as("geek_rating"),
        col("average_weight").as("complexity"),
        col("average_rating").as("rating"),
        log(col("users_rated") + 1).as("log_users_rated"),
        col("num_weights"), col("min_players"), col("max_players"),
        col("min_playtime"), col("max_playtime"), col("min_age"),
        col("image"), col("thumbnail"), col("description")) ++
        entities.keys.toSeq.sorted.map(c =>
          coalesce(col(c), array().cast("array<string>")).as(c)) ++
        Seq(col("load_timestamp"), lit(now).as("last_updated"))): _*)
  }

  /** `player_count_recommendations` (view): vote percentages per
    * (game, player_count) with the BQ division semantics.
    */
  def playerCountRecommendations(gamesActive: DataFrame,
      playerCounts: DataFrame): DataFrame = {
    val total = col("best_votes") + col("recommended_votes") + col("not_recommended_votes")
    def pct(num: Column): Column =
      when(col("total_votes") === 0, 0.0)
        .otherwise(round(num.cast("double") / col("total_votes").cast("double") * 100, 2))
    val stats = playerCounts
      .withColumn("total_votes", total)
      .withColumn("best_percentage", pct(col("best_votes")))
      .withColumn("recommended_percentage", pct(col("recommended_votes")))
      .filter(col("best_votes").isNotNull && col("recommended_votes").isNotNull &&
        col("not_recommended_votes").isNotNull)
    gamesActive.select("game_id", "name")
      .join(stats, Seq("game_id"))
      .select("game_id", "name", "player_count", "best_votes",
        "recommended_votes", "not_recommended_votes", "total_votes",
        "best_percentage", "recommended_percentage")
      .orderBy(col("total_votes").desc, col("best_percentage").desc,
        col("game_id"), col("player_count"))
  }

  /** `filter_categories` / `_mechanics` / `_designers` / `_publishers`
    * (filter_*.sqlx): top-N entities by distinct-game count among
    * rated games (J3 + A2 + P3 + O2).
    */
  def filterEntities(dim: DataFrame, bridge: DataFrame, gamesActive: DataFrame,
      idCol: String, limit: Int): DataFrame =
    dim.join(bridge, Seq(idCol))
      .join(gamesActive.filter(col("bayes_average").isNotNull &&
        col("bayes_average") > 0).select("game_id"), Seq("game_id"))
      .groupBy(idCol, "name")
      .agg(countDistinct("game_id").as("game_count"))
      .orderBy(col("game_count").desc, col("name"), col(idCol))
      .limit(limit)

  /** `filter_options_combined` (U1): the typed filter tables unioned
    * under a discriminator.
    */
  def filterOptionsCombined(filters: Seq[(String, String, DataFrame)]): DataFrame =
    filters.map { case (entityType, idCol, df) =>
      df.select(lit(entityType).as("entity_type"), col(idCol).as("entity_id"),
        col("name"), col("game_count"))
    }.reduce(_ unionByName _)

  /** `game_dropdown_options` (O1): top-N by geek rating. */
  def gameDropdownOptions(gamesActive: DataFrame, limit: Int = 25000): DataFrame =
    gamesActive.select("game_id", "name", "year_published", "bayes_average")
      .orderBy(coalesce(col("bayes_average"), lit(0.0)).desc, col("game_id"))
      .limit(limit)

  /** `game_features_hash` (F13 + J11): feature fingerprint for change
    * detection; unchanged rows preserve their old timestamp. The hash
    * is xxhash64-of-json in place of FARM_FINGERPRINT — values differ
    * from BQ, semantics (stability) are identical (SURVEY §7.3).
    */
  def gameFeaturesHash(gamesFeatures: DataFrame, oldHashes: Option[DataFrame],
      now: java.sql.Timestamp): DataFrame = {
    val newHashes = gamesFeatures
      .filter(col("year_published").isNotNull)
      .select(col("game_id"), col("name"),
        xxhash64(to_json(struct(
          col("year_published"), col("categories"), col("mechanics"),
          col("designers"), col("artists"), col("publishers"), col("families"),
          col("min_age"), col("min_playtime"), col("max_playtime"),
          col("min_players"), col("max_players"), col("description"))))
          .as("feature_hash"))
    val old = oldHashes.getOrElse(
      gamesFeatures.sparkSession.emptyDataFrame
        .select(lit(null).cast("long").as("game_id"),
          lit(null).cast("long").as("o_hash"),
          lit(null).cast("timestamp").as("o_last_updated"))
        .limit(0))
      .select(col("game_id").as("o_gid"), col("o_hash"), col("o_last_updated"))
    newHashes.join(old, col("game_id") === col("o_gid"), "left")
      .select(col("game_id"), col("name"), col("feature_hash"),
        when(col("o_gid").isNull, lit(now))
          .when(col("feature_hash") =!= col("o_hash"), lit(now))
          .otherwise(col("o_last_updated")).as("last_updated"))
  }

  /** `game_profile` (game_profile.sqlx:22-119): the one-row-per-game
    * serving document, all FIVE blocks — feature scalars + entity
    * arrays, nested player-count block (A6), and three null-guarded
    * single-row struct blocks (F7/F8, J4): the WHOLE-ROW predictions
    * struct (game_profile.sqlx:99 `IF(p.game_id IS NULL, NULL, p)` —
    * whole-row so new ML output columns flow through automatically),
    * the embedding-coordinates struct (sqlx:101-108), and fetch
    * provenance (sqlx:110-113). Each block is a keyed LEFT join on
    * game_id — one shuffle key shared across all four probes, every
    * side pre-collapsed to one row per game, so at scale AQE
    * broadcasts the small dims and the big ones co-partition.
    */
  def gameProfile(gamesFeatures: DataFrame, pcr: DataFrame,
      predictions: DataFrame, coordinates: DataFrame,
      provenance: DataFrame): DataFrame = {
    val pcAgg = pcr.groupBy(col("game_id").as("pc_gid"))
      .agg(expr(
        """transform(
          |  array_sort(collect_list(struct(player_count, best_votes,
          |    recommended_votes, not_recommended_votes, total_votes,
          |    best_percentage, recommended_percentage))),
          |  s_ -> s_)""".stripMargin).as("player_counts"))
    // whole-row struct: faithful to bgg_predictions' full column set
    val predStruct = predictions.select(col("game_id").as("pd_gid"),
      struct(predictions.columns.map(col).toIndexedSeq: _*)
        .as("pd_block"))
    val coordStruct = coordinates.select(col("game_id").as("co_gid"),
      struct(col("umap_1"), col("umap_2"), col("pca_1"), col("pca_2"),
        col("embedding_model"), col("embedding_version")).as("co_block"))
    val provLatest = provenance
      .groupBy(col("game_id").as("pr_gid"))
      .agg(max(struct(col("fetch_timestamp"), col("success"))).as("m"))
      .select(col("pr_gid"), col("m.fetch_timestamp").as("fetch_timestamp"),
        col("m.success").as("fetch_success"))
    gamesFeatures
      .join(pcAgg, col("game_id") === col("pc_gid"), "left")
      .join(predStruct, col("game_id") === col("pd_gid"), "left")
      .join(coordStruct, col("game_id") === col("co_gid"), "left")
      .join(provLatest, col("game_id") === col("pr_gid"), "left")
      .select((gamesFeatures.columns.map(col).toSeq :+
        coalesce(col("player_counts"),
          expr("cast(array() as array<struct<player_count:string," +
            "best_votes:bigint,recommended_votes:bigint," +
            "not_recommended_votes:bigint,total_votes:bigint," +
            "best_percentage:double,recommended_percentage:double>>)"))
          .as("player_counts") :+
        // a LEFT-join miss already yields a NULL struct — the same
        // observable as the reference's IF(game_id IS NULL, NULL, …)
        col("pd_block").as("predictions") :+
        col("co_block").as("embedding") :+
        when(col("pr_gid").isNull, lit(null))
          .otherwise(struct(col("fetch_timestamp"), col("fetch_success")))
          .as("provenance")): _*)
  }

  /** `game_first_prediction`: first score timestamp per game (A1). */
  def gameFirstPrediction(predictionsLanding: DataFrame): DataFrame =
    predictionsLanding.groupBy("game_id")
      .agg(min(col("score_ts")).as("first_prediction_ts"))

  /** `bgg_predictions` (bgg_predictions.sqlx): dedup the ML landing
    * table to the latest score per game (W1, tiebreak job_id DESC) and
    * attach freshness flags from the first-prediction table (J12).
    * `today` injected (F9: the reference uses CURRENT_DATE()).
    */
  def bggPredictions(landing: DataFrame, firstPrediction: DataFrame,
      today: java.sql.Date): DataFrame = {
    val w = Window.partitionBy("game_id")
      .orderBy(col("score_ts").desc, col("job_id").desc)
    val latest = landing
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val fp = firstPrediction
      .withColumnRenamed("game_id", "fp_gid")
    latest.join(fp, col("game_id") === col("fp_gid"), "left")
      .drop("fp_gid")
      .withColumn("is_new_1d",
        datediff(lit(today), to_date(col("first_prediction_ts"))) <= 1)
      .withColumn("is_new_7d",
        datediff(lit(today), to_date(col("first_prediction_ts"))) <= 7)
  }

  /** `bgg_game_embeddings` (bgg_game_embeddings.sqlx): keep only the
    * latest embedding_version (P10, one consistent vector space), then
    * dedup to the latest row per game (W1).
    */
  def bggGameEmbeddings(embeddingsLanding: DataFrame): DataFrame = {
    val latestVersion = embeddingsLanding.agg(
      max(col("embedding_version")).as("max_version"))
    val w = Window.partitionBy("game_id")
      .orderBy(col("created_ts").desc, col("job_id").desc)
    embeddingsLanding
      .crossJoin(broadcast(latestVersion))
      .filter(col("embedding_version") === col("max_version"))
      .drop("max_version")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** `bgg_game_coordinates` (bgg_game_coordinates.sqlx:8-28): the
    * UMAP/PCA visualization coordinates, restricted to the latest
    * embedding_version (P10 — one consistent projection space, via a
    * broadcast 1-row scalar like [[bggGameEmbeddings]]) then deduped
    * to the newest row per game (W1 — the reference orders by
    * created_ts DESC alone, sqlx:24; mirrored exactly, so callers
    * must not rely on same-instant tie order).
    */
  def bggGameCoordinates(coordinatesLanding: DataFrame): DataFrame = {
    val latestVersion = coordinatesLanding.agg(
      max(col("embedding_version")).as("max_version"))
    val w = Window.partitionBy("game_id").orderBy(col("created_ts").desc)
    coordinatesLanding
      .crossJoin(broadcast(latestVersion))
      .filter(col("embedding_version") === col("max_version"))
      .drop("max_version")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** `bgg_description_embeddings` (bgg_description_embeddings.sqlx:
    * 10-35): the text-description embedding table — latest
    * embedding_version only (P10, one consistent vector space), then
    * latest row per game by (created_ts, job_id) (W1). The reference
    * model is INCREMENTAL (`uniqueKey: game_id`): pass the stored
    * table's max created_ts as `watermark` and only STRICTLY newer
    * landing rows are processed (sqlx:30 `created_ts > (SELECT
    * MAX(created_ts) FROM self)` — a row stamped exactly AT the
    * watermark is skipped, the reference's boundary semantics,
    * pinned in PredictionsModelsSpec); merge the result by game_id
    * ([[graft.operators.TableStore.upsertByKey]]) and incremental ==
    * full recompute, the t18 discipline t42 gates. The version
    * scalar is computed over the FULL landing (pre-watermark), as in
    * the reference.
    */
  def bggDescriptionEmbeddings(landing: DataFrame,
      watermark: Option[java.sql.Timestamp] = None): DataFrame = {
    val latestVersion = landing.agg(
      max(col("embedding_version")).as("max_version"))
    val w = Window.partitionBy("game_id")
      .orderBy(col("created_ts").desc, col("job_id").desc)
    watermark.fold(landing)(ts => landing.filter(col("created_ts") > lit(ts)))
      .crossJoin(broadcast(latestVersion))
      .filter(col("embedding_version") === col("max_version"))
      .drop("max_version")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** `game_similarity_search` (game_similarity_search.sqlx):
    * embeddings enriched with filter/display features. Deliberately
    * unclustered in the reference (layout measured useless for the
    * self-joined live query); here a plain table.
    */
  def gameSimilaritySearch(embeddings: DataFrame, gamesFeatures: DataFrame,
      complexityPredictions: DataFrame): DataFrame = {
    val g = gamesFeatures.select(
      col("game_id").as("g_gid"), col("users_rated"), col("average_rating"),
      col("bayes_average").as("geek_rating"), col("min_players"),
      col("max_players"), col("min_playtime"), col("max_playtime"),
      col("thumbnail"), col("image"))
    val c = complexityPredictions.select(
      col("game_id").as("c_gid"), col("predicted_complexity").as("complexity"))
    embeddings
      .join(g, col("game_id") === col("g_gid"))
      .join(c, col("game_id") === col("c_gid"), "left")
      .drop("g_gid", "c_gid")
  }

  /** Similarity profile (game_neighbors.sqlx js PROFILES): the one
    * place the defaults live (min ratings floor 100, complexity band
    * 0.75, COSINE, 64 dims, top 10).
    */
  final case class SimilarityProfile(
      name: String = "default",
      minUsersRated: Int = 100,
      complexityBand: Double = 0.75,
      distance: String = "COSINE",
      dims: Int = 64,
      topK: Int = 10) {
    def embeddingColumn: String =
      if (dims == 64) "embedding" else s"embedding_$dims"
  }

  /** `game_neighbors` (game_neighbors.sqlx): per profile — candidate
    * floor, source-relative complexity band self-join (J5: written as
    * the NAIVE theta join; enable
    * [[graft.plans.BandJoinRewrite]] on the session to get the
    * bucketed equi-join plan), native `vector_distance` (F14), per-
    * source rank, top-k, ordered neighbor structs (A6+W2), one branch
    * per profile unioned (U4). Self-describing tuning columns carried
    * on the row.
    */
  def gameNeighbors(similaritySearch: DataFrame,
      profiles: Seq[SimilarityProfile], now: java.sql.Timestamp): DataFrame = {
    graft.functions.GraftFunctions.register(similaritySearch.sparkSession)
    profiles.map { p =>
      val cand = similaritySearch
        .filter(col("users_rated") >= p.minUsersRated && col("complexity").isNotNull)
        .select(col("game_id"), col("name"), col("year_published"),
          col("complexity"),
          expr(s"transform(${p.embeddingColumn}, x_ -> double(x_))").as("embedding"))
      val s = cand.select(col("game_id").as("src_game_id"),
        col("complexity").as("src_complexity"), col("embedding").as("src_embedding"))
      val t = cand.select(col("game_id").as("nbr_game_id"),
        col("name").as("nbr_name"), col("year_published").as("nbr_year_published"),
        col("complexity").as("nbr_complexity"), col("embedding").as("nbr_embedding"))
      val w = Window.partitionBy("src_game_id")
        .orderBy(col("distance"), col("nbr_game_id"))
      s.join(t,
          col("nbr_game_id") =!= col("src_game_id") &&
            col("nbr_complexity") >= col("src_complexity") - p.complexityBand &&
            col("nbr_complexity") <= col("src_complexity") + p.complexityBand)
        .withColumn("distance",
          expr(s"vector_distance(src_embedding, nbr_embedding, '${p.distance}')"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= p.topK)
        .groupBy(col("src_game_id").as("game_id"))
        .agg(expr(
          """transform(
            |  array_sort(collect_list(struct(rn, nbr_game_id, nbr_name,
            |    nbr_year_published, distance))),
            |  s_ -> struct(s_.nbr_game_id AS game_id, s_.nbr_name AS name,
            |    s_.nbr_year_published AS year_published, s_.distance AS distance))"""
            .stripMargin).as("similar"))
        .select(lit(p.name).as("profile"), col("game_id"), col("similar"),
          lit(p.minUsersRated).as("min_users_rated"),
          lit(p.complexityBand).as("complexity_band"),
          lit(p.distance).as("distance_type"),
          lit(p.dims).as("embedding_dims"),
          lit(now).as("computed_ts"))
    }.reduce(_ unionByName _)
  }

  /** `bgg_complexity_predictions`: latest complexity score per game
    * (W1 with the same score_ts/job_id tiebreaks).
    */
  def bggComplexityPredictions(landing: DataFrame): DataFrame = {
    val w = Window.partitionBy("game_id")
      .orderBy(col("score_ts").desc, col("job_id").desc)
    landing.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** `user_collection_predictions` (user_collection_predictions.sqlx):
    * landing joined to ACTIVE registry models on the composite key
    * (J8 + P9), deduped to the latest score per (username, game,
    * outcome) (W1), registry metadata rejoined USING-style.
    */
  def userCollectionPredictions(landing: DataFrame, registry: DataFrame): DataFrame = {
    val active = registry.filter(col("status") === "active")
      .select("username", "outcome", "model_version",
        "finalize_through_year", "registered_at")
    val w = Window.partitionBy("username", "game_id", "outcome")
      .orderBy(col("score_ts").desc, col("job_id").desc)
    landing
      .join(active.select("username", "outcome", "model_version"),
        Seq("username", "outcome", "model_version"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .join(active, Seq("username", "outcome", "model_version"))
      .select("username", "game_id", "outcome", "predicted_prob",
        "predicted_label", "threshold", "model_name", "model_version",
        "score_ts", "finalize_through_year", "registered_at")
  }

  /** `deployed_models` (deployed_models.sqlx): the 7-way model-
    * metadata union (U2 + F4 typed nulls + A2) — the five per-type
    * grouped projections over the predictions landing, plus the two
    * embedding blocks.
    *
    * Scale: the reference unions five separate grouped SELECTs over
    * the same landing table (deployed_models.sqlx:24-98) — five scans.
    * Here the five groupings run as ONE GROUPING SETS pass: the
    * landing is read once, Expand replicates each row per set (the
    * same map-side volume five scans would shuffle anyway), and a
    * single projection decodes `grouping_id()` back into the
    * per-type rows. One scan + one shuffle instead of five of each.
    */
  def deployedModels(predictionsLanding: DataFrame,
      gameEmbeddings: DataFrame, descriptionEmbeddings: DataFrame): DataFrame = {
    val predTypes = Seq("hurdle", "complexity", "rating", "users_rated", "geek_rating")
    val nullStr = lit(null).cast("string")
    val nullInt = lit(null).cast("long")
    val gcols = predTypes.flatMap(t => Seq(s"${t}_model_name",
      s"${t}_model_version", s"${t}_experiment"))
    val sets = predTypes.map(t => Seq(col(s"${t}_model_name"),
      col(s"${t}_model_version"), col(s"${t}_experiment")))
    // grouping_id bit i (from the MSB) marks grouping column i as
    // aggregated-out; each set keeps exactly its type's 3 columns
    val full = (1 << gcols.size) - 1
    val maskOf = predTypes.indices.map { i =>
      full & ~(0 to 2).map(j => 1 << (gcols.size - 1 - (3 * i + j))).sum
    }
    def decode(pick: Int => Column): Column =
      predTypes.indices.foldLeft(lit(null).cast("string")) { (acc, i) =>
        when(col("gid") === maskOf(i), pick(i)).otherwise(acc)
      }
    val predBlocks = Seq(
      predictionsLanding
        .groupingSets(sets, gcols.map(col): _*)
        .agg(grouping_id().as("gid"),
          countDistinct("game_id").as("games_count"),
          max(col("score_ts")).as("last_updated"))
        .select(lit("prediction").as("model_category"),
          decode(i => lit(predTypes(i))).as("model_type"),
          decode(i => col(gcols(3 * i))).as("model_name"),
          decode(i => col(gcols(3 * i + 1))).as("model_version"),
          decode(i => col(gcols(3 * i + 2))).as("experiment"),
          nullStr.as("algorithm"), nullInt.as("embedding_dim"),
          nullStr.as("document_method"), col("games_count"), col("last_updated")))
    val gameEmb = gameEmbeddings
      .groupBy("embedding_model", "embedding_version", "algorithm", "embedding_dim")
      .agg(countDistinct("game_id").as("games_count"),
        max(col("created_ts")).as("last_updated"))
      .select(lit("embedding").as("model_category"),
        lit("game_embedding").as("model_type"),
        col("embedding_model").as("model_name"),
        col("embedding_version").cast("string").as("model_version"),
        nullStr.as("experiment"), col("algorithm"),
        col("embedding_dim").cast("long").as("embedding_dim"),
        nullStr.as("document_method"), col("games_count"), col("last_updated"))
    val descEmb = descriptionEmbeddings
      .groupBy("embedding_model", "embedding_version", "algorithm",
        "embedding_dim", "document_method")
      .agg(countDistinct("game_id").as("games_count"),
        max(col("created_ts")).as("last_updated"))
      .select(lit("embedding").as("model_category"),
        lit("text_embedding").as("model_type"),
        col("embedding_model").as("model_name"),
        col("embedding_version").cast("string").as("model_version"),
        nullStr.as("experiment"), col("algorithm"),
        col("embedding_dim").cast("long").as("embedding_dim"),
        col("document_method"), col("games_count"), col("last_updated"))
    (predBlocks :+ gameEmb :+ descEmb).reduce(_ unionByName _)
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
