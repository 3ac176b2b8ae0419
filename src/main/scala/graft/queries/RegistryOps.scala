package graft.queries

import org.apache.spark.sql.functions._
import graft.transform.Models

/** Oracle-gated entry for the model-registry surface (U2): the 7-way
  * `deployed_models` metadata union
  * (reference: definitions/deployed_models.sqlx:24-128, implemented at
  * [[Models.deployedModels]]). The three input tables the reference
  * reads from its warehouse are derived DETERMINISTICALLY from the sf
  * parquet tables (orders → predictions landing, embeddings → the two
  * embedding registries) with pure integer/concat arithmetic, so the
  * DuckDB oracle can rebuild byte-identical inputs and run the same
  * 7-block grouped union in SQL.
  *
  * Timestamps never reach the gated projection: `last_updated` is
  * exposed as epoch seconds (BIGINT), and the embedding `created_ts`
  * is constructed from an integer epoch so the oracle can stay in
  * integer space end-to-end (max commutes with the monotone
  * epoch↔timestamp map).
  *
  * Scale: five grouped aggregates over the landing table + two over
  * embeddings, each map-side combinable on low-cardinality model keys;
  * the union is metadata-sized (hundreds of rows at any corpus scale).
  */
object RegistryOps {

  /** (prediction type, version modulus) — different moduli give each
    * block a different group fan-out. */
  private val PredTypes = Seq(
    "hurdle" -> 2, "complexity" -> 3, "rating" -> 4,
    "users_rated" -> 5, "geek_rating" -> 6)

  private val Epoch20260101 = 1767225600L // 2026-01-01 00:00:00 UTC

  val all: Seq[Q] = Seq(

    Q("u2_model_registry",
      "deployed_models: 5 prediction blocks + 2 embedding blocks grouped union",
      {
        val landingCols = PredTypes.map { case (tp, m) =>
          s"""'${tp}_m' || (o_custkey % 2) AS ${tp}_model_name,
             |    'v' || (o_orderkey % $m) AS ${tp}_model_version,
             |    'e' || (o_custkey % 3) AS ${tp}_experiment""".stripMargin
        }.mkString(",\n    ")
        val predBlocks = PredTypes.map { case (tp, _) =>
          s"""SELECT 'prediction' AS model_category, '$tp' AS model_type,
             |  ${tp}_model_name AS model_name,
             |  ${tp}_model_version AS model_version,
             |  ${tp}_experiment AS experiment,
             |  CAST(NULL AS VARCHAR) AS algorithm,
             |  CAST(NULL AS BIGINT) AS embedding_dim,
             |  CAST(NULL AS VARCHAR) AS document_method,
             |  count(DISTINCT game_id) AS games_count,
             |  CAST(epoch(max(score_ts)) AS BIGINT) AS last_updated
             |FROM landing GROUP BY 3, 4, 5""".stripMargin
        }
        val embBlocks = Seq(
          ("game_embedding", "ge", "CAST(NULL AS VARCHAR)"),
          ("text_embedding", "de", "document_method"))
          .map { case (mt, cte, dm) =>
            s"""SELECT 'embedding' AS model_category, '$mt' AS model_type,
               |  embedding_model AS model_name,
               |  CAST(embedding_version AS VARCHAR) AS model_version,
               |  CAST(NULL AS VARCHAR) AS experiment, algorithm,
               |  CAST(embedding_dim AS BIGINT) AS embedding_dim,
               |  $dm AS document_method,
               |  count(DISTINCT game_id) AS games_count,
               |  max(created_epoch) AS last_updated
               |FROM $cte GROUP BY 3, 4, 6, 7, 8""".stripMargin
          }
        s"""WITH landing AS (
           |  SELECT o_orderkey AS game_id, o_orderdate AS score_ts,
           |    $landingCols
           |  FROM orders),
           |ge AS (
           |  SELECT vec_id AS game_id,
           |    'emb' || (label % 2) AS embedding_model,
           |    (label % 3) + 1 AS embedding_version,
           |    CASE WHEN label % 2 = 0 THEN 'umap' ELSE 'pca' END AS algorithm,
           |    64 AS embedding_dim,
           |    $Epoch20260101 + (vec_id % 86400) AS created_epoch
           |  FROM embeddings),
           |de AS (
           |  SELECT vec_id AS game_id,
           |    'temb' || (label % 2) AS embedding_model,
           |    (label % 3) + 1 AS embedding_version,
           |    CASE WHEN label % 2 = 0 THEN 'tfidf' ELSE 'sbert' END AS algorithm,
           |    32 AS embedding_dim,
           |    CASE WHEN label % 2 = 0 THEN 'concat' ELSE 'first' END AS document_method,
           |    $Epoch20260101 + (vec_id % 86400) AS created_epoch
           |  FROM embeddings)
           |SELECT * FROM (
           |${(predBlocks ++ embBlocks).mkString("\nUNION ALL\n")}
           |) ORDER BY model_type, model_name, model_version, experiment""".stripMargin
      }) { (s, d) =>
      val landing = t(s, d, "orders").select(
        Seq(col("o_orderkey").as("game_id"), col("o_orderdate").as("score_ts")) ++
          PredTypes.flatMap { case (tp, m) => Seq(
            concat(lit(s"${tp}_m"), col("o_custkey") % 2).as(s"${tp}_model_name"),
            concat(lit("v"), col("o_orderkey") % m).as(s"${tp}_model_version"),
            concat(lit("e"), col("o_custkey") % 3).as(s"${tp}_experiment"))
          }: _*)
      val emb = t(s, d, "embeddings")
      val ge = emb.select(
        col("vec_id").as("game_id"),
        concat(lit("emb"), col("label") % 2).as("embedding_model"),
        (col("label") % 3 + 1).as("embedding_version"),
        when(col("label") % 2 === 0, "umap").otherwise("pca").as("algorithm"),
        lit(64).as("embedding_dim"),
        timestamp_seconds(lit(Epoch20260101) + col("vec_id") % 86400)
          .as("created_ts"))
      val de = emb.select(
        col("vec_id").as("game_id"),
        concat(lit("temb"), col("label") % 2).as("embedding_model"),
        (col("label") % 3 + 1).as("embedding_version"),
        when(col("label") % 2 === 0, "tfidf").otherwise("sbert").as("algorithm"),
        lit(32).as("embedding_dim"),
        when(col("label") % 2 === 0, "concat").otherwise("first")
          .as("document_method"),
        timestamp_seconds(lit(Epoch20260101) + col("vec_id") % 86400)
          .as("created_ts"))
      Models.deployedModels(landing, ge, de)
        .select(col("model_category"), col("model_type"), col("model_name"),
          col("model_version"), col("experiment"), col("algorithm"),
          col("embedding_dim"), col("document_method"), col("games_count"),
          unix_timestamp(col("last_updated")).as("last_updated"))
        .orderBy("model_type", "model_name", "model_version", "experiment")
    })
}
