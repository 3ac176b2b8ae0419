package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Q

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog maps every operator family from SURVEY.md §2 (plus
  * the training-data-pipeline extensions: dedup, similarity search,
  * text analysis) onto the synthetic test tables, each paired with the
  * equivalent DuckDB oracle SQL where SQL-expressible.
  */
object SparkEntry {

  def catalog: Seq[Q] =
    graft.queries.Relational.all ++
      graft.queries.Relational2.all ++
      graft.queries.Relational3.all ++
      graft.queries.Relational4.all ++
      graft.queries.RetrievalOps.all ++
      graft.queries.EventAnalytics.all ++
      graft.queries.GraphOps.all ++
      graft.queries.HybridRetrieval.all ++
      graft.queries.TextOps.all ++
      graft.queries.Dedup.all ++
      graft.queries.Similarity.all ++
      graft.queries.Sinks.all ++
      graft.queries.StreamingOps.all ++
      graft.queries.MultimodalOps.all ++
      graft.queries.CorpusOps.all ++
      graft.queries.ParserOps.all ++
      graft.queries.RegistryOps.all ++
      graft.queries.ModelOps.all ++
      graft.queries.ModelOps2.all ++
      graft.queries.SketchOps.all ++
      graft.queries.GovernanceOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val names = catalog.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate catalog names: ${names.diff(names.distinct).distinct.mkString(", ")}")
    catalog.map(q => q.name -> q.run).toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
