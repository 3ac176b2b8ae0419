package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.XSql
import graft.functions.XSql.{Dialect, Spark => SqlSpark, Duck => SqlDuck}

/** Hybrid retrieval: fuse the lexical tier (BM25-style term scoring)
  * with the embedding tier (cosine to a query vector) by reciprocal
  * rank fusion — the standard combiner when two retrievers score on
  * incomparable scales. RRF needs only the RANKS, which are exact
  * integers, so the fused score is a fixed sum of two IEEE divisions —
  * bit-identical cross-engine with no float-scale trouble at all.
  *
  * Scale shape: each tier is its own bounded top-N (TakeOrdered), the
  * fusion is a tiny full-outer join of two N-row tables, and nothing
  * about the fusion grows with corpus size.
  */
object HybridRetrieval {

  private val RrfK = 60
  private val TierN = 50

  val all: Seq[Q] = Seq(

    Q("k8_hybrid_rrf",
      "reciprocal-rank fusion of lexical (term-count) and embedding (cosine) tiers",
      {
        implicit val dl: Dialect = SqlDuck
        val w = XSql.words("text")
        s"""WITH wt AS (SELECT doc_id, $w AS w FROM documents),
           |lex AS (
           |  SELECT doc_id,
           |    ${dl.arrSize(dl.filt("w", "x_", "x_ = 'join'"))}
           |      + ${dl.arrSize(dl.filt("w", "x_", "x_ = 'vector'"))} AS hits
           |  FROM wt),
           |lex_top AS (
           |  SELECT doc_id, row_number() OVER (ORDER BY hits DESC, doc_id) AS lex_rank
           |  FROM lex QUALIFY lex_rank <= $TierN),
           |e AS (SELECT vec_id, ${dl.toDoubleArr("embedding")} AS v FROM embeddings),
           |n AS (SELECT vec_id, v, ${XSql.norm2("v")} AS n2 FROM e),
           |q AS (SELECT v AS qv, n2 AS qn2 FROM n WHERE vec_id = 0),
           |emb_top AS (
           |  SELECT vec_id AS doc_id, row_number() OVER (ORDER BY
           |    1.0 - ${XSql.cosineFromNorms(XSql.dot("n.v", "q.qv"), "n.n2", "q.qn2")},
           |    vec_id) AS emb_rank
           |  FROM n, q WHERE vec_id != 0
           |  QUALIFY emb_rank <= $TierN)
           |SELECT coalesce(l.doc_id, m.doc_id) AS doc_id,
           |  coalesce(l.lex_rank, 0) AS lex_rank,
           |  coalesce(m.emb_rank, 0) AS emb_rank,
           |  round((CASE WHEN l.doc_id IS NULL THEN 0.0
           |              ELSE 1.0 / cast($RrfK + l.lex_rank as double) END)
           |      + (CASE WHEN m.doc_id IS NULL THEN 0.0
           |              ELSE 1.0 / cast($RrfK + m.emb_rank as double) END), 9) AS rrf
           |FROM lex_top l FULL OUTER JOIN emb_top m ON l.doc_id = m.doc_id
           |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      import org.apache.spark.sql.expressions.Window
      // lexical tier: tokenize ONCE into w, then count hits — inlining
      // words(text) into each term filter would split the text twice
      // per row (HOF lambdas are not codegen'd, so CSE is not
      // guaranteed to rescue it)
      val lex = t(s, d, "documents")
        .selectExpr("doc_id", s"${XSql.words("text")} AS w")
        .selectExpr("doc_id",
          s"${dl.arrSize(dl.filt("w", "x_", "x_ = 'join'"))}" +
            s" + ${dl.arrSize(dl.filt("w", "x_", "x_ = 'vector'"))} AS hits")
      // top-N first (TakeOrderedAndProject — never a global sort), THEN
      // rank: the single-partition row_number window only ever sees the
      // N survivors, not the corpus
      val lexTop = lex
        .orderBy(col("hits").desc, col("doc_id")).limit(TierN)
        .withColumn("lex_rank",
          row_number().over(Window.orderBy(col("hits").desc, col("doc_id"))).cast("long"))
        .select("doc_id", "lex_rank")
      // embedding tier: cosine to the query vector, top-N rank
      val n = t(s, d, "embeddings")
        .withColumn("v", expr(dl.toDoubleArr("embedding")))
        .withColumn("n2", expr(XSql.norm2("v")))
        .select("vec_id", "v", "n2")
      val q = n.filter(col("vec_id") === 0)
        .select(col("v").as("qv"), col("n2").as("qn2"))
      val embTop = n.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= 0)
        .withColumn("dist",
          lit(1.0) - expr(XSql.cosineFromNorms(XSql.dot("v", "qv"), "n2", "qn2")))
        .orderBy(col("dist"), col("vec_id")).limit(TierN)
        .withColumn("emb_rank",
          row_number().over(Window.orderBy(col("dist"), col("vec_id"))).cast("long"))
        .select(col("vec_id").as("doc_id"), col("emb_rank"))
      lexTop.withColumnRenamed("doc_id", "l_doc")
        .join(embTop.withColumnRenamed("doc_id", "m_doc"),
          col("l_doc") === col("m_doc"), "full_outer")
        .select(
          coalesce(col("l_doc"), col("m_doc")).as("doc_id"),
          coalesce(col("lex_rank"), lit(0L)).as("lex_rank"),
          coalesce(col("emb_rank"), lit(0L)).as("emb_rank"),
          round(
            when(col("l_doc").isNull, 0.0)
              .otherwise(lit(1.0) / (lit(RrfK) + col("lex_rank")).cast("double"))
            + when(col("m_doc").isNull, 0.0)
              .otherwise(lit(1.0) / (lit(RrfK) + col("emb_rank")).cast("double")),
            9).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    }
  )
}
