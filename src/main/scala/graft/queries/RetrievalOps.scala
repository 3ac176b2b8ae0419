package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.XSql
import graft.functions.XSql.{Dialect, Spark => SqlSpark, Duck => SqlDuck}

/** Retrieval and corpus-curation operators beyond t7's TF-IDF:
  * BM25 ranking (the standard lexical retrieval tier in front of the
  * k* embedding tiers), deterministic stratified sampling (corpus
  * mixing without random()), and blocked edit-distance fuzzy matching
  * (the char-level near-dup tier between exact hash and MinHash).
  *
  * Cross-engine determinism follows the repo discipline: exact
  * integer/decimal sums for anything aggregated, then a fixed,
  * fully-parenthesized sequence of single IEEE ops emitted
  * identically for both engines, rounded at the end.
  */
object RetrievalOps {

  /** BM25 parameters (Okapi, the +1 idf variant so idf > 0 always). */
  private val K1 = "1.2"
  private val B75 = "0.75"

  /** Query terms: fixed, as a production retrieval bench would pin. */
  private val Terms = Seq("join", "vector", "stream")

  /** One BM25 term score; identical SQL text in both dialects (all
    * operations are single IEEE ops on identical inputs).
    * `tf` / `df` are column names; `dl` the doc length, `avgdl` the
    * exact corpus mean length, `nd` the corpus size.
    */
  private def bm25Term(tf: String, df: String): String =
    s"""(ln(1.0 + (cast(nd - $df as double) + 0.5) / (cast($df as double) + 0.5))
       | * ((cast($tf as double) * (1.0 + $K1))
       |    / (cast($tf as double)
       |       + $K1 * ((1.0 - $B75) + ($B75 * cast(dl as double)) / avgdl))))""".stripMargin

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // BM25 top-k for a fixed 3-term query. Plan shape at scale: one
    // narrow map computes per-doc term frequencies, one 1-row global
    // aggregate (n_docs, Σdl, per-term dfs) broadcasts back, and the
    // score is a narrow map + TakeOrderedAndProject — no join against
    // a posting list is needed when the query is known. avgdl is an
    // exact bigint-sum ratio, so every engine sees the same double.
    Q("t8_bm25",
      "BM25 top-20 docs for a fixed 3-term query (exact-stats scoring)",
      {
        implicit val dl: Dialect = SqlDuck
        val w = XSql.words("text")
        val tfs = Terms.zipWithIndex.map { case (t_, i) =>
          s"${dl.arrSize(dl.filt("w", "x_", s"x_ = '$t_'"))} AS tf$i"
        }.mkString(", ")
        val dfs = Terms.indices.map(i =>
          s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
        s"""WITH tf AS (
           |  SELECT doc_id, ${dl.arrSize("w")} AS dl, $tfs
           |  FROM (SELECT doc_id, $w AS w FROM documents)),
           |stats AS (
           |  SELECT count(*) AS nd, sum(dl) AS sdl, $dfs FROM tf),
           |scored AS (
           |  SELECT doc_id,
           |    round(${Terms.indices.map(i => bm25Term(s"tf$i", s"df$i")).mkString("(", "\n + ", ")")}, 6) AS score
           |  FROM (SELECT tf.*, stats.*,
           |          cast(sdl as double) / cast(nd as double) AS avgdl
           |        FROM tf CROSS JOIN stats))
           |SELECT doc_id, score FROM scored
           |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val w = XSql.words("text")
      val tf = t(s, d, "documents")
        .selectExpr(Seq(s"doc_id", s"$w AS w"): _*)
        .selectExpr(Seq("doc_id", s"${dl.arrSize("w")} AS dl") ++
          Terms.zipWithIndex.map { case (t_, i) =>
            s"${dl.arrSize(dl.filt("w", "x_", s"x_ = '$t_'"))} AS tf$i"
          }: _*)
      // tf feeds both the stats branch and the scoring branch — cache
      // it or the scan+tokenize (the dominant cost) runs twice
      tf.cache()
      val stats = tf.selectExpr(
        Seq("count(*) AS nd", "sum(dl) AS sdl") ++
          Terms.indices.map(i => s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i"): _*)
      tf.crossJoin(broadcast(stats))
        .withColumn("avgdl", expr("cast(sdl as double) / cast(nd as double)"))
        .selectExpr("doc_id",
          s"round(${Terms.indices.map(i => bm25Term(s"tf$i", s"df$i")).mkString("(", "\n + ", ")")}, 6) AS score")
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },

    // ---------------------------------------------------------------
    // Deterministic stratified sampling: per-language rates applied by
    // content hash, not random() — the sample is reproducible across
    // runs, engines, AND retries (a task retry with random() silently
    // changes the corpus; with hash gating it cannot). This is the
    // corpus-mixing primitive: downsample dominant strata, keep rare
    // ones whole. Narrow map, no shuffle, trivially scale-free.
    Q("t9_stratified_sample",
      "hash-gated stratified sampling with per-language rates",
      {
        implicit val dl: Dialect = SqlDuck
        s"""SELECT doc_id, lang
           |FROM (SELECT doc_id, lang,
           |        ${XSql.charHash("text")} % 100 AS gate FROM documents)
           |WHERE gate < (CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 50 ELSE 100 END)
           |ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      t(s, d, "documents")
        .selectExpr("doc_id", "lang", s"${XSql.charHash("text")} % 100 AS gate")
        .filter(expr(
          "gate < (CASE lang WHEN 'en' THEN 30 WHEN 'zh' THEN 50 ELSE 100 END)"))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Blocked edit-distance fuzzy matching: the char-level near-dup
    // tier. All-pairs levenshtein is O(n²·m²) — never. Blocking on
    // (source, length-bucket) bounds candidates the same way LSH bands
    // do for MinHash (near-dups share a source and have similar
    // length), and the distance runs on a fixed 40-char prefix so the
    // per-pair cost is constant. At 100 TB the block join is a plain
    // equi-join; block sizes are data-bounded, and a skewed block
    // would take the x2 salted-join path.
    Q("d8_fuzzy_blocked",
      "blocked levenshtein near-match pairs (source + length-bucket blocking)",
      """WITH d AS (SELECT doc_id, source, n_chars,
        |             cast(floor(n_chars / 200) as bigint) AS lb,
        |             substr(text, 1, 40) AS pre
        |           FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       levenshtein(a.pre, b.pre) AS edit_dist
        |FROM d a JOIN d b
        |  ON a.source = b.source AND a.lb = b.lb AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.pre, b.pre) <= 12
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents").selectExpr(
        "doc_id", "source",
        "cast(floor(n_chars / 200) as bigint) AS lb",
        "substr(text, 1, 40) AS pre")
      val a = docs.select(col("source"), col("lb"), col("doc_id").as("doc_a"),
        col("pre").as("pre_a"))
      val b = docs.select(col("source"), col("lb"), col("doc_id").as("doc_b"),
        col("pre").as("pre_b"))
      // threshold-bounded levenshtein: banded O(len·k) with early exit
      // (returns -1 past the bound) instead of the full O(len²) matrix
      // — measured ~2.4x faster per pair; within the bound the value
      // equals the exact distance, so the output is unchanged
      a.join(b, Seq("source", "lb"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("edit_dist",
          levenshtein(col("pre_a"), col("pre_b"), 12).cast("long"))
        .filter(col("edit_dist") >= 0)
        .select("doc_a", "doc_b", "edit_dist")
        .orderBy("doc_a", "doc_b")
    },

    // ---------------------------------------------------------------
    // I10 — incremental BM25: the ranking half of the search-index
    // family (postings t37, maintenance i9, serving /search) kept
    // CURRENT without rescanning the corpus. Two maintained states:
    // the per-doc tf table (rows add/retract with the corpus — a
    // signed fold, O(batch) per tick) and the GLOBAL ranking stats
    // (nd, Σdl, per-term dfs) as a fold chain of ONE-ROW signed
    // deltas — each tick's stats delta is a single aggregate over
    // ONLY the batch, and the serving read sums the chain (a
    // KB-sized scan at any corpus size). Scoring then broadcasts the
    // folded stats into the folded tf rows — exactly t8's plan shape
    // — and the oracle recomputes BM25 from the final corpus from
    // scratch: incremental stats == rescanned stats, to the bit
    // (integer counters; the same fixed IEEE expression on top).
    Q("i10_bm25_ivm",
      "BM25 from incrementally-maintained stats (add + retract ticks) == full recompute",
      {
        implicit val dl: Dialect = SqlDuck
        val w = XSql.words("text")
        val tfs = Terms.zipWithIndex.map { case (t_, i) =>
          s"${dl.arrSize(dl.filt("w", "x_", s"x_ = '$t_'"))} AS tf$i"
        }.mkString(", ")
        val dfs = Terms.indices.map(i =>
          s"sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS df$i").mkString(", ")
        s"""WITH tf AS (
           |  SELECT doc_id, ${dl.arrSize("w")} AS dl, $tfs
           |  FROM (SELECT doc_id, $w AS w FROM documents
           |        WHERE doc_id % 7 <> 0)),
           |stats AS (
           |  SELECT count(*) AS nd, sum(dl) AS sdl, $dfs FROM tf),
           |scored AS (
           |  SELECT doc_id,
           |    round(${Terms.indices.map(i => bm25Term(s"tf$i", s"df$i")).mkString("(", "\n + ", ")")}, 6) AS score
           |  FROM (SELECT tf.*, stats.*,
           |          cast(sdl as double) / cast(nd as double) AS avgdl
           |        FROM tf CROSS JOIN stats))
           |SELECT doc_id, score FROM scored
           |ORDER BY score DESC, doc_id LIMIT 20""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      import graft.operators.TableStore
      val tmp = java.nio.file.Files.createTempDirectory("graft_i10")
      val tfPath = s"$tmp/tf"
      val statsPath = s"$tmp/stats"
      val w = XSql.words("text")
      def tfOf(docs: org.apache.spark.sql.DataFrame) = docs
        .selectExpr("doc_id", s"$w AS w")
        .selectExpr(Seq("doc_id", s"${dl.arrSize("w")} AS dl") ++
          Terms.zipWithIndex.map { case (t_, i) =>
            s"${dl.arrSize(dl.filt("w", "x_", s"x_ = '$t_'"))} AS tf$i"
          }: _*)
      def statsOf(tf: org.apache.spark.sql.DataFrame, sign: Int) = tf.selectExpr(
        Seq(s"count(*) * $sign AS nd", s"coalesce(sum(dl), 0) * $sign AS sdl") ++
          Terms.indices.map(i =>
            s"coalesce(sum(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END), 0) * $sign AS df$i"): _*)
      val docs = t(s, d, "documents").select("doc_id", "text")
      val anchor = tfOf(docs.filter(col("doc_id") % 5 =!= 0))
      val crawl = tfOf(docs.filter(col("doc_id") % 5 === 0))
      val takedown = tfOf(docs.filter(col("doc_id") % 7 === 0))
      // build: tf rows + the one-row stats aggregate of the anchor
      TableStore.publishFoldSnapshotDistinct(s, tfPath, anchor, "anchor")
      TableStore.publishFoldSnapshot(s, statsPath, statsOf(anchor, 1), "anchor")
      // crawl tick: O(batch) tf rows + ONE stats row
      TableStore.publishFoldDelta(s, tfPath,
        crawl.withColumn("_mult", lit(1L)), "crawl")
      TableStore.publishFoldDelta(s, statsPath,
        statsOf(crawl, 1).withColumn("_mult", lit(1L)), "crawl")
      // takedown tick: signed retraction, same O(batch)
      TableStore.publishFoldDelta(s, tfPath,
        takedown.withColumn("_mult", lit(-1L)), "takedown")
      TableStore.publishFoldDelta(s, statsPath,
        statsOf(takedown, -1).withColumn("_mult", lit(1L)), "takedown")
      // ---- the serving read: fold the KB-sized stats chain, fold the
      // tf rows, broadcast stats into the scoring map — t8's plan
      val stats = TableStore.readFoldedUnion(s, statsPath)
        .agg(sum(col("nd")).as("nd"),
          (sum(col("sdl")).as("sdl") +:
            Terms.indices.map(i => sum(col(s"df$i")).as(s"df$i"))): _*)
      val tfLive = TableStore.readFoldedUnion(s, tfPath)
        .groupBy("doc_id", (Seq("dl") ++ Terms.indices.map(i => s"tf$i")): _*)
        .agg(sum(col("_mult")).as("_m")).filter(col("_m") > 0)
      tfLive.crossJoin(broadcast(stats))
        .withColumn("avgdl", expr("cast(sdl as double) / cast(nd as double)"))
        .selectExpr("doc_id",
          s"round(${Terms.indices.map(i => bm25Term(s"tf$i", s"df$i")).mkString("(", "\n + ", ")")}, 6) AS score")
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }
  )
}
