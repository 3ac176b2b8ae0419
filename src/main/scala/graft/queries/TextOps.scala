package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.XSql
import graft.functions.XSql.{Dialect, Spark => SqlSpark, Duck => SqlDuck}

/** Text-analysis operators over the `documents` table — the pieces a
  * large-scale training-data pipeline needs: token counting, quality
  * scoring, language-ID heuristics, and document fingerprinting.
  *
  * Everything is a narrow per-row map (no shuffle except the final
  * presentation sort), so it scales linearly: at 100 TB these run as a
  * single parquet scan stage with whole-stage codegen, and the only
  * plan concern is input split sizing.
  *
  * Both the Spark expressions and the DuckDB oracle SQL are emitted
  * from [[graft.functions.XSql]] with the same constants, so results
  * are bit-identical (integer hashing; single-division doubles).
  */
object TextOps {

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single punct. */
  private val TokenRe = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  /** PII patterns, valid verbatim in BOTH Java regex and RE2: only
    * [.]/[0-9] character classes, no backslash escapes to diverge.
    */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
  private val PhoneRe = "[0-9]{3}-[0-9]{3}-[0-9]{4}"

  private val StopWords = Seq("the", "a", "and", "of", "to")

  /** Fixed marker-word lists for the language-ID heuristic (top
    * distinctive words per language measured on the corpus). On this
    * synthetic corpus all languages share one vocabulary, so accuracy
    * is inherently weak — the operator contract is determinism, and
    * the shape (argmax over per-language n-gram/marker scores) is the
    * real-world design.
    */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("customer", "hash", "join", "row", "column", "big"),
    "en" -> Seq("hash", "order", "table", "window", "row", "batch"),
    "es" -> Seq("slow", "agg", "hash", "merge", "vector", "value"),
    "fr" -> Seq("scan", "data", "batch", "query", "small", "join"),
    "zh" -> Seq("join", "small", "customer", "row", "column", "scan"))

  /** Predicted-language CASE expression over a words column named
    * `w` — shared with the corpus pipeline (CorpusOps).
    *
    * NOTE: this inlines the full marker-intersection expression into
    * every CASE comparison (~4 comparisons x 2 sides x 5 branches), so
    * each doc recomputes arrDistinct+arrIntersect ~dozens of times.
    * Fine for a one-off predicate; in a pipeline stage prefer
    * [[langScores]] materialized as columns once (see `s_<lang>`
    * pattern in t3 / c1) and [[predLangFromScores]] over them.
    */
  def predLangExpr(implicit d: Dialect): String = {
    val scores = langScores.map { case (l, e) => l -> e }.toMap
    argmaxCase(l => s"(${scores(l)})")
  }

  /** argmax CASE over already-materialized score columns `s_<lang>` —
    * the cheap form: each score is evaluated once per row upstream.
    */
  def predLangFromScores: String = argmaxCase(l => s"s_$l")

  private def strArr(vals: Seq[String])(implicit d: Dialect): String = {
    val quoted = vals.map(v => s"'$v'")
    d match {
      case SqlSpark => quoted.mkString("array(", ", ", ")")
      case SqlDuck  => quoted.mkString("[", ", ", "]")
    }
  }

  // Per-dialect fragments -------------------------------------------------

  private def wordsE(implicit d: Dialect) = XSql.words("text")

  private[queries] def langScores(implicit d: Dialect): Seq[(String, String)] =
    LangMarkers.map { case (lang, markers) =>
      lang -> s"${d.arrSize(d.arrIntersect(d.arrDistinct("w"), strArr(markers)))}"
    }

  /** argmax with ties broken by list order (de,en,es,fr,zh). */
  private def argmaxCase(scoreCol: String => String): String = {
    val langs = LangMarkers.map(_._1)
    // branch i fires iff lang i is the first index attaining the max;
    // if none of the first n-1 fire, the last lang is it → plain ELSE.
    val branches = langs.init.zipWithIndex.map { case (l, i) =>
      val geAll = langs.drop(i + 1).map(o => s"${scoreCol(l)} >= ${scoreCol(o)}")
      val gtPrev = langs.take(i).map(o => s"${scoreCol(l)} > ${scoreCol(o)}")
      s"WHEN ${(gtPrev ++ geAll).mkString(" AND ")} THEN '$l'"
    }
    s"CASE ${branches.mkString(" ")} ELSE '${langs.last}' END"
  }

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    Q("t1_token_count",
      "whitespace + BPE-ish regex token counting per document",
      s"""SELECT doc_id,
         |  len(list_filter(string_split(text, ' '), w_ -> w_ != '')) AS n_ws_tokens,
         |  len(regexp_extract_all(text, '$TokenRe')) AS n_re_tokens,
         |  n_chars
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        expr(s"size(${XSql.words("text")(SqlSpark)})").as("n_ws_tokens"),
        expr(s"size(regexp_extract_all(text, '$TokenRe', 0))").as("n_re_tokens"),
        col("n_chars"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    Q("t2_quality_score",
      "document quality scoring: word stats, stopword/alpha ratios",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH w AS (SELECT doc_id, text, n_chars, $wordsE AS w FROM documents)
           |SELECT doc_id,
           |  ${dl.arrSize("w")} AS n_words,
           |  cast(${dl.foldL(dl.xform("w", "w_", "cast(length(w_) as bigint)"), 0, "a_", "x_", "a_ + x_")} as double)
           |    / cast(${dl.arrSize("w")} as double) AS avg_word_len,
           |  cast(${dl.arrSize(dl.filt("w", "w_", s"list_contains(${strArr(StopWords)}, w_)"))} as double)
           |    / cast(${dl.arrSize("w")} as double) AS stopword_ratio,
           |  cast(length(regexp_replace(text, '[^a-z]', '', 'g')) as double)
           |    / cast(n_chars as double) AS alpha_ratio
           |FROM w ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      t(s, d, "documents")
        .withColumn("w", expr(wordsE))
        .select(
          col("doc_id"),
          expr(dl.arrSize("w")).as("n_words"),
          expr(s"cast(${dl.foldL(dl.xform("w", "w_", "bigint(length(w_))"), 0, "a_", "x_", "a_ + x_")} as double)" +
            s" / cast(${dl.arrSize("w")} as double)").as("avg_word_len"),
          expr(s"cast(${dl.arrSize(dl.filt("w", "w_", s"array_contains(${strArr(StopWords)}, w_)"))} as double)" +
            s" / cast(${dl.arrSize("w")} as double)").as("stopword_ratio"),
          expr(s"cast(length(regexp_replace(text, '[^a-z]', '')) as double)" +
            s" / cast(n_chars as double)").as("alpha_ratio"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    Q("t3_lang_id",
      "language-ID heuristic: argmax of per-language marker scores",
      {
        implicit val dl: Dialect = SqlDuck
        val scores = langScores.map { case (l, e) => s"$e AS s_$l" }.mkString(",\n  ")
        s"""WITH w AS (SELECT doc_id, lang, $wordsE AS w FROM documents),
           |s AS (SELECT doc_id, lang,
           |  $scores
           |FROM w)
           |SELECT doc_id, lang, ${argmaxCase(l => s"s_$l")} AS pred_lang,
           |  greatest(s_de, s_en, s_es, s_fr, s_zh) AS score
           |FROM s ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val base = t(s, d, "documents").withColumn("w", expr(wordsE))
      val scored = langScores.foldLeft(base) { case (df, (l, e)) =>
        df.withColumn(s"s_$l", expr(e))
      }
      scored.select(
        col("doc_id"), col("lang"),
        expr(argmaxCase(l => s"s_$l")).as("pred_lang"),
        greatest(LangMarkers.map(m => col(s"s_${m._1}")): _*).as("score"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Pretraining-style text normalization: strip everything outside
    // the lowercase-alpha+space alphabet, collapse runs of spaces,
    // trim — then account for what was removed and fingerprint the
    // cleaned form. Pure per-row map (no shuffle), identical regex
    // semantics in both engines (no lookaround, 'g' flag on the
    // oracle side since DuckDB replaces first-match by default).
    Q("t5_clean_text",
      "normalize text (strip non-alpha, collapse spaces) + removal stats + cleaned hash",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH c AS (
           |  SELECT doc_id, text,
           |    trim(regexp_replace(regexp_replace(text, '[^a-z ]', '', 'g'),
           |         ' +', ' ', 'g')) AS cleaned
           |  FROM documents)
           |SELECT doc_id,
           |  cast(length(text) - length(cleaned) as bigint) AS n_removed,
           |  cast(length(cleaned) as bigint) AS n_kept,
           |  ${XSql.charHash("cleaned")} AS cleaned_hash
           |FROM c ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      t(s, d, "documents")
        .withColumn("cleaned",
          trim(regexp_replace(regexp_replace(col("text"), "[^a-z ]", ""), " +", " ")))
        .select(col("doc_id"),
          (length(col("text")) - length(col("cleaned"))).cast("long").as("n_removed"),
          length(col("cleaned")).cast("long").as("n_kept"),
          expr(XSql.charHash("cleaned")).as("cleaned_hash"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Deterministic train/validation split: bucket by content hash, not
    // by random() — reproducible across runs/engines, stable under
    // re-partitioning, and duplicate documents land in the SAME split
    // (random splits leak near-dups across train/val).
    Q("t6_hash_split",
      "content-hash train/val split (95/5), deterministic across engines",
      {
        implicit val dl: Dialect = SqlDuck
        s"""SELECT doc_id,
           |  CASE WHEN ${XSql.charHash("text")} % 100 < 95 THEN 'train'
           |       ELSE 'val' END AS split
           |FROM documents ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      t(s, d, "documents")
        .select(col("doc_id"),
          when(expr(XSql.charHash("text")) % 100 < 95, "train")
            .otherwise("val").as("split"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // TF-IDF top-terms per document — the classic corpus-scoring
    // composition: explode to (doc, term), term frequencies, document
    // frequencies, idf join, rank per doc. Scores are ROUNDED to 6
    // decimals before ranking: ln() may differ by 1 ulp between libm
    // and the JVM, and ranking on the rounded score (term as tiebreak)
    // keeps the cross-engine order identical. At scale each stage is
    // a map-side-combinable aggregate; the df table (one row per
    // term) broadcasts into the scoring join.
    Q("t7_tfidf",
      "top-3 TF-IDF terms per document (rounded scores, deterministic ranking)",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH terms AS (
           |  SELECT doc_id, unnest(${XSql.words("text")}) AS term FROM documents),
           |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
           |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY 1),
           |n AS (SELECT count(*) AS n_docs FROM documents),
           |scored AS (
           |  SELECT tf.doc_id, tf.term,
           |    round(tf.tf * ln(cast(n.n_docs as double) / cast(df.df as double)), 6) AS score
           |  FROM tf JOIN df ON tf.term = df.term, n),
           |ranked AS (
           |  SELECT doc_id, term, score, row_number() OVER (
           |    PARTITION BY doc_id ORDER BY score DESC, term) AS rn
           |  FROM scored)
           |SELECT doc_id, rn AS rnk, term, score
           |FROM ranked WHERE rn <= 3 ORDER BY doc_id, rnk""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents")
      val terms = docs.select(col("doc_id"),
        explode(expr(XSql.words("text"))).as("term"))
      val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      tf.cache()
      // df derives from tf — one row per (doc, term) already — instead
      // of re-shuffling the full exploded term stream through a
      // distinct; at corpus scale that second shuffle is the job, and
      // the cache stops the explode+agg from running once per branch
      val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val scored = tf.join(broadcast(df), Seq("term"))
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("term"),
          round(col("tf") * log(col("n_docs").cast("double") / col("df").cast("double")), 6)
            .as("score"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      scored.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select("doc_id", "rnk", "term", "score")
        .orderBy("doc_id", "rnk")
    },

    // ---------------------------------------------------------------
    // n-gram counts — the LM-training counts table (tokenizer
    // training, contamination checks, stop-gram lists all read this).
    // Explode word bigrams, count, keep the head of the distribution.
    // Scale shape: one narrow map + one partial-agg shuffle; the
    // explode multiplies rows ~|doc| but the partial aggregate
    // collapses them map-side before anything moves.
    Q("t10_bigram_counts",
      "corpus bigram counts: top-100 word bigrams by frequency",
      {
        implicit val dl: Dialect = SqlDuck
        val w = XSql.words("text")
        val bigrams = dl.xform(dl.seq0(s"${dl.arrSize("w")} - 1"), "i_",
          s"${dl.idx("w", "i_")} || ' ' || ${dl.idx("w", "i_ + 1")}")
        s"""WITH w AS (SELECT doc_id, $w AS w FROM documents),
           |bg AS (SELECT unnest($bigrams) AS bigram FROM w)
           |SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
           |ORDER BY n DESC, bigram LIMIT 100""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val bigrams = dl.xform(dl.seq0(s"${dl.arrSize("w")} - 1"), "i_",
        s"concat(${dl.idx("w", "i_")}, ' ', ${dl.idx("w", "i_ + 1")})")
      t(s, d, "documents")
        .withColumn("w", expr(XSql.words("text")))
        .select(explode(expr(bigrams)).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(100)
    },

    // ---------------------------------------------------------------
    // Sample packing — the batch-assembly step between a cleaned
    // corpus and a training run: docs are packed greedily (in a fixed
    // deterministic order) into 4096-token context windows per
    // language; bin k = docs whose running token total lands in
    // (k*4096, (k+1)*4096]. The output is the packing manifest: docs
    // and token fill per (lang, bin).
    // Scale shape: ONE running-sum window per lang partition — the
    // same shuffle the per-lang groupBy needs anyway; no self-join,
    // no iteration. (True offline bin-packing is NP-hard; streaming
    // greedy-by-order is what training pipelines actually run, and a
    // fixed order is what makes the manifest reproducible.)
    Q("t12_sequence_packing",
      "greedy 4096-token context packing per language: docs/tokens per bin",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH d AS (
           |  SELECT lang, doc_id, ${dl.arrSize(XSql.words("text"))} AS n_tokens
           |  FROM documents),
           |c AS (
           |  SELECT lang, n_tokens,
           |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
           |  FROM d WHERE n_tokens > 0)
           |SELECT lang, cast(floor(cast(run - 1 as double) / 4096) as bigint) AS bin,
           |  count(*) AS n_docs, cast(sum(n_tokens) as bigint) AS total_tokens
           |FROM c
           |GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      implicit val dl: Dialect = SqlSpark
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // packable docs are selected BEFORE the running sum in BOTH
      // dialects — an unpackable row (0 tokens, or NULL text where
      // size() is -1 with ANSI off but SQL sum() skips NULL) must not
      // shift every later doc's bin
      t(s, d, "documents")
        .selectExpr("lang", "doc_id",
          s"${dl.arrSize(XSql.words("text"))} AS n_tokens")
        .filter(col("n_tokens") > 0)
        .withColumn("run", sum(col("n_tokens")).over(w))
        // (run-1) div 4096: a doc ENDING exactly on a window boundary
        // still belongs to the window it filled, not the next one
        .withColumn("bin", floor((col("run") - 1).cast("double") / 4096).cast("long"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"))
        .orderBy("lang", "bin")
    },

    // ---------------------------------------------------------------
    // t12's manifest again, computed WITHOUT the per-language window:
    // `sum OVER (PARTITION BY lang ORDER BY doc_id)` puts each
    // language in ONE task, so the dominant language of a 100 TB
    // corpus (English, typically >half the rows) serializes onto a
    // single core no matter the cluster size. PrefixSum.runningSum is
    // the two-pass distributed scan instead: range-repartition by
    // (lang, doc_id) into balanced slices, window per (slice, lang)
    // — never per whole language — then per-slice totals (rows =
    // slices x langs, not data) cumulated and broadcast back as
    // offsets. Same oracle as t12 proves the rewrite is exact; the
    // skew ceiling is gone. PrefixSumSpec additionally pins that the
    // scan actually SPLITS a language across slices.
    Q("t12b_packing_distributed",
      "t12's packing manifest via the two-pass distributed prefix scan (no per-language single-task window)",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH d AS (
           |  SELECT lang, doc_id, ${dl.arrSize(XSql.words("text"))} AS n_tokens
           |  FROM documents),
           |c AS (
           |  SELECT lang, n_tokens,
           |    sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
           |  FROM d WHERE n_tokens > 0)
           |SELECT lang, cast(floor(cast(run - 1 as double) / 4096) as bigint) AS bin,
           |  count(*) AS n_docs, cast(sum(n_tokens) as bigint) AS total_tokens
           |FROM c
           |GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val docs = t(s, d, "documents")
        .selectExpr("lang", "doc_id",
          s"${dl.arrSize(XSql.words("text"))} AS n_tokens")
        .filter(col("n_tokens") > 0)
      graft.operators.PrefixSum
        .runningSum(docs, Seq("lang"), "doc_id", "n_tokens", "run", slices = 8)
        .withColumn("bin", floor((col("run") - 1).cast("double") / 4096).cast("long"))
        .groupBy("lang", "bin")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"))
        .orderBy("lang", "bin")
    },

    // ---------------------------------------------------------------
    // Concat-and-chunk packing — the OTHER packing discipline (t12
    // bins whole docs greedily; GPT-style pretraining instead
    // CONCATENATES the corpus in a fixed order and SPLITS it into
    // exact context-length chunks, docs crossing boundaries). The
    // manifest per chunk — docs touched, first/last doc, token fill —
    // is what a loader needs to materialize any chunk independently.
    // Global token offsets come from the SAME distributed prefix scan
    // as t12b, with NO partition column (the whole corpus is one
    // ordered sequence — precisely the case a plain global-ORDER-BY
    // window cannot survive: one task holds everything); each doc
    // then explodes to the <= len/L + 1 chunks it overlaps (a bounded
    // sequence(), never corpus x chunks), and every chunk is exactly
    // L tokens except the final partial — asserted by the oracle's
    // chunk_tokens column.
    Q("t43_concat_chunks",
      "GPT-style concat-and-chunk packing manifest: global distributed token offsets, docs split across 2048-token chunks",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH d AS (
           |  SELECT doc_id, cast(${dl.arrSize(wordsE)} AS BIGINT) AS n_tokens
           |  FROM documents),
           |c AS (
           |  SELECT doc_id, n_tokens,
           |    sum(n_tokens) OVER (ORDER BY doc_id
           |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
           |  FROM d WHERE n_tokens > 0),
           |s AS (SELECT doc_id, end_off, end_off - n_tokens AS start_off FROM c),
           |x AS (
           |  SELECT doc_id, start_off, end_off,
           |    unnest(generate_series(
           |      cast(floor(cast(start_off as double) / 2048) as bigint),
           |      cast(floor(cast(end_off - 1 as double) / 2048) as bigint))) AS chunk
           |  FROM s)
           |SELECT chunk, count(*) AS n_docs,
           |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
           |  cast(sum(least(end_off, (chunk + 1) * 2048)
           |    - greatest(start_off, chunk * 2048)) AS BIGINT) AS chunk_tokens
           |FROM x GROUP BY 1 ORDER BY chunk""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val L = 2048L
      val docs = t(s, d, "documents")
        .selectExpr("doc_id",
          s"cast(${dl.arrSize(wordsE)} AS BIGINT) AS n_tokens")
        .filter(col("n_tokens") > 0)
      graft.operators.PrefixSum
        .runningSum(docs, Seq.empty, "doc_id", "n_tokens", "end_off", slices = 8)
        .withColumn("start_off", col("end_off") - col("n_tokens"))
        .withColumn("chunk", explode(sequence(
          floor(col("start_off").cast("double") / L).cast("long"),
          floor((col("end_off") - 1).cast("double") / L).cast("long"))))
        .groupBy("chunk")
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"),
          sum(least(col("end_off"), (col("chunk") + 1) * L)
            - greatest(col("start_off"), col("chunk") * L))
            .cast("long").as("chunk_tokens"))
        .orderBy("chunk")
    },

    // ---------------------------------------------------------------
    // Deterministic per-epoch shuffles — multi-epoch pretraining needs
    // a DIFFERENT but REPRODUCIBLE document order every epoch (the
    // dataloader contract: epoch k's permutation is a pure function of
    // (seed, epoch), resumable mid-epoch on any worker). The ordering
    // key is a multiplicative hash of (doc_id, epoch) — integer-exact
    // in both engines, no RNG state anywhere — and "shuffling" at
    // 100 TB is exactly ONE range-partitioned sort by that key (what a
    // distributed shuffle physically is). The gate reads each epoch's
    // first 5 documents through a per-epoch top-k, and the plan must
    // use WindowGroupLimit (per-partition rank pruning before the
    // final per-epoch sort) — a global sort of epochs × corpus to
    // answer a top-5 probe would be the wrong plan at any scale. Three
    // epochs land three disjoint permutations of the same multiset;
    // the oracle pins every rank and hash value cell-exact.
    Q("t44_epoch_shuffle",
      "seeded multi-epoch shuffle: (seed, epoch)-keyed permutation, top-5 probe per epoch via WindowGroupLimit",
      """WITH e AS (SELECT unnest([0, 1, 2]) AS epoch),
        |h AS (
        |  SELECT epoch, doc_id,
        |    ((doc_id % 1000003) * 2654435761
        |      + (epoch + 1) * 40503) % 4294967296 AS hk
        |  FROM documents, e),
        |r AS (
        |  SELECT epoch, doc_id, hk,
        |    row_number() OVER (PARTITION BY epoch ORDER BY hk, doc_id) AS rn
        |  FROM h)
        |SELECT epoch, rn, doc_id, hk FROM r WHERE rn <= 5
        |ORDER BY epoch, rn""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val epochs = explode(array(lit(0), lit(1), lit(2))).as("epoch")
      val keyed = t(s, d, "documents").select(col("doc_id"))
        .select(col("doc_id"), epochs)
        .withColumn("hk",
          ((col("doc_id") % lit(1000003L)) * lit(2654435761L)
            + (col("epoch") + 1).cast("long") * lit(40503L)) % lit(4294967296L))
      val probe = keyed
        .withColumn("rn", row_number().over(
          Window.partitionBy("epoch").orderBy(col("hk"), col("doc_id"))))
        .filter(col("rn") <= 5)
        .select(col("epoch"), col("rn").cast("long").as("rn"),
          col("doc_id"), col("hk"))
      val plan = probe.queryExecution.executedPlan.toString
      require(plan.contains("WindowGroupLimit"),
        s"t44: per-epoch top-k must prune via WindowGroupLimit, not rank " +
          s"the full corpus per epoch:\n$plan")
      probe.orderBy("epoch", "rn")
    },

    // ---------------------------------------------------------------
    // PII scrubbing — the redaction pass every crawl corpus goes
    // through before training. The synthetic corpus carries no PII,
    // so emails/phones are SEEDED deterministically in-query (emails
    // on doc_id%3=0, phones on doc_id%4=1 — same CASE first-match in
    // both dialects) and then redacted. Patterns use only [.]/[0-9]
    // character classes — no backslash escapes — so the SAME pattern
    // string is valid Java regex (Spark) and RE2 (DuckDB); DuckDB's
    // regexp_replace needs the 'g' flag to match Spark's replace-all.
    // Gated: match counts + md5 of the scrubbed text (both engines
    // hash UTF-8 to lowercase hex). Scale shape: pure per-row map —
    // one scan stage, no shuffle except the presentation sort.
    Q("t13_pii_scrub",
      "seeded email/phone redaction: match counts + md5 of scrubbed text",
      s"""WITH seeded AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 3 = 0 THEN text || ' contact user'
         |           || cast(doc_id as varchar) || '@mail.example.com'
         |         WHEN doc_id % 4 = 1 THEN text || ' call 555-'
         |           || lpad(cast(doc_id % 1000 as varchar), 3, '0') || '-'
         |           || lpad(cast(doc_id % 10000 as varchar), 4, '0')
         |         ELSE text END AS raw
         |  FROM documents)
         |SELECT doc_id,
         |  cast(len(regexp_extract_all(raw, '$EmailRe')) as bigint) AS n_emails,
         |  cast(len(regexp_extract_all(raw, '$PhoneRe')) as bigint) AS n_phones,
         |  md5(regexp_replace(regexp_replace(raw, '$EmailRe', '<EMAIL>', 'g'),
         |                     '$PhoneRe', '<PHONE>', 'g')) AS clean_md5
         |FROM seeded ORDER BY doc_id""".stripMargin) { (s, d) =>
      val raw = when(col("doc_id") % 3 === 0,
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@mail.example.com")))
        .when(col("doc_id") % 4 === 1,
          concat(col("text"), lit(" call 555-"),
            lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"), raw.as("raw"))
        .select(col("doc_id"),
          regexp_count(col("raw"), lit(EmailRe)).cast("long").as("n_emails"),
          regexp_count(col("raw"), lit(PhoneRe)).cast("long").as("n_phones"),
          md5(regexp_replace(regexp_replace(col("raw"), EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>")).as("clean_md5"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Repetition signals (the Gopher quality rules): duplicate-word
    // fraction and top-bigram fraction per document — the filters
    // that catch boilerplate and template spam in crawl data. The
    // per-row stats (word count, distinct words) never shuffle; the
    // bigram head count explodes to (doc, bigram) and collapses
    // through TWO map-side-combinable aggregates keyed by doc_id,
    // then joins back on doc_id. At 100 TB the explode multiplies
    // rows ~|doc| but partial aggregation collapses them before the
    // exchange, and no state ever exceeds one doc's bigram set.
    Q("t14_repetition",
      "Gopher repetition signals: dup-word + top-bigram fractions per doc",
      {
        implicit val dl: Dialect = SqlDuck
        val w = XSql.words("text")
        val bigrams = dl.xform(dl.seq0(s"${dl.arrSize("w")} - 1"), "i_",
          s"${dl.idx("w", "i_")} || ' ' || ${dl.idx("w", "i_ + 1")}")
        s"""WITH w AS (SELECT doc_id, $w AS w FROM documents),
           |bg AS (SELECT doc_id, unnest($bigrams) AS bigram FROM w),
           |bc AS (SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY 1, 2),
           |bs AS (SELECT doc_id, max(c) AS top_c,
           |               cast(sum(c) as bigint) AS tot_c FROM bc GROUP BY 1)
           |SELECT w.doc_id, len(w.w) AS n_words,
           |  len(list_distinct(w.w)) AS n_distinct,
           |  round(1 - cast(len(list_distinct(w.w)) as double)
           |            / cast(len(w.w) as double), 6) AS dup_word_frac,
           |  round(cast(bs.top_c as double) / cast(bs.tot_c as double), 6)
           |    AS top_bigram_frac
           |FROM w JOIN bs ON w.doc_id = bs.doc_id ORDER BY w.doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val bigrams = dl.xform(dl.seq0(s"${dl.arrSize("w")} - 1"), "i_",
        s"concat(${dl.idx("w", "i_")}, ' ', ${dl.idx("w", "i_ + 1")})")
      val docs = t(s, d, "documents").withColumn("w", expr(XSql.words("text")))
      val perRow = docs.select(col("doc_id"),
        size(col("w")).cast("long").as("n_words"),
        size(array_distinct(col("w"))).cast("long").as("n_distinct"))
      val bs = docs.select(col("doc_id"), explode(expr(bigrams)).as("bigram"))
        .groupBy("doc_id", "bigram").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max("c").as("top_c"), sum("c").as("tot_c"))
      perRow.join(bs, Seq("doc_id"))
        .select(col("doc_id"), col("n_words"), col("n_distinct"),
          round(lit(1) - col("n_distinct").cast("double")
            / col("n_words").cast("double"), 6).as("dup_word_frac"),
          round(col("top_c").cast("double")
            / col("tot_c").cast("double"), 6).as("top_bigram_frac"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    Q("t4_fingerprint",
      "winnowing fingerprints: rolling 8-gram char hashes, window-4 minima (CSV-flattened for the gate)",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH f AS (SELECT doc_id, ${XSql.winnowText("text")} AS fp FROM documents)
           |SELECT doc_id, len(fp) AS n_fp,
           |  array_to_string(list_transform(fp, x_ -> cast(x_ as varchar)), ',') AS fp_csv
           |FROM f ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      t(s, d, "documents")
        .withColumn("fp", expr(XSql.winnowText("text")))
        .select(col("doc_id"), size(col("fp")).cast("long").as("n_fp"),
          expr("array_join(transform(fp, x_ -> cast(x_ as string)), ',')").as("fp_csv"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Statistical LM quality scoring — the CCNet-style "perplexity
    // filter" shape that t2's heuristics don't cover: train a
    // character-bigram model ON the corpus itself (one aggregate),
    // broadcast it back, and score each document by its average
    // ln(count+1) bigram familiarity — documents full of bigrams the
    // corpus has rarely seen (mojibake, binary spill, wrong-language
    // fragments) score low and get filtered. Per-doc sums go through
    // the decimal-exact dsum discipline: each ln value is bit-identical
    // cross-engine, and the decimal sum is order-free, so the ×1e6
    // rounding cannot be flipped by partial-aggregation order.
    // Scale: ONE scan trains the model (bigram vocabulary is tiny —
    // printable-pairs — so the count table broadcasts), one scan
    // scores; both narrow explodes, both map-side combinable.
    Q("t28_lm_quality_score",
      "self-trained char-bigram familiarity score per doc (CCNet-style statistical quality filter)",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH pos AS (
           |  SELECT doc_id, substr(text, cast(i + 1 as int), 2) AS bg
           |  FROM documents, (SELECT unnest(${SqlDuck.seq0("length(text) - 1")}) AS i)
           |  WHERE length(text) >= 2),
           |model AS (SELECT bg, count(*) AS c FROM pos GROUP BY bg),
           |scored AS (
           |  SELECT p.doc_id,
           |    count(*) AS n_bigrams,
           |    ${dsumSql("ln(cast(m.c + 1 as double))", 12)} AS s
           |  FROM pos p JOIN model m ON p.bg = m.bg
           |  GROUP BY p.doc_id)
           |SELECT doc_id, n_bigrams,
           |  cast(round(s / cast(n_bigrams as double) * 1000000) as bigint) AS score_e6
           |FROM scored ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.GraftColumnBridge
      import graft.functions.{BigramCounts, BigramLmScore}
      val docs = t(s, d, "documents")
        .filter(length(col("text")) >= 2)
        .select(col("doc_id"), col("text"))
      // the char-bigram model is VOCABULARY-bounded (alphabet², a few
      // hundred rows here, ≤64k for full byte pairs at any corpus
      // size), so it collects to the driver and ships inside the
      // scoring expression — the CCNet discipline of training the LM
      // once and broadcasting it. BOTH corpus passes run compressed:
      // the model pass pre-aggregates bigrams INSIDE each row
      // (graft_bigram_counts — distinct-bigram entries leave the
      // projection, not per-position rows) and combines map-side to
      // the vocabulary; the scoring pass is one narrow generated
      // projection per doc (BigramLmScore — decimal-exact integer
      // multiples of the per-occurrence dsum terms, zero Exchange
      // before the final sort), where the old shape exploded the
      // corpus to per-position rows TWICE.
      val model: Map[String, Long] = docs
        .select(explode(GraftColumnBridge.column(
          BigramCounts(GraftColumnBridge.expression(col("text"))))).as("e"))
        .groupBy(col("e.bg").as("bg"))
        .agg(sum(col("e.n")).as("c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      docs
        .select(col("doc_id"), GraftColumnBridge.column(BigramLmScore(
          GraftColumnBridge.expression(col("text")), model)).as("sc"))
        .select(col("doc_id"), col("sc.n_bigrams").as("n_bigrams"),
          round(col("sc.s") / col("sc.n_bigrams").cast("double") * 1000000)
            .cast("long").as("score_e6"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Vocabulary coverage / OOV rate — the tokenizer-fit check every
    // training pipeline runs before committing to a vocab: build the
    // top-K vocabulary from the corpus itself (count desc, word asc —
    // the tie-break makes the boundary deterministic), then score
    // every document by its out-of-vocabulary token fraction. Shape:
    // one explode + one keyed count for the vocab (map-side
    // combinable), then the corpus re-probes the vocab through a
    // BROADCAST left join — the vocab is K rows no matter how big the
    // corpus, so the probe never shuffles the token stream a second
    // time. High-OOV docs are the ones a fixed tokenizer would
    // shred into bytes — the list this query ends with is the
    // filter/re-train candidate set.
    Q("t29_vocab_coverage",
      "top-50 corpus vocab + per-doc OOV token fraction via broadcast probe",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH wd AS (SELECT doc_id, unnest($wordsE) AS w FROM documents),
           |cnt AS (SELECT w, count(*) AS c FROM wd GROUP BY w),
           |voc AS (SELECT w FROM cnt ORDER BY c DESC, w LIMIT 50),
           |per AS (SELECT wd.doc_id, count(*) AS n_tokens,
           |          count(*) FILTER (WHERE voc.w IS NULL) AS n_oov
           |        FROM wd LEFT JOIN voc ON wd.w = voc.w GROUP BY wd.doc_id)
           |SELECT doc_id, n_tokens, n_oov,
           |  round(cast(n_oov AS double) / cast(n_tokens AS double), 6) AS oov_frac
           |FROM per ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val wd = t(s, d, "documents")
        .select(col("doc_id"), explode(expr(XSql.words("text"))).as("w"))
      val voc = wd.groupBy("w").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("w")).limit(50)
        .select(col("w"), lit(1).as("in_voc"))
      wd.join(broadcast(voc), Seq("w"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          count(when(col("in_voc").isNull, 1)).as("n_oov"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)
            .as("oov_frac"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Character-entropy quality signal — the compression-ratio proxy
    // in the Gopher/MassiveText rule family: natural prose sits in a
    // mid-entropy band; keyboard mash and minified blobs score high,
    // template spam and char-runs score low. Per-doc Shannon entropy
    // H = ln(n) − (Σ c·ln c)/n over the doc's char histogram. The
    // histogram is row-local, so the Spark side computes it in a
    // single codegen'd expression (graft_char_entropy) with NO
    // shuffle at all; the oracle keeps the explode+group formulation
    // (DuckDB has no such scalar). The per-term decimal(30,12)
    // rounding inside the expression reproduces dsum (t28's
    // discipline) bit-for-bit, and ln/division are per-row IEEE on
    // exact counts — deterministic in both engines.
    Q("t30_char_entropy",
      "per-doc character Shannon entropy (compression-ratio quality proxy)",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH ch AS (SELECT doc_id, unnest(${SqlDuck.chars("text")}) AS c
           |            FROM documents),
           |cc AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c),
           |e AS (SELECT doc_id, cast(sum(k) AS BIGINT) AS n,
           |        count(*) AS n_distinct,
           |        ${dsumSql("k * ln(cast(k AS double))", 12)} AS s
           |      FROM cc GROUP BY doc_id)
           |SELECT doc_id, n, n_distinct,
           |  cast(round((ln(cast(n AS double)) - s / cast(n AS double))
           |    * 1000000) AS BIGINT) AS entropy_e6
           |FROM e ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      // Row-local: the whole histogram + Σ k·ln(k) happens inside ONE
      // generated projection (graft.functions.CharEntropy) — zero
      // Exchange before the final sort, vs the naive explode-and-
      // shuffle of (doc_id, char) pairs. The expression rounds each
      // term to decimal(30,12) and sums exactly, so it hash-matches
      // the oracle's dsum to the bit. NULL text vanishes from the
      // explode plan's output (explode of null = no rows), so filter
      // it; empty text is one empty-string "char" in both engines.
      t(s, d, "documents")
        .where(col("text").isNotNull)
        .select(col("doc_id"), expr("graft_char_entropy(text)").as("e"))
        .select(col("doc_id"), col("e.n").as("n"),
          col("e.n_distinct").as("n_distinct"),
          round((log(col("e.n").cast("double")) - col("e.s") / col("e.n").cast("double"))
            * 1000000).cast("long").as("entropy_e6"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // BPE tokenizer TRAINING — the greedy pair-merge loop (Sennrich et
    // al.) that fits a subword vocabulary to the corpus, run for
    // BpeRounds merges. The scalable decomposition is the one every
    // production trainer (HF tokenizers, SentencePiece-BPE) uses:
    // collapse the corpus to its WORD-FREQUENCY table first — one
    // map-side-combinable shuffle over the raw text, after which all
    // training touches only the bounded vocabulary (capped at the
    // top-BpeVocabCap words by count; the cap is the trainer's own
    // max_vocab discipline and what keeps the iteration state KB-sized
    // at 100 TB). Each merge round is then: adjacent-symbol pair
    // counts weighted by word frequency (ONE tiny aggregate), argmax
    // pair by (count desc, pair asc) — a total order, so the trained
    // merge table is deterministic — and a leftmost-non-overlapping
    // replace applied to every word's symbol sequence (space-anchored
    // string replace: both engines scan left-to-right without
    // overlap, which is exactly BPE's greedy application order). The
    // merge scalar rides a broadcast into the next round; nothing ever
    // rescans the corpus after the first aggregate.
    Q("t31_bpe_train",
      s"BPE tokenizer training: ${BpeRounds} greedy pair merges over the capped word-frequency table",
      {
        implicit val dl: Dialect = SqlDuck
        val outs = (1 to BpeRounds).map(r =>
          s"""SELECT $r AS merge_round, pair AS merge_pair,
             |  replace(pair, ' ', '') AS new_token, cnt AS pair_count FROM m$r""".stripMargin)
        "WITH " + bpeTrainCtes.mkString(",\n") +
          "\nSELECT * FROM (" + outs.mkString(" UNION ALL ") + ") ORDER BY merge_round"
      }) { (s, d) =>
      // ONE distributed aggregate collapses the corpus to word counts;
      // the merge loop fits at the driver on the hard-capped candidate
      // vocabulary (≤ BpeVocabCap rows — KMeans.trainLocal's bounded-
      // set discipline; iterating tiny merge rounds as cluster jobs
      // would pay a shuffle + broadcast stage per merge)
      import s.implicits._
      trainedMerges(s, d)
        .map(m => (m.round, m.pair, m.token, m.count))
        .toDF("merge_round", "merge_pair", "new_token", "pair_count")
        .orderBy("merge_round")
    },

    // ---------------------------------------------------------------
    // BPE ENCODING — the other half of the tokenizer loop: apply
    // t31's trained merges to EVERY document and account the result
    // (per-doc token counts + compression vs the char baseline — the
    // numbers a data pipeline reports when sizing a training run).
    // The merge table re-derives in-plan (same bounded chain; the
    // word-count exchange is reused at runtime) and lands on the scan
    // as ONE broadcast row of 6 merge scalars. Application is
    // row-local: a per-word lambda chains the 6 space-anchored
    // replaces inside a single projection — no explode, no shuffle;
    // the only exchange after training is the final sort. At 100 TB
    // the encode pass is embarrassingly parallel, which is exactly
    // what makes BPE the tokenizer of scale.
    Q("t32_bpe_encode",
      s"apply the ${BpeRounds} trained BPE merges corpus-wide: per-doc token counts, row-local",
      {
        implicit val dl: Dialect = SqlDuck
        val mrow = "SELECT " + (1 to BpeRounds).map(r => s"m$r.pair AS p$r")
          .mkString(", ") + " FROM " + (1 to BpeRounds).map(r => s"m$r").mkString(", ")
        s"""WITH ${bpeTrainCtes.mkString(",\n")},
           |mrow AS ($mrow)
           |SELECT doc_id,
           |  ${dl.arrSize("w")} AS n_words,
           |  cast(${sumTokens("w", oraclePairCols)} AS BIGINT) AS n_tokens,
           |  cast(${sumChars("w")} AS BIGINT) AS n_word_chars,
           |  cast((1000000 * ${sumTokens("w", oraclePairCols)}) // greatest(${sumChars("w")}, 1) AS BIGINT)
           |    AS tokens_per_char_e6
           |FROM (SELECT doc_id, $wordsE AS w FROM documents), mrow
           |ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      // train locally on the bounded vocab (t31's path), then encode
      // the corpus with the merges as expression CONSTANTS through the
      // NATIVE graft_bpe_stats call (same replace-chain semantics as
      // the oracle's lambda fold, codegen'd — the interpreted HOF form
      // was the doc-family's worst measured scale ratio) — the whole
      // encode is one narrow projection per doc, zero exchange before
      // the final sort
      val pairs = trainedMerges(s, d).map(m => sqlLit(m.pair))
        .mkString("array(", ", ", ")")
      t(s, d, "documents")
        .select(col("doc_id"), expr(wordsE).as("w"))
        .select(col("doc_id"), col("w"),
          expr(s"graft_bpe_stats(w, $pairs)").as("bs"))
        .select(col("doc_id"),
          expr(dl.arrSize("w")).as("n_words"),
          col("bs.n_tokens").as("n_tokens"),
          col("bs.n_chars").as("n_word_chars"),
          expr("cast((1000000 * bs.n_tokens) div greatest(bs.n_chars, 1) AS BIGINT)")
            .as("tokens_per_char_e6"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Repetition RUNS — the remaining Gopher repetition rule t14's two
    // signals (dup-word fraction, top-bigram fraction) don't cover:
    // the longest run of consecutively repeated words ("the the the")
    // catches generation loops and boilerplate stutter that global
    // fractions dilute on long documents. Entirely row-local (one
    // indexed transform + one packed-accumulator fold inside a single
    // projection) — zero exchange before the presentation sort, so at
    // 100 TB this is a free rider on any existing corpus scan.
    Q("t33_repetition_runs",
      "longest consecutive repeated-word run per doc (Gopher loop/stutter rule), row-local",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH w AS (SELECT doc_id, $wordsE AS w FROM documents)
           |SELECT doc_id, ${dl.arrSize("w")} AS n_words,
           |  ${maxRunExpr("w")} AS max_run,
           |  CASE WHEN ${maxRunExpr("w")} >= 3 THEN 1 ELSE 0 END AS flagged
           |FROM w ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      t(s, d, "documents")
        .select(col("doc_id"), expr(wordsE).as("w"))
        .select(col("doc_id"),
          expr(dl.arrSize("w")).as("n_words"),
          expr(maxRunExpr("w")).as("max_run"),
          expr(s"CASE WHEN ${maxRunExpr("w")} >= 3 THEN 1 ELSE 0 END")
            .as("flagged"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Tokenizer FERTILITY report — the per-language eval every
    // multilingual tokenizer ships with (tokens/word and tokens/char
    // by language): a tokenizer trained on a skewed mix over-segments
    // the under-represented languages, and this table is how that is
    // detected (high fertility = the language pays more sequence
    // positions per unit of text = effectively less context). Shape:
    // t32's row-local encode (merges as broadcast-free expression
    // constants from the bounded t31 fit) feeding ONE map-side-
    // combinable per-language aggregate — integer sums end to end,
    // ratios as e6 integer division, so the gate is exact. At 100 TB
    // this is a free rider on the encode pass the pipeline already
    // runs.
    Q("t34_tokenizer_fertility",
      "per-language BPE fertility: tokens/word and tokens/char by lang from the trained merges",
      {
        implicit val dl: Dialect = SqlDuck
        val mrow = "SELECT " + (1 to BpeRounds).map(r => s"m$r.pair AS p$r")
          .mkString(", ") + " FROM " + (1 to BpeRounds).map(r => s"m$r").mkString(", ")
        s"""WITH ${bpeTrainCtes.mkString(",\n")},
           |mrow AS ($mrow),
           |enc AS (SELECT lang,
           |    ${dl.arrSize("w")} AS n_words,
           |    cast(${sumTokens("w", oraclePairCols)} AS BIGINT) AS n_tokens,
           |    cast(${sumChars("w")} AS BIGINT) AS n_chars
           |  FROM (SELECT lang, $wordsE AS w FROM documents), mrow)
           |SELECT lang, count(*) AS n_docs,
           |  cast(sum(n_words) AS BIGINT) AS total_words,
           |  cast(sum(n_tokens) AS BIGINT) AS total_tokens,
           |  cast(sum(n_chars) AS BIGINT) AS total_chars,
           |  cast((1000000 * sum(n_tokens)) // greatest(sum(n_words), 1) AS BIGINT)
           |    AS tokens_per_word_e6,
           |  cast((1000000 * sum(n_tokens)) // greatest(sum(n_chars), 1) AS BIGINT)
           |    AS tokens_per_char_e6
           |FROM enc GROUP BY lang ORDER BY lang""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val pairs = trainedMerges(s, d).map(m => sqlLit(m.pair))
        .mkString("array(", ", ", ")")
      t(s, d, "documents")
        .select(col("lang"), expr(wordsE).as("w"))
        .select(col("lang"), col("w"),
          expr(s"graft_bpe_stats(w, $pairs)").as("bs"))
        .select(col("lang"),
          expr(dl.arrSize("w")).as("n_words"),
          col("bs.n_tokens").as("n_tokens"),
          col("bs.n_chars").as("n_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_words").cast("long").as("total_words"),
          sum("n_tokens").cast("long").as("total_tokens"),
          sum("n_chars").cast("long").as("total_chars"))
        .select(col("lang"), col("n_docs"), col("total_words"),
          col("total_tokens"), col("total_chars"),
          expr("cast((1000000 * total_tokens) div greatest(total_words, 1) AS BIGINT)")
            .as("tokens_per_word_e6"),
          expr("cast((1000000 * total_tokens) div greatest(total_chars, 1) AS BIGINT)")
            .as("tokens_per_char_e6"))
        .orderBy("lang")
    },

    // ---------------------------------------------------------------
    // Quality RULE BUNDLE — the Gopher/C4-style composite filter as
    // one verdict per document: the individual signals (t2's ratios,
    // t14's repetition, t33's runs) each exist as diagnostics, but a
    // pipeline filters on a BUNDLE with a reason trail — which rule
    // killed the doc decides what to tune. Six rules, every threshold
    // tested by INTEGER cross-multiplication (2·Σlen ≤ … ≤ 12·Σlen
    // instead of a float mean), so the verdict is bit-exact across
    // engines with no ratio rounding anywhere. Entirely row-local —
    // one corpus scan, zero exchange before the presentation sort: at
    // 100 TB the whole gate is a free rider on the ingest scan, and
    // the reason bitmask aggregates into the per-rule kill report
    // downstream dashboards want.
    Q("t35_quality_gate",
      "Gopher/C4 rule bundle: 6 integer-exact row-local rules, reason bitmask, keep verdict",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH w AS (SELECT doc_id, text, n_chars, $wordsE AS w FROM documents)
           |SELECT doc_id, ${qgRules.map { case (n, e) => s"$e AS $n" }.mkString(",\n  ")},
           |  ${qgMask} AS fail_mask,
           |  CASE WHEN ${qgMask} = 0 THEN 1 ELSE 0 END AS keep
           |FROM w ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      t(s, d, "documents")
        .withColumn("w", expr(wordsE))
        .select(Seq(col("doc_id")) ++
          qgRules.map { case (n, e) => expr(e).as(n) } ++
          Seq(expr(qgMask).as("fail_mask"),
            expr(s"CASE WHEN ${qgMask} = 0 THEN 1 ELSE 0 END").as("keep")): _*)
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // FIM (fill-in-the-middle) transform — the pretraining data op
    // behind infilling-capable models (Bavarian et al. 2022): each
    // document splits into prefix/middle/suffix at deterministic word
    // thirds and re-serializes with sentinel tokens in PSM or SPM
    // order (alternated by doc parity, the 50/50 mix the paper
    // recommends). The op is a pure row-local rewrite — one scan,
    // zero exchange before the presentation sort — and carries its
    // own LOSSLESSNESS gate in-query: the three pieces, reassembled
    // in source order, must equal the original word sequence for
    // every document (roundtrip_ok), because FIM corrupting content
    // silently is the failure mode that poisons a training run. Docs
    // under 6 words pass through as RAW (nothing sensible to infill).
    Q("t36_fim_transform",
      "fill-in-middle rewrite: PSM/SPM split at word thirds + in-query losslessness gate",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH w AS (SELECT doc_id, $wordsE AS w FROM documents),
           |c AS (SELECT doc_id, w, ${dl.arrSize("w")} AS n,
           |        ${fimCut} AS p FROM w),
           |f AS (SELECT doc_id, n, p,
           |        ${fimPieces("w")},
           |        CASE WHEN n < 6 THEN 'RAW'
           |             WHEN doc_id % 2 = 0 THEN 'PSM' ELSE 'SPM' END AS mode,
           |        ${aj("w")} AS orig
           |      FROM c)
           |SELECT doc_id, mode, n AS n_words,
           |  CASE WHEN mode = 'RAW' THEN 0 ELSE p END AS n_prefix,
           |  CASE WHEN mode = 'RAW' THEN 0 ELSE p END AS n_middle,
           |  CASE WHEN mode = 'RAW' THEN 0 ELSE n - 2 * p END AS n_suffix,
           |  md5(${fimText}) AS fim_md5,
           |  CASE WHEN ${fimRoundtrip} THEN 1 ELSE 0 END AS roundtrip_ok
           |FROM f ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      t(s, d, "documents")
        .select(col("doc_id"), expr(wordsE).as("w"))
        .select(col("doc_id"), col("w"),
          expr(dl.arrSize("w")).as("n"), expr(fimCut).as("p"))
        .select(Seq(col("doc_id"), col("n"), col("p")) ++
          fimPieceCols :+
          expr("CASE WHEN n < 6 THEN 'RAW' WHEN doc_id % 2 = 0 THEN 'PSM' ELSE 'SPM' END").as("mode") :+
          expr(aj("w")).as("orig"): _*)
        .select(col("doc_id"), col("mode"), col("n").as("n_words"),
          expr("CASE WHEN mode = 'RAW' THEN 0 ELSE p END").as("n_prefix"),
          expr("CASE WHEN mode = 'RAW' THEN 0 ELSE p END").as("n_middle"),
          expr("CASE WHEN mode = 'RAW' THEN 0 ELSE n - 2 * p END").as("n_suffix"),
          expr(s"md5(${fimText})").as("fim_md5"),
          expr(s"CASE WHEN ${fimRoundtrip} THEN 1 ELSE 0 END").as("roundtrip_ok"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // T38 — PERPLEXITY filtering (the CCNet / LLaMA-pipeline quality
    // gate t28's classifier approximates): train an add-1-smoothed
    // bigram LM on the corpus in ONE aggregate pass, score every doc
    // by its per-bigram perplexity under that LM, and flag the
    // high-ppl tail for removal. Scale shape: the LM (bigram +
    // context counts) is vocabulary-sized — in practice a broadcast
    // table, so scoring is a map-side join over the bigram stream,
    // never a corpus-sized shuffle; the per-doc fold sums DECIMALS of
    // 9-dp-rounded log-probs, so the score is order-independent and
    // bit-identical across engines (the repo's determinism rule for
    // anything summed in IEEE).
    Q("t38_perplexity_filter",
      "bigram-LM perplexity per doc (add-1 smoothing), high-ppl tail flagged",
      {
        implicit val dl: Dialect = SqlDuck
        val w = XSql.words("text")
        s"""WITH w AS (SELECT doc_id, $w AS w FROM documents),
           |ix AS (SELECT doc_id, w, unnest(${dl.seq0(s"${dl.arrSize("w")} - 1")}) AS i_ FROM w),
           |bg AS (SELECT doc_id, ${dl.idx("w", "i_")} AS w1,
           |         ${dl.idx("w", "i_ + 1")} AS w2 FROM ix),
           |cu AS (SELECT w1, count(*) AS nctx FROM bg GROUP BY 1),
           |cb AS (SELECT w1, w2, count(*) AS nbg FROM bg GROUP BY 1, 2),
           |vs AS (SELECT count(DISTINCT w2) AS v FROM bg),
           |lp AS (SELECT bg.doc_id,
           |         cast(round(ln(cast(nbg + 1 as double)
           |           / cast(nctx + v as double)), 9) as decimal(20,9)) AS lp
           |       FROM bg JOIN cb USING (w1, w2) JOIN cu USING (w1) CROSS JOIN vs),
           |p AS (SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS slp
           |      FROM lp GROUP BY 1)
           |SELECT doc_id, n_bigrams,
           |  round(exp(-(cast(slp as double) / cast(n_bigrams as double))), 6) AS ppl,
           |  round(exp(-(cast(slp as double) / cast(n_bigrams as double))), 6) > 60.0 AS drop_hi
           |FROM p ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val bg = t(s, d, "documents")
        .select(col("doc_id"), expr(XSql.words("text")).as("w"))
        .select(col("doc_id"), col("w"),
          explode(expr(dl.seq0(s"${dl.arrSize("w")} - 1"))).as("i_"))
        .select(col("doc_id"), expr(dl.idx("w", "i_")).as("w1"),
          expr(dl.idx("w", "i_ + 1")).as("w2"))
      val cu = bg.groupBy("w1").agg(count(lit(1)).as("nctx"))
      val cb = bg.groupBy("w1", "w2").agg(count(lit(1)).as("nbg"))
      val vs = bg.agg(countDistinct(col("w2")).as("v"))
      // the LM is vocab-sized: broadcast it into the scoring stream
      val lp = bg
        .join(broadcast(cb), Seq("w1", "w2"))
        .join(broadcast(cu), Seq("w1"))
        .crossJoin(broadcast(vs))
        .select(col("doc_id"),
          round(log((col("nbg") + 1).cast("double")
            / (col("nctx") + col("v")).cast("double")), 9)
            .cast("decimal(20,9)").as("lp"))
      val ppl = round(exp(-(col("slp").cast("double")
        / col("n_bigrams").cast("double"))), 6)
      lp.groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("slp"))
        .select(col("doc_id"), col("n_bigrams"), ppl.as("ppl"),
          (ppl > 60.0).as("drop_hi"))
        .orderBy("doc_id")
    }
  )

  /** FIM cut: the word-third length (integer, both engines). */
  private def fimCut(implicit d: Dialect): String =
    idiv(d.arrSize("w"), "3")

  /** prefix/middle/suffix joined strings as SELECT-list items. */
  private def fimPieces(w: String)(implicit d: Dialect): String = Seq(
    s"${aj(slDyn(w, "1", "p"))} AS pre",
    s"${aj(slDyn(w, "p + 1", "p"))} AS mid",
    s"${aj(slDyn(w, "2 * p + 1", "n - 2 * p"))} AS suf").mkString(",\n        ")

  private def fimPieceCols(implicit d: Dialect) = Seq(
    expr(aj(slDyn("w", "1", "p"))).as("pre"),
    expr(aj(slDyn("w", "p + 1", "p"))).as("mid"),
    expr(aj(slDyn("w", "2 * p + 1", "n - 2 * p"))).as("suf"))

  /** The serialized FIM document per mode (sentinels spelled out). */
  private def fimText: String =
    "CASE WHEN mode = 'RAW' THEN orig " +
      "WHEN mode = 'PSM' THEN concat('<PRE>', pre, '<SUF>', suf, '<MID>', mid) " +
      "ELSE concat('<SUF>', suf, '<PRE>', pre, '<MID>', mid) END"

  /** Losslessness: pieces reassembled in source order == original. */
  private def fimRoundtrip: String =
    "(mode = 'RAW' OR concat(pre, ' ', mid, ' ', suf) = orig)"

  /** Dynamic-length array slice (the Dialect.slice helper takes a
    * constant length; FIM's cut points are per-row).
    */
  private def slDyn(arr: String, a: String, len: String)(
      implicit d: Dialect): String = d match {
    case SqlSpark => s"slice($arr, $a, $len)"
    case SqlDuck => s"list_slice($arr, $a, ($a) + ($len) - 1)"
  }

  private def aj(arr: String)(implicit d: Dialect): String = d match {
    case SqlSpark => s"array_join($arr, ' ')"
    case SqlDuck => s"array_to_string($arr, ' ')"
  }

  /** The t35 rule set: (name, integer 0/1 pass expression) — shared
    * verbatim by both dialects (thresholds via integer
    * cross-multiplication; no float ratio anywhere).
    */
  private def qgRules(implicit d: Dialect): Seq[(String, String)] = {
    val nw = d.arrSize("w")
    val sumLen = d.foldL(
      d.xform("w", "w_", s"cast(length(w_) as bigint)"), 0L, "a_", "x_", "a_ + x_")
    val nStop = d.arrSize(d.filt("w", "w_",
      (if (d == SqlSpark) s"array_contains(${strArr(StopWords)}, w_)"
       else s"list_contains(${strArr(StopWords)}, w_)")))
    val alphaLen = if (d == SqlSpark)
      "length(regexp_replace(text, '[^a-z]', ''))"
    else "length(regexp_replace(text, '[^a-z]', '', 'g'))"
    val nDistinct = d.arrSize(d.arrDistinct("w"))
    Seq(
      "r_word_count" -> s"CASE WHEN $nw BETWEEN 10 AND 1000 THEN 1 ELSE 0 END",
      "r_word_len" ->
        s"CASE WHEN 2 * $nw <= $sumLen AND $sumLen <= 12 * $nw THEN 1 ELSE 0 END",
      "r_stopwords" -> s"CASE WHEN $nStop >= 2 THEN 1 ELSE 0 END",
      "r_alpha" -> s"CASE WHEN 5 * $alphaLen >= 3 * n_chars THEN 1 ELSE 0 END",
      "r_no_runs" -> s"CASE WHEN ${maxRunExpr("w")} < 3 THEN 1 ELSE 0 END",
      "r_distinct_words" ->
        s"CASE WHEN 2 * $nDistinct >= $nw THEN 1 ELSE 0 END")
  }

  /** Failed-rule bitmask: bit i set when rule i FAILS. */
  private def qgMask(implicit d: Dialect): String =
    qgRules.zipWithIndex.map { case ((_, e), i) =>
      s"(CASE WHEN ($e) = 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** t31's training path: one distributed word-count aggregate, local
    * greedy merge fit on the ≤ BpeVocabCap candidate table.
    */
  private def trainedMerges(s: org.apache.spark.sql.SparkSession,
      d: String): Seq[graft.operators.Bpe.Merge] = {
    implicit val dl: Dialect = SqlSpark
    val wc = t(s, d, "documents")
      .select(explode(expr(wordsE)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("word")).limit(BpeVocabCap)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    graft.operators.Bpe.trainLocal(wc, BpeRounds)
  }

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Number of greedy merges t31 trains, and the word-frequency-table
    * cap (the trainer's max-candidate-vocab bound — what keeps every
    * post-aggregate round KB-sized however big the corpus is).
    */
  private def BpeRounds = 6
  private def BpeVocabCap = 30

  /** The t31 training chain as oracle CTEs (word counts → per-round
    * pair counts / argmax merge / merge application) — shared by the
    * t31 and t32 oracles so trainer and encoder gate the same merges.
    */
  private def bpeTrainCtes(implicit d: Dialect): Seq[String] =
    Seq(
      s"""wc AS (SELECT w AS word, count(*) AS n
         |  FROM (SELECT unnest($wordsE) AS w FROM documents)
         |  GROUP BY w ORDER BY n DESC, word LIMIT $BpeVocabCap)""".stripMargin,
      s"w0 AS (SELECT word, n, ${charSeq("word")} AS seq FROM wc)") ++
      (1 to BpeRounds).flatMap { r =>
        Seq(
          s"""p$r AS (SELECT pair, cast(sum(n) AS BIGINT) AS cnt
             |  FROM (SELECT unnest(${symPairs("seq")}) AS pair, n FROM w${r - 1})
             |  GROUP BY pair)""".stripMargin,
          s"m$r AS (SELECT pair, cnt FROM p$r ORDER BY cnt DESC, pair LIMIT 1)",
          s"""w$r AS (SELECT word, n, ${mergeApply(s"w${r - 1}.seq", s"m$r.pair")} AS seq
             |  FROM w${r - 1}, m$r)""".stripMargin)
      }

  /** The oracle's merge scalar columns (from the mrow CTE). */
  private def oraclePairCols: Seq[String] = (1 to BpeRounds).map(r => s"p$r")

  /** Nonnegative integer division (dialect spelling differs). */
  private def idiv(a: String, b: String)(implicit d: Dialect): String =
    d match {
      case SqlSpark => s"(($a) div ($b))"
      case SqlDuck  => s"(($a) // ($b))"
    }

  /** Longest run of consecutive identical words, row-locally: adjacency
    * flags from one indexed transform, then a single fold whose BIGINT
    * accumulator packs (current run, best run) as cur*1024 + best —
    * runs are bounded by the ≤100-word docs, so the packing never
    * collides; both fields stay nonnegative so integer division is
    * engine-identical.
    */
  private def maxRunExpr(wordsArr: String)(implicit d: Dialect): String = {
    val flags = d.xform(d.seq0(s"${d.arrSize(wordsArr)} - 1"), "i_",
      s"CASE WHEN ${d.idx(wordsArr, "i_")} = ${d.idx(wordsArr, "i_ + 1")} " +
        "THEN 1 ELSE 0 END")
    val cur = idiv("acc_", "1024")
    val fold = d.foldL(flags, 0L, "acc_", "x_",
      s"CASE WHEN x_ = 1 THEN (($cur) + 1) * 1024 + greatest(($cur) + 1, acc_ % 1024) " +
        "ELSE acc_ % 1024 END")
    s"cast(($fold) % 1024 + 1 AS BIGINT)"
  }

  /** A word encoded under the trained merges: the char sequence with
    * the merge pair expressions (oracle: the p1..pN scalar columns;
    * Spark: string literals from the local fit) applied in training
    * order — a pure per-row string fold.
    */
  private def bpeEncodedSeq(wvar: String, pairExprs: Seq[String])(
      implicit d: Dialect): String =
    pairExprs.foldLeft(charSeq(wvar))((acc, p) => mergeApply(acc, p))

  /** Σ over a words array of the encoded token count (row-local). */
  private def sumTokens(wordsArr: String, pairExprs: Seq[String])(
      implicit d: Dialect): String =
    d.foldL(d.xform(wordsArr, "w_",
        s"cast(${d.arrSize(d.strSplit(bpeEncodedSeq("w_", pairExprs), " "))} as bigint)"),
      0L, "a_", "x_", "a_ + x_")

  /** Σ over a words array of the raw character count (the pre-merge
    * token baseline — one symbol per char).
    */
  private def sumChars(wordsArr: String)(implicit d: Dialect): String =
    d.foldL(d.xform(wordsArr, "w_", "cast(length(w_) as bigint)"),
      0L, "a_", "x_", "a_ + x_")

  /** A word as its initial space-separated character sequence. */
  private def charSeq(word: String)(implicit d: Dialect): String = d match {
    case SqlSpark => s"array_join(${d.chars(word)}, ' ')"
    case SqlDuck  => s"array_to_string(${d.chars(word)}, ' ')"
  }

  /** Adjacent symbol pairs ("a b") of a space-separated sequence. */
  private def symPairs(seq: String)(implicit d: Dialect): String = {
    val syms = d.strSplit(seq, " ")
    d.xform(d.seq0(s"${d.arrSize(syms)} - 1"), "i_",
      s"concat(${d.idx(syms, "i_")}, ' ', ${d.idx(syms, "i_ + 1")})")
  }

  /** Apply one merge: space-anchored leftmost-non-overlapping replace
    * (identical scan semantics in Spark's UTF8String.replace and
    * DuckDB's replace — BPE's greedy left-to-right application).
    */
  private def mergeApply(seq: String, pair: String): String =
    s"trim(replace(concat(' ', $seq, ' '), concat(' ', $pair, ' '), " +
      s"concat(' ', replace($pair, ' ', ''), ' ')))"
}
