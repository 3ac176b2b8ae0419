package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.XSql
import graft.functions.XSql.{Dialect, Spark => SqlSpark, Duck => SqlDuck}

/** The flagship composition: a full training-corpus cleaning pipeline
  * — language filter → quality filter → exact dedup → LSH near-dup
  * removal → token accounting — as ONE dataflow, oracle-checked end
  * to end. This is the shape a 100 TB pretraining-data job takes; at
  * scale each stage is a narrow map or a key-bounded join, and the
  * only quadratic-risk step (near-dup) is LSH-band-bounded.
  *
  * Near-dup policy: within a confirmed pair (Jaccard >= 0.5) the
  * higher doc_id is dropped (greedy, deterministic). Single pass — a
  * kept doc may itself have been a dropper; the fixed policy is what
  * the oracle states, so both engines agree exactly.
  */
object CorpusOps {

  /** Near-dup-cluster-aware 95/5 split (c9; see the query doc): every
    * doc splits by the content hash of its cluster REPRESENTATIVE
    * (component min id; singletons are their own representative), so a
    * whole near-dup cluster always shares a split. Shared with
    * [[graft.LeakageSafeSplitSpec]], which property-checks the
    * invariant on random corpora.
    */
  def leakageSafeSplit(docs: org.apache.spark.sql.DataFrame,
      threshold: Double): org.apache.spark.sql.DataFrame = {
    implicit val dl: Dialect = SqlSpark
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val sh = docs
      .withColumn("sh", expr(XSql.shinglesOfText("text")))
      .select("doc_id", "sh")
    val pairs = graft.operators.Lsh.verifiedPairsCapped(sh, threshold)
      .select("doc_a", "doc_b")
    val comp = graft.operators.ConnectedComponents
      .minLabel(pairs, "doc_a", "doc_b")
      .select(col("node").as("doc_id"), col("component"))
    docs.select("doc_id")
      .join(comp, Seq("doc_id"), "left")
      .withColumn("rep_id", coalesce(col("component"), col("doc_id")))
      .join(docs.select(col("doc_id").as("rep_id"),
        col("text").as("rep_text")), Seq("rep_id"))
      .select(col("doc_id"), col("rep_id"),
        when(expr(XSql.charHash("rep_text")) % 100 < 95, "train")
          .otherwise("val").as("split"))
  }

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // Eval-set decontamination — the release gate every trained-on
    // corpus passes: any training doc sharing a word-3-gram shingle
    // with a benchmark doc is flagged (n-gram overlap is the standard
    // contamination test). The benchmark here is the deterministic
    // doc_id % 97 slice of the same table.
    // Scale shape: the benchmark's distinct shingle set is
    // benchmark-sized, not corpus-sized — it BROADCASTS; the corpus
    // streams through one narrow shingle explode + hash equi-join and
    // one groupBy(lang). No shuffle ever carries the corpus text.
    // Docs too short to form a shingle cannot be flagged (both
    // dialects emit empty shingle sets — same convention as d2/d5).
    Q("c5_decontamination",
      "flag training docs sharing an n-gram shingle with the eval slice",
      {
        implicit val dl: Dialect = SqlDuck
        val sh = XSql.shinglesOfText("text")
        s"""WITH ev AS (
           |  SELECT DISTINCT unnest($sh) AS h
           |  FROM documents WHERE doc_id % 97 = 0),
           |cont AS (
           |  SELECT DISTINCT doc_id FROM (
           |    SELECT doc_id, unnest($sh) AS h
           |    FROM documents WHERE doc_id % 97 <> 0) trs
           |  JOIN ev USING (h))
           |SELECT lang, count(*) AS n_train,
           |  count(CASE WHEN cont.doc_id IS NOT NULL THEN 1 END) AS n_contaminated,
           |  count(*) - count(CASE WHEN cont.doc_id IS NOT NULL THEN 1 END) AS n_clean
           |FROM documents d LEFT JOIN cont ON d.doc_id = cont.doc_id
           |WHERE d.doc_id % 97 <> 0
           |GROUP BY lang ORDER BY lang""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val docs = t(s, d, "documents")
      // explode_outer, then drop the null rows: plain explode makes
      // Catalyst push `isnotnull(e) && size(e) > 0` filters whose `e`
      // is the whole shingle expression — the full text hash would run
      // 3x per row; outer + isNotNull evaluates it ONCE per row
      def shingleRows(slice: org.apache.spark.sql.DataFrame) = slice
        .select(col("doc_id"),
          explode_outer(expr(XSql.shinglesOfText("text"))).as("h"))
        .filter(col("h").isNotNull)
      val evalSh = shingleRows(docs.filter(col("doc_id") % 97 === 0))
        .select("h").distinct()
      val contaminated = shingleRows(docs.filter(col("doc_id") % 97 =!= 0))
        .join(broadcast(evalSh), Seq("h"))
        .select("doc_id").distinct()
      docs.filter(col("doc_id") % 97 =!= 0)
        .join(contaminated.withColumn("flag", lit(1)), Seq("doc_id"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_train"),
          count(col("flag")).as("n_contaminated"))
        .select(col("lang"), col("n_train"), col("n_contaminated"),
          (col("n_train") - col("n_contaminated")).as("n_clean"))
        .orderBy("lang")
    },

    // ---------------------------------------------------------------
    // Cross-modal near-dup detection: a pair is a candidate if EITHER
    // the text signal (MinHash-LSH + verified Jaccard >= 0.5) OR the
    // embedding signal (label-blocked cosine distance <= 0.6) fires;
    // the output carries which signals agreed. This is the
    // multi-signal shape of production dedup — text catches copies,
    // embeddings catch paraphrases — and both candidate generators
    // stay join-bounded (LSH bands / label blocks).
    Q("c2_crossmodal_dedup",
      "near-dup pairs by text-LSH OR embedding-cosine, with signal provenance",
      {
        implicit val dl: Dialect = SqlDuck
        val w = XSql.words("text")
        s"""WITH joined AS (
           |  SELECT d.doc_id, d.text, e.label, ${dl.toDoubleArr("e.embedding")} AS v
           |  FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
           |sh AS (SELECT doc_id, ${XSql.shingleHashes(XSql.wordHashes(w))} AS sh
           |       FROM joined),
           |sig AS (SELECT doc_id, sh, ${XSql.minhashSig("sh")} AS sig FROM sh),
           |bands AS (SELECT doc_id, unnest(${XSql.bandKeys("sig")}) AS bk,
           |                 unnest(range(0, ${XSql.LshBands})) AS bi FROM sig),
           |${graft.operators.Lsh.cappedCandSql("bands", "bi", "bk", "tcand")},
           |text_pairs AS (
           |  SELECT c.doc_a, c.doc_b, 'text' AS signal FROM tcand c
           |  JOIN sh sa ON sa.doc_id = c.doc_a
           |  JOIN sh sb ON sb.doc_id = c.doc_b
           |  WHERE ${XSql.jaccard("sa.sh", "sb.sh")} >= 0.5),
           |n AS (SELECT doc_id, label, v, ${XSql.norm2("v")} AS n2 FROM joined),
           |embed_pairs AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 'embedding' AS signal
           |  FROM n a JOIN n b ON a.label = b.label AND a.doc_id < b.doc_id
           |  WHERE 1.0 - ${XSql.cosineFromNorms(XSql.dot("a.v", "b.v"), "a.n2", "b.n2")} <= 0.6)
           |SELECT doc_a, doc_b,
           |  array_to_string(list_sort(list(DISTINCT signal)), '|') AS signals_csv
           |FROM (SELECT * FROM text_pairs UNION ALL SELECT * FROM embed_pairs)
           |GROUP BY doc_a, doc_b
           |ORDER BY doc_a, doc_b""".stripMargin
      }) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      implicit val dl: Dialect = SqlSpark
      val joined = t(s, d, "documents")
        .join(t(s, d, "embeddings"), col("doc_id") === col("vec_id"))
        .withColumn("v", expr(dl.toDoubleArr("embedding")))
        .select("doc_id", "text", "label", "v")
      joined.cache()
      val sh = joined
        .withColumn("sh", expr(XSql.shinglesOfText("text")))
        .select("doc_id", "sh")
      val textPairs = graft.operators.Lsh.verifiedPairsCapped(sh, 0.5)
        .select(col("doc_a"), col("doc_b"), lit("text").as("signal"))
      val n = joined.withColumn("n2", expr(XSql.norm2("v")))
      val na = n.select(col("label"), col("doc_id").as("doc_a"),
        col("v").as("v_a"), col("n2").as("n2_a"))
      val nb = n.select(col("label"), col("doc_id").as("doc_b"),
        col("v").as("v_b"), col("n2").as("n2_b"))
      val embedPairs = na.join(nb, Seq("label"))
        .filter(col("doc_a") < col("doc_b")
          && expr("vector_distance(v_a, v_b, 'COSINE')") <= 0.6)
        .select(col("doc_a"), col("doc_b"), lit("embedding").as("signal"))
      textPairs.unionByName(embedPairs)
        .groupBy("doc_a", "doc_b")
        .agg(array_join(sort_array(collect_set(col("signal"))), "|").as("signals_csv"))
        .orderBy("doc_a", "doc_b")
    },

    // ---------------------------------------------------------------
    // The corpus pipeline with COMPONENT-based near-dup policy: LSH
    // pairs -> connected components -> keep the min doc_id per
    // cluster. Strictly better than c1's single-pass pair-greedy
    // (which can drop B for A~B and then also drop C for B~C even
    // though B is gone): the component policy keeps exactly one
    // representative per near-dup cluster, deterministically.
    Q("c3_dedup_by_components",
      "quality filter -> occupancy-capped LSH pairs -> components -> one representative per cluster",
      {
        implicit val dl: Dialect = SqlDuck
        val w = XSql.words("text")
        s"""WITH RECURSIVE
           |base AS (
           |  SELECT doc_id, text, $w AS w FROM documents
           |  WHERE ${dl.arrSize(w)} >= 20),
           |sh AS (SELECT doc_id, ${dl.arrSize("w")} AS n_tokens,
           |              ${XSql.shingleHashes(XSql.wordHashes("w"))} AS sh FROM base),
           |sig AS (SELECT doc_id, sh, ${XSql.minhashSig("sh")} AS sig FROM sh),
           |bands AS (SELECT doc_id, unnest(${XSql.bandKeys("sig")}) AS bk,
           |                 unnest(range(0, ${XSql.LshBands})) AS bi FROM sig),
           |${graft.operators.Lsh.cappedCandSql("bands", "bi", "bk", "cand")},
           |pairs AS (SELECT c.doc_a, c.doc_b FROM cand c
           |          JOIN sh sa ON sa.doc_id = c.doc_a
           |          JOIN sh sb ON sb.doc_id = c.doc_b
           |          WHERE ${XSql.jaccard("sa.sh", "sb.sh")} >= 0.5),
           |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
           |        UNION SELECT doc_b, doc_a FROM pairs),
           |reach(src, node) AS (
           |  SELECT a, a FROM sym
           |  UNION
           |  SELECT r.src, s.b FROM reach r JOIN sym s ON r.node = s.a),
           |comp AS (SELECT src AS doc_id, min(node) AS component
           |         FROM reach GROUP BY src)
           |SELECT s.doc_id, s.n_tokens
           |FROM sh s LEFT JOIN comp c ON s.doc_id = c.doc_id
           |WHERE c.doc_id IS NULL OR c.component = s.doc_id
           |ORDER BY s.doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val base = t(s, d, "documents")
        .withColumn("w", expr(XSql.words("text")))
        .filter(expr(dl.arrSize("w")) >= 20)
      val sh = base
        .withColumn("sh", expr(XSql.shinglesOfText("text")))
        .select(col("doc_id"), expr(dl.arrSize("w")).as("n_tokens"), col("sh"))
      sh.cache()
      // occupancy-CAPPED pair generation (Lsh.BucketCap, mirrored in
      // the oracle's cbands CTE): the collision join stays
      // O(buckets·cap²) when band keys saturate — the engineered
      // bound that replaced c3's measured 19× quadratic at sf100
      val pairs = graft.operators.Lsh.verifiedPairsCapped(
        sh.select("doc_id", "sh"), 0.5).select("doc_a", "doc_b")
      val comp = graft.operators.ConnectedComponents.minLabel(pairs, "doc_a", "doc_b")
        .withColumnRenamed("node", "c_doc_id")
      // keep: not in any cluster, or the cluster's representative
      sh.join(comp, col("doc_id") === col("c_doc_id"), "left")
        .filter(col("c_doc_id").isNull || col("component") === col("doc_id"))
        .select("doc_id", "n_tokens")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // The "dataset card" rollup: per-(lang, source) corpus statistics —
    // doc counts, token totals, length quantiles, exact-dup rate —
    // every released dataset ships this table. The median is exposed as
    // `median_chars_x2` = 2 × median, a BIGINT: the middle one/two
    // elements by row_number are summed and, when the group size is odd
    // (one middle element), doubled. This keeps the gated projection
    // ALL-INTEGER — no division, no doubles — so the value hashes
    // identically on every engine/version (float formatting/rounding of
    // a `.5` median is exactly the cross-engine divergence a DOUBLE
    // column re-introduces). Consumers divide by 2 at the edge.
    // NULL discipline: `n` counts non-null n_chars and the rank order
    // pins NULLS LAST in both dialects, so rows with rn <= n are exactly
    // the non-null ones regardless of each engine's default placement.
    // Scale: the window and the groupBy share the (lang, source)
    // partitioning, so this is still ONE shuffle; exact medians need
    // the group's values together once regardless (the documented
    // trade vs approx_percentile at extreme cardinality).
    Q("c4_dataset_card",
      "per-(lang, source) dataset-card stats: counts, tokens, 2x median length, dup rate",
      {
        implicit val dl: Dialect = SqlDuck
        val w = XSql.words("text")
        val midCase = "CASE WHEN rn * 2 >= n AND rn * 2 <= n + 2 THEN n_chars END"
        s"""WITH d AS (
           |  SELECT lang, source, ${dl.arrSize(w)} AS n_tokens, n_chars,
           |         ${XSql.charHash("text")} AS th
           |  FROM documents),
           |r AS (
           |  SELECT *, row_number() OVER (PARTITION BY lang, source ORDER BY n_chars NULLS LAST) AS rn,
           |         count(n_chars) OVER (PARTITION BY lang, source) AS n
           |  FROM d)
           |SELECT lang, source, count(*) AS n_docs,
           |  cast(sum(n_tokens) AS BIGINT) AS total_tokens,
           |  cast(CASE WHEN count($midCase) = 1 THEN 2 * sum($midCase)
           |            ELSE sum($midCase) END AS BIGINT) AS median_chars_x2,
           |  count(*) - count(DISTINCT th) AS n_exact_dups
           |FROM r GROUP BY lang, source
           |ORDER BY lang, source""".stripMargin
      }) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      implicit val dl: Dialect = SqlSpark
      val grp = Window.partitionBy("lang", "source")
      // middle elements: odd n -> 2*rn == n+1; even n -> 2*rn in {n, n+2}.
      // (n and n+2 are odd when n is odd, so the range test selects exactly
      // the right one/two rows in both parities.)
      val mid = col("rn") * 2 >= col("n") && col("rn") * 2 <= col("n") + 2
      val midSum = sum(when(mid, col("n_chars")))
      val midCnt = count(when(mid, col("n_chars")))
      t(s, d, "documents")
        .selectExpr("lang", "source",
          s"${dl.arrSize(XSql.words("text"))} AS n_tokens", "n_chars",
          s"${XSql.charHash("text")} AS th")
        .withColumn("rn", row_number().over(grp.orderBy(col("n_chars").asc_nulls_last)))
        .withColumn("n", count(col("n_chars")).over(grp))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).cast("long").as("total_tokens"),
          when(midCnt === 1, midSum * 2).otherwise(midSum)
            .cast("long").as("median_chars_x2"),
          (count(lit(1)) - countDistinct(col("th"))).as("n_exact_dups"))
        .orderBy("lang", "source")
    },

    Q("c1_corpus_pipeline",
      "langid filter -> quality filter -> exact dedup -> LSH near-dup removal -> token stats",
      {
        implicit val dl: Dialect = SqlDuck
        val w = XSql.words("text")
        val scoreCols = TextOps.langScores.map { case (l, e) => s"$e AS s_$l" }
          .mkString(", ")
        s"""WITH base AS (
           |  SELECT doc_id, text, n_chars, $w AS w,
           |         length(regexp_replace(text, '[^a-z]', '', 'g')) AS n_alpha
           |  FROM documents),
           |scored AS (
           |  SELECT *, $scoreCols FROM base),
           |langed AS (
           |  SELECT * FROM scored WHERE ${TextOps.predLangFromScores} = 'en'),
           |quality AS (
           |  SELECT * FROM langed
           |  WHERE ${dl.arrSize("w")} >= 20
           |    AND cast(n_alpha as double) / cast(n_chars as double) >= 0.7),
           |hashed AS (
           |  SELECT *, ${XSql.charHash("text")} AS th FROM quality),
           |exact AS (
           |  SELECT * FROM hashed
           |  QUALIFY row_number() OVER (PARTITION BY th ORDER BY doc_id) = 1),
           |wh AS (SELECT doc_id, w, n_alpha, ${XSql.wordHashes("w")} AS wh FROM exact),
           |sh AS (SELECT doc_id, ${dl.arrSize("w")} AS n_tokens, n_alpha,
           |              ${XSql.shingleHashes("wh")} AS sh FROM wh),
           |sig AS (SELECT doc_id, sh, ${XSql.minhashSig("sh")} AS sig FROM sh),
           |bands AS (
           |  SELECT doc_id, unnest(${XSql.bandKeys("sig")}) AS band_key,
           |         unnest(range(0, ${XSql.LshBands})) AS band_idx FROM sig),
           |${graft.operators.Lsh.cappedCandSql("bands", "band_idx", "band_key", "cand")},
           |drops AS (
           |  SELECT DISTINCT c.doc_b AS doc_id FROM cand c
           |  JOIN sh sa ON sa.doc_id = c.doc_a
           |  JOIN sh sb ON sb.doc_id = c.doc_b
           |  WHERE ${XSql.jaccard("sa.sh", "sb.sh")} >= 0.5)
           |SELECT s.doc_id, s.n_tokens, s.n_alpha
           |FROM sh s
           |WHERE s.doc_id NOT IN (SELECT doc_id FROM drops)
           |ORDER BY s.doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      // n_alpha is computed ONCE at the base scan and carried through:
      // the quality filter and the final projection both read it, so
      // the corpus is regexp-scanned once and `documents` is scanned
      // once (the old shape re-joined documents at the end and ran the
      // [^a-z] strip a second time — 2 full-text passes instead of 1).
      val base = t(s, d, "documents")
        .withColumn("w", expr(XSql.words("text")))
        .withColumn("n_alpha", expr("length(regexp_replace(text, '[^a-z]', ''))"))
      // language scores materialized ONCE per row as columns; the
      // argmax CASE then compares cheap column refs instead of
      // re-evaluating arrDistinct+arrIntersect per comparison (the
      // inlined predLangExpr form costs ~dozens of intersections/doc)
      val scored = TextOps.langScores(SqlSpark).foldLeft(base) {
        case (df, (l, e)) => df.withColumn(s"s_$l", expr(e))
      }
      val langed = scored.filter(expr(TextOps.predLangFromScores) === "en")
      val quality = langed.filter(
        expr(dl.arrSize("w")) >= 20 &&
          col("n_alpha").cast("double") / col("n_chars").cast("double") >= 0.7)
      val exact = quality
        .withColumn("th", expr(XSql.charHash("text")))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("th").orderBy("doc_id")))
        .filter(col("rn") === 1).drop("rn")
      val sh = exact
        .withColumn("sh", expr(XSql.shinglesOfText("text")))
        .select(col("doc_id"), expr(dl.arrSize("w")).as("n_tokens"),
          col("n_alpha"), col("sh"))
      sh.cache()
      val drops = graft.operators.Lsh.verifiedPairsCapped(
        sh.select("doc_id", "sh"), 0.5)
        .select(col("doc_b").as("doc_id")).distinct()
      sh.join(drops, Seq("doc_id"), "left_anti")
        .select("doc_id", "n_tokens", "n_alpha")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Corpus mixing — the last step before training: down-sample each
    // source to its target mixture weight (here: tier-1 sources keep
    // 100%, tier-2 50%, the long tail 25%). The gate is a CONTENT
    // hash, never random(): reproducible across runs, engines, AND
    // task retries — a retried task with random() silently changes
    // the corpus. The salt ('#mix') makes this draw independent of
    // the t6 train/val split drawn from the same hash family.
    // Scale shape: per-row hash + one map-side-combinable aggregate
    // keyed by source — one shuffle of |sources| partial rows.
    Q("c6_corpus_mixing",
      "hash-gated per-source mixture sampling: keep counts + char budget",
      {
        implicit val dl: Dialect = SqlDuck
        val h = XSql.charHash("(text || '#mix')")
        s"""WITH g AS (
           |  SELECT source, n_chars,
           |    ($h) % 100 <
           |      CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 100
           |           WHEN source IN ('src5','src6','src7','src8','src9') THEN 50
           |           ELSE 25 END AS keep
           |  FROM documents)
           |SELECT source, count(*) AS n_total,
           |  cast(sum(CASE WHEN keep THEN 1 ELSE 0 END) as bigint) AS n_kept,
           |  cast(sum(CASE WHEN keep THEN n_chars ELSE 0 END) as bigint) AS chars_kept,
           |  round(cast(sum(CASE WHEN keep THEN 1 ELSE 0 END) as double)
           |        / cast(count(*) as double), 6) AS keep_frac
           |FROM g GROUP BY source ORDER BY source""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val tier1 = Seq("src0", "src1", "src2", "src3", "src4")
      val tier2 = Seq("src5", "src6", "src7", "src8", "src9")
      val w = when(col("source").isin(tier1: _*), 100)
        .when(col("source").isin(tier2: _*), 50).otherwise(25)
      t(s, d, "documents")
        .withColumn("keep",
          expr(XSql.charHash("concat(text, '#mix')")) % 100 < w)
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
          sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("chars_kept"),
          round(sum(when(col("keep"), 1L).otherwise(0L)).cast("double")
            / count(lit(1)).cast("double"), 6).as("keep_frac"))
        .orderBy("source")
    },

    // ---------------------------------------------------------------
    // Document chunking — the retrieval-side prep step: overlapping
    // 50-word windows at stride 25, addressed (doc_id, chunk_idx)
    // so chunk identity is deterministic across runs, with a content
    // hash per chunk (chunk-level dedup + change detection read it).
    // ceil(n/25) windows cover every word; the last window may be
    // short (both engines' slice truncates identically). Scale shape:
    // a narrow per-row explode (~n/25 rows per doc) + per-row slice
    // and hash — one scan stage, no shuffle but the output sort.
    Q("c8_chunking",
      "overlapping 50-word/stride-25 chunking: addressed chunks + content hash",
      {
        implicit val dl: Dialect = SqlDuck
        val nChunks = s"cast(floor((${dl.arrSize("w")} + 24) / 25.0) as bigint)"
        val sliceE = dl.slice("w", "k * 25", 50)
        s"""WITH w AS (SELECT doc_id, ${XSql.words("text")} AS w FROM documents),
           |k AS (SELECT doc_id, w, unnest(${dl.seq0(nChunks)}) AS k FROM w)
           |SELECT doc_id, k AS chunk_idx,
           |  ${dl.arrSize(sliceE)} AS n_chunk_words,
           |  ${XSql.charHash(s"array_to_string($sliceE, ' ')")} AS chunk_hash
           |FROM k ORDER BY doc_id, chunk_idx""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val nChunks = s"cast(floor((${dl.arrSize("w")} + 24) / 25.0) as bigint)"
      val sliceE = dl.slice("w", "k * 25", 50)
      t(s, d, "documents")
        .withColumn("w", expr(XSql.words("text")))
        .select(col("doc_id"), col("w"),
          explode(expr(dl.seq0(nChunks))).as("k"))
        .select(col("doc_id"), col("k").as("chunk_idx"),
          expr(dl.arrSize(sliceE)).cast("long").as("n_chunk_words"),
          expr(XSql.charHash(s"array_join($sliceE, ' ')")).as("chunk_hash"))
        .orderBy("doc_id", "chunk_idx")
    },

    // ---------------------------------------------------------------
    // Leakage-safe train/val split — the t6 split has a real training
    // bug at corpus scale: two near-duplicate documents can land in
    // DIFFERENT splits, and the val set then scores memorization, not
    // generalization. Fix: split by the near-dup CLUSTER, not the
    // document — LSH pairs → connected components (d7's machinery),
    // every doc splits by the hash of its cluster REPRESENTATIVE's
    // text (component min id; singletons are their own representative)
    // — so an entire near-dup cluster always shares a split, and docs
    // outside any cluster split exactly as t6 would.
    // Scale: components are the c3 path (localCheckpoint'ed min-label
    // propagation, band-bounded pairs); the representative-text join
    // keys on doc_id; everything else is one narrow map.
    Q("c9_leakage_safe_split",
      "near-dup-cluster-aware 95/5 split: a whole cluster shares one split",
      {
        implicit val dl: Dialect = SqlDuck
        val w = XSql.words("text")
        s"""WITH RECURSIVE
           |w AS (SELECT doc_id, ${XSql.wordHashes(w)} AS wh FROM documents),
           |sh AS (SELECT doc_id, ${XSql.shingleHashes("wh")} AS sh FROM w),
           |sig AS (SELECT doc_id, sh, ${XSql.minhashSig("sh")} AS sig FROM sh),
           |bands AS (SELECT doc_id, unnest(${XSql.bandKeys("sig")}) AS band_key,
           |                 unnest(range(0, ${XSql.LshBands})) AS band_idx FROM sig),
           |${graft.operators.Lsh.cappedCandSql("bands", "band_idx", "band_key", "cand")},
           |pairs AS (SELECT c.doc_a, c.doc_b FROM cand c
           |          JOIN sh sa ON sa.doc_id = c.doc_a
           |          JOIN sh sb ON sb.doc_id = c.doc_b
           |          WHERE ${XSql.jaccard("sa.sh", "sb.sh")} >= 0.3),
           |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
           |        UNION SELECT doc_b, doc_a FROM pairs),
           |reach(src, node) AS (
           |  SELECT a, a FROM sym
           |  UNION
           |  SELECT r.src, s.b FROM reach r JOIN sym s ON r.node = s.a),
           |comp AS (SELECT src AS doc_id, min(node) AS component
           |         FROM reach GROUP BY src)
           |SELECT d.doc_id,
           |  coalesce(c.component, d.doc_id) AS rep_id,
           |  CASE WHEN ${XSql.charHash("rep.text")} % 100 < 95 THEN 'train'
           |       ELSE 'val' END AS split
           |FROM documents d
           |LEFT JOIN comp c ON d.doc_id = c.doc_id
           |JOIN documents rep ON rep.doc_id = coalesce(c.component, d.doc_id)
           |ORDER BY d.doc_id""".stripMargin
      }) { (s, d) =>
      leakageSafeSplit(t(s, d, "documents").select("doc_id", "text"), 0.3)
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // DSIR-style data selection — importance resampling toward a
    // TARGET distribution (here: the 'en' slice stands in for the
    // curated target corpus), scored on hashed word features. The
    // production recipe (Xie et al., "Data Selection for Language
    // Models via Importance Resampling") weights each doc by a
    // log-likelihood ratio of hashed-n-gram models; at any scale that
    // is exactly this dataflow — two KB-sized bucket histograms
    // (target + raw, 64 buckets here) and one broadcast rejoin to
    // score every doc in a single pass. The gated surrogate keeps the
    // per-bucket DECISION (is the bucket target-heavy, by exact
    // integer cross-multiplication of the two add-one-smoothed
    // bucket rates — no float logs, so the score is engine-exact) and
    // the per-doc aggregation; swapping the sign for the float
    // log-ratio changes one projection, not the plan. Top-100 by
    // affinity = the selected training slice; 'en' docs dominating
    // the selection is the method working, visible in the output.
    Q("c10_dsir_selection",
      "DSIR-shaped target-affinity selection: hashed-bucket histograms score docs toward the 'en' target",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH wh AS (SELECT doc_id, lang,
           |    unnest(${XSql.wordHashesOfText("text")}) AS h FROM documents),
           |bk AS (SELECT doc_id, lang, h % 64 AS b FROM wh),
           |raws AS (SELECT b, count(*) AS cr FROM bk GROUP BY b),
           |tgt AS (SELECT b, count(*) AS ct FROM bk WHERE lang = 'en' GROUP BY b),
           |tots AS (SELECT (SELECT count(*) FROM bk) AS tr,
           |                (SELECT count(*) FROM bk WHERE lang = 'en') AS tt),
           |sgn AS (SELECT r.b,
           |    CASE WHEN (coalesce(t.ct, 0) + 1) * (tots.tr + 64)
           |              > (r.cr + 1) * (tots.tt + 64) THEN 1
           |         WHEN (coalesce(t.ct, 0) + 1) * (tots.tr + 64)
           |              < (r.cr + 1) * (tots.tt + 64) THEN -1
           |         ELSE 0 END AS sg
           |  FROM raws r LEFT JOIN tgt t ON r.b = t.b, tots),
           |db AS (SELECT doc_id, b, count(*) AS c FROM bk GROUP BY doc_id, b),
           |sc AS (SELECT db.doc_id, cast(sum(db.c * sgn.sg) as bigint) AS score,
           |         cast(sum(db.c) as bigint) AS n_terms
           |       FROM db JOIN sgn ON db.b = sgn.b GROUP BY db.doc_id)
           |SELECT d.doc_id, d.lang, sc.score, sc.n_terms
           |FROM sc JOIN documents d ON sc.doc_id = d.doc_id
           |ORDER BY score DESC, d.doc_id LIMIT 100""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val docs = t(s, d, "documents").select("doc_id", "lang", "text")
      val bk = docs.select(col("doc_id"), col("lang"),
        explode(expr(XSql.wordHashesOfText("text"))).as("h"))
        .withColumn("b", col("h") % 64)
      // two 64-row histograms + one 1-row total — all broadcastable
      val raws = bk.groupBy("b").agg(count(lit(1)).as("cr"))
      val tgt = bk.filter(col("lang") === "en")
        .groupBy("b").agg(count(lit(1)).as("ct"))
      val tots = bk.agg(count(lit(1)).as("tr"),
        count(when(col("lang") === "en", 1)).as("tt"))
      val lhs = (coalesce(col("ct"), lit(0L)) + 1) * (col("tr") + 64)
      val rhs = (col("cr") + 1) * (col("tt") + 64)
      val sgn = raws.join(tgt, Seq("b"), "left")
        .crossJoin(broadcast(tots))
        .select(col("b"), when(lhs > rhs, 1L).when(lhs < rhs, -1L)
          .otherwise(0L).as("sg"))
      // one shuffle keyed (doc, bucket), then a broadcast rejoin —
      // the whole selection is a single pass over the corpus
      val sc = bk.groupBy("doc_id", "b").agg(count(lit(1)).as("c"))
        .join(broadcast(sgn), "b")
        .groupBy("doc_id")
        .agg(sum(col("c") * col("sg")).cast("long").as("score"),
          sum(col("c")).cast("long").as("n_terms"))
      sc.join(docs.select("doc_id", "lang"), "doc_id")
        .select(col("doc_id"), col("lang"), col("score"), col("n_terms"))
        .orderBy(desc("score"), col("doc_id")).limit(100)
    },

    // ---------------------------------------------------------------
    // Temperature rebalancing (UniMax shape) — multilingual corpora
    // follow a power law, and training on the raw distribution
    // starves tail languages; sampling language l proportional to
    // p_l^alpha (alpha = 0.5 here) flattens the mixture. The quota
    // math is data-derived (unlike c6's FIXED per-source rates):
    // per-lang counts -> integer fixed-point weights sqrt(n)*1e6
    // (exact order-invariant integer sum for the normalizer) ->
    // per-lang target = floor(budget * w/W) capped at n_l. The
    // arithmetic that leaves integer space (the w/W share) is pure
    // per-row IEEE — deterministic in both engines; no double is
    // ever aggregated. Selection is a deterministic hash-rank quota:
    // row_number per lang ordered by (content hash, doc_id), keep
    // rank <= the lang's quota. The quota is data-derived per group,
    // so Spark's WindowGroupLimit (literal-k only) cannot pre-limit —
    // the selection pass is ONE sort-shuffle by lang with an O(1)
    // running counter per group (row_number keeps no heap), and the
    // quota table joins back as a broadcast (|langs| rows). A
    // head-language hot partition is the one skew risk; the x1/x2
    // salting pattern applies if a single language dominates.
    // Budget = half the corpus.
    Q("c11_temperature_rebalance",
      "UniMax temperature (alpha=0.5) language rebalancing: data-derived quotas, hash-rank selection",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH g AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
           |w AS (SELECT lang, n,
           |        cast(floor(sqrt(cast(n AS double)) * 1000000) AS BIGINT) AS wfp
           |      FROM g),
           |tot AS (SELECT cast(sum(n) AS BIGINT) AS nn,
           |               cast(sum(wfp) AS BIGINT) AS ww FROM w),
           |tgt AS (SELECT lang, n,
           |          least(n, cast(floor(cast(tot.nn // 2 AS double)
           |            * (cast(wfp AS double) / cast(tot.ww AS double))) AS BIGINT))
           |            AS target_n
           |        FROM w, tot),
           |r AS (SELECT lang, doc_id,
           |        row_number() OVER (PARTITION BY lang
           |          ORDER BY ${XSql.charHash("text")}, doc_id) AS rk
           |      FROM documents),
           |k AS (SELECT r.lang, count(*) AS n_kept
           |      FROM r JOIN tgt ON r.lang = tgt.lang
           |      WHERE r.rk <= tgt.target_n GROUP BY r.lang)
           |SELECT t.lang, t.n AS n_total, t.target_n, k.n_kept,
           |  round(cast(k.n_kept AS double) / cast(t.n AS double), 6) AS keep_frac
           |FROM tgt t JOIN k ON k.lang = t.lang ORDER BY t.lang""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      import org.apache.spark.sql.expressions.Window
      val docs = t(s, d, "documents").select("doc_id", "lang", "text")
      val g = docs.groupBy("lang").agg(count(lit(1)).as("n"))
        .withColumn("wfp",
          floor(sqrt(col("n").cast("double")) * 1000000).cast("long"))
      // the normalizer is a 1-row integer aggregate — broadcast, never
      // a driver-side collect
      val tot = g.agg(sum("n").cast("long").as("nn"),
        sum("wfp").cast("long").as("ww"))
      val tgt = g.crossJoin(broadcast(tot))
        .select(col("lang"), col("n"),
          least(col("n"), floor(expr("cast(nn div 2 AS double)")
            * (col("wfp").cast("double") / col("ww").cast("double")))
            .cast("long")).as("target_n"))
      val rk = docs.withColumn("rk", row_number().over(
        Window.partitionBy("lang")
          .orderBy(expr(XSql.charHash("text")), col("doc_id"))))
      val kept = rk.join(broadcast(tgt.select("lang", "target_n")), "lang")
        .filter(col("rk") <= col("target_n"))
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
      tgt.join(kept, "lang")
        .select(col("lang"), col("n").as("n_total"), col("target_n"),
          col("n_kept"),
          round(col("n_kept").cast("double") / col("n").cast("double"), 6)
            .as("keep_frac"))
        .orderBy("lang")
    },

    // ---------------------------------------------------------------
    // Distributed classifier TRAINING — the fastText-style quality/
    // language-filter probe, trained by gradient descent without an ML
    // runtime. The determinism discipline is a22/k18's taken one step
    // further: per-doc features quantize to exact integers (ratio ×
    // 1000, floor division — both engines floor nonnegative ints), and
    // because the probe's activation is LINEAR (p = 0.5 + z/4, the
    // first-order sigmoid around 0), every GD step is linear in the
    // weights — so the WHOLE multi-round training collapses onto fixed
    // integer sufficient statistics (n, Σa, Σaaᵀ, Σy·a: ONE map-side-
    // combinable aggregate pass over the corpus, order-invariant
    // int64 sums). The 3 unrolled GD rounds then run in chained 1-row
    // projections — pure scalar IEEE +,×,/ on exact ints, identical in
    // both engines (no exp/ln anywhere, so no libm divergence; a true
    // logistic sigmoid swaps in by sampling the same harness's scored
    // pass). Final pass: every doc scored under the trained weights
    // via ONE broadcast of the 1-row weight table. At 100 TB: two
    // corpus scans total (stats + scoring), KB of driver-free state.
    // On this synthetic corpus lang is independent of the text surface
    // (t3's documented property), so GD correctly converges toward the
    // majority class — the gate checks the TRAINER's arithmetic
    // (weights to the bit, exact prediction counts), not model skill.
    Q("c13_quality_classifier",
      "linear-probe classifier (lang='en' from surface features) trained by 3 unrolled GD rounds over exact integer sufficient stats",
      {
        implicit val dl: Dialect = SqlDuck
        val feat =
          s"""f AS (SELECT doc_id,
             |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
             |  (1000 * ${dl.arrSize(dl.filt(wordsC, "w_", s"list_contains(${stopArr(SqlDuck)}, w_)"))})
             |    // greatest(${dl.arrSize(wordsC)}, 1) AS a1,
             |  (1000 * length(regexp_replace(text, '[^a-z]', '', 'g')))
             |    // greatest(n_chars, 1) AS a2
             | FROM documents)""".stripMargin
        "WITH " + (Seq(feat, probeStatsSql) ++ probeRoundCtes).mkString(",\n") +
          s"""
             |SELECT w0, w1, w2, b0 AS n_pos, n AS n_total,
             |  cast(sum(CASE WHEN (CASE WHEN ${probeZ} > 0.0 THEN 1 ELSE 0 END) = y
             |           THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
             |FROM f, r$ProbeRounds
             |GROUP BY w0, w1, w2, b0, n""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val docs = t(s, d, "documents")
      val f = docs.select(col("doc_id"),
        when(col("lang") === "en", 1L).otherwise(0L).as("y"),
        expr(s"(1000 * ${dl.arrSize(dl.filt(wordsC, "w_", s"array_contains(${stopArr(SqlSpark)}, w_)"))})" +
          s" div greatest(${dl.arrSize(wordsC)}, 1)").as("a1"),
        expr("(1000 * length(regexp_replace(text, '[^a-z]', '')))" +
          " div greatest(n_chars, 1)").as("a2"))
      val stats = f.agg(
        count(lit(1)).cast("long").as("n"),
        sum("a1").cast("long").as("sa1"), sum("a2").cast("long").as("sa2"),
        sum(col("a1") * col("a1")).cast("long").as("g11"),
        sum(col("a1") * col("a2")).cast("long").as("g12"),
        sum(col("a2") * col("a2")).cast("long").as("g22"),
        sum("y").cast("long").as("b0"),
        sum(col("y") * col("a1")).cast("long").as("b1"),
        sum(col("y") * col("a2")).cast("long").as("b2"))
      // the 3 GD rounds: chained 1-row projections over the stats row
      val trained = probeRoundExprs.foldLeft(stats) { case (df, es) =>
        df.select(ProbeStatCols.map(col) ++ es.zipWithIndex.map { case (e, i) =>
          expr(e).as(s"w$i") } : _*)
      }
      // scoring rides the SAME broadcast weight row, and grouping on
      // the (constant) weight/stat columns folds everything into one
      // aggregate — one corpus scan for stats, one for scoring
      f.crossJoin(broadcast(trained))
        .groupBy("w0", "w1", "w2", "b0", "n")
        .agg(sum(when(when(expr(probeZ) > 0.0, 1L).otherwise(0L) === col("y"),
          1L).otherwise(0L)).cast("long").as("n_correct"))
        .select(col("w0"), col("w1"), col("w2"),
          col("b0").as("n_pos"), col("n").as("n_total"), col("n_correct"))
    },

    // ---------------------------------------------------------------
    // k-ANONYMITY generalization — the release-governance discipline
    // t13's PII regexes do not give: even with direct identifiers
    // scrubbed, a row whose QUASI-identifier combination (lang,
    // source) is rare re-identifies its subject by joining any outside
    // table on those columns. Classic local-recoding ladder, fully
    // deterministic: a (lang, source) group with >= k rows releases
    // as-is (level 0); smaller groups generalize lang away and re-test
    // on (*, source) (level 1); what still fails pools into (*, *)
    // (level 2) — and if even the pooled remainder is < k it is
    // SUPPRESSED, never released (on this corpus one source's 9-row
    // remainder takes exactly that path, so all four outcomes gate).
    // Scale shape: three aggregates over strictly shrinking row sets,
    // each verdict a broadcast join back (group-count tables are
    // |langs x sources|-bounded); no window, no self-join. The same
    // ladder runs on any quasi-identifier list; k = 10 here.
    Q("c14_k_anonymity",
      "k-anonymity release ladder over (lang, source): generalize until every group >= k, else suppress",
      s"""WITH g0 AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
         |lvl0 AS (SELECT lang, source FROM g0 WHERE n >= $KAnon),
         |r1 AS (SELECT d.doc_id, d.lang, d.source FROM documents d
         |       LEFT JOIN lvl0 USING (lang, source) WHERE lvl0.lang IS NULL),
         |g1 AS (SELECT source, count(*) AS n FROM r1 GROUP BY 1),
         |lvl1 AS (SELECT source FROM g1 WHERE n >= $KAnon),
         |r2 AS (SELECT r1.doc_id, r1.source FROM r1
         |       LEFT JOIN lvl1 USING (source) WHERE lvl1.source IS NULL),
         |n2 AS (SELECT count(*) AS n FROM r2)
         |SELECT doc_id, anon_lang, anon_source, level FROM (
         |  SELECT d.doc_id, d.lang AS anon_lang, d.source AS anon_source,
         |         'l0' AS level
         |  FROM documents d JOIN lvl0 USING (lang, source)
         |  UNION ALL
         |  SELECT r1.doc_id, '*', r1.source, 'l1'
         |  FROM r1 JOIN lvl1 USING (source)
         |  UNION ALL
         |  SELECT r2.doc_id, '*', '*',
         |         CASE WHEN n2.n >= $KAnon THEN 'l2' ELSE 'suppressed' END
         |  FROM r2, n2
         |) ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents").select("doc_id", "lang", "source")
      val g0 = docs.groupBy("lang", "source").agg(count(lit(1)).as("n"))
      val lvl0 = g0.filter(col("n") >= KAnon).select("lang", "source")
      val safe0 = docs.join(broadcast(lvl0), Seq("lang", "source"))
        .select(col("doc_id"), col("lang").as("anon_lang"),
          col("source").as("anon_source"), lit("l0").as("level"))
      val r1 = docs.join(broadcast(lvl0), Seq("lang", "source"), "left_anti")
      val lvl1 = r1.groupBy("source").agg(count(lit(1)).as("n"))
        .filter(col("n") >= KAnon).select("source")
      val safe1 = r1.join(broadcast(lvl1), Seq("source"))
        .select(col("doc_id"), lit("*").as("anon_lang"),
          col("source").as("anon_source"), lit("l1").as("level"))
      val r2 = r1.join(broadcast(lvl1), Seq("source"), "left_anti")
      val n2 = r2.agg(count(lit(1)).as("n"))
      val tail = r2.crossJoin(broadcast(n2))
        .select(col("doc_id"), lit("*").as("anon_lang"),
          lit("*").as("anon_source"),
          when(col("n") >= KAnon, "l2").otherwise("suppressed").as("level"))
      safe0.unionByName(safe1).unionByName(tail).orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // SOFT dedup — the alternative to dropping near-dups (d7/c3's
    // policy): keep every copy but DOWN-WEIGHT it by its cluster size,
    // so a document duplicated k times contributes total loss weight 1
    // (the SoftDeDup idea: duplication should not multiply gradient
    // mass, but dropping loses the copies' unique spans). Weight =
    // floor(1e6 / cluster_size) as an exact integer — engine-identical
    // and order-free where a float reciprocal sum would drift.
    // Pipeline: the SAME LSH pair discovery + connected components the
    // hard-dedup path uses, one count per component, one broadcast
    // join back; singletons weight 1e6. At 100 TB this costs exactly
    // what d7 costs plus one keyed count.
    Q("c15_soft_dedup",
      "SoftDeDup: per-doc training weight 1e6/cluster_size instead of dropping near-dups",
      {
        implicit val dl: Dialect = SqlDuck
        val wordsE = XSql.words("text")
        s"""WITH RECURSIVE
           |w AS (SELECT doc_id, ${XSql.wordHashes(wordsE)} AS wh FROM documents),
           |sh AS (SELECT doc_id, sh, ${XSql.minhashSig("sh")} AS sig
           |       FROM (SELECT doc_id, ${XSql.shingleHashes("wh")} AS sh FROM w)),
           |bands AS (SELECT doc_id, unnest(${XSql.bandKeys("sig")}) AS band_key,
           |                 unnest(range(0, ${XSql.LshBands})) AS band_idx FROM sh),
           |${graft.operators.Lsh.cappedCandSql("bands", "band_idx", "band_key", "cand")},
           |pairs AS (SELECT c.doc_a, c.doc_b FROM cand c
           |          JOIN sh sa ON sa.doc_id = c.doc_a
           |          JOIN sh sb ON sb.doc_id = c.doc_b
           |          WHERE ${XSql.jaccard("sa.sh", "sb.sh")} >= 0.3),
           |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
           |        UNION SELECT doc_b, doc_a FROM pairs),
           |reach(src, node) AS (
           |  SELECT a, a FROM sym
           |  UNION
           |  SELECT r.src, s.b FROM reach r JOIN sym s ON r.node = s.a),
           |comp AS (SELECT src AS doc_id, min(node) AS component
           |         FROM reach GROUP BY src),
           |sz AS (SELECT component, count(*) AS cluster_size
           |       FROM comp GROUP BY component)
           |SELECT d.doc_id,
           |  cast(coalesce(sz.cluster_size, 1) AS BIGINT) AS cluster_size,
           |  cast(1000000 // coalesce(sz.cluster_size, 1) AS BIGINT) AS weight_e6
           |FROM documents d
           |LEFT JOIN comp ON comp.doc_id = d.doc_id
           |LEFT JOIN sz ON sz.component = comp.component
           |ORDER BY d.doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      import graft.operators.{ConnectedComponents, Lsh}
      val docs = t(s, d, "documents")
      val sh = docs
        .withColumn("sh", expr(XSql.shinglesOfText("text")))
        .select("doc_id", "sh")
      val comp = ConnectedComponents.minLabel(
        Lsh.verifiedPairsCapped(sh, 0.3), "doc_a", "doc_b")
        .select(col("node").as("doc_id"), col("component"))
      val sz = comp.groupBy("component").agg(count(lit(1)).as("cluster_size"))
      docs.select("doc_id")
        .join(broadcast(comp), Seq("doc_id"), "left")
        .join(broadcast(sz), Seq("component"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_size"), lit(1L)).cast("long").as("cluster_size"),
          expr("cast(1000000 div coalesce(cluster_size, 1) AS BIGINT)")
            .as("weight_e6"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // UniMax ALLOCATION (Chung et al. 2023) — the mixing policy that
    // replaced temperature sampling for multilingual pretraining:
    // give every language at most K epochs of its data and
    // waterfill a total token budget B across languages, so
    // low-resource languages are never over-repeated past K and the
    // leftover budget flows to high-resource ones. Closed form, no
    // iteration: sort languages ASCENDING by their cap K·n, and the
    // threshold T with Σ min(cap_i, T) = B falls out of one window
    // pass over prefix sums (the first language whose cap exceeds its
    // even share of the remaining budget pins T; everyone below keeps
    // their cap, everyone above gets T). c11's temperature rebalance
    // is the α-power competitor; this is the epoch-capped policy. The
    // whole computation is language-cardinality-sized — at 100 TB it
    // runs on a few hundred aggregate rows after ONE map-side-
    // combinable count, and the allocation ships to the sampler as a
    // broadcast. Budget here: 2 average epochs (B = 2·Σn), cap K = 3.
    Q("c16_unimax_allocation",
      "UniMax epoch-cap waterfilling: per-language budget with K=3 epoch cap, threshold from sorted prefix sums",
      s"""WITH g AS (SELECT lang, cast(count(*) AS BIGINT) AS n,
         |             cast(3 * count(*) AS BIGINT) AS cap
         |           FROM documents GROUP BY lang),
         |tot AS (SELECT cast(2 * sum(n) AS BIGINT) AS b FROM g),
         |ord AS (SELECT lang, n, cap, b,
         |    row_number() OVER (ORDER BY cap, lang) AS idx,
         |    coalesce(sum(cap) OVER (ORDER BY cap, lang
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre,
         |    count(*) OVER () AS l
         |  FROM g, tot),
         |tc AS (SELECT *,
         |    cast(b - pre AS double) / cast(l - idx + 1 AS double) AS t_cand
         |  FROM ord),
         |st AS (SELECT *,
         |    min(CASE WHEN cast(cap AS double) > t_cand THEN idx END) OVER ()
         |      AS stop_idx
         |  FROM tc),
         |fin AS (SELECT *,
         |    max(CASE WHEN idx = stop_idx THEN t_cand END) OVER () AS t_final
         |  FROM st),
         |fin2 AS (SELECT *,
         |    CASE WHEN stop_idx IS NULL THEN cast(cap AS double)
         |         ELSE least(cast(cap AS double), t_final) END AS alloc
         |  FROM fin)
         |SELECT lang, n, cap,
         |  cast(floor(1000000 * alloc) AS BIGINT) AS alloc_e6,
         |  cast(floor(1000000 * alloc / cast(n AS double)) AS BIGINT) AS epochs_e6
         |FROM fin2 ORDER BY lang""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val g = t(s, d, "documents").groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n"))
        .withColumn("cap", (col("n") * 3).cast("long"))
      val byCap = Window.orderBy(col("cap"), col("lang"))
      val whole = Window.partitionBy()
      // the budget is a whole-frame window over the ALREADY-aggregated
      // language rows — a second agg+crossJoin would re-scan the
      // corpus through a second lineage (PlanSpec gates one scan)
      val ord = g
        .withColumn("b", (sum("n").over(whole) * 2).cast("long"))
        .withColumn("idx", row_number().over(byCap))
        .withColumn("pre", coalesce(sum("cap").over(
          byCap.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("l", count(lit(1)).over(whole))
      val tc = ord.withColumn("t_cand",
        (col("b") - col("pre")).cast("double") /
          (col("l") - col("idx") + 1).cast("double"))
      val st = tc.withColumn("stop_idx",
        min(when(col("cap").cast("double") > col("t_cand"), col("idx")))
          .over(whole))
      val fin = st.withColumn("t_final",
        max(when(col("idx") === col("stop_idx"), col("t_cand"))).over(whole))
        .withColumn("alloc",
          when(col("stop_idx").isNull, col("cap").cast("double"))
            .otherwise(least(col("cap").cast("double"), col("t_final"))))
      fin.select(col("lang"), col("n"), col("cap"),
          floor(lit(1000000) * col("alloc")).cast("long").as("alloc_e6"),
          floor(lit(1000000) * col("alloc") / col("n").cast("double"))
            .cast("long").as("epochs_e6"))
        .orderBy("lang")
    },

    // ---------------------------------------------------------------
    // DoReMi-style domain REWEIGHTING (Xie et al. 2023) — the mixing
    // loop that sets domain sampling weights from measured excess
    // loss instead of corpus size: domains where the proxy model
    // does WORSE than the mixture average get UPweighted so the next
    // training round spends more tokens there. Three rounds of the
    // multiplicative-weights update α'_i = α_i·(1 + η·(loss_i −
    // Σ_j α_j·loss_j)) / Z (the linearized form of DoReMi's
    // exponentiated gradient — chosen because +,*,/ doubles are
    // bit-identical across engines where exp() is not), with the
    // per-domain proxy loss = fraction of sub-150-char documents (a
    // deterministic stand-in for per-domain LM loss; the update
    // machinery is the operator). Scale shape: ONE map-side-
    // combinable per-domain aggregate over the corpus, then the
    // iteration runs on domain-cardinality rows — at 100 TB the loop
    // costs nothing and the final α broadcasts into the sampler.
    Q("c17_doremi_weights",
      "DoReMi-style multiplicative-weights domain mixing: 3 rounds of excess-loss reweighting, exact fixed-point",
      {
        // η = 1/2 folded into the fixed-point update: the multiplier
        // 1 + η·(loss − mix) becomes (2e6 + loss6 − mix6) / 2e6 with
        // a numerator provably in [1e6, 3e6] — every division is by a
        // positive value, so the engines' differing negative-division
        // conventions (truncate vs floor) never engage; every sum is
        // an INTEGER sum, so accumulation order cannot move a bit
        def roundCtes(r: Int): String = {
          val prev = if (r == 1) "w0" else s"w${r - 1}"
          s"""m$r AS (SELECT cast(sum(w9 * loss6) // 1000000000 AS BIGINT) AS mix6
             |        FROM $prev),
             |u$r AS (SELECT source, n_docs, loss6,
             |          cast((w9 * (2000000 + loss6 - (SELECT mix6 FROM m$r)))
             |            // 2000000 AS BIGINT) AS wu9
             |        FROM $prev),
             |z$r AS (SELECT cast(sum(wu9) AS BIGINT) AS z9 FROM u$r),
             |w$r AS (SELECT source, n_docs, loss6,
             |          cast((wu9 * 1000000000) // (SELECT z9 FROM z$r) AS BIGINT)
             |            AS w9 FROM u$r)""".stripMargin
        }
        s"""WITH g AS (SELECT source, cast(count(*) AS BIGINT) AS n_docs,
           |    cast(sum(CASE WHEN n_chars < 150 THEN 1 ELSE 0 END) AS BIGINT)
           |      AS n_small
           |  FROM documents GROUP BY source),
           |l AS (SELECT cast(count(*) AS BIGINT) AS n_dom FROM g),
           |w0 AS (SELECT source, n_docs,
           |    cast((1000000 * n_small) // n_docs AS BIGINT) AS loss6,
           |    cast(1000000000 // (SELECT n_dom FROM l) AS BIGINT) AS w9 FROM g),
           |${roundCtes(1)},
           |${roundCtes(2)},
           |${roundCtes(3)}
           |SELECT source, n_docs, loss6 AS loss_e6, w9 AS weight_e9
           |FROM w3 ORDER BY source""".stripMargin
      }) { (s, d) =>
      val g = t(s, d, "documents").groupBy("source")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(when(col("n_chars") < 150, 1L).otherwise(0L)).cast("long")
            .as("n_small"))
      // every round-level aggregate (mixture loss, normalizer) is a
      // whole-frame WINDOW over the domain-cardinality rows — one
      // lineage, one corpus scan (agg+crossJoin per round would
      // re-scan the corpus once per broadcast subtree); integer sums
      // are order-free, so the window's single-partition shuffle of a
      // handful of rows is the entire iteration cost
      var w = g
        .withColumn("n_dom", expr("count(1) over ()"))
        .select(col("source"), col("n_docs"),
          expr("cast((1000000 * n_small) div n_docs AS BIGINT)").as("loss6"),
          expr("cast(1000000000 div n_dom AS BIGINT)").as("w9"))
      for (_ <- 1 to 3) {
        w = w
          .withColumn("mix6",
            expr("cast((sum(w9 * loss6) over ()) div 1000000000 AS BIGINT)"))
          .withColumn("wu9",
            expr("cast((w9 * (2000000 + loss6 - mix6)) div 2000000 AS BIGINT)"))
          .withColumn("z9", expr("cast(sum(wu9) over () AS BIGINT)"))
          .select(col("source"), col("n_docs"), col("loss6"),
            expr("cast((wu9 * 1000000000) div z9 AS BIGINT)").as("w9"))
      }
      w.select(col("source"), col("n_docs"), col("loss6").as("loss_e6"),
          col("w9").as("weight_e9"))
        .orderBy("source")
    },

    // ---------------------------------------------------------------
    // Weighted sampling without replacement — Efraimidis–Spirakis
    // (IPL 2006): each doc draws u ∈ (0,1) and the k largest
    // u^(1/w) win, which is EXACTLY a w-proportional sample without
    // replacement, yet needs only one scan + a bounded top-k (no
    // global sort, no sequential draw — the property that makes it
    // the distributed-sampling workhorse). Selection orders by
    // ln(u)/w (same order, no underflow for tiny weights); u is a
    // Knuth multiplicative hash of doc_id — a bijection mod 2^32, so
    // the draw is deterministic, seedable, and identical in both
    // engines (the oracle literally re-runs the same arithmetic).
    // Scale shape: the plan is gated to TakeOrderedAndProject — each
    // partition keeps its local top-20 and only k rows per partition
    // reach the driver-side merge; a 100 TB corpus pays one scan.
    Q("c22_weighted_sample",
      "Efraimidis-Spirakis weighted sample (k=20, weight = token count): one scan + bounded top-k, no global sort",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH d AS (
           |  SELECT doc_id, cast(${dl.arrSize(wordsC)} AS BIGINT) AS weight,
           |    (cast((doc_id * 2654435761) % 4294967296 AS double) + 0.5)
           |      / 4294967296.0 AS u
           |  FROM documents WHERE ${dl.arrSize(wordsC)} > 0),
           |s AS (
           |  SELECT doc_id, weight, ln(u) / cast(weight AS double) AS es_key
           |  FROM d ORDER BY es_key DESC, doc_id LIMIT 20)
           |SELECT doc_id, weight FROM s ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val drawn = t(s, d, "documents")
        .selectExpr("doc_id",
          s"cast(${dl.arrSize(wordsC)} AS BIGINT) AS weight")
        .filter(col("weight") > 0)
        .withColumn("u",
          (((col("doc_id") * lit(2654435761L)) % lit(4294967296L))
            .cast("double") + lit(0.5)) / lit(4294967296.0))
        .withColumn("es_key", log(col("u")) / col("weight").cast("double"))
      val sample = drawn
        .orderBy(col("es_key").desc, col("doc_id")).limit(20)
      val plan = sample.queryExecution.executedPlan.toString
      require(plan.contains("TakeOrderedAndProject"),
        s"c22: top-k selection must be TakeOrderedAndProject (bounded " +
          s"per-partition heaps), not a global sort:\n$plan")
      sample.select("doc_id", "weight").orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Per-domain token-budget caps — the CommonCrawl-pipeline rule "no
    // source may exceed its share of the corpus": within each source,
    // documents are admitted in quality order (longest first — the
    // stand-in quality score; ties broken by doc_id for determinism)
    // until the domain's cumulative chars reach its budget (here an
    // equal split of a quarter of the corpus). The kernel is a
    // RUNNING SUM per domain — at 100 TB one mega-domain would
    // serialize a `sum OVER (PARTITION BY source ORDER BY …)` onto a
    // single task, so the scan runs through PrefixSum.runningSum (the
    // t12b two-pass range-partitioned scan: big domains split across
    // balanced slices, offsets broadcast back). The (quality DESC,
    // doc_id) order folds into ONE monotone bigint key so the scan
    // orders by a single column; the budget is one broadcast scalar.
    // Oracle states the same admission rule with a plain SQL window.
    Q("c23_domain_cap",
      "per-source token budget: quality-ordered admission under a cumulative cap, skew-safe prefix scan",
      """WITH cap AS (
        |  SELECT CAST(sum(n_chars) // (4 * count(DISTINCT source)) AS BIGINT)
        |    AS cap FROM documents),
        |r AS (
        |  SELECT source, n_chars,
        |    sum(n_chars) OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id) AS run
        |  FROM documents)
        |SELECT source, count(*) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS kept_chars
        |FROM r, cap WHERE r.run <= cap.cap
        |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val docs = t(s, d, "documents").select("doc_id", "source", "n_chars")
      // one broadcast scalar: the equal-split budget (integer-exact in
      // both engines: div truncates, all values positive)
      val cap = docs.agg(
        expr("sum(n_chars) div (4 * count(DISTINCT source))").as("cap"))
      // (n_chars DESC, doc_id ASC) as ONE monotone key: doc_id is
      // globally unique and < 1e10, so -n_chars·1e10 + doc_id orders
      // identically and keeps the scan single-column
      val keyed = docs.withColumn("ord",
        -col("n_chars") * lit(10000000000L) + col("doc_id"))
      val run = graft.operators.PrefixSum.runningSum(
        keyed, Seq("source"), "ord", "n_chars", "run")
      run.join(broadcast(cap))
        .filter(col("run") <= col("cap"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).cast("long").as("kept_chars"))
        .orderBy("source")
    }
  )

  /** c14's anonymity threshold. */
  private def KAnon = 10

  // ------------------------------------------------------------ c13
  // Linear-probe trainer internals. Feature space: x = (1, a1/1000,
  // a2/1000) with a1/a2 exact integer per-mille ratios; activation
  // p = 0.5 + z/4 (first-order sigmoid), squared-loss gradient
  // ∇_i = (0.5·Σx_i + 0.25·(Σxxᵀ·w)_i − Σy·x_i) / n, step η = 0.5.
  // Everything below emits IDENTICAL expression strings for both
  // engines, so the trained doubles are bit-equal.

  private def ProbeRounds = 3
  private def ProbeStatCols =
    Seq("n", "sa1", "sa2", "g11", "g12", "g22", "b0", "b1", "b2")

  private def wordsC(implicit d: Dialect) = XSql.words("text")

  private def stopArr(d: Dialect): String = {
    val items = Seq("the", "a", "and", "of", "to").map(s => s"'$s'")
    d match {
      case SqlSpark => items.mkString("array(", ", ", ")")
      case SqlDuck  => items.mkString("[", ", ", "]")
    }
  }

  /** Gram matrix Σxxᵀ in real feature space, as expressions over the
    * integer stat columns (row 0 doubles as Σx — the bias row).
    */
  private def probeG: Seq[Seq[String]] = Seq(
    Seq("cast(n as double)",
      "(cast(sa1 as double) / 1000.0)", "(cast(sa2 as double) / 1000.0)"),
    Seq("(cast(sa1 as double) / 1000.0)",
      "(cast(g11 as double) / 1000000.0)", "(cast(g12 as double) / 1000000.0)"),
    Seq("(cast(sa2 as double) / 1000.0)",
      "(cast(g12 as double) / 1000000.0)", "(cast(g22 as double) / 1000000.0)"))

  private def probeB: Seq[String] = Seq("cast(b0 as double)",
    "(cast(b1 as double) / 1000.0)", "(cast(b2 as double) / 1000.0)")

  private def probeStep(prev: Seq[String]): Seq[String] =
    (0 until 3).map { i =>
      s"(${prev(i)} - 0.5 * ((0.5 * ${probeG(0)(i)}" +
        s" + 0.25 * (${probeG(i)(0)} * ${prev(0)} + ${probeG(i)(1)} * ${prev(1)}" +
        s" + ${probeG(i)(2)} * ${prev(2)}) - ${probeB(i)}) / cast(n as double)))"
    }

  /** Per-round weight-update expressions: round 1 from w = 0, later
    * rounds from the previous round's w columns.
    */
  private def probeRoundExprs: Seq[Seq[String]] =
    probeStep(Seq("0.0", "0.0", "0.0")) +:
      Seq.fill(ProbeRounds - 1)(probeStep(Seq("w0", "w1", "w2")))

  /** The r1..rN chained-projection CTEs for the oracle SQL. */
  private def probeRoundCtes: Seq[String] =
    probeRoundExprs.zipWithIndex.map { case (es, idx) =>
      val src = if (idx == 0) "stats" else s"r$idx"
      s"r${idx + 1} AS (SELECT ${ProbeStatCols.mkString(", ")}, " +
        es.zipWithIndex.map { case (e, i) => s"$e AS w$i" }.mkString(", ") +
        s" FROM $src)"
    }

  private def probeStatsSql: String =
    """stats AS (SELECT cast(count(*) AS BIGINT) AS n,
      |  cast(sum(a1) AS BIGINT) AS sa1, cast(sum(a2) AS BIGINT) AS sa2,
      |  cast(sum(a1*a1) AS BIGINT) AS g11, cast(sum(a1*a2) AS BIGINT) AS g12,
      |  cast(sum(a2*a2) AS BIGINT) AS g22,
      |  cast(sum(y) AS BIGINT) AS b0, cast(sum(y*a1) AS BIGINT) AS b1,
      |  cast(sum(y*a2) AS BIGINT) AS b2
      | FROM f)""".stripMargin

  /** The probe's decision value z = w·x over a doc's feature row —
    * identical text in both dialects.
    */
  private def probeZ: String =
    "(w0 + w1 * (cast(a1 as double) / 1000.0) + w2 * (cast(a2 as double) / 1000.0))"
}
