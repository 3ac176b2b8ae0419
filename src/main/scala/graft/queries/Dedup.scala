package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.XSql
import graft.functions.XSql.{Dialect, Spark => SqlSpark, Duck => SqlDuck}

/** Deduplication operators over `documents` / `embeddings` — exact,
  * MinHash+LSH, SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (the point of each variant):
  *   - exact:    hash-groupBy — one shuffle on a 64-bit-ish key, fully
  *               map-side combinable; at 100 TB this is the cheapest op
  *               in the pipeline.
  *   - MinHash:  per-doc signature is a narrow map; LSH banding turns
  *               the O(n^2) pair problem into an equi-join on band keys
  *               (shuffle ~ n * bands rows, candidates only where
  *               buckets collide). This is THE scale path for near-dup.
  *   - SimHash:  one 30-bit value per doc; near-dup = small Hamming
  *               distance, bucketable by signature chunks.
  *   - n-gram Jaccard: exact pair similarity, only ever run *blocked*
  *               (here: by lang) — the verification stage after LSH,
  *               never the discovery stage.
  *   - cosine:   label-blocked exact pair similarity over embeddings
  *               (the verify stage of an ANN pipeline).
  *
  * All hashing from [[XSql]] — bit-identical across Spark and DuckDB.
  */
object Dedup {

  private def wordsE(implicit d: Dialect) = XSql.words("text")

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    Q("d1_exact_dedup",
      "exact dedup by content hash over a doubled corpus (keep min id)",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH u AS (SELECT doc_id, text FROM documents
           |           UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents)
           |SELECT ${XSql.charHash("text")} AS text_hash,
           |       min(doc_id) AS keep_id, count(*) AS n_copies
           |FROM u GROUP BY 1 ORDER BY text_hash""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val docs = t(s, d, "documents").select("doc_id", "text")
      val doubled = docs.unionByName(
        docs.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      doubled
        .withColumn("text_hash", expr(XSql.charHash("text")))
        .groupBy("text_hash")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("text_hash")
    },

    // ---------------------------------------------------------------
    Q("d2_minhash_sig",
      "MinHash signatures (k=16) over word 3-gram shingles",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH w AS (SELECT doc_id, ${XSql.wordHashes(wordsE)} AS wh FROM documents),
           |sh AS (SELECT doc_id, ${XSql.shingleHashes("wh")} AS sh FROM w),
           |sig AS (SELECT doc_id, ${XSql.minhashSig("sh")} AS sig FROM sh)
           |SELECT doc_id,
           |  array_to_string(list_transform(sig, x_ -> cast(x_ as varchar)), ',') AS sig_csv
           |FROM sig ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      // one fused native chain: text -> shingles -> signature (no
      // interpreted lambda stages, no intermediate word arrays)
      t(s, d, "documents")
        .withColumn("sig", expr(XSql.minhashSig(XSql.shinglesOfText("text"))))
        .select(col("doc_id"),
          expr("array_join(transform(sig, x_ -> cast(x_ as string)), ',')").as("sig_csv"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    Q("d3_lsh_near_dup",
      "MinHash-LSH near-dup pairs: occupancy-capped band-bucket join, verified Jaccard >= 0.5",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH w AS (SELECT doc_id, ${XSql.wordHashes(wordsE)} AS wh FROM documents),
           |sh AS (SELECT doc_id, ${XSql.shingleHashes("wh")} AS sh FROM w),
           |sig AS (SELECT doc_id, sh, ${XSql.minhashSig("sh")} AS sig FROM sh),
           |bands AS (SELECT doc_id, unnest(${XSql.bandKeys("sig")}) AS band_key,
           |                 unnest(range(0, ${XSql.LshBands})) AS band_idx FROM sig),
           |${graft.operators.Lsh.cappedCandSql("bands", "band_idx", "band_key", "cand")}
           |SELECT c.doc_a, c.doc_b, ${XSql.jaccard("sa.sh", "sb.sh")} AS jacc
           |FROM cand c
           |JOIN sh sa ON sa.doc_id = c.doc_a
           |JOIN sh sb ON sb.doc_id = c.doc_b
           |WHERE ${XSql.jaccard("sa.sh", "sb.sh")} >= 0.5
           |ORDER BY doc_a, doc_b""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      // native sorted shingles: jaccard/minhash are order-invariant,
      // and sorted inputs let the native intersect skip its per-pair
      // sort (the dominant pairwise cost). The band machinery is the
      // shared operators/Lsh implementation, in its occupancy-CAPPED
      // mode (Lsh.BucketCap): the collision join is O(buckets·cap²)
      // instead of the data's O(Σ occupancy²) — the bound that holds
      // when a 100 TB crawl's boilerplate saturates band keys. The
      // oracle applies the identical deterministic cap (cbands CTE),
      // so the gate covers the cap arithmetic too.
      val sh = t(s, d, "documents")
        .withColumn("sh", expr(XSql.shinglesOfText("text")))
        .select("doc_id", "sh")
      sh.cache()
      graft.operators.Lsh.verifiedPairsCapped(sh, 0.5)
        .orderBy("doc_a", "doc_b")
    },

    // ---------------------------------------------------------------
    Q("d4_simhash",
      "30-bit SimHash per document + Hamming distance to doc 0",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH w AS (SELECT doc_id, ${XSql.wordHashes(wordsE)} AS wh FROM documents),
           |s AS (SELECT doc_id, ${XSql.simhash("wh")} AS simhash FROM w)
           |SELECT s.doc_id, s.simhash,
           |       bit_count(xor(s.simhash, s0.simhash)) AS hamming_to_0
           |FROM s, (SELECT simhash FROM s WHERE doc_id = 0) s0
           |ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val sims = t(s, d, "documents")
        .select(col("doc_id"),
          expr(XSql.simhash(XSql.wordHashesOfText("text"))).as("simhash"))
      val s0 = sims.filter(col("doc_id") === 0)
        .select(col("simhash").as("simhash_0"))
      sims.crossJoin(broadcast(s0))
        .select(col("doc_id"), col("simhash"),
          bit_count(col("simhash").bitwiseXOR(col("simhash_0"))).as("hamming_to_0"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // SimHash near-dup pairs: Hamming distance <= 3 over the 30-bit
    // signature. Pigeonhole banding — split the signature into 4
    // chunks; any pair within distance 3 must agree on at least one
    // chunk, so candidates come from 4 equi-joins on (chunk_idx,
    // chunk_value), never an all-pairs scan.
    Q("d4b_simhash_pairs",
      "SimHash near-dup pairs via pigeonhole chunk banding, hamming <= 1",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH w AS (SELECT doc_id, ${XSql.wordHashes(wordsE)} AS wh FROM documents),
           |s AS (SELECT doc_id, ${XSql.simhash("wh")} AS sim FROM w),
           |chunks AS (
           |  SELECT doc_id, sim, unnest(range(0, 2)) AS chunk_idx,
           |         unnest([sim & 32767, (sim >> 15) & 32767]) AS chunk_val
           |  FROM s),
           |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |                a.sim AS sim_a, b.sim AS sim_b
           |         FROM chunks a JOIN chunks b
           |           ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
           |          AND a.doc_id < b.doc_id)
           |SELECT DISTINCT doc_a, doc_b, bit_count(xor(sim_a, sim_b)) AS hamming
           |FROM cand WHERE bit_count(xor(sim_a, sim_b)) <= 1
           |ORDER BY doc_a, doc_b""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val sims = t(s, d, "documents")
        .select(col("doc_id"),
          expr(XSql.simhash(XSql.wordHashesOfText("text"))).as("sim"))
      // 2 chunks of 15 bits: wide chunks keep buckets sparse (the
      // sum-of-squared-bucket-sizes is what the join pays); pigeonhole
      // needs distance < #chunks, so the threshold is 1
      val chunks = sims.select(col("doc_id"), col("sim"),
        posexplode(array(
          col("sim").bitwiseAND(32767),
          shiftright(col("sim"), 15).bitwiseAND(32767))))
        .withColumnsRenamed(Map("pos" -> "chunk_idx", "col" -> "chunk_val"))
      val a = chunks.select(col("chunk_idx"), col("chunk_val"),
        col("doc_id").as("doc_a"), col("sim").as("sim_a"))
      val b = chunks.select(col("chunk_idx"), col("chunk_val"),
        col("doc_id").as("doc_b"), col("sim").as("sim_b"))
      // filter on the cheap bit_count BEFORE deduplicating candidates:
      // the distinct then shuffles only matching pairs, not the full
      // chunk-collision cross product
      a.join(b, Seq("chunk_idx", "chunk_val"))
        .filter(col("doc_a") < col("doc_b"))
        .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
        .filter(col("hamming") <= 1)
        .select("doc_a", "doc_b", "hamming").distinct()
        .orderBy("doc_a", "doc_b")
    },

    // ---------------------------------------------------------------
    // Blocking key (lang, source) bounds the pair count: exact
    // pairwise Jaccard is quadratic per block, so the block must stay
    // small — global discovery is d3's LSH job, this is the verify-
    // style exact op. The union size is derived as |A|+|B|-|A∩B|
    // (arrays are distinct), so each pair costs ONE intersect, and the
    // intersect is computed in a materialized column (not re-evaluated
    // by a pushed-down filter).
    Q("d5_ngram_jaccard",
      "blocked exact n-gram Jaccard: pairs within (lang, source), sim >= 0.3",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH w AS (SELECT doc_id, lang, source, ${XSql.wordHashes(wordsE)} AS wh FROM documents),
           |sh AS (SELECT doc_id, lang, source, ${XSql.shingleHashes("wh")} AS sh FROM w),
           |pairs AS (
           |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |         ${dl.arrSize(dl.arrIntersect("a.sh", "b.sh"))} AS inter,
           |         ${dl.arrSize("a.sh")} AS sa, ${dl.arrSize("b.sh")} AS sb
           |  FROM sh a JOIN sh b
           |    ON a.lang = b.lang AND a.source = b.source AND a.doc_id < b.doc_id)
           |SELECT doc_a, doc_b,
           |       cast(inter as double) / cast(sa + sb - inter as double) AS jacc
           |FROM pairs
           |WHERE cast(inter as double) / cast(sa + sb - inter as double) >= 0.3
           |ORDER BY doc_a, doc_b""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      // native sorted shingles: the intersect skips per-pair sorts
      val sh = t(s, d, "documents")
        .withColumn("sh", expr(XSql.shinglesOfText("text")))
        .select("doc_id", "lang", "source", "sh")
      val a = sh.select(col("lang"), col("source"), col("doc_id").as("doc_a"),
        col("sh").as("sh_a"))
      val b = sh.select(col("lang"), col("source"), col("doc_id").as("doc_b"),
        col("sh").as("sh_b"))
      a.join(b, Seq("lang", "source"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          expr("graft_intersect_size(sh_a, sh_b)").as("inter"),
          expr(dl.arrSize("sh_a")).as("sa"), expr(dl.arrSize("sh_b")).as("sb"))
        .withColumn("jacc",
          col("inter").cast("double") / (col("sa") + col("sb") - col("inter")).cast("double"))
        .filter(col("jacc") >= 0.3)
        .select("doc_a", "doc_b", "jacc")
        .orderBy("doc_a", "doc_b")
    },

    // ---------------------------------------------------------------
    // The step AFTER pair discovery that production dedup needs:
    // LSH-verified pairs form a graph; the keep/drop unit is the
    // CONNECTED COMPONENT (pairwise-greedy breaks on chains A~B~C).
    // Spark runs iterative min-label propagation
    // (operators/ConnectedComponents, O(diameter) join+min rounds);
    // the oracle states the same fixpoint as a recursive CTE — legal
    // because min-reachable-id is a pure graph property, independent
    // of how either engine iterates.
    Q("d7_dup_components",
      "near-dup clusters: LSH pairs -> connected components (min-label)",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH RECURSIVE
           |w AS (SELECT doc_id, ${XSql.wordHashes(wordsE)} AS wh FROM documents),
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
           |  SELECT r.src, s.b FROM reach r JOIN sym s ON r.node = s.a)
           |SELECT src AS doc_id, min(node) AS component
           |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val sh = t(s, d, "documents")
        .withColumn("sh", expr(XSql.shinglesOfText("text")))
        .select("doc_id", "sh")
      val pairs = graft.operators.Lsh.verifiedPairsCapped(sh, 0.3)
        .select("doc_a", "doc_b")
      graft.operators.ConnectedComponents.minLabel(pairs, "doc_a", "doc_b")
        .select(col("node").as("doc_id"), col("component"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // INCREMENTAL near-dup dedup — the daily-crawl production shape:
    // a new batch (doc_id % 5 = 4, ~20%) is deduped against the
    // existing corpus + itself WITHOUT ever comparing old x old. Only
    // the increment's bands drive the join, so the candidate work is
    // |increment|-bounded — at 100 TB of corpus and a 0.1% daily
    // increment, that is the difference between a job and no job.
    // Policy (deterministic): a new doc drops if it near-dups any old
    // doc, or any new doc with a smaller id.
    Q("d9_incremental_dedup",
      "new-batch dedup against existing corpus (increment-bounded LSH join)",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH w AS (SELECT doc_id, ${XSql.wordHashes(wordsE)} AS wh FROM documents),
           |sh AS (SELECT doc_id, ${XSql.shingleHashes("wh")} AS sh FROM w),
           |sig AS (SELECT doc_id, sh, ${XSql.minhashSig("sh")} AS sig FROM sh),
           |bands AS (SELECT doc_id, sh, unnest(${XSql.bandKeys("sig")}) AS bk,
           |                 unnest(range(0, ${XSql.LshBands})) AS bi FROM sig),
           |new_bands AS (SELECT * FROM bands WHERE doc_id % 5 = 4),
           |old_bands AS (SELECT doc_id, sh, bk, bi FROM bands WHERE doc_id % 5 <> 4),
           |${graft.operators.Lsh.cappedStoredSql("old_bands", "bi", "bk",
               "old_capped", "doc_id, sh, bk, bi")},
           |probe AS (SELECT doc_id, sh, bk, bi, true AS b_new FROM new_bands
           |          UNION ALL
           |          SELECT doc_id, sh, bk, bi, false AS b_new FROM old_capped),
           |cand AS (
           |  SELECT DISTINCT a.doc_id AS na, b.doc_id AS ob, b.b_new
           |  FROM new_bands a JOIN probe b
           |    ON a.bi = b.bi AND a.bk = b.bk AND b.doc_id != a.doc_id
           |  WHERE ${XSql.jaccard("a.sh", "b.sh")} >= 0.5),
           |agg AS (
           |  SELECT na,
           |    count(DISTINCT CASE WHEN NOT b_new THEN ob END) AS n_dup_old,
           |    count(DISTINCT CASE WHEN b_new AND ob < na THEN ob END) AS n_dup_new_prior
           |  FROM cand GROUP BY na)
           |SELECT s.doc_id,
           |  coalesce(a.n_dup_old, 0) AS n_dup_old,
           |  coalesce(a.n_dup_new_prior, 0) AS n_dup_new_prior,
           |  coalesce(a.n_dup_old, 0) = 0 AND coalesce(a.n_dup_new_prior, 0) = 0 AS kept
           |FROM sh s LEFT JOIN agg a ON s.doc_id = a.na
           |WHERE s.doc_id % 5 = 4
           |ORDER BY s.doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val sh = t(s, d, "documents")
        .withColumn("sh", expr(XSql.shinglesOfText("text")))
        .select("doc_id", "sh")
      val bands = graft.operators.Lsh.bands(sh)
      // shared increment-bounded machinery (operators/Lsh) — only the
      // new slice drives the join, old x old never compared, and the
      // STORED side is occupancy-capped per bucket (Lsh.cappedStored:
      // a fresh doc probes O(cap) members of a saturated stored
      // bucket, not all of them — mirrored in the oracle's
      // old_capped CTE, recall-gated at sf1 where the cap binds)
      val cand = graft.operators.Lsh.incrementalCandidatesCapped(
        bands.filter(col("doc_id") % 5 === 4),
        bands.filter(col("doc_id") % 5 =!= 4), 0.5)
      val agg = cand.groupBy("na").agg(
        countDistinct(when(col("b_old"), col("ob"))).as("n_dup_old"),
        countDistinct(when(!col("b_old") && col("ob") < col("na"), col("ob")))
          .as("n_dup_new_prior"))
      sh.filter(col("doc_id") % 5 === 4)
        .join(agg, col("doc_id") === col("na"), "left")
        .select(col("doc_id"),
          coalesce(col("n_dup_old"), lit(0L)).as("n_dup_old"),
          coalesce(col("n_dup_new_prior"), lit(0L)).as("n_dup_new_prior"),
          (coalesce(col("n_dup_old"), lit(0L)) === 0
            && coalesce(col("n_dup_new_prior"), lit(0L)) === 0).as("kept"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Distances through the codegen'd native expression — the oracle
    // states the identical interleaved-fold formula. Near-dup = cosine
    // distance <= 0.6 (sim >= 0.4).
    Q("d6_embed_near_dup",
      "embedding-cosine near-dup: label-blocked pairs, distance <= 0.6",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH e AS (SELECT vec_id, label, ${dlDouble(SqlDuck)} AS v FROM embeddings),
           |n AS (SELECT vec_id, label, v, ${XSql.norm2("v")} AS n2 FROM e),
           |pairs AS (
           |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |    1.0 - ${XSql.cosineFromNorms(XSql.dot("a.v", "b.v"), "a.n2", "b.n2")} AS dist
           |  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
           |SELECT vec_a, vec_b, dist FROM pairs WHERE dist <= 0.6
           |ORDER BY vec_a, vec_b""".stripMargin
      }) { (s, d) =>
      graft.functions.GraftFunctions.register(s)
      val e = t(s, d, "embeddings")
        .withColumn("v", expr(dlDouble(SqlSpark)))
        .select("vec_id", "label", "v")
      val a = e.select(col("label"), col("vec_id").as("vec_a"), col("v").as("v_a"))
      val b = e.select(col("label"), col("vec_id").as("vec_b"), col("v").as("v_b"))
      a.join(b, Seq("label"))
        .filter(col("vec_a") < col("vec_b"))
        .withColumn("dist", expr("vector_distance(v_a, v_b, 'COSINE')"))
        .filter(col("dist") <= 0.6)
        .select("vec_a", "vec_b", "dist")
        .orderBy("vec_a", "vec_b")
    },

    // ---------------------------------------------------------------
    // The MinHash estimator itself, held against ground truth: for
    // every band-collision candidate pair, the signature agreement
    // count (an integer in 0..16 whose expectation over the hash
    // family is the Jaccard similarity) next to the exact Jaccard.
    // This is the table you read before trusting a banding config at
    // 100 TB — it shows the estimator's spread at k=16 on real pairs.
    // n_agree/16 is exact binary arithmetic (/2^4), so every gated
    // column is either an integer or a bit-pinned double.
    // Scale: candidates are band-bounded (never all-pairs); signatures
    // and shingles ride the band join — same shape as d3.
    Q("d10_minhash_estimate",
      "MinHash agreement count vs exact Jaccard for every candidate pair",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH w AS (SELECT doc_id, ${XSql.wordHashes(wordsE)} AS wh FROM documents),
           |sh AS (SELECT doc_id, ${XSql.shingleHashes("wh")} AS sh FROM w),
           |sig AS (SELECT doc_id, sh, ${XSql.minhashSig("sh")} AS sig FROM sh),
           |bands AS (SELECT doc_id, sh, sig, unnest(${XSql.bandKeys("sig")}) AS band_key,
           |                 unnest(range(0, ${XSql.LshBands})) AS band_idx FROM sig),
           |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |                ${XSql.sigAgreement("a.sig", "b.sig")} AS n_agree,
           |                ${XSql.jaccard("a.sh", "b.sh")} AS jacc
           |         FROM bands a JOIN bands b
           |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
           |          AND a.doc_id < b.doc_id)
           |SELECT doc_a, doc_b, n_agree,
           |  cast(n_agree as double) / ${XSql.MinhashK}.0 AS est_jacc, jacc
           |FROM cand ORDER BY doc_a, doc_b""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val sg = t(s, d, "documents")
        .withColumn("sh", expr(XSql.shinglesOfText("text")))
        .withColumn("sig", expr(XSql.minhashSig("sh")))
        .filter(col("sig").isNotNull)
      // The band self-join shuffles ONLY (band_idx, band_key, doc_id) —
      // the shingle + signature arrays would otherwise replicate 16×
      // (once per band) into the exchange and jaccard would recompute
      // per COLLISION instead of per PAIR (a near-dup pair collides in
      // several bands). Pairs distinct first, then each side's arrays
      // re-attach exactly once per distinct pair.
      val bs = sg.select(col("doc_id"),
        posexplode(expr(XSql.bandKeys("sig"))))
        .withColumnsRenamed(Map("pos" -> "band_idx", "col" -> "band_key"))
      val pairs = bs.select(col("band_idx"), col("band_key"),
          col("doc_id").as("doc_a"))
        .join(bs.select(col("band_idx"), col("band_key"),
          col("doc_id").as("doc_b")), Seq("band_idx", "band_key"))
        .filter(col("doc_a") < col("doc_b"))
        .select(col("doc_a"), col("doc_b"))
        .distinct()
      val docs = sg.select(col("doc_id"), col("sh"), col("sig"))
      pairs
        .join(docs.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"),
          col("sig").as("sig_a")), Seq("doc_a"))
        .join(docs.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"),
          col("sig").as("sig_b")), Seq("doc_b"))
        .select(col("doc_a"), col("doc_b"),
          expr(XSql.sigAgreement("sig_a", "sig_b")).as("n_agree"),
          expr(XSql.jaccard("sh_a", "sh_b")).as("jacc"))
        .select(col("doc_a"), col("doc_b"), col("n_agree"),
          (col("n_agree").cast("double") / lit(XSql.MinhashK.toDouble)).as("est_jacc"),
          col("jacc"))
        .orderBy("doc_a", "doc_b")
    },

    // ---------------------------------------------------------------
    // Semantic dedup over TRAINED embedding clusters — the SemDeDup
    // idea (cluster the embedding space, dedup only within a cluster)
    // with the candidate bound taken one step further: instead of the
    // paper's within-cluster pairwise pass (quadratic per cluster —
    // the role d5/d6/d8 already play as documented verify tiers), each
    // vector is keyed by (cluster, floor(dist²-to-centroid × 1000))
    // and deduped by min-id within the key — O(n), one shuffle, no
    // pair materialization. Two vectors colliding on the key sit on
    // the same thin spherical shell of the same Voronoi cell — the
    // embedding-space analogue of an exact-hash bucket. The distances
    // are bit-pinned folds, so floor-quantization is deterministic
    // cross-engine. Gated per cluster: members, survivors, sum of
    // surviving ids.
    // Scale: train (k=8 broadcast Lloyd) + one broadcast join + one
    // (cid, shell)-keyed aggregate — linear end to end; at 100 TB this
    // is the only semantic-dedup shape that is a job, not a recompute.
    Q("d11_semantic_dedup",
      "trained-cluster embedding dedup: min-id per (cluster, quantized centroid-distance shell)",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH e AS (SELECT vec_id, ${dlDouble(SqlDuck)} AS v FROM embeddings),
           |${Similarity.lloydCtes(8, dims = 64, cap = 1L << 16)},
           |dc AS (SELECT a2.vec_id, a2.cid,
           |         cast(floor(${XSql.dist2("e.v", "c1.cv")} * 1000) as bigint) AS shell
           |       FROM e JOIN a2 ON e.vec_id = a2.vec_id
           |              JOIN c1 ON a2.cid = c1.cid),
           |kept AS (SELECT cid, shell, min(vec_id) AS keep_id
           |         FROM dc GROUP BY cid, shell)
           |SELECT dc.cid, count(*) AS n_members,
           |  count(DISTINCT k.keep_id) AS n_kept,
           |  cast(sum(DISTINCT k.keep_id) as bigint) AS kept_id_sum
           |FROM dc JOIN kept k ON dc.cid = k.cid AND dc.shell = k.shell
           |GROUP BY dc.cid ORDER BY dc.cid""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      import graft.operators.KMeans
      val e = t(s, d, "embeddings")
        .withColumn("v", expr(dlDouble(SqlSpark))).select("vec_id", "v")
      // centroids fit at the driver on a BOUNDED training set — the
      // k15/k16 index-build discipline, and SemDeDup's own (the paper
      // clusters on a sample): a deterministic vec_id stride caps the
      // driver-side Lloyd at 64k vectors, so the training term is a
      // constant while the corpus-scale shell assignment below stays
      // distributed and linear. The stride is 1 at every oracle'd
      // scale (500–20k vectors), so cross-engine parity is untouched;
      // past the cap the quantizer trains on the sample exactly like a
      // production FAISS/ScaNN build. (Pre-fix the full-set retrain
      // was the steepest non-graph 10x curve: 5.3x; see BENCH_SF10.)
      val cents = KMeans.trainLocal(
        Similarity.boundTraining(e, 1, cap = 1L << 16), 8,
        Similarity.LloydRounds)
      // cluster id computed in place on the scan (withAssign's per-row
      // argmin) — no (e ⋈ assignment) vec_id join; one broadcast of
      // the k centroid rows attaches cv for the shell distance
      val dc = KMeans.withAssign(e, cents)
        .join(broadcast(cents), "cid")
        .select(col("vec_id"), col("cid"),
          floor(expr("vector_distance(v, cv, 'EUCLIDEAN_SQ')") * 1000)
            .cast("long").as("shell"))
      val kept = dc.groupBy("cid", "shell").agg(min(col("vec_id")).as("keep_id"))
      dc.join(kept, Seq("cid", "shell"))
        .groupBy("cid")
        .agg(count(lit(1)).as("n_members"),
          countDistinct(col("keep_id")).as("n_kept"),
          sum_distinct(col("keep_id")).cast("long").as("kept_id_sum"))
        .orderBy("cid")
    },

    // ---------------------------------------------------------------
    // Passage-level EXACT dedup — the C4/RefinedWeb shape: duplicated
    // boilerplate (navigation, license headers, quote chains) repeats
    // ACROSS documents that are not themselves duplicates, so
    // doc-level dedup (d1) misses it entirely. Unit here: disjoint
    // 5-word chunks (the fixed-window stand-in for paragraphs — this
    // corpus has no newlines). Keep each chunk's globally-first
    // occurrence (min (doc_id, position)), drop every other copy, and
    // reconstruct the cleaned document from its kept chunks in order.
    // Scale shape: explode is narrow (chunks ≈ words/5), the dedup
    // decision is ONE map-side-combinable min-aggregate keyed by chunk
    // text (at 100 TB: by xxhash64(chunk) — same plan), and the
    // rebuild is one groupBy doc_id. Linear end to end — the
    // suffix-array exact-substring dedup of the literature costs a
    // global sort; this is the bounded-window version that runs as a
    // plain shuffle job. The (doc_id, i) keep-key packs into one long
    // only because positions are bounded; the production form is
    // min(struct(doc_id, i)) — same aggregate, wider key.
    Q("d12_chunk_dedup",
      "corpus-wide exact passage dedup: duplicate 5-word chunks dropped (keep first occurrence), docs rebuilt",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |c AS (SELECT doc_id, i, array_to_string(l[i*5+1 : i*5+5], ' ') AS chunk
        |      FROM w, UNNEST(range(GREATEST(CAST(ceil(len(l) / 5.0) AS BIGINT), 1))) AS t(i)),
        |k AS (SELECT chunk, min(doc_id * 1000000 + i) AS keep_key FROM c GROUP BY chunk)
        |SELECT c.doc_id, count(*) AS n_chunks,
        |  count(*) FILTER (WHERE c.doc_id * 1000000 + c.i = k.keep_key) AS n_kept,
        |  coalesce(string_agg(c.chunk, ' ' ORDER BY c.i)
        |    FILTER (WHERE c.doc_id * 1000000 + c.i = k.keep_key), '') AS clean_text
        |FROM c JOIN k ON c.chunk = k.chunk
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      val chunks = t(s, d, "documents").select("doc_id", "text")
        .withColumn("l", split(col("text"), " "))
        .select(col("doc_id"), posexplode(expr(
          """transform(
            |  sequence(0, greatest(cast(ceil(size(l) / 5.0) as int), 1) - 1),
            |  i -> array_join(slice(l, i * 5 + 1, 5), ' '))""".stripMargin))
          .as(Seq("i", "chunk")))
        .withColumn("key", col("doc_id") * 1000000L + col("i"))
      val keep = chunks.groupBy("chunk").agg(min(col("key")).as("keep_key"))
      chunks.join(keep, "chunk")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_chunks"),
          count(when(col("key") === col("keep_key"), 1)).as("n_kept"),
          coalesce(
            array_join(transform(
              array_sort(collect_list(
                when(col("key") === col("keep_key"),
                  struct(col("i"), col("chunk"))))),
              x => x.getField("chunk")), " "),
            lit("")).as("clean_text"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Boilerplate removal by document frequency — the CCNet/C4
    // discipline d12 does NOT cover: a passage that appears in >= 3
    // DISTINCT documents is boilerplate (nav chrome, license
    // headers, "subscribe" footers) and is removed from EVERY doc —
    // no copy survives, where d12's keep-first policy always keeps
    // one. The frequency is per-document (count distinct doc_id),
    // not per-occurrence, so a passage repeated inside ONE doc is
    // untouched — that is t14's repetition signal, a different
    // filter. Shape: same bounded chunking as d12, one (chunk,
    // doc_id)-keyed dedup + count for the df table, one key join
    // back, one per-doc rebuild — every stage a narrow map or a
    // keyed shuffle, nothing pairwise.
    Q("d13_boilerplate_removal",
      "chunks in >= 3 distinct docs removed everywhere (CCNet boilerplate), docs rebuilt",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |c AS (SELECT doc_id, i, array_to_string(l[i*5+1 : i*5+5], ' ') AS chunk
        |      FROM w, UNNEST(range(GREATEST(CAST(ceil(len(l) / 5.0) AS BIGINT), 1))) AS t(i)),
        |df AS (SELECT chunk, count(DISTINCT doc_id) AS df FROM c GROUP BY chunk)
        |SELECT c.doc_id, count(*) AS n_chunks,
        |  count(*) FILTER (WHERE df.df < 3) AS n_kept,
        |  coalesce(string_agg(c.chunk, ' ' ORDER BY c.i)
        |    FILTER (WHERE df.df < 3), '') AS clean_text
        |FROM c JOIN df ON c.chunk = df.chunk
        |GROUP BY c.doc_id ORDER BY c.doc_id""".stripMargin) { (s, d) =>
      val chunks = t(s, d, "documents").select("doc_id", "text")
        .withColumn("l", split(col("text"), " "))
        .select(col("doc_id"), posexplode(expr(
          """transform(
            |  sequence(0, greatest(cast(ceil(size(l) / 5.0) as int), 1) - 1),
            |  i -> array_join(slice(l, i * 5 + 1, 5), ' '))""".stripMargin))
          .as(Seq("i", "chunk")))
      // exact distinct-doc frequency: the (chunk, doc) dedup runs as a
      // partial-aggregate pass before the count, so the shuffle carries
      // one row per (chunk, doc), never per occurrence
      val df = chunks.select("chunk", "doc_id").distinct()
        .groupBy("chunk").agg(count(lit(1)).as("df"))
      chunks.join(df, "chunk")
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_chunks"),
          count(when(col("df") < 3, 1)).as("n_kept"),
          coalesce(
            array_join(transform(
              array_sort(collect_list(
                when(col("df") < 3, struct(col("i"), col("chunk"))))),
              x => x.getField("chunk")), " "),
            lit("")).as("clean_text"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // INCREMENTAL connected components — the maintenance tick d7's
    // clusters need when the daily crawl lands: base components are
    // already computed over the stored corpus; the new batch's pairs
    // arrive through the increment-bounded LSH join (d9's bound — old
    // × old is never compared), and the component table is carried to
    // the merged fixpoint by solving only the CONTRACTED delta graph
    // (operators/ConnectedComponents.incrementalMinLabel): each old
    // component acts as one super-node, so the per-tick solve is
    // O(|new pairs|) however big the accumulated graph is. The oracle
    // recomputes components over ALL pairs from scratch (d7's
    // recursive CTE), so the gate IS incremental == full recompute —
    // the same changelog-consumer contract i3/i4 state for aggregate
    // and join views, here for graph connectivity.
    Q("d14_incremental_components",
      "near-dup clusters maintained incrementally: base components + new-batch LSH pairs, O(delta) relabel",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH RECURSIVE
           |w AS (SELECT doc_id, ${XSql.wordHashes(wordsE)} AS wh FROM documents),
           |sh AS (SELECT doc_id, sh, ${XSql.minhashSig("sh")} AS sig
           |       FROM (SELECT doc_id, ${XSql.shingleHashes("wh")} AS sh FROM w)),
           |bands AS (SELECT doc_id, sh, unnest(${XSql.bandKeys("sig")}) AS band_key,
           |                 unnest(range(0, ${XSql.LshBands})) AS band_idx FROM sh),
           |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
           |          FROM bands a JOIN bands b
           |            ON a.band_idx = b.band_idx AND a.band_key = b.band_key
           |           AND a.doc_id < b.doc_id
           |          WHERE ${XSql.jaccard("a.sh", "b.sh")} >= 0.3),
           |sym AS (SELECT doc_a AS a, doc_b AS b FROM pairs
           |        UNION SELECT doc_b, doc_a FROM pairs),
           |reach(src, node) AS (
           |  SELECT a, a FROM sym
           |  UNION
           |  SELECT r.src, s.b FROM reach r JOIN sym s ON r.node = s.a)
           |SELECT src AS doc_id, min(node) AS component
           |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      import graft.operators.{ConnectedComponents, Lsh}
      val sh = t(s, d, "documents")
        .withColumn("sh", expr(XSql.shinglesOfText("text")))
        .select("doc_id", "sh")
      val stored = sh.filter(pmod(col("doc_id"), lit(5)) =!= 4)
      val fresh = sh.filter(pmod(col("doc_id"), lit(5)) === 4)
      // yesterday's state: components of the stored corpus only.
      // Deliberately UNCAPPED (the one pair-family caller that stays
      // so): this query's gate is incremental == full recompute, and
      // the oracle recomputes over the full corpus's uncapped pairs —
      // a capped base with an uncapped delta would not compose to the
      // oracle's fixpoint. In production the base components are a
      // maintained table (st16), not recomputed; the uncapped call
      // here is test scaffolding constructing "yesterday".
      val base = ConnectedComponents.minLabel(
        Lsh.verifiedPairs(stored, 0.3), "doc_a", "doc_b")
      // today's tick: increment-bounded pairs, contracted solve
      val delta = Lsh.incrementalPairs(Lsh.bands(fresh), Lsh.bands(stored), 0.3)
        .select("doc_a", "doc_b")
      ConnectedComponents.incrementalMinLabel(base, delta, "doc_a", "doc_b")
        .select(col("node").as("doc_id"), col("component"))
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // Exact SUBSTRING dedup (the ExactSubstr discipline of Lee et al.
    // 2022, "Deduplicating Training Data Makes Language Models
    // Better"): fuzzy doc-level dedup (d3) keeps documents that SHARE
    // long verbatim passages — licenses, templates, quoted spam —
    // because the rest of the document differs; the remedy is to find
    // exact word-window repeats ACROSS documents and flag/trim them.
    // Spark-shaped: every 8-word window rolls into one 131-poly hash
    // (the shingle chain extended to k=8, mod P each step so the fold
    // never leaves int64), windows that recur in >= 2 DISTINCT docs
    // form the dup set via one map-side-combinable aggregate, and a
    // single equi-join back scores each document's duplicated-window
    // fraction. No pairwise comparison anywhere: cost is one 8x
    // explode + two hash-keyed aggregates, linear in corpus size. At
    // 100 TB the stride/winnowing lever (graft_winnow) bounds the
    // explode factor; full stride here keeps the oracle exact.
    Q("d15_substring_dedup",
      "ExactSubstr: cross-document repeated 8-word windows, per-doc duplicated fraction",
      {
        implicit val dl: Dialect = SqlDuck
        s"""WITH w AS (SELECT doc_id,
           |    ${XSql.wordHashes(XSql.words("text"))} AS wh FROM documents),
           |wins AS (SELECT doc_id, unnest(${winHashes("wh", 8)}) AS h FROM w),
           |dup AS (SELECT h FROM wins GROUP BY h
           |        HAVING count(DISTINCT doc_id) >= 2),
           |cnt AS (SELECT doc_id, cast(count(*) AS BIGINT) AS n_windows
           |        FROM wins GROUP BY doc_id),
           |hit AS (SELECT wins.doc_id, cast(count(*) AS BIGINT) AS n_dup
           |        FROM wins JOIN dup USING (h) GROUP BY wins.doc_id)
           |SELECT d.doc_id,
           |  coalesce(cnt.n_windows, 0) AS n_windows,
           |  coalesce(hit.n_dup, 0) AS n_dup_windows,
           |  cast((1000000 * coalesce(hit.n_dup, 0))
           |    // greatest(coalesce(cnt.n_windows, 0), 1) AS BIGINT) AS dup_frac_e6,
           |  CASE WHEN (1000000 * coalesce(hit.n_dup, 0))
           |    // greatest(coalesce(cnt.n_windows, 0), 1) >= 500000
           |    THEN 1 ELSE 0 END AS flagged
           |FROM documents d
           |LEFT JOIN cnt ON cnt.doc_id = d.doc_id
           |LEFT JOIN hit ON hit.doc_id = d.doc_id
           |ORDER BY d.doc_id""".stripMargin
      }) { (s, d) =>
      implicit val dl: Dialect = SqlSpark
      val docs = t(s, d, "documents")
      val wins = docs
        .select(col("doc_id"),
          expr(XSql.wordHashes(XSql.words("text"))).as("wh"))
        .select(col("doc_id"), explode(expr(winHashes("wh", 8))).as("h"))
      // ONE pass over the exploded windows (round 14 — the sf10 audit
      // read 4.9x for 10x data, and the dominant term was this
      // relation TOKENIZED + EXPLODED THREE TIMES: once for the
      // dup-hash set via a two-phase countDistinct, once for per-doc
      // totals, once for the dup join). The named contract is
      // O(W log W) in total window count W (~90 per doc), in exactly
      // three shuffles of skinny rows:
      //   1. groupBy (h, doc_id)  — map-side combinable pre-agg; its
      //      row count per h IS the distinct-doc count;
      //   2. window over h        — the 'shingle sort': rows of one
      //      window-hash meet once, nd = docs sharing it (hot hashes
      //      spill, never collect into a list);
      //   3. groupBy doc_id       — the per-doc fraction fold.
      // Same algebra as the three-pass oracle SQL, one tokenize pass.
      //
      // VOLUME-SIZED window shuffle (round 14 — the sf100 memory gate
      // caught this): the window sort's per-task buffer is
      // O(rows/partitions), so at a pinned session partition count the
      // task memory grows LINEARLY with data (measured 2 GB/task at
      // 425M windows over 32 partitions — within 20% of the pool at
      // 32 slots). One explicit repartition by h, sized off the
      // documents file (~85 windows/doc ≈ 8 bytes of window rows per
      // corpus byte; ~4 MB of corpus per partition keeps a task's
      // sort in the low hundreds of MB), bounds it: hash(h) clusters
      // satisfy BOTH the (h, doc_id) pre-agg and the window, so the
      // plan still carries exactly one data-sized exchange. At bench
      // SF the clamp floor keeps the session's 32 — the plan is
      // unchanged below ~130 MB of corpus.
      val docBytes = graft.Tables.inputBytes(s"$d/documents.parquet")
      val winParts = math.max(32L, math.min(4096L, docBytes / (4L << 20))).toInt
      val perDoc = wins.repartition(winParts, col("h"))
        .groupBy("h", "doc_id")
        .agg(count(lit(1)).as("c"))
        .withColumn("nd", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("h")))
        .groupBy("doc_id")
        .agg(sum(col("c")).cast("long").as("n_windows"),
          sum(when(col("nd") >= 2, col("c")).otherwise(lit(0L)))
            .cast("long").as("n_dup"))
      docs.select("doc_id")
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_windows"), lit(0L)).as("n_windows"),
          coalesce(col("n_dup"), lit(0L)).as("n_dup_windows"),
          expr("cast((1000000 * coalesce(n_dup, 0)) div greatest(coalesce(n_windows, 0), 1) AS BIGINT)")
            .as("dup_frac_e6"),
          expr("CASE WHEN (1000000 * coalesce(n_dup, 0)) div greatest(coalesce(n_windows, 0), 1) >= 500000 THEN 1 ELSE 0 END")
            .as("flagged"))
        .orderBy("doc_id")
    }
  )

  /** Rolling k-word window hash list of a word-hash array expression:
    * h = fold over the window of (h * 131 + wh[i+j]) mod P — the
    * 3-gram shingle chain generalized to k, mod applied every step so
    * every intermediate stays far under 2^63. One entry per start
    * position (no distinct: positions are the unit the per-doc
    * fraction counts).
    */
  private def winHashes(whE: String, k: Int)(implicit d: Dialect): String = {
    val terms = (0 until k).map(j => d.idx(s"($whE)", s"i_ + $j"))
    val body = terms.tail.foldLeft(terms.head)((acc, t) =>
      s"((($acc) * ${XSql.WordM} + $t) % ${XSql.P})")
    d.xform(d.seq0(s"${d.arrSize(s"($whE)")} - ${k - 1}"), "i_", body)
  }

  private def dlDouble(d: Dialect): String = d.toDoubleArr("embedding")
}
