package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

import graft.operators.TableStore

/** Data-governance and serving-index operators — the platform layer a
  * training-data warehouse grows once tables become products: an
  * inverted text index served from storage (t37), incremental index
  * maintenance through the signed fold log (i9), population-stability
  * drift between published snapshots (a23), and the GDPR
  * right-to-be-forgotten cascade across a derivation chain (c18).
  *
  * Reference anchor: the warehouse's precompute-then-serve discipline
  * (definitions/game_neighbors.sqlx:16 — build once, serve forever)
  * and its versioned-snapshot reproducibility story, extended to the
  * index/observability/deletion surfaces a 100 TB corpus needs.
  *
  * Cross-engine determinism: tokenization is the repo-standard
  * whitespace split (t1's discipline), all counts are integers, and
  * every double expression is a fixed sequence of single IEEE ops
  * emitted identically for both engines, rounded before comparison.
  */
object GovernanceOps {

  private def scratch(name: String): String = {
    val dir = Files.createTempDirectory(s"graft_$name").toFile
    dir.deleteOnExit()
    s"${dir.getAbsolutePath}/t"
  }

  /** Distinct (doc_id, term) postings of a documents frame — the
    * inverted-index row type. `array_distinct` makes per-doc terms
    * unique at the source, so document frequency is a plain count
    * downstream and fold-log retractions cancel exactly one posting
    * per (doc, term).
    */
  private def postingsOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(split(lower(col("text")), " "))).as("term"))
      .filter(col("term") =!= "")

  /** Oracle-side postings: one row per (doc_id, term), empties dropped. */
  private def postingsSql(where: String): String =
    s"""SELECT DISTINCT doc_id, term FROM (
       |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
       |  FROM documents $where) WHERE term <> ''""".stripMargin

  /** Fixed conjunctive query terms, as a retrieval bench pins them
    * ("dup" is the selective term; the others bound the intersection).
    */
  private val QTerms = Seq("dup", "vector", "key")

  val all: Seq[Q] = Seq(

    // ---------------------------------------------------------------
    // T37 — inverted index, served from storage. The postings table
    // (term → doc) is built in ONE pass over the corpus and written
    // PARTITIONED by the term's first letter; a conjunctive query
    // then reads ONLY the partitions holding its terms (directory
    // pruning — the scan never touches the other 25/26ths of the
    // index) and intersects postings with one keyed aggregate:
    // HAVING count = |terms|. Cost is O(Σ postings of the query
    // terms), never O(corpus) — the difference between a search
    // serving tier and a table scan at 100 TB. The oracle IS the
    // table scan, so the gate proves index == scan.
    Q("t37_inverted_index",
      "conjunctive term query answered from a term-partitioned postings index",
      s"""SELECT doc_id FROM documents
         |WHERE list_contains(string_split(lower(text), ' '), 'dup')
         |  AND list_contains(string_split(lower(text), ' '), 'vector')
         |  AND list_contains(string_split(lower(text), ' '), 'key')
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val path = scratch("t37_postings")
      val docs = t(s, d, "documents").select("doc_id", "text")
      // index build: tb (first letter) is the partition column; at
      // corpus scale the same layout holds with hash buckets
      postingsOf(docs)
        .withColumn("tb", substring(col("term"), 1, 1))
        .write.mode("overwrite").partitionBy("tb").parquet(path)
      val firstLetters = QTerms.map(_.substring(0, 1)).distinct
      val hits = s.read.parquet(path)
        .filter(col("tb").isin(firstLetters: _*) &&
          col("term").isin(QTerms: _*))
      // postings are distinct per (doc, term) by construction, so the
      // intersection is a count — no distinct aggregate needed
      hits.groupBy("doc_id")
        .agg(count(lit(1)).as("nt"))
        .filter(col("nt") === QTerms.size)
        .select("doc_id")
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // T40 — PHRASE query over a POSITIONAL postings index. t37's
    // term-level index answers "docs containing all of {a,b,c}"; a
    // search tier also needs "docs containing the exact phrase
    // 'a b c'" — which requires token POSITIONS in the postings.
    // The index is one pass (doc_id, pos, term), partitioned by first
    // letter like t37 so the query scan is directory-pruned to the
    // phrase's terms. Matching is NOT n−1 self-joins (a plan whose
    // depth grows with phrase length): the tiny (term, offset) phrase
    // spec broadcasts into the pruned postings scan, each posting
    // votes for anchor = pos − offset, and ONE keyed aggregate keeps
    // (doc, anchor) pairs where all |phrase| distinct offsets voted —
    // an occurrence of the phrase starting at `anchor`. Cost is
    // O(Σ postings of the phrase terms) with a single shuffle,
    // independent of phrase length and of corpus size — the Lucene
    // SpanNear discipline re-expressed as a Spark aggregate. The
    // oracle recomputes positions with DuckDB's zipped unnest and
    // adjacency self-joins — proving index == scan.
    Q("t40_phrase_query",
      "exact-phrase search from a positional postings index: broadcast (term,offset) spec + one anchor aggregate",
      """WITH p AS (SELECT doc_id,
        |    unnest(string_split(lower(text), ' ')) AS term,
        |    generate_subscripts(string_split(lower(text), ' '), 1) AS pos
        |  FROM documents)
        |SELECT DISTINCT a.doc_id FROM p a
        |JOIN p b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
        |JOIN p c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2
        |WHERE a.term = 'table' AND b.term = 'hash' AND c.term = 'agg'
        |ORDER BY a.doc_id""".stripMargin) { (s, d) =>
      val phrase = Seq("table", "hash", "agg")
      val path = scratch("t40_postings")
      val docs = t(s, d, "documents").select("doc_id", "text")
      graft.operators.Postings.positional(docs)
        .write.mode("overwrite").partitionBy("tb").parquet(path)
      graft.operators.Postings
        .phraseMatch(s.read.parquet(path), phrase)
        .orderBy("doc_id")
    },

    // ---------------------------------------------------------------
    // I9 — incremental index maintenance: the postings table as a
    // SIGNED fold log. The anchor snapshot indexes the initial
    // corpus; a crawl batch appends its postings as a +1 delta; a
    // takedown batch retracts its postings as a -1 delta. Document
    // frequency is then ONE aggregate over the raw signed chain
    // (readFoldedUnion — retracted postings net to zero inside the
    // sum, so no state-wide pre-merge is paid). Each tick writes
    // O(batch postings); the index is never rebuilt. The oracle
    // recomputes df from the final corpus from scratch — proving
    // fold-maintained == rebuilt.
    Q("i9_postings_ivm",
      "document-frequency index maintained by signed fold deltas == full rebuild",
      s"""WITH p AS (${postingsSql("WHERE doc_id % 7 <> 0")})
         |SELECT term, count(*) AS df FROM p
         |GROUP BY term ORDER BY term""".stripMargin) { (s, d) =>
      val path = scratch("i9_postings")
      val docs = t(s, d, "documents").select("doc_id", "text")
      val anchor = docs.filter(col("doc_id") % 5 =!= 0)
      val crawl = docs.filter(col("doc_id") % 5 === 0)
      val takedown = docs.filter(col("doc_id") % 7 === 0)
      // postings are distinct per (doc, term): the snapshot fast path
      // applies without a canonicalizing shuffle
      TableStore.publishFoldSnapshotDistinct(s, path, postingsOf(anchor),
        note = "anchor")
      TableStore.publishFoldDelta(s, path,
        postingsOf(crawl).withColumn("_mult", lit(1L)), note = "crawl")
      TableStore.publishFoldDelta(s, path,
        postingsOf(takedown).withColumn("_mult", lit(-1L)), note = "takedown")
      // df over the raw signed chain: one aggregate, no pre-fold
      TableStore.readFoldedUnion(s, path)
        .groupBy("term")
        .agg(sum(col("_mult")).as("df"))
        .filter(col("df") > 0)
        .orderBy("term")
    },

    // ---------------------------------------------------------------
    // A23 — population-stability drift between two PUBLISHED
    // snapshots of a table: the observability check every feature
    // pipeline runs before a model retrains on a new corpus version.
    // PSI over 12 fixed price bins with Laplace smoothing (so a bin
    // present in only one version contributes a finite term). Both
    // versions come from the snapshot store — the monitor reads
    // table history, it never re-derives the old state. Per-bin
    // contributions round to 6 dp, and the total folds the ROUNDED
    // decimals, so the output is order-independent and bit-identical
    // across engines (ln may differ in the last ulp; rounding
    // absorbs it).
    Q("a23_psi_drift",
      "PSI feature drift between two published table versions, 12 fixed bins",
      """WITH v1 AS (SELECT o_totalprice AS p FROM orders),
        |v2 AS (SELECT CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.5
        |               ELSE o_totalprice END AS p FROM orders),
        |bins AS (SELECT unnest(range(0, 12)) AS bin),
        |c1 AS (SELECT least(cast(floor(p / 50000.0) as bigint), 11) AS bin,
        |         count(*) AS n1 FROM v1 GROUP BY 1),
        |c2 AS (SELECT least(cast(floor(p / 50000.0) as bigint), 11) AS bin,
        |         count(*) AS n2 FROM v2 GROUP BY 1),
        |tot AS (SELECT (SELECT cast(count(*) as double) + 6.0 FROM v1) AS d1,
        |               (SELECT cast(count(*) as double) + 6.0 FROM v2) AS d2),
        |j AS (SELECT cast(bins.bin as bigint) AS bin,
        |        coalesce(n1, 0) AS n1, coalesce(n2, 0) AS n2, d1, d2
        |      FROM bins CROSS JOIN tot
        |      LEFT JOIN c1 ON c1.bin = bins.bin
        |      LEFT JOIN c2 ON c2.bin = bins.bin),
        |k AS (SELECT bin, n1, n2,
        |        cast(round(((cast(n2 as double) + 0.5) / d2
        |                    - (cast(n1 as double) + 0.5) / d1)
        |          * ln(((cast(n2 as double) + 0.5) / d2)
        |               / ((cast(n1 as double) + 0.5) / d1)), 6)
        |          as decimal(18,6)) AS contrib
        |      FROM j)
        |SELECT bin, n1, n2, cast(contrib as double) AS contrib,
        |  cast((SELECT sum(contrib) FROM k) as double) AS psi
        |FROM k ORDER BY bin""".stripMargin) { (s, d) =>
      val basePath = scratch("a23_snap")
      val o = t(s, d, "orders").select("o_orderkey", "o_totalprice")
      val v1 = TableStore.publishVersion(s, basePath, o, note = "v1")
      val v2 = TableStore.publishVersion(s, basePath,
        o.withColumn("o_totalprice",
          when(col("o_orderkey") % 3 === 0, col("o_totalprice") * 1.5)
            .otherwise(col("o_totalprice"))), note = "v2")
      def binned(v: Long, n: String): DataFrame =
        TableStore.readVersion(s, basePath, Some(v))
          .select(least(floor(col("o_totalprice") / 50000.0).cast("bigint"),
            lit(11L)).as("bin"))
          .groupBy("bin").agg(count(lit(1)).as(n))
      def denom(v: Long, n: String): DataFrame =
        TableStore.readVersion(s, basePath, Some(v))
          .agg((count(lit(1)).cast("double") + 6.0).as(n))
      val bins = s.range(0, 12).select(col("id").as("bin"))
      val j = bins
        .crossJoin(broadcast(denom(v1, "d1")))
        .crossJoin(broadcast(denom(v2, "d2")))
        .join(broadcast(binned(v1, "n1")), Seq("bin"), "left")
        .join(broadcast(binned(v2, "n2")), Seq("bin"), "left")
        .na.fill(0L, Seq("n1", "n2"))
      val p1 = (col("n1").cast("double") + 0.5) / col("d1")
      val p2 = (col("n2").cast("double") + 0.5) / col("d2")
      val k = j.select(col("bin"), col("n1"), col("n2"),
        round((p2 - p1) * log(p2 / p1), 6).cast("decimal(18,6)").as("contrib"))
      val psi = k.agg(sum(col("contrib")).as("psi_d"))
      k.crossJoin(broadcast(psi))
        .select(col("bin"), col("n1"), col("n2"),
          col("contrib").cast("double").as("contrib"),
          col("psi_d").cast("double").as("psi"))
        .orderBy("bin")
    },

    // ---------------------------------------------------------------
    // C18 — right-to-be-forgotten CASCADE: one forget request flows
    // through the whole derivation chain at O(matching keys) per
    // table, never a rewrite. Documents take tombstones
    // (deleteWhere); the chunk table — a derived product keyed by the
    // same doc_id — takes the same tombstone keys; the postings
    // INDEX retracts the forgotten docs' rows as a signed -1 fold
    // delta. The output reads every tier back through its LIVE path
    // (anti-join tombstones / signed fold) and proves (a) the
    // forgotten ids are gone everywhere, (b) everything else is
    // intact — the oracle recomputes each tier from scratch on the
    // filtered corpus. At 100 TB this is the deletion architecture:
    // tombstones + index retraction now, applyDeletes folded into
    // scheduled maintenance later.
    Q("c18_cascade_forget",
      "GDPR cascade: tombstoned docs, chunk table, and postings index all forget",
      s"""WITH live AS (SELECT * FROM documents WHERE doc_id % 11 <> 3),
         |w AS (SELECT doc_id,
         |        len(list_filter(string_split(lower(text), ' '), w_ -> w_ != '')) AS nw
         |      FROM live)
         |SELECT 'chunks_live' AS metric,
         |  cast(sum((nw + 19) // 20) as bigint) AS value FROM w
         |UNION ALL
         |SELECT 'df_dup_live', count(*) FROM live
         |WHERE list_contains(string_split(lower(text), ' '), 'dup')
         |UNION ALL
         |SELECT 'docs_live', count(*) FROM live
         |UNION ALL
         |SELECT 'forgotten_remaining', 0
         |ORDER BY metric""".stripMargin) { (s, d) =>
      val docsPath = scratch("c18_docs")
      val chunksPath = scratch("c18_chunks")
      val postPath = scratch("c18_postings")
      val docs = t(s, d, "documents").select("doc_id", "text")
      TableStore.overwrite(docs, docsPath)
      // derived chunk table: fixed 20-token chunks (count shape only —
      // chunk text itself would carry the same doc_id key)
      val chunks = docs
        .select(col("doc_id"),
          size(filter(split(lower(col("text")), " "),
            w => w =!= "")).as("nw"))
        .filter(col("nw") > 0)
        .select(col("doc_id"),
          explode(sequence(lit(1L), expr("(nw + 19) div 20"))).as("chunk_idx"))
      TableStore.overwrite(chunks, chunksPath)
      // derived postings index as a fold table
      TableStore.publishFoldSnapshotDistinct(s, postPath, postingsOf(docs),
        note = "full")
      // ---- the forget request cascades ----
      val forgetPred = col("doc_id") % 11 === 3
      TableStore.deleteWhere(s, docsPath, Seq("doc_id"), forgetPred)
      TableStore.deleteWhere(s, chunksPath, Seq("doc_id"), forgetPred)
      TableStore.publishFoldDelta(s, postPath,
        postingsOf(docs.filter(forgetPred)).withColumn("_mult", lit(-1L)),
        note = "forget")
      // ---- read every tier back through its live path ----
      val docsLive = TableStore.readLive(s, docsPath, Seq("doc_id"))
      val chunksLive = TableStore.readLive(s, chunksPath, Seq("doc_id"))
      val dfDup = TableStore.readFoldedUnion(s, postPath)
        .filter(col("term") === "dup")
        .agg(coalesce(sum(col("_mult")), lit(0L)).as("value"))
        .select(lit("df_dup_live").as("metric"), col("value"))
      val m1 = chunksLive.agg(count(lit(1)).as("value"))
        .select(lit("chunks_live").as("metric"), col("value"))
      val m3 = docsLive.agg(count(lit(1)).as("value"))
        .select(lit("docs_live").as("metric"), col("value"))
      val m4 = docsLive.filter(forgetPred).agg(count(lit(1)).as("value"))
        .select(lit("forgotten_remaining").as("metric"), col("value"))
      m1.unionByName(dfDup).unionByName(m3).unionByName(m4)
        .orderBy("metric")
    },

    // ---------------------------------------------------------------
    // C20 — corpus RELEASE NOTES from the CDC read: the per-language
    // added/removed/changed counts and token deltas between two
    // PUBLISHED corpus versions, derived from ONE snapshot diff
    // (TableStore.changesBetween — a single key-partitioned join,
    // O(changes) output) instead of re-aggregating either corpus.
    // The oracle recomputes the same figures by set algebra over the
    // raw table, so the green row proves diff-derived release notes
    // == ground truth. This is the datasheet a training-corpus
    // version bump ships with: what entered, what left, what was
    // edited, and how the token budget moved — per language, without
    // a corpus scan at serving time.
    Q("c20_corpus_release_diff",
      "per-language release notes (added/removed/changed + token deltas) from one snapshot diff",
      """WITH d AS (SELECT doc_id, lang, text FROM documents),
        |v1 AS (SELECT * FROM d WHERE doc_id % 3 <> 1),
        |v2 AS (SELECT doc_id, lang,
        |         CASE WHEN doc_id % 11 = 0 THEN upper(text) ELSE text END AS text
        |       FROM d WHERE doc_id % 5 <> 0),
        |added AS (SELECT v2.* FROM v2 LEFT JOIN v1 ON v1.doc_id = v2.doc_id
        |          WHERE v1.doc_id IS NULL),
        |removed AS (SELECT v1.* FROM v1 LEFT JOIN v2 ON v2.doc_id = v1.doc_id
        |            WHERE v2.doc_id IS NULL),
        |chg AS (SELECT v1.doc_id, v1.lang, v1.text AS pre_text,
        |               v2.text AS post_text
        |        FROM v1 JOIN v2 ON v1.doc_id = v2.doc_id
        |        WHERE v1.text <> v2.text OR v1.lang <> v2.lang),
        |m AS (
        |  SELECT lang, 1 AS a, 0 AS r, 0 AS c,
        |    len(list_filter(string_split(text, ' '), w_ -> w_ != '')) AS ti,
        |    0 AS to_ FROM added
        |  UNION ALL
        |  SELECT lang, 0, 1, 0, 0,
        |    len(list_filter(string_split(text, ' '), w_ -> w_ != ''))
        |  FROM removed
        |  UNION ALL
        |  SELECT lang, 0, 0, 1,
        |    len(list_filter(string_split(post_text, ' '), w_ -> w_ != '')),
        |    len(list_filter(string_split(pre_text, ' '), w_ -> w_ != ''))
        |  FROM chg)
        |SELECT lang, cast(sum(a) as bigint) AS n_added,
        |  cast(sum(r) as bigint) AS n_removed,
        |  cast(sum(c) as bigint) AS n_changed,
        |  cast(sum(ti) as bigint) AS tok_in,
        |  cast(sum(to_) as bigint) AS tok_out
        |FROM m GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      val path = scratch("c20_corpus")
      val docs = t(s, d, "documents").select("doc_id", "lang", "text")
      val v1 = TableStore.publishVersion(s, path,
        docs.filter(col("doc_id") % 3 =!= 1), note = "release-1")
      val v2 = TableStore.publishVersion(s, path,
        docs.filter(col("doc_id") % 5 =!= 0)
          .withColumn("text", when(col("doc_id") % 11 === 0,
            upper(col("text"))).otherwise(col("text"))), note = "release-2")
      val ch = TableStore.changesBetween(s, path, v1, v2, Seq("doc_id"))
      val tok = size(filter(split(col("text"), " "), w => w =!= ""))
      val ct = col("_change_type")
      ch.groupBy("lang").agg(
          sum(when(ct === "insert", 1L).otherwise(0L)).as("n_added"),
          sum(when(ct === "delete", 1L).otherwise(0L)).as("n_removed"),
          sum(when(ct === "update_postimage", 1L).otherwise(0L)).as("n_changed"),
          sum(when(ct.isin("insert", "update_postimage"), tok)
            .otherwise(0L)).as("tok_in"),
          sum(when(ct.isin("delete", "update_preimage"), tok)
            .otherwise(0L)).as("tok_out"))
        .orderBy("lang")
    },

    // ---------------------------------------------------------------
    // C21 — pseudonymization vault + crypto-erasure. c18's cascade
    // REWRITES every derived tier per forget request — correct, but
    // O(matching rows) of write amplification per table per request.
    // The vault discipline makes forgetting O(1) per subject at ANY
    // corpus size: at ingest the direct identifier is replaced by a
    // keyed one-way token (row-local projection — the identifier
    // never lands in the fact table at all), and the ONLY link back
    // is a vault table of (token, subject) pairs, O(subjects) small.
    // A forget request deletes the subject's VAULT row — the fact
    // table's tokens become permanently anonymous (crypto-erasure:
    // nothing to re-identify against), with ZERO bytes of the 100 TB
    // fact table rewritten. The serving read re-identifies through a
    // broadcast left join against the surviving vault; erased
    // subjects surface as anonymous cohorts, their aggregate utility
    // intact. The oracle recomputes both cohorts from the raw table.
    // (md5 over a peppered key stands in for the keyed HMAC a
    // production vault uses — identical hex in both engines.)
    Q("c21_pseudonym_vault",
      "tokenized facts + O(subjects) vault: forgetting = one vault delete, zero fact rewrite",
      s"""SELECT CASE WHEN o_custkey % 97 = 0 THEN 'erased'
         |            ELSE 'identified' END AS status,
         |  count(*) AS n_orders,
         |  count(DISTINCT o_custkey) AS n_subjects,
         |  ${dsumSql("o_totalprice")} AS total
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val factsPath = scratch("c21_facts")
      val vaultPath = scratch("c21_vault")
      val o = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val token = md5(concat(lit("pepper-v1:"), col("o_custkey")))
      // ingest: the identifier is tokenized BEFORE landing
      TableStore.overwrite(o.select(col("o_orderkey"), token.as("token"),
        col("o_totalprice")), factsPath)
      TableStore.overwrite(o.select(token.as("token"), col("o_custkey"))
        .distinct(), vaultPath)
      // the forget request: O(forgotten subjects) vault deletes —
      // the fact table is not touched
      TableStore.deleteWhere(s, vaultPath, Seq("token"),
        col("o_custkey") % 97 === 0)
      val facts = TableStore.read(s, factsPath)
      val vault = TableStore.readLive(s, vaultPath, Seq("token"))
      facts.join(broadcast(vault), Seq("token"), "left")
        .groupBy(when(col("o_custkey").isNull, lit("erased"))
          .otherwise(lit("identified")).as("status"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("token")).as("n_subjects"),
          dsum(col("o_totalprice")).as("total"))
        .orderBy("status")
    }
  )
}
