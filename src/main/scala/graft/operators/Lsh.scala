package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.XSql
import graft.functions.XSql.{Spark => SqlSpark}

/** The MinHash-LSH candidate machinery shared by every near-dup
  * operator (d3/d7/d9, c1/c2/c3): signature → band keys → band-bucket
  * self-join → exact-Jaccard verification. One implementation so a
  * banding fix lands everywhere at once (the oracle SQL states the
  * equivalent CTE chain per query — declarative text, checked by the
  * gate against THIS code every round).
  *
  * Scale shape: candidates come from an equi-join on (band_idx,
  * band_key) — never an all-pairs product — carrying doc_ids ONLY;
  * the shingle arrays are re-attached per DISTINCT candidate pair by
  * two equi-joins against the shingle table. Rounds ≤13 rode the
  * arrays through the band join instead (saving those two shuffles);
  * the sf100 audit measured the inversion point of that trade: band
  * buckets saturate as the corpus grows, so collision rows grow
  * super-linearly and every one of them carried ~1.6 KB of arrays —
  * while dedup-before-verify also computes each pair's exact Jaccard
  * ONCE, not once per colliding band (a 0.9-similarity pair collides
  * in nearly all bands). The two shingle-table shuffles
  * this buys back are O(corpus), the term that was already linear.
  */
object Lsh {

  /** Band rows of a `(doc_id, sh)` table: one row per (band_idx,
    * band_key) per doc, shingles carried. Docs with NULL signatures
    * (< 3 words → empty shingle set) drop out here by construction.
    */
  def bands(sh: DataFrame): DataFrame = {
    implicit val dl: XSql.Dialect = SqlSpark
    sh.withColumn("sig", expr(XSql.minhashSig("sh")))
      .select(col("doc_id"), col("sh"), posexplode(expr(XSql.bandKeys("sig"))))
      .withColumnsRenamed(Map("pos" -> "band_idx", "col" -> "band_key"))
  }

  /** Verified near-dup pairs: distinct (doc_a < doc_b, jacc) with
    * exact Jaccard >= `threshold`, candidates bounded by band
    * collisions. The band self-join moves doc_ids only; candidates
    * deduplicate BEFORE verification (each pair's exact Jaccard runs
    * once, however many bands it collides in), then the shingle
    * arrays re-attach via two equi-joins against `sh` (see class doc
    * for the measured inversion of the ride-through alternative).
    */
  def verifiedPairs(sh: DataFrame, threshold: Double): DataFrame = {
    implicit val dl: XSql.Dialect = SqlSpark
    val bs = bands(sh).select(col("band_idx"), col("band_key"), col("doc_id"))
    val cand = bs.select(col("band_idx"), col("band_key"),
        col("doc_id").as("doc_a"))
      .join(bs.select(col("band_idx"), col("band_key"),
        col("doc_id").as("doc_b")), Seq("band_idx", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .withColumn("jacc", expr(XSql.jaccard("sh_a", "sh_b")))
      .filter(col("jacc") >= threshold)
      .select("doc_a", "doc_b", "jacc")
  }

  /** Increment-bounded verified candidates: every (new, other) band
    * collision with exact Jaccard ≥ `threshold`, where `other` ranges
    * over the stored corpus and the OTHER new docs — old × old is
    * never compared, the bound that makes incremental dedup a job
    * instead of a recompute (d9/st7). Inputs are band tables shaped
    * like [[bands]]; `stored` must carry no id overlap with `fresh`.
    * Output keeps the (na, ob, b_old) orientation — one row per
    * collision, NOT yet distinct — so callers choose their policy:
    * canonical pair sets ([[incrementalPairs]]) or per-doc drop
    * verdicts (d9's old/new-prior counts).
    */
  def incrementalCandidates(fresh: DataFrame, stored: DataFrame,
      threshold: Double): DataFrame = {
    implicit val dl: XSql.Dialect = SqlSpark
    val a = fresh.select(col("band_idx"), col("band_key"),
      col("doc_id").as("na"), col("sh").as("sh_a"))
    val bNew = fresh.select(col("band_idx"), col("band_key"),
      col("doc_id").as("ob"), col("sh").as("sh_b"), lit(false).as("b_old"))
    val b = stored.select(col("band_idx"), col("band_key"),
      col("doc_id").as("ob"), col("sh").as("sh_b"), lit(true).as("b_old"))
      .unionByName(bNew)
    a.join(b, Seq("band_idx", "band_key"))
      .filter(col("ob") =!= col("na"))
      .withColumn("jacc", expr(XSql.jaccard("sh_a", "sh_b")))
      .filter(col("jacc") >= threshold)
      .select("na", "ob", "b_old", "jacc")
  }

  /** Incremental verified pairs (st7): [[incrementalCandidates]]
    * restricted to (new × stored in either id order) ∪ (new ×
    * new-with-prior-id), canonicalized to (doc_a < doc_b, jacc) —
    * each pair exactly once.
    */
  def incrementalPairs(fresh: DataFrame, stored: DataFrame,
      threshold: Double): DataFrame =
    incrementalCandidates(fresh, stored, threshold)
      .filter(col("b_old") || col("ob") < col("na"))
      .select(least(col("na"), col("ob")).as("doc_a"),
        greatest(col("na"), col("ob")).as("doc_b"), col("jacc"))
      .distinct()
}
