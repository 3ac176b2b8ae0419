package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** POSITIONAL postings — the inverted-index row type that serves both
  * conjunctive term queries (t37's shape: distinct (doc, term) is a
  * projection of it) and exact-PHRASE queries (t40): one row per
  * token OCCURRENCE, `(doc_id, pos, term, tb)`, `tb` the term's first
  * letter so a term-partitioned layout directory-prunes a query to
  * its own terms' partitions.
  *
  * Phrase matching is deliberately NOT n−1 positional self-joins
  * (plan depth growing with phrase length — the naive SpanNear): the
  * tiny `(term, offset)` phrase spec broadcasts into the pruned
  * postings scan, every matching posting votes `anchor = pos −
  * offset`, and ONE keyed aggregate keeps `(doc, anchor)` pairs where
  * all |phrase| DISTINCT offsets voted — an occurrence of the phrase
  * starting at `anchor`. Duplicate words in the phrase are handled by
  * construction: a posting for a repeated word votes one anchor per
  * offset the word occupies, and a true occurrence still needs every
  * distinct offset present. Cost: O(Σ postings of the phrase's
  * terms), one shuffle, independent of phrase length and corpus size.
  *
  * Reference anchor: the precompute-then-serve discipline of
  * `definitions/game_neighbors.sqlx:16` applied to text search — the
  * index is built once (one corpus pass), queried forever.
  */
object Postings {

  /** One corpus pass → positional postings. Not `array_distinct` —
    * every occurrence keeps its position; empty tokens dropped.
    */
  def positional(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(lower(col("text")), " ")).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .withColumn("tb", substring(col("term"), 1, 1))

  /** Doc ids containing the exact adjacent `phrase`, from a
    * positional postings frame (already pruned or not — the term
    * filter below prunes again, and on a `tb`-partitioned stored
    * index it reaches the directory listing).
    */
  def phraseMatch(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty && phrase.forall(_.nonEmpty),
      s"phraseMatch: phrase words must be non-empty, got $phrase")
    val w = phrase.map(_.toLowerCase(java.util.Locale.ROOT))
    val spark = postings.sparkSession
    import spark.implicits._
    val spec = w.zipWithIndex.toDF("term", "off")
    // CODE-POINT prefix, not substring(0,1): the stored tb column is
    // Spark's substring (code-point based), and a JVM char slice of a
    // supplementary-plane word would yield a lone surrogate that
    // matches no partition
    def prefix(s: String) = s.substring(0, s.offsetByCodePoints(0, 1))
    postings
      .filter(col("tb").isin(w.map(prefix).distinct: _*) &&
        col("term").isin(w.distinct: _*))
      .join(broadcast(spec), Seq("term"))
      .groupBy(col("doc_id"), (col("pos") - col("off")).as("anchor"))
      .agg(countDistinct(col("off")).as("k"))
      .filter(col("k") === w.size)
      .select("doc_id").distinct()
  }
}
