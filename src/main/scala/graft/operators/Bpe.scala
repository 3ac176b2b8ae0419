package graft.operators

/** Local BPE merge training over a BOUNDED word-frequency table — the
  * same index-build discipline as [[KMeans.trainLocal]]: the corpus
  * collapses to (word, count) in one distributed map-side-combinable
  * aggregate, the trainer fits on the hard-capped candidate vocabulary
  * (≤ the t31 cap, KBs of driver state), and the trained merges ship
  * back into distributed encode passes as expression constants. Every
  * production BPE trainer (HF tokenizers, SentencePiece) has exactly
  * this shape; iterating the merge rounds as Spark jobs would pay a
  * shuffle + broadcast stage per merge for data that fits in a cache
  * line.
  *
  * Semantics are pinned to the SQL-expressible form the t31/t32
  * oracles state: pair counts weighted by word frequency, argmax by
  * (count desc, pair asc in UTF-8 byte order), merges applied
  * leftmost-non-overlapping left to right (the scan order of both
  * engines' `replace`). BpeSpec pins overlap, tie-break, and
  * exhaustion cases.
  */
object Bpe {

  final case class Merge(round: Int, pair: String, token: String, count: Long)

  /** UTF-8 byte-order comparison — what Spark and DuckDB use for
    * string ORDER BY (Java's String ordering diverges on
    * supplementary characters).
    */
  private def utf8Less(a: String, b: String): Boolean = {
    val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** One merge applied with the SPACE-ANCHORED REPLACE semantics both
    * engines' `replace(' '||seq||' ', ' a b ', ' ab ')` implements —
    * the semantics the t31/t32 oracles pin. A match consumes the
    * pair's surrounding separators, and the scan resumes after the
    * MATCH, so the symbol immediately following a merged pair has no
    * leading separator left and can never START the next match (it
    * passes through protected; the symbol after IT can match again).
    * On a run of four identical symbols this yields [ab, a, b-style]
    * `[aa, a, a]`, NOT the textbook leftmost-non-overlapping
    * `[aa, aa]` — a deliberate divergence pinned in BpeSpec, because
    * cross-engine agreement with the SQL replace chain is the
    * contract, and both the trainer's between-round application and
    * the native encode (`graft_bpe_stats`) must share it exactly.
    */
  private[operators] def applyMerge(syms: Vector[String], a: String,
      b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b)
        // the next symbol's leading separator was consumed by the
        // match — it can be a pair's RIGHT element never its LEFT,
        // and the only pair in play this round is (a, b), so it
        // passes through verbatim
        if (i + 2 < syms.length) out += syms(i + 2)
        i += 3
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Train `rounds` greedy merges on a word-frequency table. Stops
    * early if no adjacent pair remains (all words fully merged).
    */
  def trainLocal(wordCounts: Seq[(String, Long)], rounds: Int): Seq[Merge] = {
    // initial symbols are CODE POINTS, not UTF-16 code units: both
    // engines' char split (Spark split(w, ''), DuckDB string_split)
    // is per code point, and String.split("") would break a
    // supplementary-plane char into two unpaired surrogates — the
    // trained merges would then diverge from the oracle's on exactly
    // the inputs utf8Less exists for.
    var seqs: Seq[(Vector[String], Long)] =
      wordCounts.map { case (w, n) =>
        (w.codePoints().toArray.toVector
          .map(cp => new String(Character.toChars(cp))), n)
      }
    val merges = Seq.newBuilder[Merge]
    var r = 1
    var done = false
    while (r <= rounds && !done) {
      val counts = scala.collection.mutable.LinkedHashMap.empty[(String, String), Long]
      for ((syms, n) <- seqs; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + n
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.reduceLeft { (best, cur) =>
          val ((ba, bb), bc) = best
          val ((ca, cb), cc) = cur
          if (cc > bc || (cc == bc && utf8Less(s"$ca $cb", s"$ba $bb"))) cur
          else best
        }
        seqs = seqs.map { case (syms, n) => (applyMerge(syms, a, b), n) }
        merges += Merge(r, s"$a $b", a + b, c)
        r += 1
      }
    }
    merges.result()
  }
}
