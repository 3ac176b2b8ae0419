package graft.functions

/** Cross-engine SQL emission for the text / hashing / vector operators.
  *
  * Every operator that needs a DuckDB oracle builds BOTH its Spark-side
  * expression (used via `expr(...)`) and its oracle SQL from the same
  * builder functions here, parameterized by [[Dialect]]. That keeps the
  * two implementations in arithmetic lockstep: same fold order, same
  * integer modulus, same constants — so results are bit-identical
  * across engines (all-integer hashing; left-to-right double folds).
  *
  * Hash design (public-domain textbook constructions, no library deps):
  *   - charHash: 31-polynomial over codepoints mod P (Java-String style)
  *   - shingles: word 3-grams combined with a 131-polynomial mod P
  *   - MinHash:  k=16 universal-hash permutations h_j(x)=(a_j x+b_j) mod P
  *   - LSH:      4 bands x 4 rows, band key = 131-polynomial of the row
  *   - SimHash:  30-bit sign-aggregate over word hashes
  * P = 1e9+7 keeps every product below 2^62 (no int64 overflow).
  */
object XSql {

  val P = 1000000007L
  val CharM = 31L
  val WordM = 131L
  val H0 = 7L

  val MinhashK = 16
  val LshBands = 4
  val LshRows = 4
  /** Universal-hash coefficients, fixed by construction (not runtime-random;
    * determinism across engines and rounds matters more than independence).
    */
  val A: Seq[Long] = (0 until MinhashK).map(j => (2654435761L * (j + 1) + 104729L) % P)
  val B: Seq[Long] = (0 until MinhashK).map(j => (97531L * (j + 1) + 12345L) % P)

  val SimhashBits = 30

  /** Hyperplane-LSH constants (shared by the native LshBucket
    * expression, the lambda emitter, and the DuckDB oracle).
    */
  val LshPlanes = 8
  val PlaneMod = 2001L
  val A2: Seq[Long] = (0 until LshPlanes).map(p => (1103515245L * (p + 7) + 12345L) % 1000003L)
  val B2: Seq[Long] = (0 until LshPlanes).map(p => (69069L * (p + 13) + 3571L) % 1000003L)

  sealed trait Dialect {
    def xform(l: String, v: String, body: String): String
    def filt(l: String, v: String, body: String): String
    /** Left fold with a BIGINT accumulator. */
    def foldL(l: String, init: Long, acc: String, x: String, body: String): String
    /** Left fold with a DOUBLE accumulator. */
    def foldD(l: String, acc: String, x: String, body: String): String
    /** 0-based element access (dialect handles its own base). */
    def idx(arr: String, i0: String): String
    /** The integer list [0, n) — empty when n <= 0. */
    def seq0(n: String): String
    def codepoint(c: String): String
    def chars(s: String): String
    def strSplit(s: String, sep: String): String
    def arrMin(l: String): String
    def arrSize(l: String): String
    def arrDistinct(l: String): String
    def arrSort(l: String): String
    def arrConcat(a: String, b: String): String
    def arrIntersect(a: String, b: String): String
    /** length-`k` slice starting at 0-based `i0`. */
    def slice(l: String, i0: String, k: Int): String
    def shiftRight(x: String, n: String): String
    def shiftLeft1(n: String): String
    def bigintArr(vals: Seq[Long]): String
    def toDoubleArr(floatArr: String): String
  }

  object Spark extends Dialect {
    def xform(l: String, v: String, body: String) = s"transform($l, $v -> $body)"
    def filt(l: String, v: String, body: String) = s"filter($l, $v -> $body)"
    def foldL(l: String, init: Long, acc: String, x: String, body: String) =
      s"aggregate($l, bigint($init), ($acc, $x) -> $body)"
    def foldD(l: String, acc: String, x: String, body: String) =
      s"aggregate($l, double(0), ($acc, $x) -> $body)"
    def idx(arr: String, i0: String) = s"element_at($arr, ($i0) + 1)"
    def seq0(n: String) =
      s"(CASE WHEN ($n) <= 0 THEN array() ELSE sequence(0, ($n) - 1) END)"
    def codepoint(c: String) = s"bigint(ascii($c))"
    def chars(s: String) = s"split($s, '')"
    def strSplit(s: String, sep: String) = s"split($s, '$sep')"
    def arrMin(l: String) = s"array_min($l)"
    def arrSize(l: String) = s"size($l)"
    def arrDistinct(l: String) = s"array_distinct($l)"
    def arrSort(l: String) = s"array_sort($l)"
    def arrConcat(a: String, b: String) = s"concat($a, $b)"
    def arrIntersect(a: String, b: String) = s"array_intersect($a, $b)"
    def slice(l: String, i0: String, k: Int) = s"slice($l, ($i0) + 1, $k)"
    def shiftRight(x: String, n: String) = s"shiftright($x, int($n))"
    def shiftLeft1(n: String) = s"shiftleft(bigint(1), int($n))"
    def bigintArr(vals: Seq[Long]) = vals.map(v => s"bigint($v)").mkString("array(", ", ", ")")
    // cast, not a per-element transform lambda: Cast on arrays is
    // codegen'd (the lambda runs interpreted per element), and
    // float->double widening is exact, so the values are identical
    def toDoubleArr(a: String) = s"cast($a as array<double>)"
  }

  object Duck extends Dialect {
    def xform(l: String, v: String, body: String) = s"list_transform($l, $v -> $body)"
    def filt(l: String, v: String, body: String) = s"list_filter($l, $v -> $body)"
    def foldL(l: String, init: Long, acc: String, x: String, body: String) =
      s"list_reduce(list_prepend(cast($init as bigint), $l), ($acc, $x) -> $body)"
    def foldD(l: String, acc: String, x: String, body: String) =
      s"list_reduce(list_prepend(cast(0 as double), $l), ($acc, $x) -> $body)"
    // cast: list_prepend of a double init coerces an int index list to
    // DOUBLE[], and DuckDB won't index with a non-integer.
    def idx(arr: String, i0: String) = s"$arr[cast(($i0) + 1 as bigint)]"
    def seq0(n: String) = s"range(0, greatest($n, 0))"
    def codepoint(c: String) = s"cast(unicode($c) as bigint)"
    def chars(s: String) = s"string_split($s, '')"
    def strSplit(s: String, sep: String) = s"string_split($s, '$sep')"
    def arrMin(l: String) = s"list_min($l)"
    def arrSize(l: String) = s"len($l)"
    def arrDistinct(l: String) = s"list_distinct($l)"
    def arrSort(l: String) = s"list_sort($l)"
    def arrConcat(a: String, b: String) = s"list_concat($a, $b)"
    def arrIntersect(a: String, b: String) = s"list_intersect($a, $b)"
    def slice(l: String, i0: String, k: Int) = s"list_slice($l, ($i0) + 1, ($i0) + $k)"
    def shiftRight(x: String, n: String) = s"(($x) >> ($n))"
    def shiftLeft1(n: String) = s"(cast(1 as bigint) << ($n))"
    def bigintArr(vals: Seq[Long]) = vals.map(v => s"cast($v as bigint)").mkString("[", ", ", "]")
    def toDoubleArr(a: String) = s"cast($a as DOUBLE[])"
  }

  // ---------------------------------------------------------------- text

  /** Non-empty words of a text column (empty strings dropped: the two
    * engines disagree on codepoint('') so they must never be hashed).
    */
  def words(text: String)(implicit d: Dialect): String =
    d.filt(d.strSplit(text, " "), "w_", "w_ != ''")

  /** 31-polynomial char hash of a string expression, mod P. On the
    * Spark side this is the native codegen'd [[CharPolyHash]] (the
    * lambda form it replaces is pinned equal in XSqlSpec); the oracle
    * runs the equivalent fold.
    */
  def charHash(s: String)(implicit d: Dialect): String = d match {
    case Spark => s"graft_char_hash($s)"
    case Duck =>
      d.foldL(d.xform(d.chars(s), "c_", d.codepoint("c_")), H0,
        "acc_", "x_", s"(acc_ * $CharM + x_) % $P")
  }

  /** The lambda-built form (both dialects) — kept for the cross-engine
    * equivalence spec that pins [[CharPolyHash]] to it.
    */
  def charHashLambda(s: String)(implicit d: Dialect): String =
    d.foldL(d.xform(d.chars(s), "c_", d.codepoint("c_")), H0,
      "acc_", "x_", s"(acc_ * $CharM + x_) % $P")

  /** Hash of every word in a words-array expression. */
  def wordHashes(wordsE: String)(implicit d: Dialect): String =
    d.xform(wordsE, "w_", charHash("w_"))

  /** Word hashes straight from a TEXT column: native single-pass scan
    * on Spark (no per-row word array, no interpreted lambdas); the
    * lambda pipeline on the oracle. Values identical (XSqlSpec).
    */
  def wordHashesOfText(text: String)(implicit d: Dialect): String = d match {
    case Spark => s"graft_word_hashes($text)"
    case Duck => wordHashes(words(text))
  }

  /** Shingle hashes straight from a TEXT column: native sorted-distinct
    * on Spark, lambda pipeline on the oracle. Element ORDER differs
    * (sorted vs first-occurrence) — every consumer (minhash, bands,
    * jaccard) is order-invariant, and sorted arrays let the native
    * intersect skip its per-pair sort.
    */
  def shinglesOfText(text: String)(implicit d: Dialect): String = d match {
    case Spark => s"graft_shingles($text)"
    case Duck => shingleHashes(wordHashes(words(text)))
  }

  /** Distinct hashes of word 3-gram shingles, from a word-hash array. */
  def shingleHashes(whE: String)(implicit d: Dialect): String = {
    val i = "i_"
    val s0 = d.idx("wh_", i)
    val s1 = d.idx("wh_", s"$i + 1")
    val s2 = d.idx("wh_", s"$i + 2")
    // ((h0*131 + h1) % P * 131 + h2) % P — stays under 2^38
    val body = s"((($s0 * $WordM + $s1) % $P) * $WordM + $s2) % $P"
    // bind wh_ once via a transform-over-singleton trick is ugly; inline instead
    val inlined = body.replace("wh_", s"($whE)")
    d.arrDistinct(d.xform(d.seq0(s"${d.arrSize(s"($whE)")} - 2"), i, inlined))
  }

  /** MinHash signature (k=16) of a shingle-hash array expression.
    * Spark runs the native [[MinHashSig]] loop; the oracle runs the
    * equivalent lambda fold (pinned equal in XSqlSpec). An empty
    * shingle array (a document with < 3 words) has NO signature: both
    * forms yield NULL, so degenerate docs drop out of LSH band joins
    * instead of colliding on a sentinel signature.
    */
  def minhashSig(shE: String)(implicit d: Dialect): String = d match {
    case Spark => s"graft_minhash_sig($shE)"
    case Duck => minhashSigLambda(shE)
  }

  def minhashSigLambda(shE: String)(implicit d: Dialect): String = {
    val perm = s"(${d.idx(d.bigintArr(A), "j_")} * s_ + ${d.idx(d.bigintArr(B), "j_")}) % $P"
    val sig = d.xform(d.seq0(MinhashK.toString), "j_", d.arrMin(d.xform(shE, "s_", perm)))
    s"(CASE WHEN ${d.arrSize(s"($shE)")} = 0 THEN NULL ELSE $sig END)"
  }

  /** LSH band keys (4 bands x 4 rows) of a signature array expression. */
  def bandKeys(sigE: String)(implicit d: Dialect): String = {
    def row(r: Int) = d.idx("sg_", s"b_ * $LshRows + $r")
    val key = (1 until LshRows).foldLeft(row(0)) { (acc, r) =>
      s"(($acc) * $WordM + ${row(r)}) % $P"
    }
    d.xform(d.seq0(LshBands.toString), "b_", key.replace("sg_", s"($sigE)"))
  }

  /** 30-bit SimHash of a word-hash array expression. Spark: native
    * [[SimHash30]]; oracle: the equivalent lambda fold.
    */
  def simhash(whE: String)(implicit d: Dialect): String = d match {
    case Spark => s"graft_simhash($whE)"
    case Duck => simhashLambda(whE)
  }

  def simhashLambda(whE: String)(implicit d: Dialect): String = {
    val bitVote =
      d.foldL(s"($whE)", 0L, "acc_", "h_",
        s"acc_ + (CASE WHEN ${d.shiftRight("h_", "b_")} % 2 = 1 THEN 1 ELSE -1 END)")
    val bits = d.xform(d.seq0(SimhashBits.toString), "b_",
      s"CASE WHEN ($bitVote) > 0 THEN ${d.shiftLeft1("b_")} ELSE bigint_zero_ END")
    val folded = d.foldL(bits, 0L, "acc2_", "x2_", "acc2_ + x2_")
    folded.replace("bigint_zero_", if (d == Spark) "bigint(0)" else "cast(0 as bigint)")
  }

  /** Positionwise agreement count of two MinHash signatures — the
    * collision statistic whose expectation IS the Jaccard similarity
    * (the estimator LSH banding thresholds are built on). Integer
    * fold, bit-identical everywhere.
    */
  def sigAgreement(a: String, b: String)(implicit d: Dialect): String =
    d.foldL(d.seq0(MinhashK.toString), 0L, "acc_", "i_",
      s"acc_ + (CASE WHEN ${d.idx(s"($a)", "i_")} = ${d.idx(s"($b)", "i_")} " +
        "THEN 1 ELSE 0 END)")

  /** Exact Jaccard similarity of two distinct-element arrays (double).
    * |A∪B| is derived as |A|+|B|-|A∩B| (arrays are distinct), so each
    * pair costs one intersect; Spark runs the native sort-merge count.
    */
  def jaccard(a: String, b: String)(implicit d: Dialect): String = {
    val inter = d match {
      case Spark => s"graft_intersect_size($a, $b)"
      case Duck => d.arrSize(d.arrIntersect(a, b))
    }
    val sizes = s"${d.arrSize(a)} + ${d.arrSize(b)}"
    s"cast($inter as double) / cast(($sizes) - ($inter) as double)"
  }

  /** Rolling k-gram char hashes of a text expression (winnowing input). */
  def kgramHashes(text: String, k: Int)(implicit d: Dialect): String = {
    val gram = s"substr(($text), i_ + 1, $k)"
    d.xform(d.seq0(s"length($text) - ${k - 1}"), "i_", charHash(gram))
  }

  /** Winnowing fingerprints of a TEXT expression (k=8 grams, window
    * 4): Spark runs the native [[Winnow]] loop; the oracle composes
    * the lambda forms.
    */
  def winnowText(text: String)(implicit d: Dialect): String = d match {
    case Spark => s"graft_winnow($text)"
    case Duck => winnow(kgramHashes(text, Winnow.K), Winnow.W)
  }

  /** Winnowing: min hash of each length-`w` window, distinct + sorted. */
  def winnow(khE: String, w: Int)(implicit d: Dialect): String = {
    val mins = d.xform(d.seq0(s"${d.arrSize(s"($khE)")} - ${w - 1}"), "i_",
      d.arrMin(d.slice(s"($khE)", "i_", w)))
    d.arrSort(d.arrDistinct(mins))
  }

  // -------------------------------------------------------------- vectors

  /** Left-fold dot product of two double-array expressions — identical
    * accumulation order in both engines, so bit-identical results.
    */
  def dot(a: String, b: String)(implicit d: Dialect): String =
    d.foldD(d.seq0(d.arrSize(s"($a)")), "acc_", "i_",
      s"acc_ + ${d.idx(s"($a)", "i_")} * ${d.idx(s"($b)", "i_")}")

  /** Squared L2 norm of a double-array expression. */
  def norm2(a: String)(implicit d: Dialect): String = dot(a, a)

  /** Squared L2 distance of two double-array expressions — same
    * left-fold accumulation order both engines, so bit-identical;
    * comparisons on the result (argmin in k-means / IVF assignment)
    * therefore agree across engines.
    */
  def dist2(a: String, b: String)(implicit d: Dialect): String = {
    val diff = s"(${d.idx(s"($a)", "i_")} - ${d.idx(s"($b)", "i_")})"
    d.foldD(d.seq0(d.arrSize(s"($a)")), "acc_", "i_",
      s"acc_ + $diff * $diff")
  }

  /** Cosine similarity given two vectors and their precomputed squared
    * norms. Formula pinned as dot / (sqrt(n2a) * sqrt(n2b)) — both
    * engines must use exactly this shape.
    */
  def cosineFromNorms(dotE: String, n2a: String, n2b: String): String =
    s"($dotE) / (sqrt($n2a) * sqrt($n2b))"
}
