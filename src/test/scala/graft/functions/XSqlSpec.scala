package graft.functions

import graft.SparkSpec
import graft.functions.XSql.{Spark => SqlSpark}
import org.apache.spark.sql.functions.expr

/** Pins the hash/fold primitives to known values — these constants are
  * the cross-engine contract with the DuckDB oracle (validated against
  * DuckDB interactively; any drift here breaks every dedup oracle).
  */
class XSqlSpec extends SparkSpec {

  private implicit val d: SqlSpark.type = SqlSpark

  private def eval1(sql: String): Any = {
    GraftFunctions.register(spark)
    spark.sql(s"SELECT $sql AS v").head().get(0)
  }

  test("charHash('hash') matches the pinned cross-engine value") {
    assert(eval1(XSql.charHash("'hash'")) == 9659797L)
  }

  // NOTE: the empty string is deliberately outside the equivalence
  // domain — split('','') yields [''] whose codepoint differs between
  // engines (Spark ascii=0, DuckDB unicode=-1, native skips). Every
  // hashing operator filters empty strings first (XSql.words).
  test("native graft_char_hash equals the lambda fold it replaced") {
    for (s <- Seq("hash", "a", "spark fast table", "Ünïcode mix 123!")) {
      val native = eval1(XSql.charHash(s"'$s'"))
      val lambda = eval1(XSql.charHashLambda(s"'$s'"))
      assert(native == lambda, s"mismatch for '$s'")
    }
  }

  test("dot product left fold is exact") {
    assert(eval1(XSql.dot("array(1.0D, 2.0D)", "array(3.0D, 4.0D)")) == 11.0)
  }

  test("dist2 left fold is exact") {
    // (1-3)² + (2-5)² = 13
    assert(eval1(XSql.dist2("array(1.0D, 2.0D)", "array(3.0D, 5.0D)")) == 13.0)
  }

  test("sigAgreement counts positionwise equal entries") {
    assert(eval1(XSql.sigAgreement(
      "array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L, 9L, 10L, 11L, 12L, 13L, 14L, 15L, 16L)",
      "array(1L, 2L, 0L, 4L, 0L, 6L, 0L, 8L, 0L, 10L, 0L, 12L, 0L, 14L, 0L, 16L)")) == 9L)
  }

  test("words drops empty strings") {
    assert(eval1(s"size(${XSql.words("'a  b '")})") == 2)
  }

  test("minhash signature has k entries, stable first value") {
    val sig = eval1(
      XSql.minhashSig(XSql.shingleHashes(XSql.wordHashes(XSql.words("'a b c d'")))))
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(sig.length == XSql.MinhashK)
    // 2 shingles; every sig entry is a valid residue
    assert(sig.forall(v => v >= 0 && v < XSql.P))
  }

  test("simhash is within 30 bits and deterministic") {
    val v1 = eval1(XSql.simhash(XSql.wordHashes(XSql.words("'spark fast table'"))))
      .asInstanceOf[Long]
    val v2 = eval1(XSql.simhash(XSql.wordHashes(XSql.words("'spark fast table'"))))
      .asInstanceOf[Long]
    assert(v1 == v2)
    assert(v1 >= 0 && v1 < (1L << 30))
  }

  test("native simhash and minhash sig equal their lambda forms") {
    val wh = XSql.wordHashes(XSql.words("'spark fast table spark row batch'"))
    assert(eval1(XSql.simhash(wh)) == eval1(XSql.simhashLambda(wh)))
    val sh = XSql.shingleHashes(wh)
    assert(eval1(XSql.minhashSig(sh)) == eval1(XSql.minhashSigLambda(sh)))
  }

  test("native word hashes / shingles equal their lambda pipelines") {
    for (s <- Seq("spark fast table spark row batch", "a  b   c d", "one",
      "Ünïcode mix 123! again Ünïcode mix", " lead trail ", "x y z")) {
      val lit = s"'$s'"
      assert(eval1(XSql.wordHashesOfText(lit)) ==
        eval1(XSql.wordHashes(XSql.words(lit))), s"wordHashes mismatch for '$s'")
      // native shingles are SORTED-distinct; the lambda form is
      // first-occurrence-distinct — equal as sorted sets
      assert(eval1(XSql.shinglesOfText(lit)) ==
        eval1(s"array_sort(${XSql.shingleHashes(XSql.wordHashes(XSql.words(lit)))})"),
        s"shingles mismatch for '$s'")
    }
    // < 3 words -> empty shingle set
    assert(eval1(s"size(${XSql.shinglesOfText("'two words'")})") == 0)
  }

  test("minhash sig of an empty shingle array is NULL in both forms") {
    // < 3 words => no shingles => no signature; the native expression
    // and the lambda/oracle form must agree on NULL (not sentinel
    // values, which would collide in LSH band joins)
    val empty = "cast(array() as array<bigint>)"
    assert(eval1(XSql.minhashSig(empty)) == null)
    assert(eval1(XSql.minhashSigLambda(empty)) == null)
    // and the shingle pipeline for a 2-word doc produces that empty case
    val sh = XSql.shingleHashes(XSql.wordHashes(XSql.words("'two words'")))
    assert(eval1(XSql.minhashSig(sh)) == null)
  }

  test("native intersect size equals builtin array_intersect size") {
    val a = "array(bigint(5), bigint(1), bigint(9), bigint(3))"
    val b = "array(bigint(3), bigint(9), bigint(8))"
    assert(eval1(s"graft_intersect_size($a, $b)") ==
      eval1(s"bigint(size(array_intersect($a, $b)))"))
  }

  test("native winnow equals the lambda composition") {
    val t = "'the quick brown fox jumps over the lazy dog'"
    assert(eval1(XSql.winnowText(t)) ==
      eval1(XSql.winnow(XSql.kgramHashes(t, 8), 4)))
  }

  test("native lsh bucket is stable and within plane-bit range") {
    val v = (1 to 64).map(i => s"double(${i % 7} - 3)").mkString("array(", ",", ")")
    val x = eval1(s"graft_lsh_bucket($v)").asInstanceOf[Long]
    assert(x == eval1(s"graft_lsh_bucket($v)").asInstanceOf[Long])
    assert(x >= 0 && x < (1L << XSql.LshPlanes))
  }

  test("variable-width lsh bucket: formula coefficients == fixed arrays at the default width; wider = prefix-consistent") {
    val v = (1 to 64).map(i => s"double(${i % 7} - 3)").mkString("array(", ",", ")")
    // A2/B2 are the generating formula's first LshPlanes values, so
    // bucketN at the default width must equal the fixed-array bucket
    val fixed = eval1(s"graft_lsh_bucket($v)").asInstanceOf[Long]
    val dyn = eval1(s"graft_lsh_bucket_n($v, ${XSql.LshPlanes})").asInstanceOf[Long]
    assert(dyn == fixed, s"formula=$dyn fixed=$fixed")
    // widening only ADDS high bits: the low LshPlanes bits are the
    // same plane signs (the property that keeps narrow- and wide-width
    // assignments comparable)
    val wide = eval1(s"graft_lsh_bucket_n($v, 13)").asInstanceOf[Long]
    assert((wide & ((1L << XSql.LshPlanes) - 1)) == fixed, s"wide=$wide")
    assert(wide >= 0 && wide < (1L << 13))
  }

  test("native bpe stats: space-anchored replace chain, code-point chars, split-size tokens") {
    // 'aaaa' under (a,a): ' a a a a ' -> ' aa a a ' (the replace scan
    // consumes the third symbol's separator — engine semantics, see
    // BpeSpec), so 3 tokens and 'aa aa' never applies; 'ab' untouched
    // -> 2 tokens; chars = 4 + 2. Pinned equal to the SQL lambda
    // chain the oracle runs.
    val r = eval1(
      "graft_bpe_stats(array('aaaa', 'ab'), array('a a', 'aa aa'))")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert((r.getLong(0), r.getLong(1)) == ((5L, 6L)), r.toString)
    // and Spark's own replace shows the same scan-after-match
    // semantics the native loop uses (the cross-engine contract —
    // DuckDB's replace agrees, verified against it directly)
    assert(eval1("replace(' a a a a ', ' a a ', ' aa ')") == " aa a a ")
    // supplementary-plane code point is ONE char and merges as one
    val clef = new String(Character.toChars(0x1D11E))
    val r2 = eval1(
      s"graft_bpe_stats(array('${clef}a'), array('$clef a'))")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert((r2.getLong(0), r2.getLong(1)) == ((1L, 2L)), r2.toString)
    // no merges: one token per char
    val r3 = eval1(
      "graft_bpe_stats(array('xyz'), cast(array() as array<string>))")
      .asInstanceOf[org.apache.spark.sql.Row]
    assert((r3.getLong(0), r3.getLong(1)) == ((3L, 3L)), r3.toString)
  }

  test("jaccard of overlapping sets") {
    assert(eval1(XSql.jaccard(
      "array(bigint(1), bigint(2), bigint(3))",
      "array(bigint(2), bigint(3), bigint(4))")) == 0.5)
  }

  test("sketch algebra: jaccard(a,a)=1, symmetry, sig equality on equal sets") {
    val a = "array(bigint(4), bigint(7), bigint(9))"
    val b = "array(bigint(7), bigint(8))"
    assert(eval1(XSql.jaccard(a, a)) == 1.0)
    assert(eval1(XSql.jaccard(a, b)) == eval1(XSql.jaccard(b, a)))
    val j = eval1(XSql.jaccard(a, b)).asInstanceOf[Double]
    assert(j >= 0.0 && j <= 1.0)
    // minhash of the same element set is identical regardless of order
    assert(eval1(XSql.minhashSig("array(bigint(3), bigint(5), bigint(11))")) ==
      eval1(XSql.minhashSig("array(bigint(11), bigint(3), bigint(5))")))
  }

  test("winnow produces sorted distinct fingerprints") {
    val fp = eval1(XSql.winnow(XSql.kgramHashes("'abcdefghijklmno'", 8), 4))
      .asInstanceOf[scala.collection.Seq[Long]]
    assert(fp == fp.sorted && fp.distinct == fp)
    assert(fp.nonEmpty)
  }
}
