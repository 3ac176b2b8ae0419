package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bpe.trainLocal]] to the SQL-expressible semantics the
  * t31/t32 oracles state: frequency-weighted pair counts, argmax by
  * (count desc, pair asc), greedy leftmost-non-overlapping merges.
  */
class BpeSpec extends AnyFunSuite {

  test("overlapping runs follow the space-anchored replace scan (engine parity, not textbook)") {
    // ' a a a a ' under replace ' a a ' -> ' aa ': the match consumes
    // the separator before the third symbol, so the scan CANNOT
    // restart there — both engines yield ' aa a a ', and the trainer
    // must agree with the SQL chain, not with textbook non-overlap
    assert(Bpe.applyMerge(Vector("a", "a", "a", "a"), "a", "a") ==
      Vector("aa", "a", "a"))
    assert(Bpe.applyMerge(Vector("a", "a", "a"), "a", "a") ==
      Vector("aa", "a"))
    // a run of five: the protected third symbol's SUCCESSOR can match
    assert(Bpe.applyMerge(Vector("a", "a", "a", "a", "a"), "a", "a") ==
      Vector("aa", "a", "aa"))
    // non-overlapping occurrences all merge
    assert(Bpe.applyMerge(Vector("a", "a", "x", "a", "a"), "a", "a") ==
      Vector("aa", "x", "aa"))
  }

  test("pair counts weight by word frequency; argmax picks the heaviest pair") {
    val merges = Bpe.trainLocal(Seq(("ab", 10L), ("cd", 3L)), 1)
    assert(merges == Seq(Bpe.Merge(1, "a b", "ab", 10L)))
  }

  test("count ties break by pair string ascending (engine ORDER BY parity)") {
    // 'xy' and 'ab' both appear 5 times -> 'a b' < 'x y' wins
    val merges = Bpe.trainLocal(Seq(("xy", 5L), ("ab", 5L)), 1)
    assert(merges.head.pair == "a b")
  }

  test("merged tokens participate in later rounds (cascade)") {
    // round 1 merges (e,r); round 2 can then merge (m, er)
    val merges = Bpe.trainLocal(Seq(("mer", 10L), ("er", 15L)), 2)
    assert(merges(0) == Bpe.Merge(1, "e r", "er", 25L))
    assert(merges(1) == Bpe.Merge(2, "m er", "mer", 10L))
  }

  test("training stops early when no adjacent pair remains") {
    // (a,b) merges in round 1; the fully-merged word has no pairs left
    val merges = Bpe.trainLocal(Seq(("ab", 1L)), 5)
    assert(merges == Seq(Bpe.Merge(1, "a b", "ab", 1L)))
  }

  test("single-char words contribute no pairs") {
    assert(Bpe.trainLocal(Seq(("a", 100L), ("b", 50L)), 3).isEmpty)
  }

  test("supplementary-plane chars split as code points, not UTF-16 units") {
    // U+1D11E (musical G clef) is one code point, two UTF-16 units; a
    // code-unit split would yield unpaired surrogates and train a
    // surrogate-pair merge the SQL engines' char split never sees
    val clef = new String(Character.toChars(0x1D11E))
    val merges = Bpe.trainLocal(Seq((clef + "a", 7L)), 1)
    assert(merges == Seq(Bpe.Merge(1, s"$clef a", clef + "a", 7L)))
    // a two-code-point supplementary word fully merges in one round —
    // under a code-unit split it would need three
    val twoClefs = clef + clef
    assert(Bpe.trainLocal(Seq((twoClefs, 1L)), 5) ==
      Seq(Bpe.Merge(1, s"$clef $clef", twoClefs, 1L)))
  }
}
