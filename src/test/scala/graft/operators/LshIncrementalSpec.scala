package graft.operators

import graft.{SparkSpec, TestSpark}
import graft.functions.XSql
import org.apache.spark.sql.functions._

/** Pins the stream/batch equivalence theorem behind st7/d9: feeding a
  * corpus through [[Lsh.incrementalPairs]] batch by batch — each batch
  * compared only against the accumulated store and its own prior ids —
  * must produce EXACTLY the batch [[Lsh.verifiedPairs]] set, for any
  * split of the corpus into batches. (Every pair is found once, in
  * whichever batch its second member arrives.)
  */
class LshIncrementalSpec extends SparkSpec {

  graft.functions.GraftFunctions.register(TestSpark.spark)

  private def docs(rows: (Long, String)*) = {
    import TestSpark.spark.implicits._
    implicit val dl: XSql.Dialect = XSql.Spark
    rows.toDF("doc_id", "text")
      .withColumn("sh", expr(XSql.shinglesOfText("text")))
      .select("doc_id", "sh")
  }

  // a corpus with exact dups, near-dups, and unrelated docs
  private val corpus = Seq(
    1L -> "the quick brown fox jumps over the lazy dog again and again",
    2L -> "the quick brown fox jumps over the lazy dog again and again",
    3L -> "the quick brown fox jumps over the lazy cat again and again",
    4L -> "completely different text about spark shuffles and partitions",
    5L -> "completely different text about spark shuffles and partitions",
    6L -> "short doc",
    7L -> "an unrelated third topic entirely with its own set of words here")

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental accumulation over any batch split == batch pair set") {
    val batchAll = pairSet(Lsh.verifiedPairs(docs(corpus: _*), 0.5))
    assert(batchAll.nonEmpty, "test corpus must contain near-dup pairs")
    // three different splits, including unordered ids across batches
    val splits: Seq[Seq[Seq[(Long, String)]]] = Seq(
      corpus.grouped(2).toSeq,
      corpus.grouped(3).toSeq,
      Seq(Seq(corpus(4), corpus(0)), Seq(corpus(2), corpus(6)),
        Seq(corpus(1), corpus(3), corpus(5))))
    for (split <- splits) {
      var store = Lsh.bands(docs()).limit(0)
      var found = Set.empty[(Long, Long)]
      for (batch <- split) {
        val nb = Lsh.bands(docs(batch: _*)).filter(col("band_key").isNotNull)
        found ++= pairSet(Lsh.incrementalPairs(nb, store, 0.5))
        store = store.unionByName(nb)
      }
      assert(found == batchAll,
        s"split ${split.map(_.map(_._1))}: incremental $found != batch $batchAll")
    }
  }

  test("incremental candidates keep orientation and provenance for count policies") {
    val first = docs(corpus.take(4): _*)
    val firstBands = Lsh.bands(first).filter(col("band_key").isNotNull)
    val second = docs(corpus.drop(4): _*)
    val secondBands = Lsh.bands(second).filter(col("band_key").isNotNull)
    val cands = Lsh.incrementalCandidates(secondBands, firstBands, 0.5)
      .select("na", "ob", "b_old").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    // doc 5 dups doc 4 (stored) — orientation must say new=5, old=4
    assert(cands.contains((5L, 4L, true)), cands.toString)
    // no candidate may claim a stored doc as the driving (new) side
    assert(cands.forall { case (na, _, _) => na >= 5L }, cands.toString)
  }
}
