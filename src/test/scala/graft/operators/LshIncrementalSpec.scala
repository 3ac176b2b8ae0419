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

  // ---- stored-side occupancy cap (r15 verdict task 2) --------------

  /** A corpus whose shared text SATURATES its band buckets: `n` docs
    * that are near-identical (every bucket they band into has
    * occupancy ~n), so a cap < n must bind.
    */
  private def saturating(n: Int, from: Long): Seq[(Long, String)] =
    (0 until n).map(i => (from + i,
      s"the same boilerplate template text repeated across the crawl " +
        s"with trailing variation token_$i"))

  test("capped stored buckets never exceed the cap and keep the rank-1 hub") {
    val stored = Lsh.bands(docs(saturating(40, 100L): _*))
      .filter(col("band_key").isNotNull)
    val capped = Lsh.cappedStored(stored, cap = 4)
    val occ = capped.groupBy("band_idx", "band_key").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(occ <= 4, s"capped bucket occupancy $occ > cap 4")
    // the rank-1 survivor of every bucket is retained (the probe's
    // guaranteed representative of a saturated cluster)
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("band_idx", "band_key")
      .orderBy((col("doc_id") * lit(Lsh.CapSelMult)) % lit(XSql.P),
        col("doc_id"))
    val hubs = stored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
    assert(hubs.join(capped, Seq("band_idx", "band_key", "doc_id"),
      "left_anti").count() == 0, "a bucket's rank-1 hub was capped away")
  }

  test("capped incremental pairs are a subset with identical jacc; " +
    "equality when no bucket saturates") {
    val fresh = Lsh.bands(docs(saturating(3, 500L) ++ corpus.take(2): _*))
      .filter(col("band_key").isNotNull)
    val stored = Lsh.bands(docs(saturating(40, 100L) ++ corpus.drop(2): _*))
      .filter(col("band_key").isNotNull)
    val capped = Lsh.incrementalPairsCapped(fresh, stored, 0.5, cap = 4)
    val uncapped = Lsh.incrementalPairs(fresh, stored, 0.5)
    // subset with identical jacc values
    assert(capped.join(uncapped, Seq("doc_a", "doc_b", "jacc"), "left_anti")
      .count() == 0, "capped emitted a pair (or jacc) the uncapped form lacks")
    // the saturated stored cluster is still DETECTED: every fresh
    // near-dup of it keeps at least one stored partner
    val freshDupIds = Set(500L, 501L, 502L)
    val partners = capped.filter(col("doc_a").isin(freshDupIds.toSeq: _*) ||
      col("doc_b").isin(freshDupIds.toSeq: _*)).count()
    assert(partners > 0, "fresh dups of the saturated stored cluster lost all partners")
    // where no bucket saturates the cap, capped == uncapped exactly
    val smallStored = Lsh.bands(docs(corpus.drop(2): _*))
      .filter(col("band_key").isNotNull)
    val smallFresh = Lsh.bands(docs(corpus.take(2): _*))
      .filter(col("band_key").isNotNull)
    assert(pairSet(Lsh.incrementalPairsCapped(smallFresh, smallStored, 0.5))
      == pairSet(Lsh.incrementalPairs(smallFresh, smallStored, 0.5)),
      "cap changed results on a corpus where it never binds")
  }

  test("cappedStored selection is membership-determined, not layout-determined") {
    val stored = Lsh.bands(docs(saturating(30, 100L): _*))
      .filter(col("band_key").isNotNull)
    def surv(df: org.apache.spark.sql.DataFrame): Set[(Int, Long)] =
      Lsh.cappedStored(df, cap = 4).select("band_idx", "doc_id").collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(surv(stored) == surv(stored.repartition(7).orderBy(desc("doc_id"))),
      "survivor set depends on physical layout")
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
