package graft

import org.apache.spark.sql.functions._

import graft.functions.XSql
import graft.queries.CorpusOps

/** Property check for the c9 leakage-safe split on generated corpora:
  *   1. every near-dup cluster shares ONE split (the invariant the
  *      operator exists for — a cluster straddling train/val scores
  *      memorization in the val set);
  *   2. docs outside any cluster split exactly as the plain t6
  *      content-hash rule would (the operator must not perturb the
  *      split of clean documents).
  * The corpus is deterministic-pseudo-random: base sentences from an
  * affine word generator, duplicates with small word-level edits so
  * LSH at 0.3 actually clusters them.
  */
class LeakageSafeSplitSpec extends SparkSpec {

  private def word(n: Long): String = s"w${(1103515245L * n + 12345L) % 9973L}"

  /** ~40 base docs of 30 words; every 4th doc gets a near-duplicate
    * (one word changed) and every 8th a second one (two words changed)
    * — clusters of size 2-3 plus singletons.
    */
  private def corpus: Seq[(Long, String)] = {
    val bases = (0L until 40L).map { i =>
      i -> (0 until 30).map(j => word(i * 31 + j)).mkString(" ")
    }
    val dups = bases.collect {
      case (i, text) if i % 4 == 0 =>
        (100L + i) -> (text.split(" ").updated(3, "changed").mkString(" "))
    }
    val dups2 = bases.collect {
      case (i, text) if i % 8 == 0 =>
        (200L + i) -> (text.split(" ")
          .updated(5, "altered").updated(11, "edited").mkString(" "))
    }
    bases ++ dups ++ dups2
  }

  test("every near-dup cluster shares one split; singletons match the t6 rule") {
    import spark.implicits._
    implicit val dl: XSql.Dialect = XSql.Spark
    val docs = corpus.toDF("doc_id", "text")
    val out = CorpusOps.leakageSafeSplit(docs, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))

    // the generator must actually produce clusters, or this test is vacuous
    val clustered = out.filter { case (id, rep, _) => id != rep }
    assert(clustered.nonEmpty, "fixture produced no near-dup clusters")

    // invariant 1: one split per rep_id
    val splitsPerRep = out.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    splitsPerRep.foreach { case (rep, splits) =>
      assert(splits.size == 1, s"cluster rep=$rep straddles splits: $splits")
    }

    // invariant 2: singleton docs split exactly as t6 would
    val reps = out.map(_._2).toSet
    val singletons = out.filter { case (id, rep, _) =>
      id == rep && !out.exists { case (o, r, _) => o != id && r == id }
    }.map(_._1).toSet
    assert(singletons.nonEmpty)
    val t6 = docs
      .select(col("doc_id"),
        when(expr(XSql.charHash("text")) % 100 < 95, "train")
          .otherwise("val").as("split"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(o => singletons(o._1)).foreach { case (id, _, split) =>
      assert(split == t6(id), s"singleton $id diverged from the t6 rule")
    }
    // sanity: reps are always cluster minima
    out.foreach { case (id, rep, _) => assert(rep <= id) }
    assert(reps.subsetOf(out.map(_._1).toSet))
  }
}
