package graft.operators

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.functions._

/** Property check for the anchor-aggregate phrase matcher: on random
  * corpora over a tiny vocabulary (dense with repeats — the adversarial
  * regime for positional matching), [[Postings.phraseMatch]] must
  * equal a brute-force sliding-window scan for every phrase shape:
  * single word, adjacent pairs/triples, phrases with REPEATED words
  * ("a b a" — a posting votes one anchor per offset it occupies), and
  * phrases absent from the corpus. Seeded, deterministic.
  */
class PostingsPropertySpec extends SparkSpec {

  private val vocab = Vector("a", "b", "c", "d")

  test("phraseMatch == brute-force sliding window on random dense corpora") {
    import TestSpark.spark.implicits._
    val rnd = new scala.util.Random(4242)
    val docs = (0L until 120L).map { id =>
      val n = 3 + rnd.nextInt(18)
      (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val docsDf = docs.toDF("doc_id", "text")
    val postings = Postings.positional(docsDf).cache()

    def brute(phrase: Seq[String]): Set[Long] = docs.collect {
      case (id, text)
          if text.split(" ").toSeq.sliding(phrase.size).contains(phrase) =>
        id
    }.toSet

    val phrases = Seq(
      Seq("a"), Seq("d"),
      Seq("a", "b"), Seq("c", "c"),
      Seq("a", "b", "a"), Seq("b", "b", "b"),
      Seq("d", "c", "b", "a"),
      Seq("a", "a", "a", "a", "a"),
      Seq("zz"), Seq("a", "zz")) ++
      Seq.fill(10)(Seq.fill(1 + rnd.nextInt(4))(vocab(rnd.nextInt(vocab.size))))

    phrases.foreach { ph =>
      val got = Postings.phraseMatch(postings, ph)
        .collect().map(_.getLong(0)).toSet
      val want = brute(ph)
      assert(got == want,
        s"phrase ${ph.mkString(" ")}: got ${got.toSeq.sorted.take(20)} " +
          s"want ${want.toSeq.sorted.take(20)}")
    }
    postings.unpersist(): Unit
  }
}
