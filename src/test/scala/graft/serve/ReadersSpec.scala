package graft.serve

import graft.SparkSpec

/** Serving-read contract (readers/games.py semantics, SURVEY §3.3):
  * point lookups, precomputed vs live similarity, metric allow-list.
  */
class ReadersSpec extends SparkSpec {

  private lazy val readers = Readers.build(spark, "/root/testdata/sf0.001", k = 5)

  test("point lookup returns the row, missing id returns None") {
    assert(readers.profile(0L).isDefined)
    assert(readers.profile(99999999L).isEmpty)
  }

  test("precomputed neighbors: k ordered ascending by distance") {
    val row = readers.similarPrecomputed(0L).get
    val similar = row.getSeq[org.apache.spark.sql.Row](row.fieldIndex("similar"))
    assert(similar.nonEmpty && similar.length <= 5)
    val dists = similar.map(_.getDouble(1))
    assert(dists == dists.sorted)
  }

  test("live similarity: top-k, query vector excluded, deterministic") {
    val top = readers.similarLive(0L, "COSINE", 3).collect()
    assert(top.length == 3)
    assert(!top.map(_.getLong(0)).contains(0L))
    val again = readers.similarLive(0L, "COSINE", 3).collect()
    assert(top.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("document composes profile + neighbors; missing id -> None") {
    val doc = readers.document(0L).get
    assert(doc.contains("vec_id") && doc.contains("similar"))
    assert(doc("similar").asInstanceOf[Seq[_]].nonEmpty)
    assert(readers.document(99999999L).isEmpty)
  }

  test("concurrent document assembly == sequential composition of the two lookups") {
    // document() issues the profile and neighbors lookups on two
    // futures (the reference's ThreadPoolExecutor(2) discipline);
    // the composed result must equal hand-sequential assembly
    val doc = readers.document(0L).get
    val row = readers.profile(0L).get
    val seqBase = row.schema.fieldNames.zip(row.toSeq).toMap
    val seqSimilar = readers.similarPrecomputed(0L)
      .map(r => r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("similar")))
      .getOrElse(Seq.empty)
    assert(doc == seqBase + ("similar" -> seqSimilar))
  }

  test("metric allow-list rejects unknown metrics") {
    intercept[IllegalArgumentException] {
      readers.similarLive(0L, "MANHATTAN", 3)
    }
  }

  test("live euclidean and dot-product paths work") {
    assert(readers.similarLive(0L, "EUCLIDEAN", 2).collect().length == 2)
    assert(readers.similarLive(0L, "DOT_PRODUCT", 2).collect().length == 2)
  }
}
