package graft.operators

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {

  private def components(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.minLabel(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chains collapse to the min id (multi-round propagation)") {
    // a 6-node path given in descending orientation — min label needs
    // several rounds to travel the diameter
    val path = Seq((6L, 5L), (5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L))
    assert(components(path) == (1L to 6L).map(_ -> 1L).toMap)
  }

  test("disjoint clusters keep separate labels") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L))
    val got = components(edges)
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("empty edge set returns empty components (not an NPE)") {
    assert(components(Seq.empty) == Map.empty)
  }

  test("exceeding maxIter falls back to star contraction, labels stay exact") {
    import spark.implicits._
    val path = (1L until 8L).map(i => (i + 1, i))
    val got = ConnectedComponents.minLabel(path.toDF("a", "b"), maxIter = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 8L).map(_ -> 1L).toMap)
  }

  test("path graph with diameter > default maxIter converges (large-star fallback)") {
    import spark.implicits._
    // 121-node path, diameter 120 > 50 — propagation alone cannot
    // finish; the star-contraction fallback must produce the fixpoint
    val path = (1L until 121L).map(i => (i + 1, i))
    val got = ConnectedComponents.minLabel(path.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (1L to 121L).map(_ -> 1L).toMap)
  }

  test("star contraction alone matches propagation on mixed shapes") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L),
      (21L, 22L), (22L, 20L), (30L, 30L))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.toDF("node")
    val got = ConnectedComponents
      .starContract(edges.toDF("p", "q"), nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L,
      11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L, 30L -> 30L))
  }

  test("freeCheckpoint releases a localCheckpoint's blocks deterministically") {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    val df = Seq(1L, 2L, 3L).toDF("n").localCheckpoint()
    val rdd = df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      case other => fail(s"localCheckpoint did not plan a LogicalRDD leaf: $other")
    }
    // the checkpoint pins materialized blocks...
    assert(rdd.getStorageLevel != StorageLevel.NONE)
    ConnectedComponents.freeCheckpoint(df)
    // ...and freeCheckpoint releases them without waiting for GC
    assert(rdd.getStorageLevel == StorageLevel.NONE)
  }

  test("star and cycle shapes converge") {
    val star = Seq((5L, 1L), (5L, 2L), (5L, 3L), (5L, 4L))
    assert(components(star).values.toSet == Set(1L))
    val cycle = Seq((7L, 8L), (8L, 9L), (9L, 7L))
    assert(components(cycle) == Map(7L -> 7L, 8L -> 7L, 9L -> 7L))
  }
}
