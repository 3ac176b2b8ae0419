package graft.operators

import graft.SparkSpec

/** Property checks for [[ConnectedComponents.incrementalMinLabel]]:
  * maintaining a converged component table through a batch of new
  * edges must land on exactly the fixpoint a full recompute over the
  * merged edge set reaches — over random graphs and random
  * base/delta splits, including merges of many base components,
  * brand-new nodes, and deltas that change nothing.
  */
class IncrementalComponentsSpec extends SparkSpec {

  private def full(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    if (edges.isEmpty) Map.empty
    else ConnectedComponents.minLabel(edges.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def incremental(base: Seq[(Long, Long)],
      delta: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val baseLabels =
      if (base.isEmpty)
        Seq.empty[(Long, Long)].toDF("node", "component")
      else ConnectedComponents.minLabel(base.toDF("a", "b"))
    ConnectedComponents.incrementalMinLabel(baseLabels, delta.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("delta merging two base components relabels both to the global min") {
    val base = Seq((1L, 2L), (10L, 11L), (20L, 21L))
    val delta = Seq((2L, 10L))
    assert(incremental(base, delta) == full(base ++ delta))
  }

  test("delta inside one base component is a no-op") {
    val base = Seq((1L, 2L), (2L, 3L))
    val delta = Seq((1L, 3L))
    assert(incremental(base, delta) == full(base ++ delta))
  }

  test("brand-new nodes chain through an old component") {
    // new nodes 100~101, 101 touches old 2; and a fully new pair 200~201
    val base = Seq((1L, 2L), (10L, 11L))
    val delta = Seq((100L, 101L), (101L, 2L), (200L, 201L))
    assert(incremental(base, delta) == full(base ++ delta))
  }

  test("a new node with a SMALLER id than the old component's min wins the label") {
    val base = Seq((5L, 6L), (6L, 7L))
    val delta = Seq((1L, 7L))
    val got = incremental(base, delta)
    assert(got == full(base ++ delta))
    assert(got.values.toSet == Set(1L))
  }

  test("empty base: the delta solve stands alone") {
    val delta = Seq((3L, 4L), (4L, 5L))
    assert(incremental(Seq.empty, delta) == full(delta))
  }

  test("empty delta: base labels pass through unchanged") {
    val base = Seq((1L, 2L), (10L, 11L))
    assert(incremental(base, Seq.empty) == full(base))
  }

  test("random graphs with random base/delta splits match the full recompute") {
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 0 until 8) {
      val n = 12 + rnd.nextInt(10)
      val m = 10 + rnd.nextInt(15)
      val edges = Seq.fill(m) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        if (a == b) (a, b + 1) else (a, b)
      }.distinct
      val (base, delta) = edges.partition(_ => rnd.nextBoolean())
      assert(incremental(base, delta) == full(base ++ delta),
        s"trial $trial diverged: base=$base delta=$delta")
    }
  }

  test("repeated ticks over a random edge stream land on the full fixpoint (st16's composition)") {
    import spark.implicits._
    val rnd = new scala.util.Random(816L)
    for (trial <- 0 until 4) {
      val n = 14 + rnd.nextInt(8)
      val edges = Seq.fill(18 + rnd.nextInt(10)) {
        val a = rnd.nextInt(n).toLong
        val b = rnd.nextInt(n).toLong
        if (a == b) (a, b + 1) else (a, b)
      }.distinct
      val nBatches = 2 + rnd.nextInt(3)
      val batches = edges.groupBy(_ => rnd.nextInt(nBatches)).values.toSeq
      var labels = Seq.empty[(Long, Long)].toDF("node", "component")
      for (b <- batches)
        labels = ConnectedComponents.incrementalMinLabel(labels, b.toDF("a", "b"))
          .localCheckpoint()
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == full(edges), s"trial $trial diverged over $nBatches ticks")
    }
  }

  test("delta chaining many base components in one tick (transitive merges)") {
    // four separate base components joined into one by a delta chain
    val base = Seq((1L, 2L), (10L, 11L), (20L, 21L), (30L, 31L))
    val delta = Seq((2L, 10L), (11L, 20L), (21L, 30L))
    val got = incremental(base, delta)
    assert(got == full(base ++ delta))
    assert(got.values.toSet == Set(1L))
  }
}
