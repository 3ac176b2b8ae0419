package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The production (plain sum/count) and gate-parity (sorted-fold) mean
  * updates must drive Lloyd's loop to the SAME assignment — assignment
  * equality, not bit-equal means: the low-order float bits the sorted
  * fold pins are exactly what k-means does not need.
  */
class KMeansSpec extends SparkSpec {

  /** 120 deterministic 8-d vectors in 4 well-separated blobs: blob b
    * centers at 10·b per dim, ±≈1 pseudo-random jitter from an affine
    * integer generator (no RNG — repeatable across runs/engines).
    */
  private def vectors: DataFrame = {
    import spark.implicits._
    (0L until 120L).map { id =>
      val blob = id % 4
      val v = (0 until 8).map { d =>
        val j = ((1103515245L * (id * 8 + d) + 12345L) % 2001L) - 1000L
        10.0 * blob + j.toDouble / 1000.0
      }
      (id, v)
    }.toDF("vec_id", "v")
  }

  private def assignments(gateParity: Boolean, rounds: Int): Map[Long, Long] = {
    val e = vectors
    val cents = KMeans.train(e, 4, rounds, dims = 8, gateParity)
    KMeans.assign(e, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("production and gate-parity means converge to the same assignment") {
    // 3 rounds: enough for the means to move well off the init points
    val prod = assignments(gateParity = false, rounds = 3)
    val gate = assignments(gateParity = true, rounds = 3)
    assert(prod == gate)
    // and the clustering is the true blob structure (ids mod 4)
    val byBlob = prod.groupBy { case (id, _) => id % 4 }.values
    assert(byBlob.forall(m => m.values.toSet.size == 1),
      "each blob maps to exactly one cluster")
    assert(prod.values.toSet.size == 4, "all four clusters survive")
  }

  test("assign ties break to the smaller cid") {
    import spark.implicits._
    val e = Seq((7L, Seq(0.0, 0.0))).toDF("vec_id", "v")
    // two centroids equidistant from the point
    val cents = Seq((5L, Seq(1.0, 0.0)), (2L, Seq(-1.0, 0.0)))
      .toDF("cid", "cv")
    val got = KMeans.assign(e, cents).collect()
    assert(got.length == 1 && got(0).getLong(1) == 2L)
  }

  test("empty clusters drop out identically on both paths") {
    import spark.implicits._
    // k=3 over 2 distinct points + a duplicate: farthest-point init
    // exhausts the distinct points after 2 picks, so the 3rd seed is
    // the duplicate (every remaining min-distance is 0, min-id tie-
    // break) — its twin with the smaller cid wins every assignment
    // tie and the duplicate centroid empties out in the first mean
    // update, on either path
    val e = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.0, 0.0)), (2L, Seq(5.0, 0.0)))
      .toDF("vec_id", "v")
    val prod = KMeans.train(e, 3, 2, dims = 2, gateParity = false)
    val gate = KMeans.train(e, 3, 2, dims = 2, gateParity = true)
    val prodA = KMeans.assign(e, prod).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gateA = KMeans.assign(e, gate).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(prodA == gateA)
    assert(prod.count() == gate.count())
  }

  test("initSchedule doubles the chosen set each pass up to k") {
    (1 to 20).foreach { k =>
      val sched = KMeans.initSchedule(k)
      assert(sched.sum == k - 1, s"k=$k: schedule must add k-1 points")
      assert(sched.forall(_ >= 1))
      // chosen-set size doubles (capped at k): pass j adds min(s, k-s)
      var s = 1
      sched.foreach { m => assert(m == math.min(s, k - s)); s += m }
      assert(s == k)
      assert(sched.length <= 1 + (math.log(k.max(1)) / math.log(2)).ceil.toInt)
    }
  }

  test("trainMulti groups are independent: grouped == per-group training") {
    import spark.implicits._
    // two groups with DIFFERENT geometry; training them together must
    // not leak points, seeds, or means across the group boundary
    val g0 = vectors.withColumn("grp", lit(0))
    val g1 = vectors
      .select(col("vec_id"), expr("transform(v, x_ -> -3.0 * x_ + 7.0)").as("v"))
      .withColumn("grp", lit(1))
    val both = KMeans.trainMulti(g0.unionByName(g1), 4, 2, dims = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    val solo0 = KMeans.train(vectors, 4, 2, dims = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val solo1 = KMeans.train(g1.drop("grp"), 4, 2, dims = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(both.keySet == (solo0.keySet.map((0, _)) ++ solo1.keySet.map((1, _))))
    def close(a: Seq[Double], b: Seq[Double]): Boolean =
      a.size == b.size && a.zip(b).forall { case (x, y) =>
        math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(y)) }
    solo0.foreach { case (cid, cv) => assert(close(both((0, cid)), cv)) }
    solo1.foreach { case (cid, cv) => assert(close(both((1, cid)), cv)) }
  }

  test("trainLocal is bit-identical to the gate-parity distributed trainer") {
    // the local (index-build) trainer must reproduce the distributed
    // sorted-fold trainer EXACTLY — same seeds, same assignments, same
    // mean bits — because the DuckDB oracle recomputes that chain and
    // the ANN-tier catalog queries gate on centroids trained locally
    val e = vectors
    val local = KMeans.trainLocal(e, 4, 3).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val dist = KMeans.train(e, 4, 3, dims = 8, gateParity = true).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(local == dist)
    // ... including the degenerate duplicate-point / empty-cluster case
    import spark.implicits._
    val dup = Seq(
      (0L, Seq(0.0, 0.0)), (1L, Seq(0.0, 0.0)), (2L, Seq(5.0, 0.0)))
      .toDF("vec_id", "v")
    val localDup = KMeans.trainLocal(dup, 3, 2).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val distDup = KMeans.train(dup, 3, 2, dims = 2, gateParity = true).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(localDup == distDup)
    // grouped local == per-group local (independence, local form)
    val g01 = vectors.withColumn("grp", lit(0))
      .unionByName(vectors.withColumn("grp", lit(1)))
    val multi = KMeans.trainLocalMulti(g01, 4, 3).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getSeq[Double](2)).toMap
    assert(multi == local.map { case (c, v) => (0, c) -> v } ++
      local.map { case (c, v) => (1, c) -> v })
  }

  test("trainLocal == distributed gate trainer on randomized low-dim fixtures") {
    // integer-grid coordinates (affine generator, no RNG) force exact
    // distance TIES and duplicate points — the cases where an ordering
    // slip between the two trainers would first show
    import spark.implicits._
    (1 to 3).foreach { seed =>
      val e = (0L until 40L).map { id =>
        val v = (0 until 3).map { d =>
          ((1103515245L * (seed * 1000 + id * 3 + d) + 12345L) % 5L).toDouble
        }
        (id, v)
      }.toDF("vec_id", "v")
      val k = 2 + seed // 3, 4, 5
      val local = KMeans.trainLocal(e, k, 2).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val dist = KMeans.train(e, k, 2, dims = 3, gateParity = true).collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      assert(local == dist, s"seed=$seed k=$k")
    }
  }

  test("gate-parity means equal production means up to float tolerance") {
    val e = vectors
    val a = KMeans.assign(e, KMeans.init(e, 4))
    val prod = KMeans.meanUpdate(e, a, dims = 8).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val gate = KMeans.meanUpdateSorted(e, a).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(prod.keySet == gate.keySet)
    prod.foreach { case (cid, pv) =>
      val gv = gate(cid)
      assert(pv.size == gv.size)
      pv.zip(gv).foreach { case (p, g) =>
        assert(math.abs(p - g) <= 1e-9 * math.max(1.0, math.abs(g)),
          s"cid=$cid mean diverged: $p vs $g")
      }
    }
  }
}
