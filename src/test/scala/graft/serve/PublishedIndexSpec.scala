package graft.serve

import graft.SparkSpec
import graft.operators.TableStore
import graft.queries.Similarity

/** k20's serving contract: the published IVF index is built ONCE per
  * dataset, and the query path is read-only against it — no training,
  * no re-publish, no embeddings re-scan.
  */
class PublishedIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def k20 = graft.SparkEntry.queries("k20_published_index")

  test("second invocation publishes nothing and reads only the index tables") {
    val first = k20(spark, dir).collect()
    val root = Similarity.publishedIvfIndex(spark, dir)
    val centVs = TableStore.committedVersions(spark, s"$root/centroids")
    val listVs = TableStore.committedVersions(spark, s"$root/lists")
    assert(centVs.nonEmpty && listVs.nonEmpty)

    val df2 = k20(spark, dir)
    val second = df2.collect()
    // read-only: no new versions appeared
    assert(TableStore.committedVersions(spark, s"$root/centroids") == centVs,
      "second query re-published centroids")
    assert(TableStore.committedVersions(spark, s"$root/lists") == listVs,
      "second query re-published lists")
    // deterministic: the read-path answer equals the build-path answer
    assert(second.toSeq == first.toSeq)

    // every file the plan scans lives under the index root — the
    // query never re-reads embeddings.parquet (vectors + norms come
    // from the published lists)
    val scanned = df2.inputFiles.toSeq
    assert(scanned.nonEmpty)
    val outside = scanned.filterNot(_.contains("graft_ivf_published"))
    assert(outside.isEmpty,
      s"read-only query path scanned non-index files: ${outside.take(3)}")
    // and no training shape appears in the executed plan (trainLocal
    // is a driver-side build step that must not run here)
    val plan = df2.queryExecution.executedPlan.toString()
    assert(!plan.contains("embeddings.parquet"))
  }

  test("k22 absorb tick: exactly one O(batch) fold delta, read path folds it in") {
    import org.apache.spark.sql.functions._
    // building the index runs the absorb tick once
    graft.SparkEntry.queries("k22_published_absorb")(spark, dir).collect()
    val root = Similarity.publishedIvfIndexIncremental(spark, dir)
    val lists = s"$root/lists"
    val versions = TableStore.committedVersions(spark, lists)
    val deltas = versions.filter(v => TableStore.isFoldDelta(spark, lists, v))
    assert(deltas.length == 1, s"expected 1 absorb delta, got $deltas")
    // the absorb wrote O(batch): exactly the batch's rows, never the base
    val batchSize = spark.read
      .parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 3 === 2).count()
    val deltaRows = TableStore.readVersion(spark, lists, Some(deltas.head)).count()
    assert(deltaRows == batchSize, s"delta $deltaRows rows != batch $batchSize")
    // the folded read serves base + batch
    val total = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(TableStore.readFolded(spark, lists).count() == total)
    // re-invocation publishes nothing (read-only query path)
    graft.SparkEntry.queries("k22_published_absorb")(spark, dir).collect()
    assert(TableStore.committedVersions(spark, lists) == versions)
  }

  test("per-query recall from the published index is sane (batch of 16)") {
    val rows = k20(spark, dir).collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val recall = r.getAs[Double]("recall_at_10")
      assert(recall >= 0.0 && recall <= 1.0)
      assert(r.getAs[Long]("n_truth") == 10L)
    }
    // 2-probe IVF over 4 lists must beat random guessing on average
    val mean = rows.map(_.getAs[Double]("recall_at_10")).sum / rows.length
    assert(mean >= 0.5, s"mean recall@10 $mean — index probably broken")
  }

  test("k24: PQ serving is read-only against the published compression artifacts") {
    val k24 = graft.SparkEntry.queries("k24_published_pq")
    val first = k24(spark, dir).collect()
    val root = Similarity.publishedPqIndex(spark, dir)
    val vs = Seq("codebooks", "codes", "vectors")
      .map(t => t -> TableStore.committedVersions(spark, s"$root/$t")).toMap
    vs.values.foreach(v => assert(v.nonEmpty))

    val df2 = k24(spark, dir)
    val second = df2.collect()
    // read-only: no table advanced, and the answer is deterministic
    vs.foreach { case (t, v) =>
      assert(TableStore.committedVersions(spark, s"$root/$t") == v,
        s"second query re-published $t")
    }
    assert(second.toSeq == first.toSeq)
    // every scanned file lives under the index root — the corpus is
    // never re-read and never re-encoded
    val outside = df2.inputFiles.toSeq
      .filterNot(_.contains("graft_pq_published"))
    assert(outside.isEmpty,
      s"PQ serving scanned non-index files: ${outside.take(3)}")
    assert(!df2.queryExecution.executedPlan.toString()
      .contains("embeddings.parquet"))
  }
}
