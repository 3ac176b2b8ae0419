package graft.operators

import java.nio.file.Files
import graft.{SparkSpec, TestSpark}

/** Write-discipline semantics on tiny tables (SURVEY §2.1 S5-S12). */
class TableStoreSpec extends SparkSpec {

  private def scratch(): String =
    Files.createTempDirectory("graft_store_spec").toString + "/t"

  private def kv(rows: (Long, String)*) = {
    import TestSpark.spark.implicits._
    rows.toDF("k", "v")
  }

  private def readSorted(path: String): Seq[(Long, String)] =
    TableStore.read(spark, path).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("insertIfAbsent keeps existing keys, adds new ones") {
    val p = scratch()
    TableStore.overwrite(kv(1L -> "a", 2L -> "b"), p)
    TableStore.insertIfAbsent(spark, p, kv(2L -> "NEW", 3L -> "c"), Seq("k"))
    assert(readSorted(p) == Seq(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("upsertByKey lets the source win") {
    val p = scratch()
    TableStore.overwrite(kv(1L -> "a", 2L -> "b"), p)
    TableStore.upsertByKey(spark, p, kv(2L -> "NEW", 3L -> "c"), Seq("k"))
    assert(readSorted(p) == Seq(1L -> "a", 2L -> "NEW", 3L -> "c"))
  }

  test("deleteInsert drops all rows of rewritten keys") {
    val p = scratch()
    TableStore.overwrite(kv(1L -> "a", 1L -> "a2", 2L -> "b"), p)
    TableStore.deleteInsert(spark, p, kv(1L -> "only"), Seq("k"))
    assert(readSorted(p) == Seq(1L -> "only", 2L -> "b"))
  }

  test("maxWatermark on absent table is None") {
    assert(TableStore.maxWatermark(spark, scratch(), "ts").isEmpty)
  }

  test("upsertByKey and insertIfAbsent are idempotent") {
    val p = scratch()
    TableStore.overwrite(kv(1L -> "a"), p)
    val batch = kv(1L -> "NEW", 2L -> "b")
    TableStore.upsertByKey(spark, p, batch, Seq("k"))
    val once = readSorted(p)
    TableStore.upsertByKey(spark, p, batch, Seq("k"))
    assert(readSorted(p) == once)

    val q = scratch()
    TableStore.overwrite(kv(1L -> "a"), q)
    TableStore.insertIfAbsent(spark, q, batch, Seq("k"))
    val onceQ = readSorted(q)
    TableStore.insertIfAbsent(spark, q, batch, Seq("k"))
    assert(readSorted(q) == onceQ)
  }

  test("compact merges accreted small files, preserving rows") {
    import TestSpark.spark.implicits._
    val p = scratch()
    // ten appends -> many small files
    (1 to 10).foreach { i =>
      TableStore.append(Seq((i.toLong, s"v$i")).toDF("k", "v"), p)
    }
    def fileCount = new java.io.File(p).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(fileCount >= 10)
    TableStore.compact(spark, p, targetFileRows = 100, sortCols = Seq("k"))
    assert(fileCount == 1)
    assert(readSorted(p) == (1 to 10).map(i => i.toLong -> s"v$i"))
  }

  test("deleteInsert on an absent table bootstraps it") {
    val p = scratch()
    TableStore.deleteInsert(spark, p, kv(7L -> "x"), Seq("k"))
    assert(readSorted(p) == Seq(7L -> "x"))
  }
}
