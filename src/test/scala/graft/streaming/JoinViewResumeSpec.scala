package graft.streaming

import java.nio.file.Files
import graft.{SparkSpec, TestSpark}
import graft.operators.{Ivm, TableStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crash the st15 maintenance loop BETWEEN its per-tick publishes (view
  * advanced, bases not) and prove the durable-checkpoint restart rolls
  * the tick forward to exactly the recomputed join — the WAL semantics
  * JoinViewMaintenance's commit notes implement.
  */
class JoinViewResumeSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def viewSet(df: DataFrame): Set[(Long, String, Long, Long)] =
    df.select(col("k"), col("va"), col("vb"), col("_mult"))
      .as[(Long, String, Long, Long)].collect().toSet

  test("mid-tick crash + resume == recompute (roll-forward), redelivery is skipped") {
    val spark = TestSpark.spark
    val tmp = Files.createTempDirectory("graft_jvm_resume")
    val viewPath = tmp.resolve("view").toString
    val aPath = tmp.resolve("base_a").toString
    val bPath = tmp.resolve("base_b").toString
    val stage = tmp.resolve("stage").toString
    val ckpt = tmp.resolve("ckpt").toString

    val a0 = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "va")
    val b0 = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "vb")
    // deletes, in-place updates and inserts on BOTH sides
    val a1 = Seq((1L, "x"), (2L, "Y"), (4L, "w")).toDF("k", "va")
    val b1 = Seq((2L, 20L), (3L, 31L), (4L, 40L)).toDF("k", "vb")
    val dA = TableStore.diffKeyed(a0, a1, Seq("k"))
      .select(lit("a").as("_side"), col("k"), col("_change_type"),
        col("va"), lit(null).cast("long").as("vb"))
    val dB = TableStore.diffKeyed(b0, b1, Seq("k"))
      .select(lit("b").as("_side"), col("k"), col("_change_type"),
        lit(null).cast("string").as("va"), col("vb"))
    val combined = dA.unionByName(dB)
    combined.repartition(3).write.parquet(stage)

    JoinViewMaintenance.init(spark, viewPath, aPath, bPath, a0, b0, Seq("k"))

    def run(crashAt: Option[(Long, String)]): Unit =
      EventStream.runForeachBatch(spark,
        EventStream.restageFileStream(spark, combined.schema, stage),
        Some(ckpt)) { (batch, bid) =>
        val slice = batch.cache()
        try {
          val sa = slice.filter(col("_side") === "a")
            .select("k", "_change_type", "va")
          val sb = slice.filter(col("_side") === "b")
            .select("k", "_change_type", "vb")
          JoinViewMaintenance.applyTick(spark, viewPath, aPath, bPath,
            sa, sb, Seq("k"), bid,
            afterPublish = p => crashAt.foreach { case (cb, cp) =>
              if (bid == cb && p == cp) sys.error(s"injected crash at tick $cb")
            })
        } finally { slice.unpersist(); () }
      }

    // run 1: crash AFTER the view's tick-1 publish, BEFORE the bases'
    val ex = intercept[Throwable] { run(Some((1L, viewPath))) }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(ex).contains("injected crash"), messages(ex))
    // the crash really is mid-tick: view advanced to tick 1, bases not
    assert(JoinViewMaintenance.tickVersion(spark, viewPath, 1L).isDefined)
    assert(JoinViewMaintenance.tickVersion(spark, aPath, 1L).isEmpty)
    assert(JoinViewMaintenance.tickVersion(spark, bPath, 1L).isEmpty)

    // run 2: same checkpoint — redelivers tick 1 (roll-forward: view
    // kept, bases recomputed), then plays the rest
    run(None)
    val got = viewSet(JoinViewMaintenance.currentView(spark, viewPath))
    val want = viewSet(Ivm.joinView(a1, b1, Seq("k")))
    assert(got == want, s"got=$got want=$want")
  }
}
