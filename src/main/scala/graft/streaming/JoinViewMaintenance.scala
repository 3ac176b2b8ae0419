package graft.streaming

import graft.operators.{Ivm, TableStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable, crash-safe streaming JOIN-view maintenance (st15's loop,
  * extracted so a spec can crash it mid-tick and prove resume).
  *
  * All three states — the join view and BOTH base tables — live as
  * [[TableStore]] versioned tables, advanced once per micro-batch
  * through the same publish path production ingestion uses. Each
  * tick's publishes carry the commit note `tick=<batchId>`, which
  * makes the tick a write-ahead-log transaction WITHOUT any extra
  * coordination machinery:
  *
  *   - REDELIVERY (crash after the tick, before the stream checkpoint
  *     committed): every table already holds a `tick=B` version — the
  *     whole tick is skipped. Idempotent.
  *   - MID-TICK CRASH (between the three publishes): some tables hold
  *     `tick=B`, the rest don't. On redelivery the have-ones are kept
  *     and the missing ones are recomputed from their own `tick=B-1`
  *     versions + the SAME batch slice (staged files re-read
  *     identically) — a deterministic roll-forward to the exact state
  *     the uninterrupted tick would have produced.
  *
  * The commit point of each single publish is TableStore's atomic
  * create-exclusive marker, so a version either exists with its full
  * data or is an unreadable orphan — there is no torn intermediate a
  * reader (or the roll-forward) can observe.
  *
  * Scale: each tick costs the delta-broadcast probes of
  * [[Ivm.applyJoinDelta]] plus three bounded table publishes;
  * retention drops versions older than the previous tick (the
  * roll-forward horizon), so history depth never accumulates.
  */
object JoinViewMaintenance {

  /** The initial (pre-stream) state is tick -1. */
  val InitTick: Long = -1L

  private def note(b: Long) = s"tick=$b"

  /** The committed version tagged `tick=<b>` at `path`, if any. */
  def tickVersion(spark: SparkSession, path: String, b: Long): Option[Long] =
    TableStore.committedVersions(spark, path)
      .find(v => TableStore.versionNote(spark, path, v).contains(note(b)))

  private def stateAt(spark: SparkSession, path: String, b: Long): DataFrame =
    TableStore.readVersion(spark, path, Some(tickVersion(spark, path, b)
      .getOrElse(sys.error(s"JoinViewMaintenance: no tick=$b state at $path"))))

  /** Publish the v0 states: both bases and their join view, tagged
    * tick=-1.
    */
  def init(spark: SparkSession, viewPath: String, aPath: String,
      bPath: String, a: DataFrame, b: DataFrame, keys: Seq[String]): Unit = {
    TableStore.publishVersion(spark, aPath, a, note(InitTick))
    TableStore.publishVersion(spark, bPath, b, note(InitTick))
    TableStore.publishVersion(spark, viewPath,
      Ivm.joinView(a, b, keys), note(InitTick)): Unit
  }

  /** Signed whole-row base advance. This must be a signed fold, not a
    * keyed delete+insert: the stage split can deliver an update's
    * postimage in an EARLIER tick than its preimage, and a by-key
    * anti-join would then wrongly delete both rows when the preimage
    * arrives. The signed fold is linear — base_t == base_0 ⊎ Σ deltas
    * under ANY split — exactly the invariant the delta rule needs.
    */
  def advance(old: DataFrame, delta: DataFrame): DataFrame = {
    val signed = delta.withColumn("_s",
      when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
        .otherwise(lit(-1L)))
      .drop("_change_type")
    val cols = signed.columns.filterNot(_ == "_s").toSeq
    old.withColumn("_s", lit(1L)).unionByName(signed)
      .groupBy(cols.map(col): _*).agg(sum(col("_s")).as("_s"))
      .filter(col("_s") > 0).drop("_s")
  }

  /** Apply micro-batch `batchId` (deltas `dA`/`dB` in changesBetween
    * shape) to all three stored states — idempotent and roll-forward-
    * safe per the class doc. `afterPublish(path)` is a test seam: the
    * crash spec throws from it to kill the loop between publishes.
    */
  def applyTick(spark: SparkSession, viewPath: String, aPath: String,
      bPath: String, dA: DataFrame, dB: DataFrame, keys: Seq[String],
      batchId: Long, afterPublish: String => Unit = _ => ()): Unit = {
    val prev = if (batchId == 0L) InitTick else batchId - 1
    if (tickVersion(spark, viewPath, batchId).isEmpty) {
      val newView = Ivm.applyJoinDelta(stateAt(spark, viewPath, prev),
        stateAt(spark, aPath, prev), stateAt(spark, bPath, prev),
        dA, dB, keys)
      TableStore.publishVersion(spark, viewPath, newView, note(batchId)): Unit
    }
    afterPublish(viewPath)
    if (tickVersion(spark, aPath, batchId).isEmpty) {
      TableStore.publishVersion(spark, aPath,
        advance(stateAt(spark, aPath, prev), dA), note(batchId)): Unit
    }
    afterPublish(aPath)
    if (tickVersion(spark, bPath, batchId).isEmpty) {
      TableStore.publishVersion(spark, bPath,
        advance(stateAt(spark, bPath, prev), dB), note(batchId)): Unit
    }
    afterPublish(bPath)
    // retention: tick B-1 is the roll-forward horizon — an in-flight
    // redelivery of B can still need it; everything older cannot be
    // referenced again
    Seq(viewPath, aPath, bPath).foreach { p =>
      tickVersion(spark, p, prev).foreach(v =>
        TableStore.dropVersionsBelow(spark, p, v))
    }
  }

  /** The maintained view at the latest committed tick. */
  def currentView(spark: SparkSession, viewPath: String): DataFrame =
    TableStore.readVersion(spark, viewPath)
}
