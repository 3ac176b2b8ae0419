package graft.streaming

import graft.operators.{Ivm, TableStore}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable, crash-safe streaming JOIN-view maintenance (st15's loop,
  * extracted so a spec can crash it mid-tick and prove resume).
  *
  * All three states — the join view and BOTH base tables — live as
  * [[TableStore]] FOLD tables (log-structured versions on the same
  * publish substrate): each tick publishes only the SIGNED DELTA of
  * each state — O(batch) written per tick, the property that makes
  * versioned maintenance viable when the view is 100 TB (rewriting
  * the full state per micro-batch, the copy-on-write alternative, is
  * O(state) write amplification). Every [[CompactEvery]] ticks a full
  * snapshot checkpoint resets the fold chain and lets retention drop
  * history — exactly Delta Lake's log + checkpoint design.
  *
  * Each tick's publishes carry the commit note `tick=<batchId>`,
  * which makes the tick a write-ahead-log transaction WITHOUT any
  * extra coordination machinery:
  *
  *   - REDELIVERY (crash after the tick, before the stream checkpoint
  *     committed): every table already holds a `tick=B` version — the
  *     whole tick is skipped. Idempotent. (A redelivered compaction
  *     republish is harmless: the logical state is unchanged.)
  *   - MID-TICK CRASH (between the three publishes): publish order is
  *     view → base A → base B, so a missing table's delta recomputes
  *     from the SAME re-read batch slice — and the view delta, which
  *     needs the bases at B-1, runs only when the view lacks tick B,
  *     in which case the bases (published after it) necessarily still
  *     sit at B-1. Deterministic roll-forward.
  *
  * The commit point of each single publish is TableStore's atomic
  * create-exclusive marker, so a version either exists with its full
  * data or is an unreadable orphan — there is no torn intermediate a
  * reader (or the roll-forward) can observe.
  *
  * Per-tick cost: the delta-broadcast probes of [[Ivm.joinViewDelta]]
  * against the folded bases + three O(batch) delta writes; chain
  * length (read-side fold cost) is bounded by [[CompactEvery]].
  */
object JoinViewMaintenance {

  /** The initial (pre-stream) state is tick -1. */
  val InitTick: Long = -1L

  /** Full-snapshot checkpoint cadence (in ticks). */
  val CompactEvery: Int = 2

  private def note(b: Long) = s"tick=$b"

  /** The committed version tagged `tick=<b>` at `path` (as a full
    * snapshot or a fold delta), if any. Exact-match on the note, so
    * compaction checkpoints (`checkpoint;after=N`) never collide.
    */
  def tickVersion(spark: SparkSession, path: String, b: Long): Option[Long] =
    TableStore.committedVersions(spark, path).find { v =>
      TableStore.versionNote(spark, path, v).exists(n =>
        n == note(b) || n == TableStore.FoldDeltaPrefix + note(b))
    }

  /** Publish the v0 states: both bases and their join view, tagged
    * tick=-1, as full fold-table snapshots (`_mult`-annotated).
    */
  def init(spark: SparkSession, viewPath: String, aPath: String,
      bPath: String, a: DataFrame, b: DataFrame, keys: Seq[String]): Unit = {
    TableStore.publishVersion(spark, aPath,
      a.withColumn("_mult", lit(1L)), note(InitTick))
    TableStore.publishVersion(spark, bPath,
      b.withColumn("_mult", lit(1L)), note(InitTick))
    TableStore.publishVersion(spark, viewPath,
      Ivm.joinView(a, b, keys), note(InitTick)): Unit
  }

  /** A changelog slice as the signed fold-delta rows its base table
    * stores. This must be a signed fold, not a keyed delete+insert:
    * the stage split can deliver an update's postimage in an EARLIER
    * tick than its preimage, and a by-key anti-join would then
    * wrongly delete both rows when the preimage arrives. The signed
    * fold is linear — base_t == base_0 ⊎ Σ deltas under any split —
    * exactly the invariant the delta rule needs, and exactly what
    * [[TableStore.readFolded]] computes.
    */
  def baseDelta(delta: DataFrame): DataFrame = delta
    .withColumn("_mult",
      when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
        .otherwise(lit(-1L)))
    .drop("_change_type")

  /** Apply micro-batch `batchId` (deltas `dA`/`dB` in changesBetween
    * shape) to all three stored states — idempotent and roll-forward-
    * safe per the class doc. `afterPublish(path)` is a test seam: the
    * crash spec throws from it to kill the loop between publishes.
    */
  def applyTick(spark: SparkSession, viewPath: String, aPath: String,
      bPath: String, dA: DataFrame, dB: DataFrame, keys: Seq[String],
      batchId: Long, afterPublish: String => Unit = _ => ()): Unit = {
    if (tickVersion(spark, viewPath, batchId).isEmpty) {
      // bases still sit at tick B-1 here (they publish after the view)
      val aPrev = TableStore.readFolded(spark, aPath).drop("_mult")
      val bPrev = TableStore.readFolded(spark, bPath).drop("_mult")
      val viewCols = (aPrev.columns ++ bPrev.columns).distinct.toSeq
      val dView = Ivm.joinViewDelta(aPrev, bPrev, dA, dB, keys, viewCols)
        .withColumnRenamed("_dmult", "_mult")
      TableStore.publishFoldDelta(spark, viewPath, dView, note(batchId)): Unit
    }
    afterPublish(viewPath)
    if (tickVersion(spark, aPath, batchId).isEmpty) {
      TableStore.publishFoldDelta(spark, aPath, baseDelta(dA), note(batchId)): Unit
    }
    afterPublish(aPath)
    if (tickVersion(spark, bPath, batchId).isEmpty) {
      TableStore.publishFoldDelta(spark, bPath, baseDelta(dB), note(batchId)): Unit
    }
    afterPublish(bPath)
    // checkpoint cadence: only AFTER the tick fully committed, so a
    // roll-forward never loses a version it can still reference; the
    // anchor then bounds both the fold chain and retained history
    if ((batchId + 1) % CompactEvery == 0) {
      Seq(viewPath, aPath, bPath).foreach { p =>
        TableStore.compactFold(spark, p, s"checkpoint;after=$batchId")
        TableStore.currentVersion(spark, p).foreach { cur =>
          TableStore.dropVersionsBelow(spark, p,
            TableStore.foldAnchor(spark, p, cur))
        }
      }
    }
  }

  /** The maintained view at the latest committed tick. */
  def currentView(spark: SparkSession, viewPath: String): DataFrame =
    TableStore.readFolded(spark, viewPath)
}
