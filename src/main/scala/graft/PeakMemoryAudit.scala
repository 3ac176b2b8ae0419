package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerTaskEnd}

/** Memory-headroom probe for the scale audits: the wall-clock gates
  * prove a query's TIME curve, but a query can be time-linear and
  * still die one decade later because a single task's execution
  * memory (hash map, sort buffer, collected list) grows with the
  * data. This listener turns that into a measured, gateable number
  * per audited query:
  *
  *   - `peakTaskMb`   — max over tasks of Spark's per-task
  *     peakExecutionMemory (the unified-memory charge of its joins /
  *     aggs / sorts). The scale contract of a well-partitioned
  *     operator is that this stays bounded by the PARTITION size,
  *     not the data size.
  *   - `spillMb`      — total disk spill: nonzero means the memory
  *     manager already ran out of headroom and the query survived by
  *     spilling (time keeps scaling, but the cliff is near).
  *   - `driverHeapMb` — JVM heap in use after the run (post-GC hint).
  *     On local[32] driver and executors share the heap, so this is
  *     the whole-engine resident set; what must stay bounded at scale
  *     are the driver-side artifacts (collected manifests, centroid
  *     tables, broadcast builds).
  *
  * The gate (`headroomFlag`): worst-case concurrent execution memory
  * = peakTaskMb × slots must stay under 80% of the unified execution
  * pool (0.6 × (heap − 300 MB) with the default memory fractions). A
  * flagged query is the one to fix BEFORE the next decade finds it —
  * the within-20%-of-heap early warning the audits' wall ratios
  * cannot see.
  */
class PeakMemoryAudit extends SparkListener {
  private val peakTask = new AtomicLong(0L)
  private val spilled = new AtomicLong(0L)

  /** Per-stage attribution: a flagged peak is only actionable when the
    * gate can NAME the stage that allocated it (i4's 544 MB task was
    * invisible in every wall ratio and, without this map, anonymous).
    * Keyed by stageId; name carries the stage's callsite string.
    */
  final case class StagePeak(stageId: Int, name: String, nTasks: Int,
      maxTaskPeakMb: Double)
  private val stageNames =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()
  private val stagePeaks =
    new java.util.concurrent.ConcurrentHashMap[Int, (Int, Long)]()

  override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
    stageNames.put(s.stageInfo.stageId,
      Option(s.stageInfo.name).getOrElse("?")); ()
  }

  override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
    val m = t.taskMetrics
    if (m != null) {
      peakTask.getAndUpdate(p => math.max(p, m.peakExecutionMemory))
      spilled.addAndGet(m.diskBytesSpilled)
      stagePeaks.merge(t.stageId, (1, m.peakExecutionMemory),
        (a, b) => (a._1 + b._1, math.max(a._2, b._2))); ()
    }
  }

  def reset(): Unit = {
    peakTask.set(0); spilled.set(0)
    stageNames.clear(); stagePeaks.clear()
  }

  /** The `n` stages with the largest max-task execution-memory peaks
    * since the last reset, heaviest first — the attribution a flagged
    * `headroomFlag` hands to whoever has to fix it.
    */
  def topStages(n: Int): Seq[StagePeak] = {
    import scala.jdk.CollectionConverters._
    stagePeaks.asScala.toSeq
      .map { case (sid, (tasks, peak)) =>
        StagePeak(sid, stageNames.getOrDefault(sid, "?"), tasks,
          peak / 1048576.0)
      }
      .sortBy(-_.maxTaskPeakMb).take(n)
  }

  def peakTaskMb: Double = peakTask.get / 1048576.0
  def spillMb: Double = spilled.get / 1048576.0

  def driverHeapMb: Double = {
    System.gc() // audit-only path; stabilizes the in-use reading
    val rt = Runtime.getRuntime
    (rt.totalMemory - rt.freeMemory) / 1048576.0
  }

  /** 80%-of-execution-pool ceiling for `slots` concurrent tasks at
    * the observed per-task peak. */
  def headroomFlag(slots: Int): Boolean = {
    val heapMb = Runtime.getRuntime.maxMemory / 1048576.0
    val poolMb = 0.6 * (heapMb - 300.0)
    peakTaskMb * slots > 0.8 * poolMb
  }
}
