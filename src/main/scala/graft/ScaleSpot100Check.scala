package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The sf10 → sf100 decade (round 14): 1000× the bench SF — lineitem
  * ~600M rows, orders 150M, documents 5M, embeddings 2M, events 100M.
  * Every prior decade caught something real (the 10× audits caught
  * st17's uncompacted base chain and i4's pinned shuffle count; the
  * 100× spot caught g3's wedge explosion and d11's unbounded
  * training), so the audit keeps walking: this is the decade where a
  * vertex-sized broadcast, a driver-sized collect, or a hidden
  * n log n with a small constant actually shows.
  *
  * ISOLATION: at this volume a single query's shuffle + checkpoint
  * scratch is tens of GB, and scratch accumulates for the life of the
  * JVM (shuffle files free only when their RDDs are GC'd) — a
  * whole-audit session exceeds the sandbox disk before the second
  * query. So this main runs ONE measurement per JVM and
  * `tools/spot100.py` orchestrates: spawn → measure → exit →
  * reclaim /tmp → next. Each invocation warms ITS query at /tmp/sf1
  * first (session + codegen + plan staging), so the timed runs are
  * compute, not bring-up.
  *
  * Modes (all print one JSON line on stdout):
  *   --one <name> <smallDir> <largeDir>   min-of-2 walls both sides
  *       (i4: min-of-1, scratch reclaimed between runs), plan-flip
  *       ops counts, PeakMemoryAudit fields; g6 also reports its
  *       1-row estimate.
  *   --exact-tri <dir>                    g3's exact triangle count,
  *       run once (the DOULION truth — expensive, attempted in its
  *       own JVM so a disk failure costs nothing else).
  *   --doulion-twin <dir>                 an INDEPENDENT p=1/4 DOULION
  *       replicate (different universal-hash constants, same
  *       pipeline): when the exact count does not fit the sandbox,
  *       two independent unbiased estimators agreeing within their
  *       combined sampling error still bound the variance at this
  *       scale (the truth-based gate lives at sf1/sf10 in
  *       BENCH_SF10.json, where exact is cheap).
  *
  * Gates (evaluated by tools/spot100.py, written to BENCH_SF100.json):
  * per-query wall ratio ceilings (default 12× for 10× data; g6 32×
  * per its O((pm)^1.5) contract), 0 plan flips, memory headroom
  * (peak task × 32 slots ≤ 80% of the execution pool), DOULION
  * accuracy (vs exact if available, else twin agreement).
  */
object ScaleSpot100Check {

  private val MinOf = Map("i4_join_view_ivm" -> 1, "g3_triangle_count" -> 1)
    .withDefaultValue(2)

  private val Ops = Seq("CartesianProduct", "BroadcastNestedLoopJoin")
  private def counts(p: String): Map[String, Int] =
    Ops.map(op => op -> op.r.findAllIn(p).size).toMap

  /** i4's versioned scratch tables are ~30 GB at sf100; reclaim them
    * between runs instead of waiting for JVM-exit deleteOnExit. */
  private def cleanScratch(): Unit = {
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    Option(tmp.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("graft_i4"))
      .foreach { d =>
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(d)
      }
  }

  private def session(): SparkSession = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    spark
  }

  /** The distinct co-purchase edge set the triangle family shares
    * (same derivation as g3/g6's catalog bodies). */
  private def edges(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/lineitem.parquet")
      .filter(col("l_orderkey") % 4 === 1)
      .groupBy("l_orderkey").agg(collect_set(col("l_partkey")).as("ps"))
      .select(explode(col("ps")).as("u"), col("ps"))
      .select(col("u"), explode(col("ps")).as("v"))
      .filter(col("u") < col("v"))
      .distinct()

  def main(args: Array[String]): Unit = args.toList match {

    case "--one" :: name :: small :: large :: Nil =>
      val spark = session()
      val mem = new PeakMemoryAudit
      spark.sparkContext.addSparkListener(mem)
      // memory fields are captured PER REP (listener reset each rep)
      // and the reported fields come from the rep whose wall was kept
      // (the min) — under min-of-2 a shared accumulator would sum
      // spill across both reps and could report a peak from the rep
      // that was discarded
      final case class Rep(sec: Double, plan: Map[String, Int],
          peakMb: Double, spillMb: Double, flag: Boolean)
      def run(dir: String, reps: Int): Rep =
        (0 until reps).map { _ =>
          spark.catalog.clearCache()
          mem.reset()
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(name)(spark, dir)
          df.write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          if (name.startsWith("i4")) cleanScratch()
          Rep(dt, counts(df.queryExecution.executedPlan.toString()),
            mem.peakTaskMb, mem.spillMb, mem.headroomFlag(32))
        }.minBy(_.sec)
      run("/tmp/sf1", 1) // warm THIS query's plan/codegen on tiny data
      val rs = run(small, MinOf(name))
      val rl = run(large, MinOf(name))
      val (ts, cs, tl, cl) = (rs.sec, rs.plan, rl.sec, rl.plan)
      val est =
        if (name.startsWith("g6"))
          s""","est":${SparkEntry.queries(name)(spark, large)
            .collect()(0).getAs[Long]("n_triangles_est")}"""
        else ""
      println(s"""{"query":"$name","small_sec":$ts,"large_sec":$tl,""" +
        s""""ops_small":{"cp":${cs("CartesianProduct")},"bnlj":${cs("BroadcastNestedLoopJoin")}},""" +
        s""""ops_large":{"cp":${cl("CartesianProduct")},"bnlj":${cl("BroadcastNestedLoopJoin")}},""" +
        f""""peak_task_mb":${rl.peakMb}%.1f,"spill_mb":${rl.spillMb}%.1f,""" +
        f""""driver_heap_mb":${mem.driverHeapMb}%.0f,"mem_flag":${rl.flag}$est}""")
      spark.stop()

    case "--exact-tri" :: dir :: Nil =>
      val spark = session()
      val n = SparkEntry.queries("g3_triangle_count")(spark, dir)
        .collect()(0).getAs[Long]("n_triangles")
      println(s"""{"exact":$n}""")
      spark.stop()

    case "--doulion-twin" :: dir :: Nil =>
      val spark = session()
      // independent universal hash (distinct odd multipliers), same
      // deterministic p = 1/4 — a true replicate of the estimator
      val keep = ((col("u") * lit(2246822519L) + col("v") * lit(3266489917L))
        % lit(2147483647L)) % 4 === 0
      val e = edges(spark, dir).filter(keep).cache()
      val tri = graft.queries.GraphOps.intersectionTriangles(
        graft.queries.GraphOps.orientedAdjPlan(e).localCheckpoint(),
        "est", scaleUp = 64L)
      val est = tri.collect()(0).getAs[Long]("est")
      val m = e.count()
      println(s"""{"twin_est":$est,"twin_edges":$m}""")
      spark.stop()

    case other =>
      sys.error(s"usage: --one <name> <small> <large> | --exact-tri <dir> " +
        s"| --doulion-twin <dir>; got: $other")
  }
}
