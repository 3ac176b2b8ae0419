package graft

import org.apache.spark.sql.SparkSession

/** The sf10 → sf100 decade (round 14): 1000× the bench SF — lineitem
  * ~600M rows, orders 150M, documents 5M, embeddings 2M, events 100M.
  * Every prior decade caught something real (the 10× audits caught
  * st17's uncompacted base chain and i4's pinned shuffle count; the
  * 100× spot caught g3's wedge explosion and d11's unbounded
  * training), so the audit keeps walking: this is the decade where a
  * vertex-sized broadcast, a driver-sized collect, or a hidden
  * n log n with a small constant actually shows.
  *
  * Audit set = the 6 most scale-sensitive queries by the sf10 audit's
  * ratios and family coverage: the sampled triangle count (graph),
  * substring dedup (text, steepest non-graph curve), semantic dedup
  * (vector), the temporal dim join (relational), component dedup
  * (iterative graph), and the CDC join-view replay (lakehouse write
  * path).
  *
  * Gates, per query:
  *   - wall ratio (large / small) under an explicit ceiling — default
  *     12× for 10× data; g6's contract is super-linear by design
  *     (O((pm)^1.5) in sampled edges → ceiling 32×);
  *   - 0 plan flips (no CartesianProduct / BroadcastNestedLoopJoin
  *     appearing only at large scale);
  *   - memory headroom (PeakMemoryAudit): max task peakExecutionMemory
  *     × 32 slots must stay under 80% of the execution pool;
  *   - DOULION accuracy where the truth is known: g3's EXACT count
  *     runs ONCE at sf100 (untimed — it is the ~32×-contract query
  *     the sampled variant exists to replace) and g6's estimate must
  *     sit within 2%.
  *
  * Protocol: min-of-2 except i4 (min-of-1: each run publishes ~30 GB
  * of versioned scratch tables at this SF — the sandbox disk, not the
  * algorithm, bounds the repeat; its scratch dirs are deleted after
  * each run).
  *
  * Usage: tools/run.sh graft.ScaleSpot100Check [smallDir largeDir [out]]
  * Defaults: /tmp/sf10 /tmp/sf100 BENCH_SF100.json. Exits nonzero on
  * any gate failure.
  */
object ScaleSpot100Check {

  private val Queries = Seq(
    "g6_triangle_doulion", "d15_substring_dedup", "d11_semantic_dedup",
    "j17_temporal_dim_join", "c3_dedup_by_components", "i4_join_view_ivm")

  private val DefaultMaxRatio = 12.0
  private val MaxRatio = Map("g6_triangle_doulion" -> 32.0)
  private val DoulionMaxErr = 0.02
  private val MinOf = Map("i4_join_view_ivm" -> 1).withDefaultValue(2)

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

  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/tmp/sf10")
    val large = args.lift(1).getOrElse("/tmp/sf100")
    val out = args.lift(2).getOrElse("BENCH_SF100.json")
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
    val mem = new PeakMemoryAudit
    spark.sparkContext.addSparkListener(mem)

    case class Timing(secs: Double, ops: Map[String, Int], peakTaskMb: Double,
        spillMb: Double, driverHeapMb: Double, memFlag: Boolean)

    def time(name: String, dir: String): Timing = {
      var plan = ""
      mem.reset()
      val secs = (0 until MinOf(name)).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        plan = df.queryExecution.executedPlan.toString()
        val dt = (System.nanoTime() - t0) / 1e9
        if (name.startsWith("i4")) cleanScratch()
        dt
      }.min
      Timing(secs, counts(plan), mem.peakTaskMb, mem.spillMb,
        mem.driverHeapMb, mem.headroomFlag(32))
    }

    // per-dir warmup to absorb codegen / scan staging
    time("j17_temporal_dim_join", small); time("j17_temporal_dim_join", large)

    // DOULION accuracy at the NEW decade: exact truth once, untimed
    val exL = SparkEntry.queries("g3_triangle_count")(spark, large)
      .collect()(0).getAs[Long]("n_triangles")
    val estL = SparkEntry.queries("g6_triangle_doulion")(spark, large)
      .collect()(0).getAs[Long]("n_triangles_est")
    val errL = math.abs(estL.toDouble / exL - 1.0)
    val doulionFail = errL > DoulionMaxErr
    println(f"""{"doulion_accuracy":{"sf100_exact":$exL,"sf100_est":$estL,"sf100_err":$errL%.4f,"max_err":$DoulionMaxErr,"fail":$doulionFail}}""")

    var flips = 0
    var ratioFails = 0
    var memFlags = 0
    var (totS, totL) = (0.0, 0.0)
    val rows = Queries.map { n =>
      val s0 = time(n, small)
      val l0 = time(n, large)
      val (ts, tl) = (s0.secs, l0.secs)
      val flip = l0.ops("CartesianProduct") > s0.ops("CartesianProduct") ||
        l0.ops("BroadcastNestedLoopJoin") > s0.ops("BroadcastNestedLoopJoin")
      if (flip) flips += 1
      if (l0.memFlag) memFlags += 1
      totS += ts; totL += tl
      val ratio = if (ts > 0) tl / ts else 0.0
      val ratioFail = ratio > MaxRatio.getOrElse(n, DefaultMaxRatio)
      if (ratioFail) ratioFails += 1
      println(f"""{"query":"$n","sf10_sec":$ts%.4f,"sf100_sec":$tl%.4f,"ratio":$ratio%.2f,"flip":$flip,"ratio_fail":$ratioFail,"sf100_peak_task_mb":${l0.peakTaskMb}%.1f,"sf100_spill_mb":${l0.spillMb}%.1f,"mem_flag":${l0.memFlag}}""")
      (n, ts, tl, ratio, flip, s0, l0)
    }
    val worst = rows.maxBy(_._4)
    val json =
      f"""{
         | "metric": "spot_scale_headroom_1000x",
         | "data_ratio": "sf10 -> sf100 (one decade past the committed 100x spot audit; 1000x the sf0.1 bench SF — lineitem ~600M rows, orders 150M, documents 5M, embeddings 2M, events 100M; tools/gen_sf.py seed 4242)",
         | "why": "every prior decade caught a real super-linear term; sf100 is where a vertex-sized broadcast, a driver-sized collect or a small-constant n log n actually shows",
         | "total_sf10_sec": ${totS}%.4f,
         | "total_sf100_sec": ${totL}%.4f,
         | "wall_ratio": ${totL / totS}%.2f,
         | "protocol": "min-of-2 (i4 min-of-1, scratch reclaimed between runs), local[32], per-dir warmup query",
         | "plan_audit": "${Queries.size} queries, $flips flips, $ratioFails ratio-gate failures (default <=${DefaultMaxRatio}x; g6<=32x per its O((pm)^1.5) contract)",
         | "memory_audit": "per-query max task peakExecutionMemory + disk spill + post-run driver heap at sf100; gate: peak_task_mb x 32 slots <= 80%% of the unified execution pool — $memFlags flagged",
         | "worst_query": {"name": "${worst._1}", "ratio": ${worst._4}%.2f},
         | "doulion_accuracy": {"gate": "g6 estimate within ${DoulionMaxErr}%.2f of g3's exact count at sf100 (exact run once, untimed)", "sf100_exact": $exL, "sf100_est": $estL, "sf100_err": $errL%.4f, "fail": $doulionFail},
         | "queries": {
         |${rows.map(r => f""" "${r._1}": {"sf10_sec": ${r._2}%.4f, "sf100_sec": ${r._3}%.4f, "ratio": ${r._4}%.2f, "sf100_peak_task_mb": ${r._7.peakTaskMb}%.1f, "sf100_spill_mb": ${r._7.spillMb}%.1f, "sf100_driver_heap_mb": ${r._7.driverHeapMb}%.0f, "mem_flag": ${r._7.memFlag}}""").mkString(",\n")}
         | }
         |}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(s"wrote $out (flips=$flips, ratioFails=$ratioFails, " +
      s"memFlags=$memFlags, wall ${f"${totL / totS}%.2f"}x for 10x data)")
    spark.stop()
    if (flips > 0 || ratioFails > 0 || doulionFail || memFlags > 0) sys.exit(1)
  }
}
