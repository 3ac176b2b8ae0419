package graft

import org.apache.spark.sql.SparkSession

/** The NEXT-decade spot audit (round 12): the committed 10× gates
  * (BENCH_SF1*, sf0.1 → sf1) all land at wall ratios of 1.5–1.8×,
  * which proves those runs are still OVERHEAD-DOMINATED — a hidden
  * quadratic term with a small constant would not show at 10×. This
  * audit runs the catalog's most expensive non-streaming queries one
  * decade further (sf1 → sf10 — 100× the bench SF: lineitem ≈ 60M
  * rows, documents 500k, embeddings 200k, events 10M) where the walls
  * are seconds-to-tens-of-seconds and compute dominates, so a
  * super-linear term has nowhere to hide.
  *
  * Gates, per query:
  *   - wall ratio (min-of-2 large / min-of-2 small) under an explicit
  *     ceiling — default 12× for 10× data (linear + scheduling
  *     headroom), with documented exceptions where the operator's own
  *     contract is super-linear (g3's triangle count is O(m^1.5) BY
  *     DESIGN — the degree-ordered bound, not an accident);
  *   - 0 plan flips (no CartesianProduct, no new
  *     BroadcastNestedLoopJoin at large stats).
  *
  * s47 rides along as the graft-table snapshot-source probe: its
  * in-query gate (pruned file listing < total files) must hold at
  * this volume too, so the DSv2 path's planning-time skipping is
  * exercised at 100×, not just at catalog scale.
  *
  * Usage: tools/run.sh graft.ScaleSpotCheck [smallDir largeDir [out]]
  * Defaults: /tmp/sf1 /tmp/sf10 BENCH_SF10.json. Exits nonzero on any
  * flip or ratio-gate failure.
  */
object ScaleSpotCheck {

  /** The audit set: the most expensive non-streaming catalog queries
    * (per BENCH_FULL_r11) + the graft-table source probe.
    */
  private val Queries = Seq(
    "q16_supplier_diversity", "j17_temporal_dim_join", "t22_game_profile",
    "d3_lsh_near_dup", "d15_substring_dedup", "d11_semantic_dedup",
    "i5_minmax_ivm", "k10_recall_report", "g3_triangle_count",
    "g6_triangle_doulion", "s47_snapshot_source")

  /** Ceilings for 10× data. Default 12× = linear plus headroom.
    * g3's contract is super-linear by design: degree-ordered triangle
    * counting is O(m^1.5) in edges (the documented bound in its
    * catalog entry), so 10× edges admits up to ~31.6× work; the
    * ceiling sits at the contract, not at linear.
    */
  private val DefaultMaxRatio = 12.0
  private val MaxRatio = Map("g3_triangle_count" -> 32.0)

  /** g6 must also agree with g3's EXACT count within the DOULION
    * bound at both scales — accuracy measured where the truth is
    * known, not asserted (stderr ≈ sqrt((1/p³−1)/T): ~0.4% at sf1's
    * ~4M triangles, ~0.13% at sf10's ~40M).
    */
  private val DoulionMaxErr = 0.02

  /** Below this small-side wall a ratio is scheduler jitter, not an
    * algorithm; such queries keep the plan-flip audit only.
    */
  private val NoiseFloorSec = 0.5

  private val Ops = Seq("CartesianProduct", "BroadcastNestedLoopJoin")

  private def counts(p: String): Map[String, Int] =
    Ops.map(op => op -> op.r.findAllIn(p).size).toMap

  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/tmp/sf1")
    val large = args.lift(1).getOrElse("/tmp/sf10")
    val out = args.lift(2).getOrElse("BENCH_SF10.json")
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
      // listener reset PER REP; the reported memory fields belong to
      // the rep whose wall was kept (min-of-2) — a shared accumulator
      // would double-count spill and could report the discarded rep's
      // peak (same fix as ScaleSpot100Check)
      (0 until 2).map { _ =>
        spark.catalog.clearCache()
        mem.reset()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        val secs = (System.nanoTime() - t0) / 1e9
        Timing(secs, counts(df.queryExecution.executedPlan.toString()),
          mem.peakTaskMb, mem.spillMb, mem.driverHeapMb, mem.headroomFlag(32))
      }.minBy(_.secs)
    }

    // per-dir warmup to absorb codegen / scan staging
    time(Queries.head, small); time(Queries.head, large)

    // DOULION accuracy gate: the g6 estimate vs g3's exact count at
    // BOTH scales (one extra collect of each 1-row result)
    def triCounts(dir: String): (Long, Long) = {
      val exact = SparkEntry.queries("g3_triangle_count")(spark, dir)
        .collect()(0).getAs[Long]("n_triangles")
      val est = SparkEntry.queries("g6_triangle_doulion")(spark, dir)
        .collect()(0).getAs[Long]("n_triangles_est")
      (exact, est)
    }
    val (exS, estS) = triCounts(small)
    val (exL, estL) = triCounts(large)
    val errS = math.abs(estS.toDouble / exS - 1.0)
    val errL = math.abs(estL.toDouble / exL - 1.0)
    val doulionFail = errS > DoulionMaxErr || errL > DoulionMaxErr
    println(f"""{"doulion_accuracy":{"sf1_exact":$exS,"sf1_est":$estS,"sf1_err":$errS%.4f,"sf10_exact":$exL,"sf10_est":$estL,"sf10_err":$errL%.4f,"max_err":$DoulionMaxErr,"fail":$doulionFail}}""")

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
      val ceiling = MaxRatio.getOrElse(n,
        if (ts >= NoiseFloorSec) DefaultMaxRatio else Double.MaxValue)
      val ratioFail = ratio > ceiling
      if (ratioFail) ratioFails += 1
      println(f"""{"query":"$n","sf1_sec":$ts%.4f,"sf10_sec":$tl%.4f,"ratio":$ratio%.2f,"flip":$flip,"ratio_fail":$ratioFail,"sf10_peak_task_mb":${l0.peakTaskMb}%.1f,"sf10_spill_mb":${l0.spillMb}%.1f,"mem_flag":${l0.memFlag}}""")
      (n, ts, tl, ratio, flip, s0, l0)
    }
    val worst = rows.maxBy(_._4)
    val json =
      f"""{
         | "metric": "spot_scale_headroom_100x",
         | "data_ratio": "sf1 -> sf10 (10x on top of the committed 10x audits; 100x the sf0.1 bench SF — lineitem ~60M rows, documents 500k, embeddings 200k, events 10M; tools/gen_sf.py seed 4242)",
         | "why": "the 10x audits' 1.5-1.8x wall ratios prove overhead domination; this decade is compute-dominated, so a hidden quadratic term has nowhere to hide",
         | "total_sf1_sec": ${totS}%.4f,
         | "total_sf10_sec": ${totL}%.4f,
         | "wall_ratio": ${totL / totS}%.2f,
         | "protocol": "min-of-2, local[32], per-dir warmup query",
         | "plan_audit": "${Queries.size} queries, $flips flips, $ratioFails ratio-gate failures (default <=${DefaultMaxRatio}x above the ${NoiseFloorSec}s floor; g3<=32x per its O(m^1.5) contract)",
         | "memory_audit": "per-query max task peakExecutionMemory + disk spill + post-run driver heap at sf10; gate: peak_task_mb x 32 slots <= 80%% of the unified execution pool — $memFlags flagged",
         | "worst_query": {"name": "${worst._1}", "ratio": ${worst._4}%.2f},
         | "doulion_accuracy": {"gate": "g6 estimate within ${DoulionMaxErr}%.2f of g3's exact count at both scales", "sf1_exact": $exS, "sf1_est": $estS, "sf1_err": $errS%.4f, "sf10_exact": $exL, "sf10_est": $estL, "sf10_err": $errL%.4f, "fail": $doulionFail},
         | "queries": {
         |${rows.map(r => f""" "${r._1}": {"sf1_sec": ${r._2}%.4f, "sf10_sec": ${r._3}%.4f, "ratio": ${r._4}%.2f, "sf10_peak_task_mb": ${r._7.peakTaskMb}%.1f, "sf10_spill_mb": ${r._7.spillMb}%.1f, "sf10_driver_heap_mb": ${r._7.driverHeapMb}%.0f, "mem_flag": ${r._7.memFlag}}""").mkString(",\n")}
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
