package graft.operators

import java.nio.file.{Files, Paths}
import java.util.concurrent.TimeUnit

import graft.SparkSpec

/** CROSS-PROCESS multi-writer gate (round 14, verdict task #4): two
  * real JVMs race `publishVersion` / `publishWithRetry` /
  * `reserveVersionAfter` / `vacuum` over ONE table directory while a
  * changefeed reader tails it. ReservedSlotPropertySpec already
  * proves the in-process interleavings, but a single JVM shares
  * `claimLock` and the heartbeat scheduler — the two things two
  * production writers on different hosts do NOT share. What holds
  * across processes must come from the substrate itself: hard-link
  * create-exclusive claim files and commit markers. This spec is that
  * proof: races are either TOLERATED PROVABLY (claim publishers land
  * distinct versions; CAS increments lose no update) or SERIALIZED
  * LOUDLY (reserveVersionAfter throws on a foreign commit inside its
  * pinned window) — the single-writer BigQuery assumption the
  * reference gets for free is re-established on parquet, per
  * SURVEY §7.4 trap 9.
  */
class MultiWriterRaceSpec extends SparkSpec {

  import spark.implicits._

  /** Same module surface build.sbt forks tests with — the child is a
    * plain `java` spawn, so it needs the JDK17 add-opens Spark wants. */
  private val addOpens = Seq(
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
  ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))

  private case class Child(proc: Process, lines: () => Seq[String])

  private def spawnChild(args: String*): Child = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    val cp = System.getProperty("java.class.path")
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC", "-Duser.timezone=UTC",
      "-cp", cp, "graft.operators.MultiWriterChild") ++ args
    val proc = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val t = new Thread(() => {
      val r = new java.io.BufferedReader(
        new java.io.InputStreamReader(proc.getInputStream))
      var line = r.readLine()
      while (line != null) { buf.add(line); line = r.readLine() }
    }, "race-child-drain")
    t.setDaemon(true); t.start()
    Child(proc, () => { import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toList })
  }

  /** Wait for the child's ready sentinel, release it, run `parentWork`
    * concurrently with the child, then join both. */
  private def race[A](child: Child, syncDir: String)(parentWork: => A): A = {
    val ready = Paths.get(syncDir, "child_ready")
    val deadline = System.currentTimeMillis() + 90000
    while (!Files.exists(ready) && System.currentTimeMillis() < deadline) {
      assert(child.proc.isAlive, "child died before ready:\n" +
        child.lines().mkString("\n"))
      Thread.sleep(20)
    }
    assert(Files.exists(ready), "child never became ready")
    Files.write(Paths.get(syncDir, "parent_go"), Array.emptyByteArray)
    val out = parentWork
    assert(child.proc.waitFor(120, TimeUnit.SECONDS),
      "child did not exit:\n" + child.lines().mkString("\n"))
    assert(child.proc.exitValue() == 0, "child failed:\n" +
      child.lines().mkString("\n"))
    assert(child.lines().contains("CHILD_DONE"),
      "child incomplete:\n" + child.lines().mkString("\n"))
    out
  }

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("claim-based publishers in two JVMs land distinct ordered versions; a changefeed tail sees every commit exactly once") {
    val dir = tmp("graft_race_claims")
    val table = s"$dir/t"
    val sync = tmp("graft_race_sync1")
    val n = 6
    // seed v1 so the changefeed can infer its schema before the race
    val seed = TableStore.publishVersion(spark, table,
      Seq(("seed", -1L)).toDF("writer", "seq"))
    assert(seed == 1L)

    val child = spawnChild("claims", table, n.toString, sync)
    val parentVs = race(child, sync) {
      (0 until n).map { i =>
        // vacuum races the writers on every other publish — it must
        // neither break a commit nor eat in-flight data (age guard)
        if (i % 2 == 0) TableStore.vacuum(spark, table)
        TableStore.publishVersion(spark, table,
          Seq(("parent", i.toLong)).toDF("writer", "seq"))
      }
    }
    val childVs = child.lines()
      .filter(_.startsWith("CHILD_VERSION ")).map(_.split(" ")(1).toLong)
    assert(childVs.size == n, s"child committed ${childVs.size}/$n:\n" +
      child.lines().mkString("\n"))
    // each writer's own versions are strictly increasing (claims are
    // taken in order within a process)
    assert(parentVs == parentVs.sorted && childVs == childVs.sorted)
    // TOLERATED PROVABLY: no version number was ever handed to both
    // processes, and nothing committed outside the two writers
    val all = (parentVs ++ childVs) :+ seed
    assert(all.distinct.size == all.size,
      s"duplicate version across processes: parent=$parentVs child=$childVs")
    val committed = TableStore.committedVersions(spark, table)
    assert(committed.sorted == all.sorted.toSeq,
      s"committed=$committed but writers returned ${all.sorted}")
    // every version is readable and owned by exactly the writer that
    // claims it published it (no torn/overwritten data)
    committed.foreach { v =>
      val rows = TableStore.readVersion(spark, table, Some(v)).collect()
      assert(rows.length == 1, s"v$v has ${rows.length} rows")
      val who = rows(0).getAs[String]("writer")
      val expected =
        if (v == seed) "seed"
        else if (parentVs.contains(v)) "parent" else "child"
      assert(who == expected, s"v$v owned by $who, expected $expected")
    }
    // the changefeed over the finished race replays every commit in
    // version order, exactly once (the tail a downstream view would
    // have been maintaining during the race)
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-table").load(table)
      .writeStream.foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= df.select("_version").distinct().collect().map(_.getLong(0))
        ()
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.awaitTermination(120000)
    assert(seen.sorted.toSeq == committed,
      s"changefeed saw ${seen.sorted} of $committed")
    deleteRecursively(new java.io.File(dir))
    deleteRecursively(new java.io.File(sync))
  }

  test("CAS increments from two JVMs lose no update (optimistic concurrency across processes)") {
    val dir = tmp("graft_race_cas")
    val table = s"$dir/t"
    val sync = tmp("graft_race_sync2")
    val n = 5
    val child = spawnChild("cas", table, n.toString, sync)
    race(child, sync) {
      (0 until n).foreach { _ =>
        TableStore.publishWithRetry(spark, table, "", maxRetries = 500) { cur =>
          val next = cur.map(c =>
            TableStore.readVersion(spark, table, Some(c))
              .collect()(0).getAs[Long]("value") + 1L).getOrElse(1L)
          Seq(next).toDF("value")
        }
      }
    }
    // 2n increments → counter exactly 2n AND version exactly 2n: CAS
    // commits are gapless by construction (target = expected + 1), so
    // a single lost update would show as a hole or a short count
    val cur = TableStore.currentVersion(spark, table)
    assert(cur.contains(2L * n), s"expected version ${2 * n}, got $cur")
    val finalValue = TableStore.readVersion(spark, table)
      .collect()(0).getAs[Long]("value")
    assert(finalValue == 2L * n,
      s"lost update: ${2 * n} increments, counter reads $finalValue")
    deleteRecursively(new java.io.File(dir))
    deleteRecursively(new java.io.File(sync))
  }

  test("reserveVersionAfter fails loudly when another PROCESS commits inside its pinned window") {
    val dir = tmp("graft_race_reserve")
    val table = s"$dir/t"
    val sync = tmp("graft_race_sync3")
    val v1 = TableStore.publishVersion(spark, table,
      Seq(("seed", 0L)).toDF("writer", "seq"))

    // a reservation taken BEFORE the foreign commit keeps its slot:
    // the child's claim collides with the reservation's claim file
    // (hard-link exclusivity) and lands above it
    val slot = TableStore.reserveVersionAfter(spark, table, at = v1)
    assert(slot == v1 + 1)
    val child = spawnChild("claims", table, "1", sync)
    race(child, sync) { () }
    val childV = child.lines()
      .filter(_.startsWith("CHILD_VERSION ")).map(_.split(" ")(1).toLong).head
    assert(childV > slot,
      s"child's claim must land above the reservation, got $childV vs $slot")
    val committed = TableStore.publishReserved(spark, table, slot,
      Seq(("parent", 1L)).toDF("writer", "seq"))
    assert(committed == slot)
    assert(TableStore.committedVersions(spark, table) == Seq(v1, slot, childV))

    // SERIALIZED LOUDLY: pinning at `slot` now has the child's commit
    // inside the window — the single-writer sanity check must throw
    // (and give the reservation back: the table stays publishable)
    val ex = intercept[IllegalStateException] {
      TableStore.reserveVersionAfter(spark, table, at = slot)
    }
    assert(ex.getMessage.contains("concurrent writer"), ex.getMessage)
    val after = TableStore.publishVersion(spark, table,
      Seq(("parent", 2L)).toDF("writer", "seq"))
    assert(after > childV, "cancelled reservation must free the table")
    deleteRecursively(new java.io.File(dir))
    deleteRecursively(new java.io.File(sync))
  }
}
