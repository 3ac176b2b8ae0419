package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** The SECOND PROCESS of the multi-writer race gate
  * ([[MultiWriterRaceSpec]]): a standalone main the spec launches as
  * a real child JVM, so the publish/reserve/CAS protocol is exercised
  * across an actual process boundary — in-JVM interleavings
  * (ReservedSlotPropertySpec) share `claimLock` and the beat
  * scheduler, which is exactly the help two production writers do NOT
  * get. The cross-process guarantees under test all reduce to
  * filesystem atomicity: claim files and commit markers are
  * hard-link create-exclusive, so they exclude other PROCESSES, not
  * just other threads.
  *
  * Coordination is two sentinel files (the spec watches for
  * `child_ready`, the child waits for `parent_go`) so both writers
  * enter their publish loops together instead of the child losing its
  * whole window to SparkSession startup.
  *
  * Modes:
  *   - `claims <table> <n> <syncDir>`: n claim-based publishVersion
  *     calls of one-row frames; prints `CHILD_VERSION v` per commit.
  *   - `cas <table> <n> <syncDir>`: n publishWithRetry increments of a
  *     one-row counter (value = previous + 1); prints `CHILD_CAS v`.
  */
object MultiWriterChild {

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val path = args(1)
    val n = args(2).toInt
    val syncDir = args(3)
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-race-child")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    Files.write(Paths.get(syncDir, "child_ready"), Array.emptyByteArray)
    val go = Paths.get(syncDir, "parent_go")
    val deadline = System.currentTimeMillis() + 60000
    while (!Files.exists(go) && System.currentTimeMillis() < deadline)
      Thread.sleep(10)
    require(Files.exists(go), "parent_go never appeared")

    mode match {
      case "claims" =>
        (0 until n).foreach { i =>
          val v = TableStore.publishVersion(spark, path,
            Seq(("child", i.toLong)).toDF("writer", "seq"))
          println(s"CHILD_VERSION $v")
        }
      case "cas" =>
        (0 until n).foreach { _ =>
          val v = TableStore.publishWithRetry(spark, path, "",
            maxRetries = 500) { cur =>
            val next = cur.map(c =>
              TableStore.readVersion(spark, path, Some(c))
                .collect()(0).getAs[Long]("value") + 1L).getOrElse(1L)
            Seq(next).toDF("value")
          }
          println(s"CHILD_CAS $v")
        }
      case other => sys.error(s"unknown mode $other")
    }
    println("CHILD_DONE")
    spark.stop()
  }
}
