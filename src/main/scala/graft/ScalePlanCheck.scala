package graft

import org.apache.spark.sql.SparkSession

/** Scale-headroom plan audit: compile every TPC-H-shape catalog query
  * against a SMALL and a LARGE data directory and compare the join
  * strategies Catalyst picks. A query "flips" if the large-stats plan
  * introduces a CartesianProduct, or more BroadcastNestedLoopJoins
  * than the small plan had (the hinted 1-row scalar broadcasts some
  * q-shapes legitimately use appear at BOTH sizes; a flip means a real
  * join degraded when the stats crossed a threshold).
  *
  * Usage: tools/run.sh graft.ScalePlanCheck <smallDir> <largeDir>
  * Prints one JSON line per query + a SUMMARY line; exits nonzero on
  * any flip.
  */
object ScalePlanCheck {

  private val Ops = Seq("CartesianProduct", "BroadcastNestedLoopJoin",
    "SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin")

  private def strategyCounts(p: String): Map[String, Int] =
    Ops.map(op => op -> op.r.findAllIn(p).size).toMap

  def main(args: Array[String]): Unit = {
    val small = args.headOption.getOrElse("/root/testdata/sf0.1")
    val large = args.lift(1).getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries.keys.filter(_.matches("q\\d+_.*")).toSeq.sorted
    var flips = 0
    qs.foreach { n =>
      val ps = SparkEntry.queries(n)(spark, small)
        .queryExecution.executedPlan.toString()
      val pl = SparkEntry.queries(n)(spark, large)
        .queryExecution.executedPlan.toString()
      val cs = strategyCounts(ps)
      val cl = strategyCounts(pl)
      val flip = cl("CartesianProduct") > 0 ||
        cl("BroadcastNestedLoopJoin") > cs("BroadcastNestedLoopJoin")
      if (flip) flips += 1
      def j(m: Map[String, Int]) = m.filter(_._2 > 0)
        .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
      println(s"""{"query":"$n","flip":$flip,"small":${j(cs)},"large":${j(cl)}}""")
    }
    println(s"""{"summary":true,"n_queries":${qs.size},"flips":$flips}""")
    spark.stop()
    if (flips > 0) sys.exit(1)
  }
}
