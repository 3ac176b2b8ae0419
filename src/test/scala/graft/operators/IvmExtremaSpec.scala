package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.{SparkSpec, TestSpark}

/** MIN/MAX IVM property: for ARBITRARY before/after multiset states,
  * maintaining the (count, sum, min, max) view from the diff changelog
  * must land exactly on the recompute from the after state. Small
  * domains force every hard case: deletes AT the current extremum
  * (rescan path), deletes strictly inside the interval (incremental
  * path), groups emptied to zero, groups born in the delta, duplicate
  * extremum values, and single-row groups.
  */
class IvmExtremaSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private type Row = (Long, Long) // (grp, amt)

  private def countRows(rows: Seq[Row]): Map[Row, Int] =
    rows.groupBy(identity).view.mapValues(_.size).toMap

  private def diff(before: Seq[Row], after: Seq[Row]): Seq[(Row, String)] = {
    val b = countRows(before); val a = countRows(after)
    (b.keySet ++ a.keySet).toSeq.flatMap { r =>
      val d = a.getOrElse(r, 0) - b.getOrElse(r, 0)
      if (d > 0) Seq.fill(d)((r, "insert"))
      else Seq.fill(-d)((r, "delete"))
    }
  }

  private def df(rows: Seq[Row]): DataFrame = rows.toDF("grp", "amt")
  private def dDf(rows: Seq[(Row, String)]): DataFrame =
    rows.map { case ((g, a), ct) => (g, ct, a) }
      .toDF("grp", "_change_type", "amt")

  private def snap(v: DataFrame): Set[(Long, Long, BigDecimal, Long, Long)] =
    v.select(col("grp"), col("n"), col("sum_amt"), col("min_amt"), col("max_amt"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2)),
        r.getLong(3), r.getLong(4))).toSet

  private def agg(d: DataFrame): DataFrame =
    Ivm.aggregateWithExtrema(d, Seq("grp"), Seq("amt"), Seq("amt"), Seq("amt"))

  test("maintained == recomputed under extremum deletes, emptied and born groups") {
    val rows: Gen[List[Row]] =
      Gen.listOfN(5, Gen.zip(Gen.choose(1L, 3L), Gen.choose(10L, 13L)))
    val gen = for { before <- rows; after <- rows } yield (before, after)
    val prop = Prop.forAll(gen) { case (before, after) =>
      val changes = dDf(diff(before, after))
      val maintained = Ivm.applyDeltaWithExtrema(
        agg(df(before)), changes, df(after),
        Seq("grp"), Seq("amt"), Seq("amt"), Seq("amt"))
      val got = snap(maintained)
      val want = snap(agg(df(after)))
      Prop(got == want) :| s"got=$got want=$want before=$before after=$after"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("extremum delete rescans ONLY its group; inside-interval delete stays incremental") {
    // grp 1: [10, 20, 30] delete the 30 (max) -> rescan, min/max = 10/20
    // grp 2: [10, 20, 30] delete the 20 (inside) -> incremental, 10/30
    // grp 3: untouched passthrough
    val before = Seq((1L, 10L), (1L, 20L), (1L, 30L),
      (2L, 10L), (2L, 20L), (2L, 30L), (3L, 5L))
    val after = Seq((1L, 10L), (1L, 20L),
      (2L, 10L), (2L, 30L), (3L, 5L))
    val maintained = Ivm.applyDeltaWithExtrema(
      agg(df(before)), dDf(diff(before, after)), df(after),
      Seq("grp"), Seq("amt"), Seq("amt"), Seq("amt"))
    assert(snap(maintained) == snap(agg(df(after))))
    // and the duplicate-extremum case: [10, 10] delete one 10 -> the
    // conservative rescan must keep min = max = 10 with n = 1
    val b2 = Seq((9L, 10L), (9L, 10L))
    val a2 = Seq((9L, 10L))
    val m2 = Ivm.applyDeltaWithExtrema(
      agg(df(b2)), dDf(diff(b2, a2)), df(a2),
      Seq("grp"), Seq("amt"), Seq("amt"), Seq("amt"))
    assert(snap(m2) == snap(agg(df(a2))))
  }
}
