package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.{SparkSpec, TestSpark}

/** Property test for the join-view delta rule: for ARBITRARY before/
  * after multiset states on both sides and an ARBITRARY split of the
  * changelog into ticks, maintaining tick by tick must land exactly on
  * the recomputed join of the after states. The changelog is the true
  * multiset difference (deletes for removed copies, inserts for added
  * copies), and the split can deliver an insert of a row's replacement
  * BEFORE the delete of its old copy — the case that breaks any keyed
  * (non-signed) formulation. The reference model is `Ivm.joinView` on
  * the final states; transient mid-stream disagreement is expected and
  * allowed, final disagreement fails with both sets printed.
  */
class IvmJoinPropertySpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private type ARow = (Long, String)
  private type BRow = (Long, Long)

  private def countRows[R](rows: Seq[R]): Map[R, Int] =
    rows.groupBy(identity).view.mapValues(_.size).toMap

  /** Signed multiset diff as changelog tuples (row, change_type). */
  private def diff[R](before: Seq[R], after: Seq[R]): Seq[(R, String)] = {
    val b = countRows(before); val a = countRows(after)
    val keys = (b.keySet ++ a.keySet).toSeq
    keys.flatMap { r =>
      val d = a.getOrElse(r, 0) - b.getOrElse(r, 0)
      if (d > 0) Seq.fill(d)((r, "insert"))
      else Seq.fill(-d)((r, "delete"))
    }
  }

  private def aDf(rows: Seq[ARow]): DataFrame = rows.toDF("k", "va")
  private def bDf(rows: Seq[BRow]): DataFrame = rows.toDF("k", "vb")
  private def dADf(rows: Seq[(ARow, String)]): DataFrame =
    rows.map { case ((k, va), ct) => (k, ct, va) }.toDF("k", "_change_type", "va")
      .select("k", "_change_type", "va")
  private def dBDf(rows: Seq[(BRow, String)]): DataFrame =
    rows.map { case ((k, vb), ct) => (k, ct, vb) }.toDF("k", "_change_type", "vb")
      .select("k", "_change_type", "vb")

  /** st15's signed base advance (whole-row fold — split-order-proof). */
  private def advance(old: DataFrame, delta: DataFrame): DataFrame = {
    val signed = delta.withColumn("_s",
      when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L)))
      .drop("_change_type")
    val cols = signed.columns.filterNot(_ == "_s").toSeq
    old.withColumn("_s", lit(1L)).unionByName(signed)
      .groupBy(cols.map(col): _*).agg(sum(col("_s")).as("_s"))
      .filter(col("_s") > 0)
      // re-expand multiplicity so the state is a true multiset again
      .withColumn("_dup", explode(array_repeat(lit(1), col("_s").cast("int"))))
      .drop("_s", "_dup")
      .localCheckpoint()
  }

  private def viewSet(df: DataFrame): Set[(Long, String, Long, Long)] =
    df.select(col("k"), col("va"), col("vb"), col("_mult"))
      .as[(Long, String, Long, Long)].collect().toSet

  test("tick-split maintenance lands on the recomputed join for random states/splits") {
    val keys = Gen.choose(1L, 3L)
    val aRows: Gen[List[ARow]] =
      Gen.listOfN(4, Gen.zip(keys, Gen.oneOf("x", "y"))).map(_.take(4))
    val bRows: Gen[List[BRow]] =
      Gen.listOfN(4, Gen.zip(keys, Gen.choose(10L, 12L))).map(_.take(4))
    val gen = for {
      a0 <- aRows; a1 <- aRows
      b0 <- bRows; b1 <- bRows
      nTicks <- Gen.choose(1, 3)
      aTicks <- Gen.listOfN(diff(a0, a1).size, Gen.choose(0, nTicks - 1))
      bTicks <- Gen.listOfN(diff(b0, b1).size, Gen.choose(0, nTicks - 1))
    } yield (a0, a1, b0, b1, nTicks, aTicks, bTicks)

    val prop = Prop.forAll(gen) { case (a0, a1, b0, b1, nTicks, aTicks, bTicks) =>
      val dA = diff(a0, a1).zip(aTicks)
      val dB = diff(b0, b1).zip(bTicks)
      var aCur = aDf(a0).localCheckpoint()
      var bCur = bDf(b0).localCheckpoint()
      var view = Ivm.joinView(aCur, bCur, Seq("k"))
      (0 until nTicks).foreach { t =>
        val da = dADf(dA.filter(_._2 == t).map(_._1))
        val db = dBDf(dB.filter(_._2 == t).map(_._1))
        view = Ivm.applyJoinDelta(view, aCur, bCur, da, db, Seq("k"))
          .localCheckpoint()
        aCur = advance(aCur, da)
        bCur = advance(bCur, db)
      }
      val got = viewSet(view)
      val want = viewSet(Ivm.joinView(aDf(a1), bDf(b1), Seq("k")))
      Prop(got == want) :| s"got=$got want=$want a0=$a0 a1=$a1 b0=$b0 b1=$b1 ticks=$nTicks"
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }
}
