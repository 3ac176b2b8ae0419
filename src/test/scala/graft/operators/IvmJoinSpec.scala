package graft.operators

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-view IVM (the bilinear delta rule) beyond what the i4 oracle
  * can show: multiset multiplicities above 1, exact sign cancellation
  * when BOTH sides lose their row in the same tick, and tick-split
  * associativity (two sequential ticks == one combined tick == full
  * recompute). Frames are tiny on purpose — the algebra is the thing
  * under test, and every case is chosen so a sign error changes the
  * result.
  */
class IvmJoinSpec extends SparkSpec {
  import TestSpark.spark.implicits._

  private def viewSet(df: DataFrame): Set[(Long, String, Long, Long)] =
    df.select(col("k"), col("va"), col("vb"), col("_mult"))
      .as[(Long, String, Long, Long)].collect().toSet

  // changelog shape: keys + _change_type + data cols
  private def dA(rows: (Long, String, String)*): DataFrame =
    rows.toDF("k", "_change_type", "va").select("k", "_change_type", "va")
  private def dB(rows: (Long, String, Long)*): DataFrame =
    rows.toDF("k", "_change_type", "vb").select("k", "_change_type", "vb")
  private val emptyDA = dA()
  private val emptyDB = dB()

  test("duplicate derivations carry _mult > 1 and decrement one at a time") {
    // two identical A rows × one B row → _mult = 2
    val a = Seq((1L, "x"), (1L, "x")).toDF("k", "va")
    val b = Seq((1L, 10L)).toDF("k", "vb")
    val v0 = Ivm.joinView(a, b, Seq("k"))
    assert(viewSet(v0) == Set((1L, "x", 10L, 2L)))
    // delete ONE copy of the duplicated A row
    val v1 = Ivm.applyJoinDelta(v0, a, b, dA((1L, "delete", "x")), emptyDB, Seq("k"))
    assert(viewSet(v1) == Set((1L, "x", 10L, 1L)))
    // ... and the other copy: the row vanishes, not goes negative
    val aAfter = Seq((1L, "x")).toDF("k", "va")
    val v2 = Ivm.applyJoinDelta(v1, aAfter, b, dA((1L, "delete", "x")), emptyDB, Seq("k"))
    assert(viewSet(v2).isEmpty)
  }

  test("same-tick delete on BOTH sides cancels to exactly zero (cross-term sign)") {
    // ΔA⋈B_old gives -1, A_old⋈ΔB gives -1, ΔA⋈ΔB gives (-1)(-1)=+1:
    // net -1 against _mult=1 → gone. A sign error in the cross term
    // would leave -1 (negative mult) or +1 (ghost row).
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "va")
    val b = Seq((1L, 10L), (2L, 20L)).toDF("k", "vb")
    val v0 = Ivm.joinView(a, b, Seq("k"))
    val v1 = Ivm.applyJoinDelta(v0, a, b,
      dA((1L, "delete", "x")), dB((1L, "delete", 10L)), Seq("k"))
    assert(viewSet(v1) == Set((2L, "y", 20L, 1L)))
  }

  test("same-tick update on BOTH sides derives exactly the (new,new) row") {
    val a = Seq((1L, "old")).toDF("k", "va")
    val b = Seq((1L, 10L)).toDF("k", "vb")
    val v0 = Ivm.joinView(a, b, Seq("k"))
    val v1 = Ivm.applyJoinDelta(v0, a, b,
      dA((1L, "update_preimage", "old"), (1L, "update_postimage", "new")),
      dB((1L, "update_preimage", 10L), (1L, "update_postimage", 11L)),
      Seq("k"))
    // (old,10) removed; (new,10) and (old,11) must cancel to zero;
    // (new,11) appears once
    assert(viewSet(v1) == Set((1L, "new", 11L, 1L)))
  }

  test("two sequential ticks == one combined tick == full recompute") {
    val a1 = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("k", "va")
    val b1 = Seq((1L, 10L), (2L, 20L), (2L, 21L)).toDF("k", "vb")
    // tick 1: delete A(3,z) [dangling — no B partner], insert B(3,30)
    val a2 = Seq((1L, "x"), (2L, "y")).toDF("k", "va")
    val b2 = Seq((1L, 10L), (2L, 20L), (2L, 21L), (3L, 30L)).toDF("k", "vb")
    val tick1A = dA((3L, "delete", "z"))
    val tick1B = dB((3L, "insert", 30L))
    // tick 2: update A(2) in place, delete B(2,21)
    val a3 = Seq((1L, "x"), (2L, "Y")).toDF("k", "va")
    val b3 = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "vb")
    val tick2A = dA((2L, "update_preimage", "y"), (2L, "update_postimage", "Y"))
    val tick2B = dB((2L, "delete", 21L))

    val v0 = Ivm.joinView(a1, b1, Seq("k"))
    val sequential = Ivm.applyJoinDelta(
      Ivm.applyJoinDelta(v0, a1, b1, tick1A, tick1B, Seq("k")),
      a2, b2, tick2A, tick2B, Seq("k"))
    val combined = Ivm.applyJoinDelta(v0, a1, b1,
      tick1A.unionByName(tick2A), tick1B.unionByName(tick2B), Seq("k"))
    val recomputed = Ivm.joinView(a3, b3, Seq("k"))

    assert(viewSet(sequential) == viewSet(recomputed),
      s"sequential ${viewSet(sequential)} vs recomputed ${viewSet(recomputed)}")
    assert(viewSet(combined) == viewSet(recomputed),
      s"combined ${viewSet(combined)} vs recomputed ${viewSet(recomputed)}")
  }

  test("NULL data columns still pair view rows with their deltas (null-safe merge)") {
    // joinView's groupBy treats NULLs as equal, so the merge join must
    // too — a plain equi-join would strand the -1 on its own row and
    // leave the (1, null, 10) ghost alive
    val a = Seq((1L, Option.empty[String]), (2L, Some("y"))).toDF("k", "va")
    val b = Seq((1L, 10L), (2L, 20L)).toDF("k", "vb")
    val v0 = Ivm.joinView(a, b, Seq("k"))
    assert(v0.count() == 2)
    val delNull = Seq((1L, "delete", Option.empty[String]))
      .toDF("k", "_change_type", "va")
    val aAfter = Seq((2L, "y")).toDF("k", "va")
    val v1 = Ivm.applyJoinDelta(v0, a, b, delNull, emptyDB, Seq("k"))
    assert(viewSet(v1) == Set((2L, "y", 20L, 1L)),
      s"ghost row survived: ${viewSet(v1)}")
    assert(viewSet(v1) == viewSet(Ivm.joinView(aAfter, b, Seq("k"))))
  }

  test("inconsistent changelog (delete of an underived row) fails loudly") {
    val a = Seq((1L, "x")).toDF("k", "va")
    val b = Seq((1L, 10L)).toDF("k", "vb")
    val v0 = Ivm.joinView(a, b, Seq("k"))
    // (1, 'zzz') was never in A: ΔA⋈B_old derives (1, zzz, 10, -1)
    // with no view row to absorb it — must raise, not silently filter
    val bad = dA((1L, "delete", "zzz"))
    val ex = intercept[Throwable] {
      Ivm.applyJoinDelta(v0, a, b, bad, emptyDB, Seq("k")).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + messages(t.getCause)
    assert(messages(ex).contains("went negative"), messages(ex))
  }

  test("an oversized delta trips the broadcast guard with the contract named") {
    // the micro-batch contract as a runtime bound (r15 verdict task 5):
    // shrink the ceiling so an ordinary delta is "oversized", and the
    // guard must refuse BEFORE any probe plan is built
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "va")
    val b = Seq((1L, 10L), (2L, 20L)).toDF("k", "vb")
    val v0 = Ivm.joinView(a, b, Seq("k"))
    sys.props("graft.ivm.maxDeltaRows") = "0"
    try {
      val ex = intercept[IllegalStateException] {
        Ivm.applyJoinDelta(v0, a, b, dA((1L, "delete", "x")), emptyDB, Seq("k"))
      }
      assert(ex.getMessage.contains("MICRO-BATCH-SIZED"), ex.getMessage)
      assert(ex.getMessage.contains("graft.ivm.maxDeltaRows"), ex.getMessage)
    } finally sys.props -= "graft.ivm.maxDeltaRows"
    // with the bound back at its default the same tick goes through
    val v1 = Ivm.applyJoinDelta(v0, a, b, dA((1L, "delete", "x")), emptyDB, Seq("k"))
    assert(viewSet(v1) == Set((2L, "y", 20L, 1L)))
  }

  test("the deltas ride broadcasts into the base probes (O(Δ) tick, plan-gated)") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "va")
    val b = Seq((1L, 10L), (2L, 20L)).toDF("k", "vb")
    val v0 = Ivm.joinView(a, b, Seq("k"))
    val maintained = Ivm.applyJoinDelta(v0, a, b,
      dA((1L, "delete", "x")), dB((2L, "insert", 21L)), Seq("k"))
    val p = maintained.queryExecution.executedPlan.toString()
    assert(p.sliding("BroadcastHashJoin".length).count(_ == "BroadcastHashJoin") >= 2,
      "ΔA⋈B_old and A_old⋈ΔB must broadcast the delta side:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
