package graft.functions

import graft.{SparkSpec, TestSpark}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.Decimal

/** The t28 bigram-LM primitives: code-point window semantics, the
  * decimal-exact score contract (integer multiples of per-occurrence
  * dsum terms), inner-join drop of unmodeled bigrams, and the
  * no-Exchange scoring plan.
  */
class BigramLmSpec extends SparkSpec {

  private def countsOf(text: String): Map[String, Long] = {
    import TestSpark.spark.implicits._
    Seq(text).toDF("text")
      .select(explode(GraftColumnBridge.column(
        BigramCounts(GraftColumnBridge.expression(col("text"))))).as("e"))
      .select("e.bg", "e.n").as[(String, Long)].collect().toMap
  }

  test("counts: overlapping windows, repeats, degenerate and astral inputs") {
    assert(countsOf("abab") == Map("ab" -> 2L, "ba" -> 1L))
    assert(countsOf("aaa") == Map("aa" -> 2L))
    assert(countsOf("") == Map.empty[String, Long])
    assert(countsOf("a") == Map.empty[String, Long])
    // U+1D11E is outside the BMP: the surrogate pair must stay one
    // character, exactly like substr-by-codepoint in both engines
    assert(countsOf("a𝄞b") ==
      Map("a𝄞" -> 1L, "𝄞b" -> 1L))
  }

  private def round12(x: Double): java.math.BigDecimal = {
    val d = Decimal(x)
    d.changePrecision(30, 12)
    d.toJavaBigDecimal
  }

  test("score: decimal-exact integer multiples of the per-occurrence terms; unmodeled bigrams drop") {
    import TestSpark.spark.implicits._
    val model = Map("ab" -> 3L, "ba" -> 1L)
    val out = Seq("ababcx").toDF("text")
      .select(GraftColumnBridge.column(BigramLmScore(
        GraftColumnBridge.expression(col("text")), model)).as("sc"))
      .select("sc.n_bigrams", "sc.s").as[(Long, Double)].head()
    // windows: ab, ba, ab, bc, cx — bc/cx unmodeled, so n = 3 and
    // s = 2·round12(ln 4) + 1·round12(ln 2), summed exactly
    assert(out._1 == 3L)
    val want = round12(math.log(4.0)).multiply(java.math.BigDecimal.valueOf(2))
      .add(round12(math.log(2.0))).doubleValue()
    assert(out._2 == want, s"${out._2} vs $want")
  }

  test("scoring plan: one narrow projection, zero Exchange before the sort") {
    import TestSpark.spark.implicits._
    val df = Seq((1L, "abab"), (2L, "baba")).toDF("doc_id", "text")
      .select(col("doc_id"), GraftColumnBridge.column(BigramLmScore(
        GraftColumnBridge.expression(col("text")), Map("ab" -> 1L))).as("sc"))
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan)
  }
}
