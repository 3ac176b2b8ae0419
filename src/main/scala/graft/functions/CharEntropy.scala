package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_char_entropy(s)` — per-document character-histogram stats for
  * the Shannon-entropy quality signal (t30), computed row-locally as a
  * single generated static call: `struct(n, n_distinct, s)` where `n`
  * is the codepoint count, `n_distinct` the distinct-codepoint count,
  * and `s = Σ k·ln(k)` over the histogram.
  *
  * Scale rationale: the naive formulation explodes text to one row per
  * character and shuffles (doc_id, char) pairs — at 100 TB of text that
  * exchange is doc-count × distinct-chars rows for a quantity that is
  * entirely row-local. This expression keeps the whole computation
  * inside one narrow projection (no Exchange at all before the final
  * sort; PlanSpec-gated).
  *
  * Determinism contract (must hash-match DuckDB's
  * `sum(cast(k*ln(k) as decimal(30,12)))`): each per-char term is
  * rounded to decimal(30,12) via Spark's own [[Decimal]] cast rules
  * (HALF_UP — identical to the `dsum` aggregate the shuffled plan
  * used), the terms are summed exactly in BigDecimal space (order
  * cannot matter), and only the exact total is cast back to double.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharEntropy.schema
  override def prettyName: String = "graft_char_entropy"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_char_entropy expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropy {
  val schema: StructType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("s", DoubleType, nullable = false)))

  /** Static entry point shared by interpreted eval and generated code.
    * Iterates unicode code points (same boundaries as `split(s, '')` /
    * DuckDB `string_split(s, '')` — surrogate pairs stay whole).
    */
  def compute(s: UTF8String): InternalRow = {
    val str = s.toString
    // split('', '') yields [''] in both engines: empty text counts as
    // one occurrence of one "char" (the empty string), entropy 0
    if (str.isEmpty) return InternalRow(1L, 1L, 0.0)
    val hist = new scala.collection.mutable.LongMap[Long](64)
    var i = 0
    var n = 0L
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      val k = cp.toLong
      hist.update(k, hist.getOrElse(k, 0L) + 1L)
      n += 1L
      i += Character.charCount(cp)
    }
    var acc = java.math.BigDecimal.ZERO
    var nd = 0L
    hist.foreachValue { k =>
      nd += 1L
      if (k > 1L) { // ln(1) = 0 contributes an exact zero term
        val term = Decimal(k.toDouble * math.log(k.toDouble))
        // decimal(30,12) — the dsum discipline; overflow is impossible
        // for any real document (k ≤ 2^63, term < 1e21 needs k > 1e19)
        term.changePrecision(30, 12)
        acc = acc.add(term.toJavaBigDecimal)
      }
    }
    InternalRow(n, nd, acc.doubleValue())
  }
}
