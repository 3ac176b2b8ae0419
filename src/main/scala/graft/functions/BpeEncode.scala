package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_bpe_stats(words, merges)` — the corpus-wide BPE encode
  * accounting (t32/t34) as one native row-local call:
  * `struct(n_tokens, n_chars)` summed over a document's word array
  * under the trained merge list.
  *
  * Semantics are EXACTLY the SQL replace-chain the DuckDB oracle runs
  * (TextOps.sumTokens): each word becomes its space-joined CODE-POINT
  * sequence, every merge pair applies as a space-anchored
  * leftmost-non-overlapping replace in training order (Java
  * `String.replace` scans left to right and resumes after the
  * replacement — the same contract as Spark's `UTF8String.replace`
  * and DuckDB's `replace`), and the token count is the split size of
  * the final sequence. `n_chars` is the per-word code-point total
  * (the one-symbol-per-char baseline).
  *
  * Why native: the expression-level formulation is a higher-order
  * fold over a per-word lambda chaining N replaces — interpreted,
  * ~per-word allocation-heavy, and the measured worst scale ratio in
  * the doc-family audit (t32 at 3.5× for 10× data). This call keeps
  * whole-stage codegen intact and does the same work in plain JVM
  * string ops.
  */
case class BpeStats(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_chars", LongType, nullable = false)))

  override def prettyName: String = "graft_bpe_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe_stats expects (array<string>, array<string>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }

  override def nullSafeEval(w: Any, m: Any): Any =
    BpeStats.stats(w.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (w, m) => s"graft.functions.BpeStats.stats($w, $m)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object BpeStats {

  def stats(words: ArrayData, merges: ArrayData): InternalRow = {
    val nm = merges.numElements()
    val pairs = new Array[String](nm)
    val fused = new Array[String](nm)
    var j = 0
    while (j < nm) {
      val p = merges.getUTF8String(j).toString
      pairs(j) = " " + p + " "
      fused(j) = " " + p.replace(" ", "") + " "
      j += 1
    }
    var tokens = 0L
    var chars = 0L
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i).toString
      // code-point split, space-joined — the chars() baseline
      val sb = new java.lang.StringBuilder(w.length * 2 + 2)
      sb.append(' ')
      var nCp = 0L
      var k = 0
      while (k < w.length) {
        val cp = w.codePointAt(k)
        sb.appendCodePoint(cp)
        sb.append(' ')
        nCp += 1
        k += Character.charCount(cp)
      }
      chars += nCp
      var s = sb.toString
      j = 0
      while (j < nm) {
        s = s.replace(pairs(j), fused(j))
        j += 1
      }
      val t = s.trim
      // split size of the final sequence: "" splits to one empty token
      // in both engines' split(..., ' ') — count separators + 1
      var nTok = 1L
      var idx = t.indexOf(' ')
      while (idx >= 0) { nTok += 1; idx = t.indexOf(' ', idx + 1) }
      tokens += nTok
      i += 1
    }
    InternalRow(tokens, chars)
  }
}
