package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_char_hash(s)` — the engine's 31-polynomial codepoint hash
  * (h = fold(codepoints, 7, (acc, c) -> (acc*31 + c) mod 1e9+7)) as a
  * native codegen expression.
  *
  * Semantically identical to the `aggregate(transform(split(s, ''),
  * ...))` lambda chain the cross-engine spec pins (XSqlSpec), but it
  * runs as a single generated static call instead of building a
  * per-row char array and interpreting two lambdas. Every text
  * operator (dedup shingles, winnowing, token stats) hashes through
  * this, so it is the hottest scalar in the text path.
  */
case class CharPolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_char_hash"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_char_hash expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    CharPolyHash.hash(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharPolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharPolyHash {
  /** Static entry point shared by interpreted eval and generated code.
    * Iterates unicode code points (matches DuckDB's
    * string_split(s, '') + unicode(c) on the oracle side).
    */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = XSql.H0
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * XSql.CharM + cp) % XSql.P
      i += Character.charCount(cp)
    }
    acc
  }
}
