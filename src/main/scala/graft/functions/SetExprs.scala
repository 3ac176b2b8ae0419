package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `graft_intersect_size(a, b)` — |A ∩ B| for two distinct-element
  * long arrays, as a native sort-merge count. Replaces
  * `size(array_intersect(a, b))` in the pairwise-similarity hot path
  * (one call per candidate pair); the builtin allocates an
  * intermediate array and runs on the interpreted HOF path.
  */
case class IntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_intersect_size"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_intersect_size expects array<bigint>, got ${l.simpleString}/${r.simpleString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectSize.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.IntersectSize.count($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object IntersectSize {
  /** Copy to a long[]; sort only if not already sorted. Callers in the
    * pair-similarity path pre-sort their shingle arrays ONCE per
    * document (sortedness check is O(n), a per-pair sort is
    * O(n log n) × pairs — the dominant cost at scale).
    */
  private def sortedLongs(a: ArrayData): Array[Long] = {
    val x = a.toLongArray()
    var i = 1
    while (i < x.length && x(i - 1) <= x(i)) i += 1
    if (i < x.length) java.util.Arrays.sort(x)
    x
  }

  def count(a: ArrayData, b: ArrayData): Long = {
    val x = sortedLongs(a)
    val y = sortedLongs(b)
    var i = 0
    var j = 0
    var n = 0L
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { n += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    n
  }
}

/** `graft_winnow(text)` — winnowing fingerprints (k=8 char-grams,
  * window 4): rolling 31-poly hashes, per-window minima, distinct +
  * sorted. Native form of `XSql.winnow(XSql.kgramHashes(text, 8), 4)`
  * — same arithmetic, so the DuckDB oracle (which runs the lambda
  * form) matches bit-for-bit.
  */
case class Winnow(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    Winnow.fingerprints(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Winnow.fingerprints($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Winnow {
  val K = 8
  val W = 4

  def fingerprints(s: UTF8String): ArrayData = {
    val str = s.toString
    val nk = str.length - (K - 1)
    if (nk <= 0) return new GenericArrayData(Array.emptyLongArray)
    // k-gram hashes, identical to charHash(substr(text, i+1, K))
    val kh = new Array[Long](nk)
    var i = 0
    while (i < nk) {
      var acc = XSql.H0
      var j = 0
      while (j < K) {
        // ASCII-safe: codePointAt == charAt for the corpus; use
        // codePointAt to match CharPolyHash on any input
        val cp = str.codePointAt(i + j)
        acc = (acc * XSql.CharM + cp) % XSql.P
        j += 1
      }
      kh(i) = acc
      i += 1
    }
    val nw = nk - (W - 1)
    if (nw <= 0) return new GenericArrayData(Array.emptyLongArray)
    val mins = new Array[Long](nw)
    i = 0
    while (i < nw) {
      var mn = kh(i)
      var j = 1
      while (j < W) { if (kh(i + j) < mn) mn = kh(i + j); j += 1 }
      mins(i) = mn
      i += 1
    }
    val distinct = mins.distinct
    java.util.Arrays.sort(distinct)
    new GenericArrayData(distinct)
  }
}
