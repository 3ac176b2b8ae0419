package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.types.Decimal
import org.apache.spark.unsafe.types.UTF8String

/** `graft_bigram_counts(s)` — the distinct character bigrams of a
  * document with their occurrence counts, as one row-local generated
  * call: `array<struct<bg:string, n:long>>`.
  *
  * This is t28's model-build primitive (the CCNet-style statistical
  * quality filter trains a char-bigram LM on the corpus itself,
  * reference quality-filter shape; cf. data_preparation/cleaning in
  * the reference pipeline). The naive formulation explodes text to
  * one row per character POSITION (≈ text bytes) twice — once to
  * train, once to score. This expression pre-aggregates inside the
  * row, so the only thing that ever leaves the projection is the
  * per-doc distinct-bigram table (~alphabet², hundreds of rows per
  * doc vs thousands of positions), and the global model aggregate
  * that follows is map-side combinable down to the vocabulary size.
  *
  * Windows are consecutive Unicode code-point pairs — exactly the
  * `substr(text, i+1, 2)` windows of the oracle SQL (both engines
  * count code points), surrogate pairs kept whole.
  */
case class BigramCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BigramLm.countsSchema
  override def prettyName: String = "graft_bigram_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_counts expects string, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    BigramLm.counts(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramLm.counts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `BigramLmScore(text, model)` — per-document bigram-familiarity
  * score against a driver-trained model (bigram → corpus count),
  * computed row-locally: `struct(n_bigrams: long, s: double)` where
  * `n_bigrams` counts the document's model-matched bigram occurrences
  * and `s = Σ n_bg · round12(ln(c_bg + 1))` over its distinct
  * bigrams.
  *
  * Determinism contract (must hash-match the oracle's per-occurrence
  * `dsum(ln(c+1), 12)`): each distinct bigram's `ln(c+1)` is rounded
  * once to decimal(30,12) by Spark's own [[Decimal]] cast rule
  * (HALF_UP — the dsum discipline), then multiplied EXACTLY by the
  * occurrence count in BigDecimal space; an exact integer multiple of
  * the rounded term equals the decimal sum of that many per-occurrence
  * terms, and decimal addition is order-free, so the result is
  * bit-identical to the shuffled per-occurrence plan. Bigrams absent
  * from the model are excluded from BOTH `n_bigrams` and `s` (the
  * oracle's inner join).
  *
  * The model is a plain constructor value (vocabulary-bounded —
  * ≤ alphabet² entries — per the bounded-sample training discipline),
  * prepared once into a hash map of pre-rounded terms and shipped to
  * generated code as a reference object: one O(1) lookup per distinct
  * bigram, zero Exchange before the final sort.
  */
case class BigramLmScore(child: Expression, model: Map[String, Long])
    extends UnaryExpression {

  override def dataType: DataType = BigramLm.scoreSchema
  override def prettyName: String = "graft_bigram_lm_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_lm_score expects string, got ${child.dataType.simpleString}")

  @transient private lazy val prepared: java.util.HashMap[String, java.math.BigDecimal] =
    BigramLm.prepare(model)

  override def nullSafeEval(input: Any): Any =
    BigramLm.score(input.asInstanceOf[UTF8String], prepared)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramModel", prepared,
      "java.util.HashMap<String, java.math.BigDecimal>")
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramLm.score($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramLm {

  val countsSchema: DataType = ArrayType(StructType(Seq(
    StructField("bg", StringType, nullable = false),
    StructField("n", LongType, nullable = false))), containsNull = false)

  val scoreSchema: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("s", DoubleType, nullable = false)))

  /** Per-document distinct bigram counts over code-point windows. */
  private def localCounts(str: String): java.util.HashMap[String, Long] = {
    val m = new java.util.HashMap[String, Long](256)
    if (str.nonEmpty) {
      var i0 = 0
      var i1 = i0 + Character.charCount(str.codePointAt(i0))
      while (i1 < str.length) {
        val i2 = i1 + Character.charCount(str.codePointAt(i1))
        val bg = str.substring(i0, i2)
        m.merge(bg, 1L, (a, b) => a + b)
        i0 = i1
        i1 = i2
      }
    }
    m
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def counts(s: UTF8String): GenericArrayData = {
    val m = localCounts(s.toString)
    val out = new Array[Any](m.size)
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out(i) = InternalRow(UTF8String.fromString(e.getKey), e.getValue)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Driver-side model preparation: pre-round every bigram's
    * `ln(c+1)` term to decimal(30,12) once (the per-row hot path then
    * only multiplies and adds exactly).
    */
  def prepare(model: Map[String, Long]): java.util.HashMap[String, java.math.BigDecimal] = {
    val m = new java.util.HashMap[String, java.math.BigDecimal](
      math.max(16, model.size * 2))
    model.foreach { case (bg, c) =>
      val term = Decimal(math.log(c + 1.0))
      term.changePrecision(30, 12)
      m.put(bg, term.toJavaBigDecimal)
    }
    m
  }

  /** Static entry point shared by interpreted eval and generated code. */
  def score(s: UTF8String,
      model: java.util.HashMap[String, java.math.BigDecimal]): InternalRow = {
    val local = localCounts(s.toString)
    var n = 0L
    var acc = java.math.BigDecimal.ZERO
    val it = local.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val term = model.get(e.getKey)
      if (term != null) { // inner-join semantics: unmodeled bigrams drop
        n += e.getValue
        acc = acc.add(term.multiply(java.math.BigDecimal.valueOf(e.getValue)))
      }
    }
    InternalRow(n, acc.doubleValue())
  }
}
