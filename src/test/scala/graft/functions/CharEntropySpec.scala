package graft.functions

import graft.SparkSpec
import graft.queries.dsum
import org.apache.spark.sql.functions._

/** graft_char_entropy must be bit-identical to the explode + (doc,char)
  * count + dsum(k·ln k, 12) formulation it replaced — that formulation
  * is what the DuckDB oracle still runs.
  */
class CharEntropySpec extends SparkSpec {

  private def both(texts: Seq[String]) = {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val naive = df
      .select(col("doc_id"), explode(split(col("text"), "")).as("c"))
      .groupBy("doc_id", "c").agg(count(lit(1)).as("k"))
      .groupBy("doc_id")
      .agg(sum("k").as("n"), count(lit(1)).as("n_distinct"),
        dsum(col("k").cast("double") * log(col("k").cast("double")), 12).as("s"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val native = df
      .select(col("doc_id"), expr("graft_char_entropy(text)").as("e"))
      .select(col("doc_id"), col("e.n"), col("e.n_distinct"), col("e.s"))
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    (naive, native)
  }

  test("matches the shuffled dsum formulation bit-for-bit") {
    val texts = Seq(
      "hello world",
      "aaaaaaaaaa",
      "x",
      "The quick brown fox jumps over the lazy dog 0123456789!?.,;",
      "ababababababababababab",
      "mixed éèü unicode 你好 text",
      // surrogate pair (U+1F600) must count as ONE code point, twice
      "a😀b😀")
    val (naive, native) = both(texts)
    assert(native.toSeq == naive.toSeq)
  }

  test("empty text counts as one empty-string char, matching split('','') = ['']") {
    val (naive, native) = both(Seq("abc", "", "def"))
    assert(native.length == 3 && naive.length == 3)
    assert(native.toSeq == naive.toSeq)
  }

  test("surrogate pairs count as single code points") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val r = Seq(("😀😀")).toDF("text")
      .select(expr("graft_char_entropy(text)").as("e"))
      .select(col("e.n"), col("e.n_distinct")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L)
  }
}
