package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

package object queries {

  /** A catalog entry: a named DataFrame-producing query over the
    * scale-factor directory, plus (when SQL-expressible) the equivalent
    * ANSI SQL the DuckDB oracle runs on the same parquet tables.
    */
  final case class Q(
      name: String,
      doc: String,
      run: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  object Q {
    def apply(name: String, doc: String, oracle: String)(
        run: (SparkSession, String) => DataFrame): Q =
      Q(name, doc, run, Some(oracle))
    // no `noOracle` constructor: CatalogContractSpec holds the line
    // that every query ships an oracle — nondeterministic ops state a
    // STRUCTURAL oracle instead (see f16_uuid)
  }

  /** Deterministic cross-engine double sum: casting to decimal before
    * summing makes the aggregate independent of partial-aggregation
    * order (plain double sums differ in low-order bits between Spark
    * and DuckDB because addition order differs). Casting the exact
    * decimal total back to double is itself deterministic, so both
    * engines produce bit-identical doubles. At scale this is also the
    * honest answer for money columns: decimal partials are exact and
    * still map-side combinable.
    */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(30, scale))).cast(DoubleType)

  /** Oracle-side twin of [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"cast(sum(cast($expr as decimal(30,$scale))) as double)"

  /** Deterministic average: exact decimal sum divided by count in
    * double space (one IEEE division — identical in both engines).
    */
  def davg(c: Column, scale: Int = 2): Column =
    (sum(c.cast(DecimalType(30, scale))).cast(DoubleType) /
      count(c).cast(DoubleType))

  def davgSql(expr: String, scale: Int = 2): String =
    s"(cast(sum(cast($expr as decimal(30,$scale))) as double) / cast(count($expr) as double))"

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)
}
