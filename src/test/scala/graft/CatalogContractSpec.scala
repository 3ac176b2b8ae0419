package graft

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

/** Contracts every catalog entry must honor for the driver's
  * correctness gate (the round-1 failure class: the driver compares
  * results with pandas, which cannot sort/hash array, map, or struct
  * cells — a query emitting one passes every local test and then
  * silently fails the real gate).
  */
class CatalogContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  test("every catalog query output schema is scalar-only") {
    // building the DataFrame runs analysis (schema) without executing
    // a job for pure queries; sink-backed queries do their small
    // writes at sf0.001
    val offenders = SparkEntry.catalog.flatMap { q =>
      val schema = q.run(spark, sfDir).schema
      val bad = schema.fields.filter(f => f.dataType match {
        case _: ArrayType | _: MapType | _: StructType => true
        case _ => false
      })
      if (bad.isEmpty) None
      else Some(s"${q.name}: ${bad.map(f => s"${f.name}:${f.dataType.simpleString}").mkString(", ")}")
    }
    assert(offenders.isEmpty,
      s"non-scalar output columns (driver gate would crash):\n${offenders.mkString("\n")}")
  }

  test("approx_count_distinct tracks exact counts (the documented scale option for A2)") {
    // SURVEY §2.4: COUNT(DISTINCT) is exact in the reference;
    // approx_count_distinct is the 100 TB alternative — HLL sketches
    // are map-side combinable and shuffle O(sketch) instead of
    // O(distinct values). Not oracle-checkable (DuckDB's HLL differs),
    // so the contract is relative error on real data here.
    import org.apache.spark.sql.functions.{approx_count_distinct, countDistinct, col}
    val ev = Tables.load(spark, sfDir, "events")
    val row = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile tracks exact percentiles (a14's documented scale path)") {
    // exact percentiles need each group's values together; the
    // huge-cardinality alternative is the t-digest sketch
    // (approx_percentile), which is map-side mergeable. Not
    // oracle-checkable (sketch internals differ per engine), so the
    // contract is bounded error on real data.
    import org.apache.spark.sql.functions.{col, expr}
    val c = Tables.load(spark, sfDir, "customer")
    val row = c.agg(
      expr("percentile(c_acctbal, 0.5)").as("exact"),
      expr("approx_percentile(c_acctbal, 0.5, 1000)").as("approx")).head()
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    val span = c.agg(expr("max(c_acctbal) - min(c_acctbal)")).head().getDouble(0)
    assert(math.abs(approx - exact) / span <= 0.02,
      s"approx=$approx exact=$exact span=$span")
  }

  test("every catalog query has an oracle") {
    // rows-only checks are a weaker gate; the whole catalog is
    // SQL-expressible today, so hold that line
    val missing = SparkEntry.catalog.filter(_.oracle.isEmpty).map(_.name)
    assert(missing.isEmpty, s"queries without oracle SQL: ${missing.mkString(", ")}")
  }

  test("catalog names are unique and well-formed") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size == names.size)
    names.foreach(n => assert(n.matches("[a-z0-9_]+"), s"odd query name: $n"))
  }
}
