package graft.parse

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import BggParser._

/** Property tests for the parser (SURVEY §5): arbitrary nested shapes
  * never throw — every malformed input lands in the lenient-cast
  * fallbacks or the abort-to-None path, exactly like the reference's
  * blanket try/except.
  */
class ParserPropertySpec extends AnyFunSuite {

  /** Run a scalacheck property under ScalaTest (no scalatestplus
    * bridge in the offline dep set).
    */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(res.passed, res.status.toString)
  }

  private val ts = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")

  /** Generator for arbitrary xmltodict-shaped JSON. */
  private def jsonGen(depth: Int): Gen[String] =
    if (depth <= 0) scalarGen
    else Gen.frequency(
      3 -> scalarGen,
      2 -> Gen.listOfN(2, jsonGen(depth - 1)).map(_.mkString("[", ",", "]")),
      3 -> (for {
        keys <- Gen.someOf(Seq("@value", "@type", "@id", "name", "poll",
          "results", "result", "link", "statistics", "ratings", "rank",
          "yearpublished", "minplayers", "x"))
        vals <- Gen.listOfN(keys.size, jsonGen(depth - 1))
      } yield keys.zip(vals).map { case (k, v) => s""""$k": $v""" }
        .mkString("{", ",", "}")))

  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.chooseNum(-99999L, 99999L).map(_.toString),
    Gen.oneOf("\"0\"", "\"1995\"", "\"-7\"", "\"4+\"", "\"Best\"",
      "\"Not Ranked\"", "\"primary\"", "\"alternate\"", "\"garbage x\"",
      "\"7.5\"", "\"true\""),
    Gen.oneOf("null", "true", "false", "3.25"))

  test("safeInt / safeFloat never throw on any JSON shape") {
    check(Prop.forAll(jsonGen(3)) { js =>
      val n = parseJson(js)
      safeInt(n); safeFloat(n)
      true
    })
  }

  test("safeInt is non-negative for any string input; ints keep sign") {
    check(Prop.forAll(Gen.alphaNumStr) { s =>
      safeInt(parseJson("\"" + s + "\"")) >= 0
    })
    check(Prop.forAll(Gen.chooseNum(-99999L, 99999L)) { v =>
      safeInt(parseJson(v.toString)) == v
    })
  }

  test("extractYear returns None or a positive year, never throws") {
    check(Prop.forAll(jsonGen(2)) { js =>
      val item = parseJson(s"""{"yearpublished": $js}""")
      // non-str non-obj shapes raise in the reference (aborting the
      // game); mirror by only asserting the non-throwing domain
      val y = try Some(extractYear(item)) catch { case _: Throwable => None }
      y.forall(_.forall(_ > 0))
    })
  }

  test("processGame never throws: any payload parses to Some or None") {
    check(Prop.forAll(jsonGen(4)) { js =>
      val wrapped = s"""{"items": {"item": {"@id": "7", "body": $js}}}"""
      processGame(7L, wrapped, "boardgame", ts)
      processGame(7L, js, "boardgame", ts) // raw arbitrary shape too
      true
    })
  }

  test("processGame with arbitrary item fields still keyed correctly") {
    check(Prop.forAll(jsonGen(3)) { js =>
      val wrapped = s"""{"items": {"item": [{"@id": "7"}, $js]}}"""
      val r = processGame(7L, wrapped, "boardgame", ts)
      r.forall(_.game_id == 7L)
    })
  }
}
