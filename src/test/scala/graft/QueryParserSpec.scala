package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.query._

class QueryParserSpec extends AnyFunSuite {

  test("point cut (HOWTO.md:75)") {
    assert(QueryParser.parseCut("institution:Bielefeld U") ===
      PointCut("institution", "Bielefeld U"))
  }

  test("range cut, closed and open ends (HOWTO.md:79)") {
    assert(QueryParser.parseCut("period:2014~2016") ===
      RangeCut("period", Some("2014"), Some("2016")))
    assert(QueryParser.parseCut("period:~2016") ===
      RangeCut("period", None, Some("2016")))
    assert(QueryParser.parseCut("period:2014~") ===
      RangeCut("period", Some("2014"), None))
  }

  test("conjunctive multi-cut (HOWTO.md:89)") {
    assert(QueryParser.parseCuts("country:GBR|is_hybrid:TRUE") ===
      Seq(PointCut("country", "GBR"), PointCut("is_hybrid", "TRUE")))
  }

  test("set cut and negation (cubes dialect)") {
    assert(QueryParser.parseCut("country:GBR;DEU") ===
      SetCut("country", Seq("GBR", "DEU")))
    assert(QueryParser.parseCut("!country:GBR") ===
      PointCut("country", "GBR", invert = true))
  }

  test("orders") {
    assert(QueryParser.parseOrders("apc_amount_sum") === Seq(Order("apc_amount_sum")))
    assert(QueryParser.parseOrders("a:desc,b") === Seq(Order("a", desc = true), Order("b")))
  }

  test("pagination requires both params (HOWTO.md:15)") {
    intercept[IllegalArgumentException] {
      QueryParser.parse(Map("page" -> "0"))
    }
    assert(QueryParser.parse(Map("page" -> "1", "pagesize" -> "10")).page ===
      Some(Page(1, 10)))
  }

  test("colon in value stays in value (only first colon splits)") {
    assert(QueryParser.parseCut("doi:10.1234/x:y") === PointCut("doi", "10.1234/x:y"))
  }

  private val dimGen = Gen.identifier.suchThat(_.nonEmpty).map(_.take(12))
  private val valGen = Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(12))
  private val cutGen: Gen[Cut] = Gen.oneOf(
    for { d <- dimGen; v <- valGen; i <- Gen.oneOf(true, false) } yield PointCut(d, v, i),
    for { d <- dimGen; l <- Gen.choose(0, 5000); h <- Gen.choose(5001, 9999) }
      yield RangeCut(d, Some(l.toString), Some(h.toString)),
    // ≥2 members: a single-member set renders as `dim:v`, which correctly
    // parses back as the semantically-equal PointCut
    for { d <- dimGen; v1 <- valGen; vs <- Gen.nonEmptyListOf(valGen).map(_.take(3)) }
      yield SetCut(d, v1 +: vs))

  test("property: parse(render(cuts)) == cuts (200 samples)") {
    val listGen = Gen.nonEmptyListOf(cutGen).map(_.take(5))
    (0 until 200).foreach { i =>
      listGen(Gen.Parameters.default, Seed(42L + i)).foreach { cuts =>
        val rendered = CubeQuery(cuts = cuts).renderCut
        assert(QueryParser.parseCuts(rendered) === cuts, s"seed ${42L + i}")
      }
    }
  }
}
