package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.locationtech.jts.geom.{Coordinate, Envelope, GeometryFactory}

/** Overpass QL generation vs the reference's OWN golden strings
  * (osmtools UtilitiesTest.groovy:209-400) — byte-for-byte. */
class OverpassQuerySpec extends AnyFunSuite {
  import OverpassQuery._

  private val f = new GeometryFactory()
  private def rect(x0: Double, y0: Double, x1: Double, y1: Double) =
    f.createPolygon(Array(new Coordinate(x0, y0), new Coordinate(x1, y0),
      new Coordinate(x1, y1), new Coordinate(x0, y1), new Coordinate(x0, y0)))

  test("toBBox: point / polygon goldens (UtilitiesTest:223-225)") {
    assert(toBBox(f.createPoint(new Coordinate(1.3, 7.7))) == "(bbox:7.7,1.3,7.7,1.3)")
    assert(toBBox(rect(2.0, 2.0, 4.0, 4.0)) == "(bbox:2.0,2.0,4.0,4.0)")
  }

  test("toPoly: exterior-ring y-x pairs, closing coordinate dropped (:249)") {
    assert(toPoly(rect(2.0, 2.0, 4.0, 4.0)) ==
      "(poly:\"2.0 2.0 2.0 4.0 4.0 4.0 4.0 2.0\")")
    intercept[IllegalArgumentException] { toPoly(f.createPoint(new Coordinate(0, 0))) }
    intercept[IllegalArgumentException] { toPoly(f.createPolygon()) }
  }

  test("buildQuery(envelope): key x element grid + completions (:270-305)") {
    val env = new Envelope(0.0, 2.3, 7.6, 8.9)
    assert(buildQuery(env, Seq("building", "water"), Seq(Node, Way)) ==
      "[bbox:7.6,0.0,8.9,2.3];\n(\n\tnode[\"building\"];\n\tnode[\"water\"];\n" +
        "\tway[\"building\"];\n\tway[\"water\"];\n);\n(._;>;);\nout;")
    assert(buildQuery(env, Seq("building")) ==
      "[bbox:7.6,0.0,8.9,2.3];\n(\n\tnode[\"building\"];\n\tway[\"building\"];\n" +
        "\trelation[\"building\"];\n);\n(._;>;);\nout;")
    // varargs-null elements: empty union, completion kept
    assert(buildQuery(env, Seq("building", "water"), Nil) ==
      "[bbox:7.6,0.0,8.9,2.3];\n(\n);\n(._;>;);\nout;")
    assert(buildQuery(env, Nil, Seq(Node, Way)) ==
      "[bbox:7.6,0.0,8.9,2.3];\n(\n\tnode;\n\tway;\n);\n(._;>;);\nout;")
  }

  test("buildQueryWithAllData: ((...);>;); completion (:313-335)") {
    val env = new Envelope(0.0, 2.3, 7.6, 8.9)
    assert(buildQueryWithAllData(env, Seq("building", "water"), Seq(Node, Way)) ==
      "[bbox:7.6,0.0,8.9,2.3];\n((\n\tnode[\"building\"];\n\tnode[\"water\"];\n" +
        "\tway[\"building\"];\n\tway[\"water\"];\n);\n>;);\nout;")
    assert(buildQueryWithAllData(env, Seq("building", "water")) ==
      "[bbox:7.6,0.0,8.9,2.3];\n((\n);\n>;);\nout;")
    assert(buildQueryWithAllData(env, Nil, Seq(Node, Way)) ==
      "[bbox:7.6,0.0,8.9,2.3];\n((\n\tnode;\n\tway;\n);\n>;);\nout;")
  }

  test("buildQuery(polygon): per-line poly filter + nokeys quirk (:361-380)") {
    val polygon = rect(0.0, 2.3, 7.6, 8.9)
    val p = "(poly:\"2.3 0.0 2.3 7.6 8.9 7.6 8.9 0.0\")"
    assert(buildQuery(polygon, Seq("building", "water"), Seq(Node, Way)) ==
      s"""[bbox:2.3,0.0,8.9,7.6];\n(\n\tnode["building"]$p;\n\tnode["water"]$p;\n""" +
        s"""\tway["building"]$p;\n\tway["water"]$p;\n);\n(._;>;);\nout;""")
    assert(buildQuery(polygon, Seq("building")) ==
      s"""[bbox:2.3,0.0,8.9,7.6];\n(\n\tnode["building"]$p;\n\tway["building"]$p;\n""" +
        s"""\trelation["building"]$p;\n);\n(._;>;);\nout;""")
    // keyless non-empty element list: plain `out;` (reference nokeys branch)
    assert(buildQuery(polygon, Nil, Seq(Node)) ==
      s"[bbox:2.3,0.0,8.9,7.6];\n(\n\tnode$p;\n);\nout;")
  }

  test("buildQuery(location list): 4-value bbox form (south west north east)") {
    assert(buildQuery(Seq(7.6, 0.0, 8.9, 2.3), Seq("building"), Seq(Node)) ==
      "[bbox:7.6,0.0,8.9,2.3];\n(\n\tnode[\"building\"];\n);\n(._;>;);\nout;")
  }
}
