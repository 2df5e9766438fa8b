package graft.sources

import org.locationtech.jts.geom.{Envelope, Geometry, Polygon}

/**
 * Overpass QL query generation — the pure-string half of the reference's
 * download path (osmtools/utils/Utilities.groovy: toBBox :323, toPoly :342,
 * buildOSMQuery envelope/list/polygon overloads :374-530,
 * buildOSMQueryWithAllData :458). The HTTP download itself stays
 * N/A-by-design offline; the query text a user would hand to Overpass is
 * generated with exact reference parity (the reference's own golden test
 * strings, UtilitiesTest.groovy:209-400, are reproduced in
 * OverpassQuerySpec). Number rendering matches: Groovy GString on a double
 * is Java `Double.toString`, which is what Scala interpolation emits.
 */
object OverpassQuery {

  sealed abstract class Element(val name: String)
  case object Node extends Element("node")
  case object Way extends Element("way")
  case object Relation extends Element("relation")
  val AllElements: Seq[Element] = Seq(Node, Way, Relation)

  /** `(bbox:minLat,minLon,maxLat,maxLon)` of any geometry's envelope. */
  def toBBox(g: Geometry): String = {
    require(g != null, "Cannot convert to an overpass bounding box.")
    val e = g.getEnvelopeInternal
    s"(bbox:${e.getMinY},${e.getMinX},${e.getMaxY},${e.getMaxX})"
  }

  /** `(poly:"lat lon lat lon …")` of a polygon's exterior ring (closing
    * coordinate dropped, reference coordinate order y x). */
  def toPoly(g: Geometry): String = {
    require(g != null, "Cannot convert to an overpass poly filter.")
    val poly = g match {
      case p: Polygon if !p.isEmpty => p
      case _ => throw new IllegalArgumentException("The input geometry must be polygon.")
    }
    val cs = poly.getExteriorRing.getCoordinates
    val body = cs.dropRight(1).map(c => s"${c.y} ${c.x}").mkString(" ")
    "(poly:\"" + body + "\")"
  }

  private def header(e: Envelope): String =
    s"[bbox:${e.getMinY},${e.getMinX},${e.getMaxY},${e.getMaxX}];\n"

  private def lines(keys: Seq[String], elements: Seq[Element], area: String): String =
    elements.map { el =>
      if (keys.isEmpty) s"\t${el.name}$area;\n"
      else keys.map(k => s"\t${el.name}[\"${k.toLowerCase}\"]$area;\n").mkString
    }.mkString

  /** buildOSMQuery(Envelope, keys, elements...) — recurse-down union +
    * `(._;>;);` completion. Null/absent element list = empty (the
    * reference's varargs-null no-op), NOT the 3-element default. */
  def buildQuery(env: Envelope, keys: Seq[String] = Nil,
                 elements: Seq[Element] = AllElements): String = {
    require(env != null, "Cannot create the overpass query from the bbox null.")
    header(env) + "(\n" + lines(keys, elements, "") + ");\n(._;>;);\nout;"
  }

  /** buildOSMQuery(List latLonCoordinates, …): the 4-value bbox / 3-value
    * point+distance location forms (geometryFromValues semantics — shared
    * with [[graft.workflow.ZoneExtract.parseInput]]'s location handling). */
  def buildQuery(latLon: Seq[Double], keys: Seq[String],
                 elements: Seq[Element]): String = {
    require(latLon != null && latLon.size == 4,
      "Cannot create the overpass query from the bbox.")
    // location order (south, west, north, east) -> envelope(minX.., minY..)
    val env = new Envelope(latLon(1), latLon(3), latLon(0), latLon(2))
    buildQuery(env, keys, elements)
  }

  /** buildOSMQuery(Polygon, …): bbox header + per-line poly filter; the
    * reference's `nokeys` quirk replicated — a keyless NON-EMPTY element
    * list ends with plain `out;` (the poly filter already bounds the data),
    * every other shape keeps the `(._;>;);` completion. */
  def buildQuery(polygon: Polygon, keys: Seq[String],
                 elements: Seq[Element]): String = {
    require(polygon != null && !polygon.isEmpty,
      "Cannot create the overpass query from an empty polygon.")
    val area = toPoly(polygon)
    val body = lines(keys, elements, area)
    val nokeys = elements.nonEmpty && keys.isEmpty
    header(polygon.getEnvelopeInternal) + "(\n" + body +
      (if (nokeys) ");\nout;" else ");\n(._;>;);\nout;")
  }

  def buildQuery(polygon: Polygon, keys: Seq[String]): String =
    buildQuery(polygon, keys, AllElements)

  /** buildOSMQueryWithAllData: `((…);\n>;);` completion downloads every
    * referenced child; NO default element list (reference varargs). */
  def buildQueryWithAllData(env: Envelope, keys: Seq[String],
                            elements: Seq[Element] = Nil): String = {
    require(env != null, "Cannot create the overpass query from the bbox null.")
    header(env) + "((\n" + lines(keys, elements, "") + ");\n>;);\nout;"
  }
}
