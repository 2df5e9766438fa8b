package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{Geo, GeoFunctions => G}

/**
 * Shapefile source vs the reference's OWN BDTopo sample commune (read-only
 * real-world data, bdtopo/src/test/resources/.../sample_12174): record
 * counts per layer, JTS area total vs an independent shoelace computation
 * (1591959.474365 for the 10481 buildings incl. 35 hole rings), attribute
 * values, plus a hand-built polygon-with-hole record for the ring rule.
 */
class ShapefileSpec extends SparkTestBase {

  private val base =
    "/root/reference/bdtopo/src/test/resources/org/orbisgis/geoclimate/bdtopo/v2/sample_12174/"

  test("BDTopo sample layers: counts, areas, attributes") {
    val bati = Shapefile.read(spark, base + "BATI_INDIFFERENCIE.shp").localCheckpoint()
    assert(bati.count() == 10481)
    val area = bati.agg(sum(G.stArea(col("the_geom")))).head().getDouble(0)
    assert(math.abs(area - 1591959.474365) < 0.1) // independent shoelace, different summation order
    val first = bati.where(Shapefile.attr("id") === "BATIMENT0000000060614263")
      .select(Shapefile.attr("hauteur").cast("double"), Shapefile.attr("origin_bat"))
      .head()
    assert(first.getDouble(0) == 4.0 && first.getString(1) == "Autre")
    assert(Shapefile.read(spark, base + "ROUTE.shp").count() == 4981)        // PolyLineZ
    assert(Shapefile.read(spark, base + "SURFACE_EAU.shp").count() == 92)    // PolygonZ
    assert(Shapefile.read(spark, base + "ZONE_VEGETATION.shp").count() == 2325) // Polygon
  }

  test("hand-built polygon-with-hole record follows the CW-shell/CCW-hole rule") {
    // shell [0,10]² clockwise, hole [2,4]² counter-clockwise
    val shell = Seq((0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0), (0.0, 0.0))
    val hole = Seq((2.0, 2.0), (4.0, 2.0), (4.0, 4.0), (2.0, 4.0), (2.0, 2.0))
    val pts = shell ++ hole
    val content = ByteBuffer.allocate(4 + 32 + 8 + 8 + 16 * pts.size)
      .order(ByteOrder.LITTLE_ENDIAN)
    content.putInt(5) // Polygon
    Seq(0.0, 0.0, 10.0, 10.0).foreach(content.putDouble) // box
    content.putInt(2).putInt(pts.size) // numParts, numPoints
    content.putInt(0).putInt(shell.size) // part offsets
    pts.foreach { case (x, y) => content.putDouble(x).putDouble(y) }
    val rec = content.array()
    val file = ByteBuffer.allocate(100 + 8 + rec.length)
    file.order(ByteOrder.BIG_ENDIAN).putInt(0, 9994)
    file.position(100)
    file.order(ByteOrder.BIG_ENDIAN).putInt(1).putInt(rec.length / 2)
    file.put(rec)
    val gs = Shapefile.parseShp(file.array())
    assert(gs.size == 1)
    val g = Geo.fromWkb(gs.head)
    assert(g.getGeometryType == "Polygon")
    assert(g.getArea == 100.0 - 4.0)
    assert(g.asInstanceOf[org.locationtech.jts.geom.Polygon].getNumInteriorRing == 1)
  }
}
