package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{Geo, GeoFunctions => G}
import graft.index.CellGrid

/** pointInPolygonCompact ≡ pointInPolygon ≡ brute-force JTS, including a
  * polygon large enough that compaction emits multiple resolutions. */
class CompactPipSpec extends SparkTestBase {
  import spark.implicits._
  private val grid = CellGrid.fixture

  test("compact-cover PIP equals fixed-res PIP and brute force") {
    val rnd = new scala.util.Random(11)
    val pts = Seq.tabulate(4000)(i =>
      (i.toLong, rnd.nextDouble() * 1200 - 100, rnd.nextDouble() * 1200 - 100))
      .toDF("pid", "x", "y")
    // one big polygon (many interior cells at res 10) + a small one + an L-shape
    val polys = Seq(
      (1, "POLYGON((0 0, 1000 0, 1000 800, 0 800, 0 0))"),
      (2, "POLYGON((-90 -90, -40 -90, -40 -40, -90 -40, -90 -90))"),
      (3, "POLYGON((0 850, 600 850, 600 950, 300 950, 300 1100, 0 1100, 0 850))"))
      .toDF("poly_id", "wkt")
      .withColumn("the_geom", G.stGeomFromWkt($"wkt")).drop("wkt")

    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("pid", "poly_id").as[(Long, Int)].collect().toSet

    val fixed = pairs(SpatialJoin.pointInPolygon(pts, "x", "y", polys, "the_geom", grid, 10))
    val compact = pairs(SpatialJoin.pointInPolygonCompact(pts, "x", "y", polys, "the_geom", grid, 10))
    val compactShuffle = pairs(SpatialJoin.pointInPolygonCompact(
      pts, "x", "y", polys, "the_geom", grid, 10, broadcastPolys = false))

    // brute force
    val polyRows = polys.select("poly_id", "the_geom")
      .as[(Int, Array[Byte])].collect()
      .map { case (id, wkb) => (id, org.locationtech.jts.geom.prep.PreparedGeometryFactory.prepare(Geo.fromWkb(wkb))) }
    val ptRows = pts.as[(Long, Double, Double)].collect()
    val brute = (for {
      (pid, x, y) <- ptRows
      (polyId, prep) <- polyRows
      if prep.contains(Geo.point(x, y))
    } yield (pid, polyId)).toSet

    assert(fixed == brute)
    assert(compact == brute)
    assert(compactShuffle == brute)
    assert(brute.nonEmpty)
  }

  test("world-border regression: clamped out-of-bounds points never match " +
    "a polygon that covers the border cell") {
    // polygon extends PAST the world edge, so it containsProperly world-
    // border cells; an out-of-world point clamps into those cells and the
    // interior fast path would emit it without refinement (round-1 ADVICE)
    val edge = grid.minX + grid.worldSize // 16384
    val poly = Seq((1, Geo.toWkb(Geo.box(edge - 100, edge - 100, edge + 5000, edge + 5000))))
      .toDF("poly_id", "the_geom")
    val pts = Seq(
      (1L, edge - 50.0, edge - 50.0),   // genuinely inside
      (2L, edge + 9000.0, edge + 9000.0), // outside polygon AND world -> clamps
      (3L, edge - 200.0, edge - 200.0))  // in-world, outside polygon
      .toDF("pid", "x", "y")
    def got(df: org.apache.spark.sql.DataFrame) =
      df.select("pid").as[Long].collect().toSet
    // point 2 is outside the polygon (> edge+5000) but its clamped border
    // cell IS containsProperly-covered — border cells must always refine
    assert(got(SpatialJoin.pointInPolygon(pts, "x", "y", poly, "the_geom", grid, 10)) == Set(1L))
    assert(got(SpatialJoin.pointInPolygonCompact(pts, "x", "y", poly, "the_geom", grid, 10)) == Set(1L))
  }
}
