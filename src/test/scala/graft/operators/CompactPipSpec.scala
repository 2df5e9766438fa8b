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
}
