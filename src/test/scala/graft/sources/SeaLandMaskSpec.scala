package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid

/**
 * formatSeaLandMask vs a hand-derived coastline scene
 * (InputDataFormatting.groovy:1222-1474 semantics): zone [0,300]², two
 * coastlines x=100 (drawn northward: sea to its EAST) and x=220 (drawn
 * southward: sea to its WEST), a water pond [20,60]² on the land side.
 * Expected faces: pond = water; [100,220] strip = sea (receives both
 * seaward midpoints); west land ring (minus pond) and east strip = land.
 */
class SeaLandMaskSpec extends SparkTestBase {
  import spark.implicits._
  private val grid = CellGrid.fixture

  test("coastline scene: water pond, sea strip, two land faces") {
    val zone = Seq(1).toDF("id_zone")
      .withColumn("the_geom", G.stGeomFromWkt(lit("POLYGON((0 0, 300 0, 300 300, 0 300, 0 0))")))
    val coastline = Seq(
      (1, "coastline", "LINESTRING(100 -10, 100 310)"),
      (1, "coastline", "LINESTRING(220 310, 220 -10)"),
      (1, "water", "LINESTRING(0 -50, 300 -50)")) // non-coastline: filtered
      .toDF("id_zone", "natural", "wkt")
      .withColumn("the_geom", G.stGeomFromWkt($"wkt")).drop("wkt")
    val water = Seq((1, "water", "POLYGON((20 20, 60 20, 60 60, 20 60, 20 20))"),
      (1, "sea", "POLYGON((110 20, 130 20, 130 40, 110 40, 110 20))")) // type!=water: no water evidence, but in the mesh
      .toDF("id_zone", "type", "wkt")
      .withColumn("the_geom", G.stGeomFromWkt($"wkt")).drop("wkt")
    val out = OsmLayers.formatSeaLandMask(coastline, zone, Some(water), "id_zone", grid, 8)
      .select($"id", $"type", G.stArea($"the_geom").as("area"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
    val byType = out.groupBy(_._2).view.mapValues(_.map(_._3).sorted.toSeq).toMap
    def ~=(a: Seq[Double], b: Seq[Double]) =
      a.size == b.size && a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-6 }
    // pond face flips to water
    assert(~=(byType("water"), Seq(1600.0)))
    // the [100,220] strip (minus the enclosed type='sea' rect face, which
    // receives no evidence point and stays land) gets both seaward midpoints
    assert(~=(byType("sea"), Seq(120 * 299.98 - 400)))
    // land: the evidence-free sea-rect face, east strip, west ring minus pond
    assert(~=(byType("land"), Seq(400.0, 79.99 * 299.98, 99.99 * 299.98 - 1600).sorted))
    // ids are dense 1..5
    assert(out.map(_._1).sorted.toSeq == (1 to 5))
  }

  test("prepareTSUData consumes the mask: land faces join the TSU line mesh") {
    val zone = Seq(1).toDF("id_zone")
      .withColumn("the_geom", G.stGeomFromWkt(lit("POLYGON((0 0, 300 0, 300 300, 0 300, 0 0))")))
    val coastline = Seq((1, "coastline", "LINESTRING(100 -10, 100 310)"))
      .toDF("id_zone", "natural", "wkt")
      .withColumn("the_geom", G.stGeomFromWkt($"wkt")).drop("wkt")
    val mask = OsmLayers.formatSeaLandMask(coastline, zone, None, "id_zone", grid, 8)
    assert(mask.select("type").distinct().as[String].collect().toSet == Set("land", "sea"))
    val withMask = graft.operators.SpatialUnits.prepareTSUData(
      zone.select("the_geom"), None, None, None, None,
      Some(mask.select("type", "the_geom")), None, 10, 20, 60, grid, 8)
    val without = graft.operators.SpatialUnits.prepareTSUData(
      zone.select("the_geom"), None, None, None, None, None, None, 10, 20, 60, grid, 8)
    // the land face's boundary (the coastline-split half of the zone) is in
    // the mesh: strictly more linework than the zone outline alone
    assert(withMask.count() == without.count() + 1)
    val tsu = graft.operators.SpatialUnits.createTSU(
      withMask.withColumn("id_zone", lit(1)), "id_zone", "the_geom")
    assert(tsu.count() == 2) // coastline splits the zone into two faces
  }

  test("no coastline, no water -> one whole-zone land face (reference no-water branch)") {
    val zone = Seq(1).toDF("id_zone")
      .withColumn("the_geom", G.stGeomFromWkt(lit("POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))")))
    val coastline = Seq((1, "water", "LINESTRING(0 0, 10 10)")) // filtered out
      .toDF("id_zone", "natural", "wkt")
      .withColumn("the_geom", G.stGeomFromWkt($"wkt")).drop("wkt")
    val out = OsmLayers.formatSeaLandMask(coastline, zone, None, "id_zone", grid, 8)
      .select($"type", G.stArea($"the_geom").as("a")).collect()
    assert(out.length == 1 && out(0).getString(0) == "land"
      && math.abs(out(0).getDouble(1) - 9.98 * 9.98) < 1e-9)
  }
}
