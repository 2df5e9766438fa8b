package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid

/** Rail/vegetation/water/urban gates that the analytic oracles exercise only
  * in aggregate: the subway tunnel/bridge rule, the pitch/sport flip, and
  * the removeOverlaps / withinToHoles utilities in isolation. */
class OsmLayers2Spec extends SparkTestBase {
  import spark.implicits._
  private val grid = CellGrid.fixture

  private val line = G.stGeomFromWkt(lit("LINESTRING(0 0, 10 0)"))

  test("rail subway gate: survives only as tunnel=no at zindex>=0 or on a bridge") {
    val raw = Seq(
      (1L, "subway", "no", null, null),      // tunnel=no, z0 -> kept
      (2L, "subway", "yes", null, null),     // tunnel=yes -> dropped
      (3L, "subway", null, "viaduct", null), // bridge viaduct -> kept, crossing lifts z
      (4L, "subway", null, null, null),      // neither -> dropped
      (5L, "subway", "no", null, "-1"),      // tunnel=no but z<0 -> type null -> dropped
      (6L, "rail", null, null, null))        // ordinary rail kept
      .toDF("id", "railway", "tunnel", "bridge", "layer")
      .withColumn("the_geom", line).withColumn("id_zone", lit(1))
    val out = OsmLayers.formatRailsLayer(raw, "id_zone")
      .select("id_source", "type", "zindex", "usage").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getInt(2), r.getString(3))).toMap
    assert(out.keySet == Set("1", "3", "6"))
    assert(out("3") == (("subway", 1, "null"))) // bridge lifts zindex; null usage -> 'null'
  }

  test("vegetation pitch/sport flip and surface gate") {
    val box = G.stGeomFromWkt(lit("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"))
    val raw = Seq(
      (1L, null, "pitch", "golf", null),   // grass-sport -> type grass, class low
      (2L, null, "pitch", "tennis", null), // other sport -> dropped
      (3L, null, "pitch", null, null),     // plain pitch kept, class NULL (map has no pitch)
      (4L, "wood", null, null, "asphalt"), // non-grass surface -> dropped
      (5L, "wood", null, null, "grass"))   // grass surface kept, class high
      .toDF("id", "natural", "leisure", "sport", "surface")
      .withColumn("the_geom", box).withColumn("id_zone", lit(1))
    val out = OsmLayers.formatVegetationLayer(raw, "id_zone")
      .select("id_source", "type", "height_class").collect()
      .map(r => r.getString(0) -> (r.getString(1), Option(r.getString(2)))).toMap
    assert(out.keySet == Set("1", "3", "5"))
    assert(out("1") == (("grass", Some("low"))))
    assert(out("3") == (("pitch", None)))
    assert(out("5") == (("wood", Some("high"))))
  }

  test("removeOverlaps: larger polygon loses the smaller's area; withinToHoles punches") {
    val df = Seq(
      (1, 1, "POLYGON((0 0, 100 0, 100 100, 0 100, 0 0))"),
      (1, 2, "POLYGON((80 0, 140 0, 140 60, 80 60, 80 0))"),
      (1, 3, "POLYGON((20 20, 40 20, 40 40, 20 40, 20 20))"))
      .toDF("id_zone", "id", "wkt")
      .withColumn("the_geom", G.stGeomFromWkt($"wkt")).drop("wkt")
    val ro = OsmLayers.removeOverlaps(df, "id_zone", "id", grid, 8)
    val areas = ro.select($"id", G.stArea($"the_geom")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(areas(1) == 10000.0 - 1200.0 && areas(2) == 3600.0 && areas(3) == 400.0)
    val holed = OsmLayers.withinToHoles(ro, "id_zone", "id", grid, 8)
    val h = holed.select($"id", G.stArea($"the_geom"), G.stHolesArea($"the_geom")).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(h(1) == ((10000.0 - 1200.0 - 400.0, 400.0)))
    assert(h(3) == ((400.0, 0.0))) // the contained polygon itself is untouched
  }
}
