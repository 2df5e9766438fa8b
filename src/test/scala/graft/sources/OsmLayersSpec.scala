package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{GeoFunctions => G}

/** formatBuildingLayer / formatRoadLayer vs hand-derived expectations from
  * the reference mapping tables (buildingParams.json / roadParams.json) and
  * InputDataFormatting.groovy semantics: first-match priority, level
  * gating, building:use synonym override, width defaults, track-surface
  * gate, bridge zindex lift, speed parsing. */
class OsmLayersSpec extends SparkTestBase {
  import spark.implicits._

  private val box4 = G.stGeomFromWkt(lit("POLYGON((0 0, 4 0, 4 4, 0 4, 0 0))"))

  test("building mapping: priority, level gating, use override, undefined default") {
    val raw = Seq(
      // (id, building, building:use, height, layer)
      (1L, "terminal", null, null, null),   // type terminal/transport, level 0 -> nb_lev 0 -> dropped
      (2L, "house", null, null, null),      // house/residential, level 1 -> estimated 3m
      (3L, "house", " SCHOOL ", null, null),// use override via education synonym (trim+lower)
      (4L, "historic", null, "6", null),    // historic rule via building tag (dead historic_building key skipped); h=6 -> 2 levels
      (5L, "yes", null, null, null),        // explicit 'undefined' rule, level 1
      (6L, "house", null, null, "-2"),      // zindex -2 -> dropped
      (7L, "wombat", null, "9", null))      // no rule matches -> undefined/undefined
      .toDF("id", "building", "building:use", "height", "layer")
      .withColumn("the_geom", box4).withColumn("id_zone", lit(1))
    val out = OsmLayers.formatBuildingLayer(raw, "id_zone")
      .select("id_source", "type", "main_use", "height_roof", "height_wall", "nb_lev", "estimated")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getDouble(3), r.getDouble(4), r.getInt(5), r.getBoolean(6))).toMap
    assert(!out.contains("1") && !out.contains("6"))
    assert(out("2") == (("house", "residential", 3.0, 3.0, 1, true)))
    assert(out("3") == (("house", "education", 3.0, 3.0, 1, true)))
    assert(out("4") == (("historic", "historic", 6.0, 6.0, 2, false)))
    assert(out("5") == (("undefined", "undefined", 3.0, 3.0, 1, true)))
    assert(out("7") == (("undefined", "undefined", 9.0, 9.0, 3, false)))
  }

  test("building geometry: multipolygon explodes, parts with area <= 1 dropped, dense ids per zone") {
    val raw = Seq(
      (1L, "house", "MULTIPOLYGON(((0 0, 4 0, 4 4, 0 4, 0 0)), ((10 10, 10.5 10, 10.5 10.5, 10 10.5, 10 10)))"),
      (2L, "house", "POLYGON((20 0, 23 0, 23 3, 20 3, 20 0))"))
      .toDF("id", "building", "wkt")
      .withColumn("the_geom", G.stGeomFromWkt($"wkt")).drop("wkt")
      .withColumn("id_zone", lit(1))
    val out = OsmLayers.formatBuildingLayer(raw, "id_zone")
      .select("id_build", "id_source").collect().map(r => (r.getInt(0), r.getString(1))).sorted
    assert(out.toSeq == Seq((1, "1"), (2, "2"))) // tiny part dropped; ids dense
  }

  test("road mapping: width defaults, track gate, bridge zindex lift, speeds, sidewalk, drops") {
    val line = G.stGeomFromWkt(lit("LINESTRING(0 0, 10 0)"))
    val raw = Seq(
      // (id, highway, width, maxspeed, oneway, bridge, layer, surface, tracktype, sidewalk, service, access, area, tunnel, lanes)
      (1L, "residential", null, "50", "yes", null, null, null, null, "both", null, null, null, null, "2"),
      (2L, "motorway", "12.5", "30 mph", null, "yes", null, null, null, null, null, null, null, "yes", null),
      (3L, "track", null, null, null, null, null, null, "grade1", null, null, null, null, null, null),
      (4L, "track", null, null, null, null, null, null, "grade4", null, null, null, null, null, null),
      (5L, "proposed", null, "fast", null, null, null, null, null, "left", null, null, null, null, null),
      (6L, "residential", null, null, null, null, null, null, null, null, "driveway", null, null, null, null),
      (7L, "residential", null, null, null, null, null, null, null, null, null, "forestry", null, null, null),
      (8L, "residential", null, null, null, null, null, null, null, null, null, null, "yes", null, null),
      (9L, "residential", null, null, null, null, "-1", null, null, null, null, null, null, null, null))
      .toDF("id", "highway", "width", "maxspeed", "oneway", "bridge", "layer", "surface",
        "tracktype", "sidewalk", "service", "access", "area", "tunnel", "lanes")
      .withColumn("the_geom", line).withColumn("id_zone", lit(1))
    val out = OsmLayers.formatRoadLayer(raw, "id_zone")
      .select("id_source", "type", "width", "crossing", "surface", "sidewalk",
        "maxspeed", "direction", "tunnel", "lanes", "zindex")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(Set("1", "2", "3", "5") == out.keySet) // 4 track-gated; 6/7/8 dropped; 9 zindex<0
    val r1 = out("1")
    assert(r1.getString(1) == "residential" && r1.getDouble(2) == 8.0 &&
      r1.getString(5) == "two" && r1.getInt(6) == 50 && r1.getInt(7) == 1 &&
      r1.getInt(8) == 0 && r1.getInt(9) == 2)
    val r2 = out("2")
    assert(r2.getString(1) == "motorway" && r2.getDouble(2) == 12.5 &&
      r2.getString(3) == "bridge" && r2.getInt(6) == 48 && r2.getInt(7) == 3 &&
      r2.getInt(8) == 1 && r2.getInt(10) == 1) // 30 mph -> round(48.27); bridge lifts zindex 0->1
    val r3 = out("3")
    assert(r3.getString(1) == "track" && r3.getString(4) == "compacted" && r3.getDouble(2) == 2.0)
    val r5 = out("5")
    assert(r5.getString(1) == "unclassified" && r5.getDouble(2) == 3.0 &&
      r5.getInt(6) == -1 && r5.getString(5) == "one")
  }
}
