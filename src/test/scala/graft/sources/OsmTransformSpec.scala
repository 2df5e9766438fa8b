package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{GeoFunctions => G}

/** Generic tag-filtered transforms: relation branches, columnsToKeep drops,
  * bounding-geometry filter — the paths the driver scene leaves empty. */
class OsmTransformSpec extends SparkTestBase {
  import spark.implicits._

  /** Scene: way 1 = closed 10x10 square (building=yes, height=7); way 2 =
    * open 2-segment chain (highway=primary); ways 3+4 = two half-rings of a
    * multipolygon relation 9 (landuse=forest) forming a 20x20 square; node
    * 100 tagged amenity=cafe. */
  private def tables: OsmXml.Tables = {
    val nodes = Seq(
      (1L, 0.0, 0.0), (2L, 10.0, 0.0), (3L, 10.0, 10.0), (4L, 0.0, 10.0),
      (10L, 30.0, 0.0), (11L, 40.0, 0.0), (12L, 40.0, 5.0),
      (20L, 50.0, 0.0), (21L, 70.0, 0.0), (22L, 70.0, 20.0), (23L, 50.0, 20.0),
      (100L, 5.0, 5.0)).toDF("node_id", "x", "y")
    val wayNodes = Seq(
      (1L, 0, 1L), (1L, 1, 2L), (1L, 2, 3L), (1L, 3, 4L), (1L, 4, 1L),
      (2L, 0, 10L), (2L, 1, 11L), (2L, 2, 12L),
      (3L, 0, 20L), (3L, 1, 21L), (3L, 2, 22L),
      (4L, 0, 22L), (4L, 1, 23L), (4L, 2, 20L)).toDF("way_id", "pos", "node_id")
    val wayTags = Seq(
      (1L, "building", "yes"), (1L, "height", "7"),
      (2L, "highway", "primary"), (2L, "name", "rue")).toDF("way_id", "tag_key", "tag_value")
    val nodeTags = Seq((100L, "amenity", "cafe")).toDF("node_id", "tag_key", "tag_value")
    val relMembers = Seq((9L, 3L, "outer", 0), (9L, 4L, "outer", 1))
      .toDF("id_relation", "id_way", "role", "way_order")
    val relTags = Seq((9L, "type", "multipolygon"), (9L, "landuse", "forest"))
      .toDF("id_relation", "tag_key", "tag_value")
    OsmXml.Tables(nodes, nodeTags, wayNodes, wayTags, relMembers, relTags)
  }

  test("toPolygons: relation rings merge into one polygon, union pads columns") {
    val out = OsmTransform.toPolygons(tables,
      Seq(OsmTransform.TagFilter(Seq("building", "landuse"))))
      .select(col("id"), round(G.stArea(col("the_geom")), 6).as("area"),
        col("building"), col("landuse"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), Option(r.getString(2)), Option(r.getString(3)))).toMap
    assert(out.keySet == Set("w1", "r9"))
    assert(out("w1") == ((100.0, Some("yes"), None)))
    assert(out("r9") == ((400.0, None, Some("forest"))))
  }

  test("toLines: relation member linework merges; tag-value filter applies") {
    val out = OsmTransform.toLines(tables,
      Seq(OsmTransform.TagFilter(Seq("highway"), Seq("primary")),
        OsmTransform.TagFilter(Seq("landuse"))))
      .select(col("id"), round(G.stLength(col("the_geom")), 6).as("len"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // way 2: 10 + 5; relation 9: the two half-rings merge into the closed
    // 20x20 ring (perimeter 80)
    assert(out == Map("w2" -> 15.0, "r9" -> 80.0))
  }

  test("toPoints + columnsToKeep + bounding geometry") {
    val bound = graft.geom.Geo.toWkb(graft.geom.Geo.box(0, 0, 20, 20))
    val out = OsmTransform.toPoints(tables,
      Seq(OsmTransform.TagFilter(Seq("amenity"))),
      columnsToKeep = Seq("amenity", "name"), bound = Some(bound))
      .select("node_id", "amenity", "name")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(out.toSeq == Seq((100L, "cafe", None)))
    // a bound excluding the node drops it
    val far = graft.geom.Geo.toWkb(graft.geom.Geo.box(500, 500, 600, 600))
    assert(OsmTransform.toPoints(tables,
      Seq(OsmTransform.TagFilter(Seq("amenity"))),
      columnsToKeep = Seq("amenity"), bound = Some(far)).count() == 0)
  }

  test("capped tag-key discovery keeps the top-N most frequent keys") {
    // way 1 carries building+height, way 2 highway+name: frequency census is
    // building=1, height=1, highway=1, name=1 — cap 2 keeps the 2 first by
    // (count DESC, key ASC) = building, height
    val out = OsmTransform.toLines(tables, maxDiscoveredKeys = 2)
    assert(out.columns.toSet.intersect(
      Set("building", "height", "highway", "name")) == Set("building", "height"))
    // way 2 (highway-only) drops out on the capped path (inner semantics,
    // same contract as columnsToKeep); way 1 is closed so toLines keeps its
    // ring line. The RELATION pivot censuses its own key set (type, landuse
    // — 2 keys, under the cap, no truncation) so r9 survives untouched.
    val ids = out.select("id").collect().map(_.getString(0)).toSet
    assert(ids == Set("w1", "r9"))
    // an uncapped run over the same scene keeps every discovered key
    val full = OsmTransform.toLines(tables)
    assert(Set("building", "height", "highway", "name")
      .subsetOf(full.columns.toSet))
  }
}
