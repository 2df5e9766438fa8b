package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{Geo, GeoFunctions => G}

/** assembleRelations vs hand cases (Transform.groovy:384-622): ring merged
  * from split/reversed ways, holes punched into the right outer of a
  * two-outer relation, non-multipolygon relations dropped, unclosed ring
  * sets dropped. */
class OsmRelationSpec extends SparkTestBase {
  import spark.implicits._

  test("two-outer relation with holes; hole lands in its containing outer only") {
    // relation 1 (multipolygon): outer A [0,20]² from two ways (second
    // reversed), outer B [100,120]x[0,20] one closed way, hole [5,9]² (in A)
    // one closed way. relation 2: same shape but NOT multipolygon -> dropped.
    // relation 3 (multipolygon): open ring (3 points, unclosed) -> dropped.
    val relationTags = Seq(
      (1, "type", "multipolygon"), (1, "building", "yes"),
      (2, "type", "route"), (3, "type", "multipolygon"))
      .toDF("id_relation", "tag_key", "tag_value")
    val members = Seq(
      (1, 10, "outer", 0), (1, 11, "outer", 1), (1, 12, "outer", 2), (1, 13, "inner", 3),
      (2, 10, "outer", 0), (2, 11, "outer", 1),
      (3, 14, "outer", 0))
      .toDF("id_relation", "id_way", "role", "way_order")
    // way 10: (0,0)->(20,0)->(20,20); way 11 REVERSED: (0,0)->(0,20)->(20,20)
    // way 12: closed square [100,120]x[0,20]; way 13: closed hole [5,9]²
    // way 14: open chain
    val wayNodes = Seq(
      (10, 0, 100), (10, 1, 101), (10, 2, 102),
      (11, 0, 100), (11, 1, 103), (11, 2, 102),
      (12, 0, 110), (12, 1, 111), (12, 2, 112), (12, 3, 113), (12, 4, 110),
      (13, 0, 120), (13, 1, 121), (13, 2, 122), (13, 3, 123), (13, 4, 120),
      (14, 0, 130), (14, 1, 131), (14, 2, 132))
      .toDF("way_id", "pos", "node_id")
    val nodes = Seq(
      (100, 0.0, 0.0), (101, 20.0, 0.0), (102, 20.0, 20.0), (103, 0.0, 20.0),
      (110, 100.0, 0.0), (111, 120.0, 0.0), (112, 120.0, 20.0), (113, 100.0, 20.0),
      (120, 5.0, 5.0), (121, 9.0, 5.0), (122, 9.0, 9.0), (123, 5.0, 9.0),
      (130, 200.0, 0.0), (131, 210.0, 0.0), (132, 210.0, 10.0))
      .toDF("node_id", "x", "y")
    val out = OsmAssembly.assembleRelations(relationTags, members, wayNodes, nodes)
      .select($"id_relation", G.stArea($"the_geom").as("area"),
        G.stHolesArea($"the_geom").as("holes"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._2)
    assert(out.length == 2)
    assert(out(0) == ((1, 400.0 - 16.0, 16.0))) // outer A minus its hole
    assert(out(1) == ((1, 400.0, 0.0)))         // outer B untouched
  }
}
