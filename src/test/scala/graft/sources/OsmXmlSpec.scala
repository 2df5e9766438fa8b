package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{GeoFunctions => G}

/** OSM XML envelope parse → assembly: a document with nodes/ways/relation
  * must round-trip through OsmXml.parse into the same tables the assembly
  * layer consumes, end-to-end to polygons with holes. */
class OsmXmlSpec extends SparkTestBase {
  import spark.implicits._

  private val doc =
    """<osm>
      | <node id="1" lat="0.0" lon="0.0"/>
      | <node id="2" lat="0.0" lon="20.0"/>
      | <node id="3" lat="20.0" lon="20.0"/>
      | <node id="4" lat="20.0" lon="0.0"><tag k="amenity" v="bench"/></node>
      | <node id="5" lat="5.0" lon="5.0"/>
      | <node id="6" lat="5.0" lon="9.0"/>
      | <node id="7" lat="9.0" lon="9.0"/>
      | <node id="8" lat="9.0" lon="5.0"/>
      | <way id="10"><nd ref="1"/><nd ref="2"/><nd ref="3"/><tag k="building" v="yes"/></way>
      | <way id="11"><nd ref="3"/><nd ref="4"/><nd ref="1"/></way>
      | <way id="12"><nd ref="5"/><nd ref="6"/><nd ref="7"/><nd ref="8"/><nd ref="5"/></way>
      | <relation id="77">
      |  <member type="way" ref="10" role="outer"/>
      |  <member type="way" ref="11" role="outer"/>
      |  <member type="way" ref="12" role="inner"/>
      |  <member type="node" ref="1" role=""/>
      |  <tag k="type" v="multipolygon"/>
      | </relation>
      |</osm>""".stripMargin

  test("parse tables + relation assembly end-to-end") {
    val t = OsmXml.parse(Seq(doc).toDF("xml"), "xml")
    assert(t.nodes.count() == 8)
    assert(t.nodeTags.collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
      == Seq((4L, "amenity", "bench")))
    assert(t.wayNodes.where($"way_id" === 10).orderBy("pos")
      .select("node_id").as[Long].collect().toSeq == Seq(1L, 2L, 3L))
    assert(t.wayTags.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((10L, "building")))
    assert(t.relationMembers.count() == 3) // node member filtered
    assert(t.relationTags.head().getString(1) == "type")
    val out = OsmAssembly.assembleRelations(t.relationTags, t.relationMembers,
        t.wayNodes, t.nodes)
      .select($"id_relation", G.stArea($"the_geom").as("a"), G.stHolesArea($"the_geom").as("h"))
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 77L && out(0).getDouble(1) == 384.0 && out(0).getDouble(2) == 16.0)
  }
}
