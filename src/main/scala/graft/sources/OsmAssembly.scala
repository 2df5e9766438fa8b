package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom.Coordinate
import graft.geom.Geo

/**
 * OSM-style geometry assembly — the reference's osmtools
 * `toPoints/toLines/toPolygons` (Transform.groovy:47,102,137-186,205,384,622:
 * node/way tables joined, way geometries built from ordered node lists).
 * Spark-first shape: `wayNodes ⋈ nodes` (hash equi-join on node_id — the
 * only shuffle) then ONE hash aggregate per way collecting (pos,x,y)
 * structs; geometry construction is a scalar UDF over the collected array.
 * At 10^12 nodes this is exactly the groupBy(way_id).agg(collect_list)
 * pattern the SURVEY maps it to (§2.1).
 */
object OsmAssembly {

  /**
   * Build one geometry per way: closed rings (first == last, ≥4 points)
   * become polygons, open chains lines, single nodes points.
   * @param wayNodes (way_id, pos, node_id) — pos is the node order
   * @param nodes    (node_id, x, y)
   */
  def assembleWays(wayNodes: DataFrame, nodes: DataFrame): DataFrame = {
    val mk = udf { (pts: Seq[Row]) =>
      val cs = pts.sortBy(_.getInt(0))
        .map(r => new Coordinate(r.getDouble(1), r.getDouble(2))).toArray
      if (cs.length >= 4 && cs.head.equals2D(cs.last))
        Geo.toWkb(Geo.factory.createPolygon(cs))
      else if (cs.length >= 2) Geo.toWkb(Geo.factory.createLineString(cs))
      else Geo.toWkb(Geo.factory.createPoint(cs.head))
    }
    wayNodes.join(nodes, "node_id")
      .groupBy("way_id")
      .agg(collect_list(struct(col("pos"), col("x"), col("y"))).as("__pts"))
      .select(col("way_id"), mk(col("__pts")).as("the_geom"))
  }

  /** Tag-filtered node geometries (toPoints). */
  def toPoints(nodes: DataFrame, pred: org.apache.spark.sql.Column): DataFrame =
    nodes.where(pred).select(col("node_id"),
      graft.geom.GeoFunctions.stPoint(col("x"), col("y")).as("the_geom"))

  /** Per-way open linework `(way_id, __line)` — nodes joined and collected
    * in order, LineString per way (null under 2 points). Shared by the
    * relation assembly and the generic transform API. */
  def wayLinework(wayNodes: DataFrame, nodes: DataFrame): DataFrame = {
    val mkLine = udf { (pts: Seq[Row]) =>
      val cs = pts.sortBy(_.getInt(0))
        .map(r => new Coordinate(r.getDouble(1), r.getDouble(2))).toArray
      if (cs.length >= 2) Geo.toWkb(Geo.factory.createLineString(cs)) else null
    }
    wayNodes.join(nodes, "node_id")
      .groupBy("way_id")
      .agg(collect_list(struct(col("pos"), col("x"), col("y"))).as("__pts"))
      .select(col("way_id"), mkLine(col("__pts")).as("__line"))
  }

  /**
   * Multipolygon relations assembled into polygons with holes — the
   * reference's `extractRelationsAsPolygons` (osmtools
   * Transform.groovy:384-622): relations tagged type=multipolygon; member
   * ways per role linemerged into rings (closed, >= 4 points) and closed
   * rings made polygons; each inner ring punched into the outer (same
   * relation) that contains its point-on-surface; result buffer(0)-repaired,
   * empty/invalid dropped, normalized.
   *
   * Spark shape: the node join + per-way collect is the assembleWays
   * pattern; ring merging is a per-(relation, role) aggregate (bounded by
   * relation member count); hole matching is an equi-join on id_relation
   * refined by a containsPoint predicate — per-relation work is bounded, so
   * no cell index is needed.
   *
   * @param relationTags (id_relation, tag_key, tag_value)
   * @param members      (id_relation, id_way, role, way_order)
   * @param wayNodes     (way_id, pos, node_id)
   * @param nodes        (node_id, x, y)
   * @return (id_relation, the_geom) — one row per OUTER polygon
   */
  def assembleRelations(relationTags: DataFrame, members: DataFrame,
                        wayNodes: DataFrame, nodes: DataFrame): DataFrame = {
    import graft.geom.{GeoFunctions => G}
    val mp = relationTags
      .where(col("tag_key") === "type" && col("tag_value") === "multipolygon")
      .select("id_relation").distinct()
    val mem = members.join(mp, "id_relation").where(col("role").isin("outer", "inner"))
    val wayLines = wayLinework(wayNodes, nodes)
    // rings per (relation, role): linemerge member lines; closed strands
    // with >= 4 points become polygons (ST_MAKEPOLYGON on closed rings)
    val ringsU = udf { (gs: Seq[Array[Byte]]) =>
      val m = new org.locationtech.jts.operation.linemerge.LineMerger()
      gs.foreach(b => if (b != null) m.add(Geo.fromWkb(b)))
      import scala.jdk.CollectionConverters._
      m.getMergedLineStrings.asScala.toArray
        .map(_.asInstanceOf[org.locationtech.jts.geom.LineString])
        .filter(l => l.isClosed && l.getNumPoints >= 4)
        .map(l => Geo.toWkb(Geo.factory.createPolygon(l.getCoordinates)))
    }
    val rings = mem.join(wayLines, col("id_way") === col("way_id"))
      .groupBy("id_relation", "role")
      .agg(collect_list(col("__line")).as("__ls"))
      .select(col("id_relation"), col("role"), explode(ringsU(col("__ls"))).as("the_geom"))
      .localCheckpoint() // outer + inner branches both read it
    val outers = rings.where(col("role") === "outer")
      .select(col("id_relation"), col("the_geom").as("__outer"))
    val inners = rings.where(col("role") === "inner")
      .select(col("id_relation"), col("the_geom").as("__inner"),
        G.stPointOnSurf(col("the_geom")).as("__pos"))
      .select(col("id_relation"), col("__inner"),
        G.stX(col("__pos")).as("__px"), G.stY(col("__pos")).as("__py"))
    // punch holes: inner rings of the SAME relation whose point-on-surface
    // the outer contains (Transform.groovy:540-555), buffer(0) repair
    val punch = udf { (outer: Array[Byte], holes: Seq[Array[Byte]]) =>
      val o = Geo.fromWkb(outer).asInstanceOf[org.locationtech.jts.geom.Polygon]
      val hs = holes.filter(_ != null)
        .map(h => Geo.factory.createLinearRing(
          Geo.fromWkb(h).asInstanceOf[org.locationtech.jts.geom.Polygon]
            .getExteriorRing.getCoordinates))
      val poly = Geo.factory.createPolygon(
        Geo.factory.createLinearRing(o.getExteriorRing.getCoordinates), hs.toArray)
      Geo.toWkb(poly.buffer(0))
    }
    // containment lives in the JOIN condition (reference LEFT JOIN ON ...):
    // an outer whose relation has inners belonging to OTHER outers must
    // survive with no holes, which a post-join filter would drop
    val innersR = inners.withColumnRenamed("id_relation", "__ir")
    outers.join(innersR, col("id_relation") === col("__ir") &&
        G.stContainsPoint(col("__outer"), col("__px"), col("__py")), "left")
      .groupBy(col("id_relation"), col("__outer"))
      .agg(collect_list(col("__inner")).as("__holes"))
      .select(col("id_relation"), punch(col("__outer"), col("__holes")).as("the_geom"))
      .where(!G.stIsEmpty(col("the_geom")))
      .select(col("id_relation"), G.stNormalize(col("the_geom")).as("the_geom"))
  }
}
