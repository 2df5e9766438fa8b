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
}
