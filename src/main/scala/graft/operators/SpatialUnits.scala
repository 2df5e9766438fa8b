package graft.operators

import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.locationtech.jts.geom.Geometry
import org.locationtech.jts.operation.buffer.{BufferOp, BufferParameters}
import org.locationtech.jts.operation.polygonize.Polygonizer
import org.locationtech.jts.operation.union.UnaryUnionOp
import graft.geom.{Geo, GeoFunctions => G}

/**
 * Topological spatial units (TSU/RSU) — the reference's createTSU
 * (SpatialUnits.groovy:108-146): the line mesh (roads/rails/vegetation/water
 * boundaries + zone border) is noded + unioned, polygonized into faces,
 * small faces dropped, and each face cleaned with a -0.01/+0.01 mitre
 * shrink-grow. Golden: fixture roads 1-4 polygonize into 9 faces.
 *
 * Scale design: polygonization is an inherently whole-graph geometry op, so
 * it runs PER ZONE (`zoneId` grouping — the reference iterates zones the
 * same way, one commune at a time, SURVEY §3.3/§7.4.2): each zone's mesh is
 * one task; zones parallelize across the cluster. Ids are minted with
 * row_number over a deterministic ordering (face centroid), not
 * monotonically_increasing_id (SURVEY §7.4.4).
 */
object SpatialUnits {

  private val polygonizeUdf = udf { (gs: Seq[Array[Byte]]) =>
    val geoms = new java.util.ArrayList[Geometry](gs.size)
    gs.foreach(b => geoms.add(Geo.fromWkb(b)))
    val noded = UnaryUnionOp.union(geoms) // nodes + dissolves the linework
    val p = new Polygonizer()
    p.add(noded)
    p.getPolygons.asScala.map(g => Geo.toWkb(g.asInstanceOf[Geometry])).toArray
  }

  private val shrinkGrowUdf = udf { (b: Array[Byte]) =>
    val bp = new BufferParameters(2, BufferParameters.CAP_FLAT,
      BufferParameters.JOIN_MITRE, BufferParameters.DEFAULT_MITRE_LIMIT)
    val shrunk = BufferOp.bufferOp(Geo.fromWkb(b), -0.01, bp)
    Geo.toWkb(BufferOp.bufferOp(shrunk, 0.01, bp))
  }

  /**
   * Polygonize per-zone linework into TSU faces.
   * @param lines rows of (zone id, line WKB)
   * @param areaMin faces with area <= areaMin are dropped (pre-clean area,
   *                like the reference)
   */
  def createTSU(lines: DataFrame, zoneId: String, lineGeom: String,
                areaMin: Double = 1.0): DataFrame = {
    val faces = lines.groupBy(col(zoneId))
      .agg(collect_list(col(lineGeom)).as("__gs"))
      .select(col(zoneId), explode(polygonizeUdf(col("__gs"))).as("__face"))
      .where(G.stArea(col("__face")) > areaMin)
      .withColumn("the_geom", shrinkGrowUdf(col("__face")))
      .withColumn("__cx", G.stX(G.stCentroid(col("__face"))))
      .withColumn("__cy", G.stY(G.stCentroid(col("__face"))))
    faces
      .withColumn("id_rsu", row_number().over(
        Window.orderBy(col(zoneId), col("__cx"), col("__cy"))))
      .select(col("id_rsu"), col(zoneId), col("the_geom"))
  }
}
