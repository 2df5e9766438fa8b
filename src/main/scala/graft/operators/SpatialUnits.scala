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
   * prepareTSUData (reference SpatialUnits.groovy:171-364): assembles the
   * line mesh that createTSU polygonizes — per-layer filtering with surface
   * thresholds, vegetation/water contact-cluster merging, and the zone
   * outline, every branch emitting MultiLineString boundaries:
   *
   *  - zone: ST_ToMultiLine(the_geom) (always present);
   *  - sea_land_mask: rows with type='land' (:210-213);
   *  - vegetation (:214-271): connected components of the intersects graph
   *    (self-edges make every polygon a node, so the reference's "isolated
   *    row" UNION branch is unreachable — replicated by labelling ALL ids);
   *    per (component × height_class in low/high) the member union's
   *    boundary is kept iff that class's summed area >= surfaceVegetation;
   *  - water (:273-316): same clustering but edges require the LEFT row's
   *    zindex=0 (two touching zindex=1 polygons do NOT connect directly —
   *    the asymmetry is deliberate in the reference and replicated);
   *    component kept iff total area >= surfaceHydro, union over ALL
   *    members;
   *  - road (:318-324): (zindex=0 OR crossing IN (bridge, crossing)) AND
   *    type NOT IN (track…ferry) AND tunnel=0;
   *  - rail (:326-331): usage='main' AND (zindex=0 OR crossing='bridge');
   *  - urban_areas (:332-337): area >= surfaceUrbanAreas AND type NOT IN
   *    (social_building) — NULL types drop, SQL NOT IN semantics.
   *
   * The reference merges branches with UNION (dedup) — replicated with a
   * distinct on the WKB. Cluster merging runs on the same CC machinery as
   * blocks (pointer-jumped label propagation — O(log d) rounds).
   */
  def prepareTSUData(zone: DataFrame,
                     road: Option[DataFrame], rail: Option[DataFrame],
                     vegetation: Option[DataFrame], water: Option[DataFrame],
                     seaLandMask: Option[DataFrame], urbanAreas: Option[DataFrame],
                     surfaceVegetation: Double, surfaceHydro: Double,
                     surfaceUrbanAreas: Double,
                     grid: graft.index.CellGrid, res: Int): DataFrame = {
    require(surfaceVegetation >= 0 && surfaceHydro >= 0 && surfaceUrbanAreas >= 0,
      "surface thresholds must be >= 0")

    /** contact clusters of a polygon layer: (idCol, component) for ALL rows.
      * `edgeFilterLeft` restricts which LEFT rows may originate an edge
      * (the water layer's a.zindex=0 asymmetry). */
    def clusters(layer: DataFrame, idCol: String,
                 edgeFilterLeft: Column): DataFrame = {
      val a = layer.where(edgeFilterLeft).select(col(idCol), col("the_geom"))
      val b = layer.select(col(idCol).as("__idb"), col("the_geom").as("__geomb"))
      val edges = SpatialJoin.intersectsJoin(a, "the_geom", b, "__geomb", grid, res)
        .where(col(idCol) =!= col("__idb"))
        .select(col(idCol).as("src"), col("__idb").as("dst"))
      ConnectedComponents.run(layer.select(col(idCol)), idCol, edges, "src", "dst")
        .withColumnRenamed("id", idCol)
    }

    val zoneLines = zone.select(G.stToMultiLine(col("the_geom")).as("the_geom"))
    val landLines = seaLandMask.map(_.where(col("type") === "land")
      .select(G.stToMultiLine(col("the_geom")).as("the_geom")))
    val vegLines = vegetation.map { veg =>
      val comp = clusters(veg, "id_veget", lit(true))
      val withComp = veg.join(comp, "id_veget")
      Seq("low", "high").map { hc =>
        withComp.where(col("height_class") === hc)
          .groupBy("component")
          .agg(G.st_union_agg(col("the_geom")).as("__u"),
            sum(G.stArea(col("the_geom"))).as("__a"))
          .where(col("__a") >= surfaceVegetation)
          .select(G.stToMultiLine(col("__u")).as("the_geom"))
      }.reduce(_ unionAll _)
    }
    val waterLines = water.map { w =>
      val comp = clusters(w, "id_water", col("zindex") === 0)
      w.join(comp, "id_water")
        .groupBy("component")
        .agg(G.st_union_agg(col("the_geom")).as("__u"),
          sum(G.stArea(col("the_geom"))).as("__a"))
        .where(col("__a") >= surfaceHydro)
        .select(G.stToMultiLine(col("__u")).as("the_geom"))
    }
    val roadLines = road.map(_
      .where((col("zindex") === 0 || col("crossing").isin("bridge", "crossing"))
        && !col("type").isin("track", "service", "path", "cycleway", "steps",
          "footway", "pedestrian", "ferry")
        && col("tunnel") === 0)
      .select(G.stToMultiLine(col("the_geom")).as("the_geom")))
    val railLines = rail.map(_
      .where((col("zindex") === 0 && col("usage") === "main")
        || (col("crossing") === "bridge" && col("usage") === "main"))
      .select(G.stToMultiLine(col("the_geom")).as("the_geom")))
    val urbanLines = urbanAreas.map(_
      .where(G.stArea(col("the_geom")) >= surfaceUrbanAreas
        && !col("type").isin("social_building"))
      .select(G.stToMultiLine(col("the_geom")).as("the_geom")))

    (Seq(zoneLines) ++ landLines ++ vegLines ++ waterLines ++ roadLines
      ++ railLines ++ urbanLines)
      .reduce(_ unionAll _)
      .dropDuplicates("the_geom") // reference UNION (not UNION ALL) dedups
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
