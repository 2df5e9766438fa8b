package graft.workflow

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.index.CellGrid
import graft.indicators.{BuildingIndicators, GenericIndicators, RoadIndicators}
import graft.lake.Lake
import graft.operators.{ConnectedComponents, SpatialJoin, SpatialUnits, Tiling}

/**
 * Config-gated workflow runner — the chain half of the reference's
 * `computeAllGeoIndicators` entry (WorkflowOSM.groovy:143 →
 * WorkflowGeoIndicators.groovy:1237-1373, SURVEY §3.3): a
 * [[WorkflowConfig.Params]] drives which stages run, with the reference's
 * per-zone execution model (one zone per call, zones parallelize as
 * separate runs — WorkflowOSM.groovy:394 `id_zones.each`).
 *
 * Stages (each a `DataFrame`, optionally persisted through [[Lake.stage]]
 * for the north-rule resume semantics when `lakeRoot` is given):
 *   tsu_mesh → tsu → blocks → building↔TSU relation → building indicators
 *   → RSU aggregates; plus the config-gated extras: road traffic
 *   (`params.roadTraffic`) and the analysis grid (`params.gridIndicators`).
 * LCZ/UTRF/TARGET gating is exposed via `params.compute*`; their indicator
 * pipelines are the per-operator entries this engine already ships
 * (Lcz.identifyLczType, ml.RandomForest) — callers compose them over the
 * `rsuStats` output exactly as the driver queries do.
 */
object WorkflowRunner {

  final case class Layers(zone: DataFrame,
                          building: DataFrame,
                          road: Option[DataFrame] = None,
                          rail: Option[DataFrame] = None,
                          vegetation: Option[DataFrame] = None,
                          water: Option[DataFrame] = None,
                          seaLandMask: Option[DataFrame] = None,
                          urbanAreas: Option[DataFrame] = None)

  final case class Results(mesh: DataFrame, tsu: DataFrame, blocks: DataFrame,
                          buildingTsu: DataFrame, buildingIndicators: DataFrame,
                          rsuStats: DataFrame, roadTraffic: Option[DataFrame],
                          grid: Option[DataFrame])

  def run(spark: SparkSession, params: WorkflowConfig.Params, layers: Layers,
          grid: CellGrid, res: Int, zoneId: Int = 1,
          lakeRoot: Option[String] = None): Results = {
    def staged(name: String)(f: => DataFrame): DataFrame =
      lakeRoot.fold(f)(root => Lake.stage(spark, root, name)(f))

    val mesh = staged("tsu_mesh") {
      SpatialUnits.prepareTSUData(layers.zone, layers.road, layers.rail,
        layers.vegetation, layers.water, layers.seaLandMask, layers.urbanAreas,
        surfaceVegetation = params.surfaceVegetation,
        surfaceHydro = params.surfaceHydro,
        surfaceUrbanAreas = params.surfaceUrbanAreas, grid, res)
        .withColumn("id_zone", lit(zoneId))
    }
    val tsu = staged("tsu")(SpatialUnits.createTSU(mesh, "id_zone", "the_geom"))
    val blocks = staged("blocks") {
      // blocks table re-expressed relationally for the lake (id_build list
      // explodes to rows; the CC label is the stable block id)
      ConnectedComponents.createBlocks(layers.building, grid, res)
        .select(col("id_block"), explode(col("id_builds")).as("id_build"))
    }
    val rel = staged("building_tsu") {
      SpatialJoin.assignMaxOverlap(layers.building, "id_build", "the_geom",
        tsu.select(col("id_rsu"), col("the_geom")), "id_rsu", "the_geom", grid, res)
    }
    val bInd = staged("building_indicators") {
      BuildingIndicators.sizeProperties(layers.building)
        .join(BuildingIndicators.formProperties(layers.building), "id_build")
        .join(BuildingIndicators.neighborsProperties(layers.building, grid, res)
          .select("id_build", "contiguity", "number_building_neighbor"), "id_build")
    }
    val rsuStats = staged("rsu_stats") {
      GenericIndicators.unweightedOperationFromLowerScale(
        bInd.join(rel, "id_build").select(col("id_rsu"), col("volume"), col("id_build")),
        tsu.select(col("id_rsu")), "id_rsu", "id_build",
        Map("volume" -> Seq(GenericIndicators.OpAvg, GenericIndicators.OpSum)))
    }
    val traffic =
      if (params.roadTraffic)
        Some(staged("road_traffic")(RoadIndicators.buildRoadTraffic(
          layers.road.getOrElse(spark.emptyDataFrame))))
      else None
    val gridDf = params.gridIndicators.map { g =>
      staged("grid") {
        // grid over the zone envelope, cells g.xSize × g.ySize (reference
        // rasterizeIndicators creates the grid the same way, :2272-2288)
        val env = layers.zone
          .agg(min(graft.geom.GeoFunctions.stXMin(col("the_geom"))).as("x0"),
            min(graft.geom.GeoFunctions.stYMin(col("the_geom"))).as("y0"),
            max(graft.geom.GeoFunctions.stXMax(col("the_geom"))).as("x1"),
            max(graft.geom.GeoFunctions.stYMax(col("the_geom"))).as("y1"))
          .head()
        Tiling.makeGrid(spark, env.getDouble(0), env.getDouble(1),
          env.getDouble(2), env.getDouble(3), g.xSize.toDouble, g.ySize.toDouble)
      }
    }
    Results(mesh, tsu, blocks, rel, bInd, rsuStats, traffic, gridDf)
  }
}
