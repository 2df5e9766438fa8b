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
    val traffic = // gated by config AND the presence of a road layer (the
      // reference computes traffic only when the road table exists)
      if (params.roadTraffic)
        layers.road.map(r => staged("road_traffic")(RoadIndicators.buildRoadTraffic(r)))
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

  /**
   * rasterizeIndicators (WorkflowGeoIndicators.groovy:1732-2227), the
   * building-driven subset: computes the grid-indicator columns the config
   * requested onto the analysis grid — BUILDING_HEIGHT (per-cell AVG/STD of
   * height_roof via the generic scale transfer, :1094-1100 semantics),
   * BUILDING_NUMBER (count, 0 default), BUILDING_TYPE_FRACTION (per-type
   * area fractions via the zonal pivot, when the building layer carries a
   * type). Buildings route to their max-overlap cell, like the reference's
   * grid correlation. Unrequested/unsupported indicator names pass through
   * untouched (the reference gates each block the same way).
   */
  def rasterizeIndicators(layers: Layers, results: Results,
                          g: WorkflowConfig.GridParams,
                          grid: CellGrid, res: Int,
                          lczGrid: Option[DataFrame] = None): Option[DataFrame] =
    results.grid.map { cells0 =>
      val cells = cells0.localCheckpoint() // joined against several times
      val inds = g.indicators.map(_.trim.toUpperCase)
      var out = cells
      val needsBuildings = inds.exists(
        Set("BUILDING_HEIGHT", "BUILDING_NUMBER", "BUILDING_TYPE_FRACTION"))
      if (needsBuildings) {
        val rel = SpatialJoin.assignMaxOverlap(layers.building, "id_build", "the_geom",
          cells.select(col("id_grid"), col("the_geom")), "id_grid", "the_geom", grid, res)
        val lower = layers.building.join(rel, "id_build")
        if (inds.contains("BUILDING_HEIGHT")) {
          val h = GenericIndicators.unweightedOperationFromLowerScale(
            lower.select(col("id_grid"), col("height_roof"), col("id_build")),
            cells.select("id_grid"), "id_grid", "id_build",
            Map("height_roof" -> Seq(GenericIndicators.OpAvg, GenericIndicators.OpStd)))
          out = out.join(h, Seq("id_grid"), "left")
        }
        if (inds.contains("BUILDING_NUMBER")) {
          val cnt = lower.groupBy("id_grid").agg(count(lit(1)).as("building_number"))
          out = out.join(cnt, Seq("id_grid"), "left")
            .withColumn("building_number", coalesce(col("building_number"), lit(0L)))
        }
        if (inds.contains("BUILDING_TYPE_FRACTION") &&
            layers.building.columns.contains("type")) {
          // pivot values discovered once (bounded class set, like the
          // reference's SELECT DISTINCT — GenericIndicators.groovy:1035-1039)
          val types = layers.building.select("type").where(col("type").isNotNull)
            .distinct().collect().map(_.getString(0)).sorted.toSeq
          // keep ONLY id + fraction columns: zonalAreaStats echoes every
          // zone column, which would duplicate id_col/id_row in the join
          val tf = Tiling.zonalAreaStats(cells, "id_grid", "the_geom",
            layers.building.select(col("the_geom"), col("type")), "the_geom",
            "type", types, grid, res, prefix = "type_fraction_")
            .select((col("id_grid") +: types.map(t => col(s"type_fraction_$t"))): _*)
          out = out.join(tf, Seq("id_grid"), "left")
        }
      }
      // LCZ-driven grid indicators, available when the caller supplies the
      // classified grid (id_grid, lcz_primary) — LCZ itself is the
      // Lcz.identifyLczType pipeline composed upstream
      lczGrid.foreach { lcz =>
        if (inds.contains("LCZ_PRIMARY"))
          out = out.join(lcz.select(col("id_grid"), col("lcz_primary")),
            Seq("id_grid"), "left")
        val warmSizes = inds.collect {
          case s if s.startsWith("COUNT_WARM_") => s.stripPrefix("COUNT_WARM_").toInt
        }
        if (warmSizes.nonEmpty) {
          val cellsLcz = cells.select("id_grid", "id_row", "id_col")
            .join(lcz.select(col("id_grid"), col("lcz_primary")), "id_grid")
          out = out.join(
            graft.indicators.GridIndicators.gridCountCellsWarm(cellsLcz,
              "lcz_primary", warmSizes),
            Seq("id_grid"), "left")
        }
      }
      out
    }
}
