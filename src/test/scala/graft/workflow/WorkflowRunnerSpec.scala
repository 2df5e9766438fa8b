package graft.workflow

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.fixtures.GeoFixture
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid
import graft.lake.Lake

/** Config-gated chain runner on the SQL fixture layers: gating follows the
  * parsed config, stage outputs compose, and a lake root makes the run
  * resumable (stages read back instead of recomputing). */
class WorkflowRunnerSpec extends SparkTestBase {

  private val grid = CellGrid.fixture

  private def layers = WorkflowRunner.Layers(
    zone = spark.range(1).select(lit(1).as("id_zone"),
      G.stMakeBox(lit(-20.0), lit(-20.0), lit(180.0), lit(70.0)).as("the_geom")),
    building = GeoFixture.buildingDf(spark)
      .where(G.stX(G.stCentroid(col("the_geom"))) < 500)
      .select("id_build", "the_geom", "height_wall", "height_roof", "nb_lev")
      .localCheckpoint(),
    road = Some(GeoFixture.roadDf(spark).withColumn("tunnel", lit(0))
      .withColumn("surface", lit(null).cast("string"))
      .withColumn("direction", lit(3))
      .withColumn("maxspeed", lit(-1))), // traffic columns the fixture lacks
    vegetation = Some(GeoFixture.vegetDf(spark)),
    water = Some(GeoFixture.hydroDf(spark)))

  test("gating: road traffic and grid run only when the config asks") {
    val pOff = WorkflowConfig.parse(
      """{"rsu_indicators": {"surface_vegetation": 2500, "surface_hydro": 2500}}""")
    val off = WorkflowRunner.run(spark, pOff, layers, grid, 10)
    assert(off.roadTraffic.isEmpty && off.grid.isEmpty)
    assert(off.tsu.count() > 1)
    assert(off.buildingTsu.count() == off.buildingTsu.select("id_build").distinct().count())
    assert(off.rsuStats.count() == off.tsu.count())
    val pOn = WorkflowConfig.parse(
      """{"rsu_indicators": {"surface_vegetation": 2500, "surface_hydro": 2500},
        |"road_traffic": true,
        |"grid_indicators": {"x_size": 50, "y_size": 50, "indicators": ["BUILDING_HEIGHT"]}}""".stripMargin)
    val on = WorkflowRunner.run(spark, pOn, layers, grid, 10)
    assert(on.roadTraffic.get.count() > 0)
    assert(on.grid.get.count() == 8) // 200x90 envelope under 50x50 cells -> 4x2
    // rowCol absent (WorkflowOSM.groovy:606-612): sizes become counts via
    // ceil, cells have size extent/count and EXACTLY tile the envelope —
    // 200/4 x 90/2, last cell ends at the envelope edge (no overhang)
    val dims = on.grid.get.select(
      (G.stXMax(col("the_geom")) - G.stXMin(col("the_geom"))).as("w"),
      (G.stYMax(col("the_geom")) - G.stYMin(col("the_geom"))).as("h")).distinct().collect()
    assert(dims.length == 1 && dims.head.getDouble(0) == 50.0 && dims.head.getDouble(1) == 45.0)
    assert(on.grid.get.agg(max(G.stYMax(col("the_geom")))).head().getDouble(0) == 70.0)
    // rowCol=false keeps fixed meter sizes: 50x50 cells overhang to y=80
    val pFixed = WorkflowConfig.parse(
      """{"rsu_indicators": {"surface_vegetation": 2500, "surface_hydro": 2500},
        |"grid_indicators": {"x_size": 50, "y_size": 50, "rowCol": false,
        |  "indicators": ["BUILDING_HEIGHT"]}}""".stripMargin)
    val gFixed = WorkflowRunner.run(spark, pFixed, layers, grid, 10).grid.get
    assert(gFixed.count() == 8)
    assert(gFixed.agg(max(G.stYMax(col("the_geom")))).head().getDouble(0) == 80.0)
  }

  test("rasterizeIndicators: requested building indicators land on the grid") {
    val p = WorkflowConfig.parse(
      """{"rsu_indicators": {"surface_vegetation": 2500, "surface_hydro": 2500},
        |"grid_indicators": {"x_size": 50, "y_size": 50,
        |  "indicators": ["BUILDING_HEIGHT", "BUILDING_NUMBER", "BUILDING_TYPE_FRACTION", "SVF"]}}""".stripMargin)
    val lyr0 = layers
    val lyr = lyr0.copy(building = lyr0.building
      .withColumn("type", when(col("id_build") % 2 === 0, "residential").otherwise("commercial")))
    val res = WorkflowRunner.run(spark, p, lyr, grid, 10)
    val rast = WorkflowRunner.rasterizeIndicators(lyr, res, p.gridIndicators.get, grid, 10).get
    // BUILDING_NUMBER -> building + block number DENSITIES over cut
    // buildings (reference NB_DENS semantics); BUILDING_HEIGHT -> avg/std
    assert(rast.columns.toSet.intersect(
      Set("avg_height_roof", "std_height_roof",
        "building_number_density", "block_number_density")).size == 4)
    assert(rast.columns.count(_ == "id_col") == 1 && rast.columns.count(_ == "id_row") == 1)
    // TEB composition fractions (building types map into the TEB groups)
    assert(rast.columns.contains("area_fraction_undefined_residential"))
    assert(rast.columns.contains("floor_area_fraction_undefined_residential"))
    assert(rast.count() == res.grid.get.count())
    assert(rast.agg(max(col("building_number_density"))).head().getDouble(0) > 0)
    assert(rast.where(col("building_number_density") > 0 && col("avg_height_roof").isNull)
      .count() == 0)
    assert(rast.columns.contains("svf"))
    assert(rast.agg(min("svf")).head().getDouble(0) >= 0.0)
  }

  test("rasterizeIndicators: LCZ-driven indicators aggregate the RSU LCZ layer") {
    val p = WorkflowConfig.parse(
      """{"rsu_indicators": {"surface_vegetation": 2500, "surface_hydro": 2500},
        |"grid_indicators": {"x_size": 50, "y_size": 50,
        |  "indicators": ["LCZ_FRACTION", "LCZ_PRIMARY", "COUNT_WARM_1"]}}""".stripMargin)
    val lyr = layers
    val res = WorkflowRunner.run(spark, p, lyr, grid, 10)
    // RSU-scale LCZ polygons: left half compact midrise (2), right half
    // water (107) — built over the zone box
    val rsuLcz = spark.range(2).select(
      when(col("id") === 0, G.stMakeBox(lit(-20.0), lit(-20.0), lit(80.0), lit(70.0)))
        .otherwise(G.stMakeBox(lit(80.0), lit(-20.0), lit(180.0), lit(70.0))).as("the_geom"),
      when(col("id") === 0, 2).otherwise(107).as("lcz_primary"))
    val rast = WorkflowRunner.rasterizeIndicators(
      lyr, res, p.gridIndicators.get, grid, 10, Some(rsuLcz), None, None).get
    assert(rast.columns.contains("lcz_primary") && rast.columns.contains("lcz_secondary"))
    assert(rast.columns.contains("lcz_primary_2") && rast.columns.contains("lcz_primary_107"))
    assert(rast.columns.contains("count_warm_1") && rast.columns.contains("count_cells_1"))
    assert(rast.count() == res.grid.get.count())
    // fully-covered halves classify to their class; fractions sum to 1
    val row = rast.where(col("id_col") === 1 && col("id_row") === 1)
      .select("lcz_primary", "lcz_primary_2").head()
    assert(row.getInt(0) == 2 && math.abs(row.getDouble(1) - 1.0) < 1e-9)
    // lcz_lod in the config pushes the grid through the LOD pyramid
    val pLod = WorkflowConfig.parse(
      """{"rsu_indicators": {"surface_vegetation": 2500, "surface_hydro": 2500},
        |"grid_indicators": {"x_size": 50, "y_size": 50, "lcz_lod": 1,
        |  "indicators": ["LCZ_FRACTION", "LCZ_PRIMARY"]}}""".stripMargin)
    val rastLod = WorkflowRunner.rasterizeIndicators(
      lyr, res, pLod.gridIndicators.get, grid, 10, Some(rsuLcz), None, None).get
    assert(rastLod.columns.contains("lcz_primary_lod_1"))
    assert(rastLod.columns.contains("lcz_warm_lod_1") && rastLod.columns.contains("lcz_primary_n"))
    assert(rastLod.count() == res.grid.get.count())
  }

  test("grid domain + rowCol modes (WorkflowOSM.groovy:596-615)") {
    // rowCol=true: x/y_size are CELL COUNTS over the domain envelope
    val pCount = WorkflowConfig.parse(
      """{"rsu_indicators": {"surface_vegetation": 2500, "surface_hydro": 2500},
        |"grid_indicators": {"x_size": 4, "y_size": 3, "rowCol": true,
        |  "indicators": ["LAND_TYPE_FRACTION"]}}""".stripMargin)
    val g1 = WorkflowRunner.run(spark, pCount, layers, grid, 10).grid.get
    assert(g1.count() == 12) // exactly 4 x 3 cells, regardless of extent
    val widths = g1.select(
      (G.stXMax(col("the_geom")) - G.stXMin(col("the_geom"))).as("w")).distinct().collect()
    assert(widths.length == 1 && widths.head.getDouble(0) == 200.0 / 4) // extent/count
    // domain=zone_extended + an extended table: envelope comes from it
    val pExt = WorkflowConfig.parse(
      """{"rsu_indicators": {"surface_vegetation": 2500, "surface_hydro": 2500},
        |"grid_indicators": {"x_size": 100, "y_size": 100, "domain": "zone_extended",
        |  "indicators": ["LAND_TYPE_FRACTION"]}}""".stripMargin)
    val ext = spark.range(1).select(lit(1).as("id_zone"),
      G.stMakeBox(lit(-120.0), lit(-120.0), lit(280.0), lit(170.0)).as("the_geom"))
    val g2 = WorkflowRunner.run(spark, pExt, layers, grid, 10,
      extendedZone = Some(ext)).grid.get
    assert(g2.agg(min(G.stXMin(col("the_geom")))).head().getDouble(0) == -120.0)
    assert(g2.count() == 4 * 3) // ceil(400/100) x ceil(290/100)
    // without an extended table the domain falls back to the zone envelope
    val g3 = WorkflowRunner.run(spark, pExt, layers, grid, 10).grid.get
    assert(g3.agg(min(G.stXMin(col("the_geom")))).head().getDouble(0) == -20.0)
  }

  test("lake root makes the chain resumable: second run reads committed stages") {
    val root = Files.createTempDirectory("wf-lake").toString
    val p = WorkflowConfig.parse(
      """{"rsu_indicators": {"surface_vegetation": 2500, "surface_hydro": 2500}}""")
    val r1 = WorkflowRunner.run(spark, p, layers, grid, 10, lakeRoot = Some(root))
    val n1 = r1.tsu.count()
    assert(Lake.isCommitted(root, "tsu") && Lake.isCommitted(root, "rsu_stats"))
    // second run resumes: same outputs, stage versions unchanged
    val r2 = WorkflowRunner.run(spark, p, layers, grid, 10, lakeRoot = Some(root))
    assert(r2.tsu.count() == n1)
    assert(Lake.currentVersion(root, "tsu") == 1)
    assert(Lake.snapshots(root, "tsu").size == 1) // no recompute happened
  }
}
