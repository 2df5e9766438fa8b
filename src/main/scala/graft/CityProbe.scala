package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid
import graft.operators.{ConnectedComponents, SpatialJoin, SpatialUnits, Tiling}
import graft.workflow.{WorkflowChain, WorkflowConfig, WorkflowRunner}

/**
 * City-scale chain probe: runs the composed `computeAllGeoIndicators` +
 * `rasterizeIndicators` pipeline on a GENERATED city (~10^5 buildings with
 * a dense center / sparse outskirts skew, ~2.8k street-mesh TSU, 6.4k
 * analysis-grid cells) at local[N] and prints per-stage wall / process-CPU
 * fraction / row counts. The workflow_*_e2e driver queries prove the chain
 * CORRECT at fixture scale; this probe is the measurement that the composed
 * chain also has no stage whose wall time is a driver funnel at city scale
 * (a funnel shows up as cpu_frac ≈ 1/cores on a long stage).
 *
 * Stage wiring mirrors WorkflowChain.computeAllGeoIndicators (same public
 * operators, same checkpoints between stages) so each stage is timed in
 * isolation; the scene is deterministic (lattice + modular arithmetic, no
 * RNG) so reruns are comparable.
 *
 * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_CITY_BUILDINGS (default
 * 100000).
 */
object CityProbe {

  private def readProcCpu(): Double = {
    val s = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/self/stat")), "US-ASCII")
    val rest = s.substring(s.lastIndexOf(')') + 2).split(" ")
    (rest(11).toLong + rest(12).toLong) / 100.0 // utime+stime, USER_HZ=100
  }

  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val nBuild = sys.env.getOrElse("SPARK_GRAFT_CITY_BUILDINGS", "100000").toLong
    val s = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val grid = CellGrid.fixture
    val res = 10

    // ---- the generated city (8 km x 8 km) ---------------------------------
    // 60% of buildings on a 16.3 m lattice in the central 4x4 km, 40% on a
    // 40 m lattice across the full extent — realistic center-density skew.
    val nCenter = nBuild * 3 / 5
    val nOuter = nBuild - nCenter
    val center = s.range(nCenter).select(
      col("id").as("id_build"),
      (lit(2000.0) + (col("id") % 245) * 16.3).as("x0"),
      (lit(2000.0) + floor(col("id") / 245) * 16.3).as("y0"))
    val outer = s.range(nOuter).select(
      (col("id") + nCenter).as("id_build"),
      ((col("id") % 200) * 40.0 + 5.0).as("x0"),
      (floor(col("id") / 200) * 40.0 + 5.0).as("y0"))
    val building = center.unionByName(outer)
      .withColumn("w", (col("id_build") % 7 + 6).cast("double"))
      .withColumn("h", (pmod(floor(col("id_build") / 7), lit(7)) + 6).cast("double"))
      .withColumn("the_geom",
        G.stMakeBox(col("x0"), col("y0"), col("x0") + col("w"), col("y0") + col("h")))
      .withColumn("height_wall", (col("id_build") % 10 + 3).cast("double"))
      .withColumn("height_roof", col("height_wall") + (col("id_build") % 4).cast("double"))
      .withColumn("nb_lev", (col("id_build") % 3 + 1).cast("int"))
      .withColumn("type", element_at(
        lit(Array("house", "apartments", "office", "industrial")),
        (col("id_build") % 4).cast("int") + 1))
      .drop("x0", "y0", "w", "h")
      .localCheckpoint()
    // street mesh: 200 m grid across the extent + 100 m infill in the center
    import s.implicits._
    val roadLines =
      ((0 to 8000 by 200).map(p => s"LINESTRING($p 0, $p 8000)") ++
        (0 to 8000 by 200).map(p => s"LINESTRING(0 $p, 8000 $p)") ++
        (2100 to 5900 by 200).map(p => s"LINESTRING($p 2000, $p 6000)") ++
        (2100 to 5900 by 200).map(p => s"LINESTRING(2000 $p, 6000 $p)")).toDF("wkt")
        .select(G.stGeomFromWkt(col("wkt")).as("the_geom"), lit(6.0).as("width"),
          lit(0).as("zindex"), lit(null).cast("string").as("crossing"),
          lit("primary").as("type"), lit(0).as("tunnel"))
        .localCheckpoint()
    val veg = s.range(2000).select(
      col("id").as("id_veget"),
      ((col("id") % 80) * 100.0 + 13.0).as("vx"),
      (floor(col("id") / 80) * 320.0 + 17.0).as("vy"))
      .select(col("id_veget"),
        G.stMakeBox(col("vx"), col("vy"), col("vx") + 40, col("vy") + 30).as("the_geom"),
        lit("high").as("height_class"))
      .localCheckpoint()
    val water = s.range(1000).select(
      col("id").as("id_water"), lit(0).as("zindex"),
      ((col("id") % 40) * 200.0 + 61.0).as("wx"),
      (floor(col("id") / 40) * 320.0 + 111.0).as("wy"))
      .select(col("id_water"), col("zindex"),
        G.stMakeBox(col("wx"), col("wy"), col("wx") + 25, col("wy") + 20).as("the_geom"))
      .localCheckpoint()
    val zone = s.range(1).select(lit(1).as("id_zone"),
      G.stMakeBox(lit(0.0), lit(0.0), lit(8000.0), lit(8000.0)).as("the_geom"))
    val layers = WorkflowRunner.Layers(zone = zone, building = building,
      road = Some(roadLines), vegetation = Some(veg), water = Some(water))
    val params = WorkflowConfig.Defaults.copy(indicatorUse = Seq("LCZ", "UTRF", "TEB"))

    val sb = new StringBuilder("{\"probe\":\"city_chain\",")
    sb.append(s""""cores":$cores,"n_buildings":$nBuild,"stages":{""")
    var first = true
    def stage(name: String)(body: => DataFrame): DataFrame = {
      val c0 = readProcCpu(); val t0 = System.nanoTime()
      val out = body.localCheckpoint() // eager: materializes the stage
      val n = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val cf = math.min(1.0, (readProcCpu() - c0) / (wall * cores))
      println(f"CITY stage=$name%-22s rows=$n%7d wall=$wall%8.2fs cpu_frac=$cf%.3f")
      if (!first) sb.append(",")
      sb.append(f""""$name":{"rows":$n,"wall_sec":$wall%.2f,"cpu_frac":$cf%.3f}""")
      first = false
      out
    }

    // ---- the chain, stage by stage (computeAllGeoIndicators wiring) -------
    val mesh = stage("tsu_mesh") {
      SpatialUnits.prepareTSUData(layers.zone, layers.road, layers.rail,
        layers.vegetation, layers.water, None, None,
        params.surfaceVegetation, params.surfaceHydro, params.surfaceUrbanAreas,
        grid, res).withColumn("id_zone", lit(1))
    }
    val rsu = stage("tsu")(SpatialUnits.createTSU(mesh, "id_zone", "the_geom"))
    val blocks = stage("blocks")(ConnectedComponents.createBlocks(building, grid, res))
    val blockRel = blocks.select(col("id_block"), explode(col("id_builds")).as("id_build"))
    val rsuRel = stage("building_rsu_relation") {
      SpatialJoin.assignMaxOverlap(building, "id_build", "the_geom",
        rsu.select("id_rsu", "the_geom"), "id_rsu", "the_geom", grid, res)
    }
    val uses = params.indicatorUse
    val bInd = stage("building_indicators") {
      WorkflowChain.computeBuildingsIndicators(building, layers.road, uses, grid, res)
        .join(blockRel, Seq("id_build"), "left")
        .join(rsuRel, Seq("id_build"), "left")
    }
    val blkRsuRel = SpatialJoin.assignMaxOverlap(blocks, "id_block", "the_geom",
      rsu.select("id_rsu", "the_geom"), "id_rsu", "the_geom", grid, res)
    val blkInd = stage("block_indicators") {
      WorkflowChain.computeBlockIndicators(bInd, blocks.select("id_block", "the_geom"))
        .join(blkRsuRel, Seq("id_block"), "left")
    }
    val rsuInd = stage("rsu_indicators") {
      WorkflowChain.computeRsuIndicators(bInd.where(col("id_rsu").isNotNull), rsu,
        layers.road, layers.vegetation, layers.water, None, None,
        uses, svfSimplified = true, grid, res)
    }
    val lcz = stage("lcz") {
      val lczIndics = rsuInd.select(col("id_rsu"),
        col("ground_sky_view_factor").as("sky_view_factor"),
        col("aspect_ratio"),
        col("building_fraction_lcz").as("building_surface_fraction"),
        col("impervious_fraction_lcz").as("impervious_surface_fraction"),
        col("pervious_fraction_lcz").as("pervious_surface_fraction"),
        col("geom_avg_height_roof").as("height_of_roughness_elements"),
        col("effective_terrain_roughness_length").as("terrain_roughness_length"))
      graft.indicators.Lcz.identifyLczType(lczIndics, rsuInd, params.mapOfWeights)
    }
    val cells = Tiling.makeGrid(s, 0, 0, 8000, 8000, 100, 100)
      .withColumn("id_zone", lit(1)).localCheckpoint()
    val rast = stage("rasterize") {
      WorkflowRunner.rasterizeIndicators(layers, cells,
        Seq("LAND_TYPE_FRACTION", "BUILDING_HEIGHT", "BUILDING_NUMBER",
          "BUILDING_HEIGHT_WEIGHTED", "FREE_EXTERNAL_FACADE_DENSITY",
          "ASPECT_RATIO", "STREET_WIDTH", "BUILDING_SURFACE_DENSITY"),
        grid, res, rsuLcz = Some(lcz.select(col("id_rsu"), col("lcz_primary"))
          .join(rsu.select("id_rsu", "the_geom"), "id_rsu")))
    }
    // sanity floor: the chain really ran at city scale
    require(rast.columns.contains("aspect_ratio") && lcz.count() > 1000,
      "city probe under-scaled")
    sb.append("}}")
    println(sb.toString)
    java.nio.file.Files.write(java.nio.file.Paths.get("city_probe.json"),
      (sb.toString + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    s.stop()
  }
}
