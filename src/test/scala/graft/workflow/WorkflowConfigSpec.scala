package graft.workflow

import org.scalatest.funsuite.AnyFunSuite

/** extractProcessingParameters rules (WorkflowOSM.groovy:787-1000) on JSON
  * configs: defaults, overrides, validation throws, gating derivations. */
class WorkflowConfigSpec extends AnyFunSuite {

  test("empty config -> reference defaults") {
    val p = WorkflowConfig.parse("{}")
    assert(p == WorkflowConfig.Defaults)
    assert(p.distance == 200.0 && p.hLevMin == 3 && p.svfSimplified
      && p.surfaceVegetation == 10000.0 && p.surfaceHydro == 2500.0
      && p.mapOfWeights("terrain_roughness_length") == 0.5
      && p.gridIndicators.isEmpty && !p.computeLcz)
  }

  test("scalar overrides + null-safe parses (unparseable behaves as absent)") {
    val p = WorkflowConfig.parse(
      """{"distance": "150.5", "hLevMin": "wat", "prefixName": "x",
        |"rsu_indicators": {"surface_hydro": 99, "svfSimplified": false}}""".stripMargin)
    assert(p.distance == 150.5 && p.hLevMin == 3 && p.prefixName == "x")
    assert(p.surfaceHydro == 99.0 && !p.svfSimplified)
  }

  test("indicatorUse uppercased and validated; TARGET implies a 100m grid") {
    val p = WorkflowConfig.parse(
      """{"rsu_indicators": {"indicatorUse": ["lcz", "target"]}}""")
    assert(p.computeLcz && p.computeTarget && !p.computeUtrf)
    val g = p.gridIndicators.get
    assert(g.xSize == 100 && g.ySize == 100 &&
      g.indicators == Seq("LAND_TYPE_FRACTION", "BUILDING_HEIGHT", "STREET_WIDTH"))
    intercept[IllegalArgumentException] {
      WorkflowConfig.parse("""{"rsu_indicators": {"indicatorUse": ["WOMBAT"]}}""")
    }
  }

  test("grid indicators: whitelist + COUNT_WARM_ prefix; LCZ/UTRF pulled into use") {
    val p = WorkflowConfig.parse(
      """{"grid_indicators": {"x_size": 10, "y_size": 10,
        |  "indicators": ["LCZ_PRIMARY", "UTRF_AREA_FRACTION", "COUNT_WARM_5", "NOPE"],
        |  "output": "asc", "lcz_lod": 2}}""".stripMargin)
    val g = p.gridIndicators.get
    assert(g.indicators == Seq("LCZ_PRIMARY", "UTRF_AREA_FRACTION", "COUNT_WARM_5"))
    assert(g.output == "asc" && g.lczLod.contains(2))
    assert(p.computeLcz && p.computeUtrf)
    intercept[IllegalArgumentException] {
      WorkflowConfig.parse(
        """{"grid_indicators": {"x_size": -5, "y_size": 10, "indicators": ["SVF"]}}""")
    }
    intercept[IllegalArgumentException] {
      WorkflowConfig.parse(
        """{"grid_indicators": {"x_size": 5, "y_size": 10, "indicators": ["NOPE"]}}""")
    }
  }

  test("TARGET + explicit grid: indicator list extended, x must equal y") {
    val p = WorkflowConfig.parse(
      """{"rsu_indicators": {"indicatorUse": ["TARGET"]},
        |"grid_indicators": {"x_size": 50, "y_size": 50, "indicators": ["SVF"]}}""".stripMargin)
    assert(p.gridIndicators.get.indicators ==
      Seq("SVF", "LAND_TYPE_FRACTION", "BUILDING_HEIGHT_WEIGHTED", "STREET_WIDTH"))
    intercept[IllegalArgumentException] {
      WorkflowConfig.parse(
        """{"rsu_indicators": {"indicatorUse": ["TARGET"]},
          |"grid_indicators": {"x_size": 50, "y_size": 60, "indicators": ["SVF"]}}""".stripMargin)
    }
  }

  test("mapOfWeights must carry exactly the 7 reference keys") {
    intercept[IllegalArgumentException] {
      WorkflowConfig.parse(
        """{"rsu_indicators": {"mapOfWeights": {"sky_view_factor": 1, "extra_key": 2}}}""")
    }
    val p = WorkflowConfig.parse(
      """{"rsu_indicators": {"mapOfWeights": {
        |  "sky_view_factor": 1, "aspect_ratio": 1, "building_surface_fraction": 1,
        |  "impervious_surface_fraction": 1, "pervious_surface_fraction": 1,
        |  "height_of_roughness_elements": 1, "terrain_roughness_length": 1}}}""".stripMargin)
    assert(p.mapOfWeights.values.toSet == Set(1.0))
  }

  test("road_traffic and noise gating") {
    val p = WorkflowConfig.parse(
      """{"road_traffic": true, "noise_indicators": {"ground_acoustic": true}}""")
    assert(p.roadTraffic && p.noiseGroundAcoustic)
  }

  test("input.locations bbox parsing (the offline zone-resolution entry)") {
    val (bboxes, area) = ZoneExtract.parseInput(
      """{"input": {"locations": [[43.2, 2.1, 43.26, 2.18]], "area": 2000}}""")
    assert(bboxes == Seq((43.2, 2.1, 43.26, 2.18)) && area == 2000.0)
    // default area when absent; string locations rejected offline
    assert(ZoneExtract.parseInput(
      """{"input": {"locations": [[1.0, 2.0, 1.1, 2.1]]}}""")._2 == 1000.0)
    intercept[IllegalArgumentException] {
      ZoneExtract.parseInput("""{"input": {"locations": ["Paris"]}}""")
    }
  }
}
