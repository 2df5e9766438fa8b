package graft.indicators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.fixtures.GeoFixture
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid

/**
 * smallestCommonGeometry + surfaceFractions on the fixture's rsu4 layer
 * stack (buildings 9/10, high veget 4, low veget 5, water 2) — flag-area
 * sums must equal direct intersection areas (the reference test's property,
 * RsuIndicatorsTests.groovy:459-530) and the priority/superposition
 * fractions match hand-computed values.
 */
class ScgSpec extends SparkTestBase {
  import spark.implicits._
  private val grid = CellGrid.fixture

  private def layers = Seq(
    "water" -> GeoFixture.hydroDf(spark).select("the_geom"),
    "building" -> GeoFixture.buildingDf(spark).where($"id_rsu" === 4).select("the_geom"),
    "high_vegetation" -> GeoFixture.vegetDf(spark).where($"height_class" === "high").select("the_geom"),
    "low_vegetation" -> GeoFixture.vegetDf(spark).where($"height_class" === "low").select("the_geom"))

  private def rsu4 = GeoFixture.rsuDf(spark).where($"id_rsu" === 4).select("id_rsu", "the_geom")

  test("atom flag-area sums equal direct intersection areas") {
    val scg = RsuIndicators.smallestCommonGeometry(rsu4, layers, grid, 10)
    val sums = scg.groupBy("id_rsu").agg(
      sum(when($"building" === 1, $"area").otherwise(0.0)).as("b"),
      sum(when($"high_vegetation" === 1, $"area").otherwise(0.0)).as("hv"),
      sum(when($"low_vegetation" === 1, $"area").otherwise(0.0)).as("lv"),
      sum(when($"water" === 1, $"area").otherwise(0.0)).as("w")).head()
    assert(math.abs(sums.getAs[Double]("b") - 4000.0) < 1e-6)  // b9 + b10 in rsu4
    assert(math.abs(sums.getAs[Double]("hv") - 5000.0) < 1e-6) // veget4 ∩ rsu4
    assert(math.abs(sums.getAs[Double]("lv") - 5000.0) < 1e-6) // veget5 ∩ rsu4
    assert(math.abs(sums.getAs[Double]("w") - 2500.0) < 1e-6)  // hydro2 ∩ rsu4
  }

  test("priority/superposition fractions: hand-computed rsu4 goldens") {
    val scg = RsuIndicators.smallestCommonGeometry(rsu4, layers, grid, 10)
    val out = RsuIndicators.surfaceFractions(scg, rsu4,
      Map("high_vegetation" -> Seq("water", "building", "low_vegetation")),
      Seq("water", "building", "high_vegetation", "low_vegetation")).head()
    def v(n: String) = out.getAs[Double](n)
    assert(math.abs(v("high_vegetation_fraction") - 0.15) < 1e-9)
    assert(math.abs(v("high_vegetation_building_fraction") - 0.20) < 1e-9)
    assert(math.abs(v("high_vegetation_low_vegetation_fraction") - 0.15) < 1e-9)
    assert(math.abs(v("water_fraction") - 0.25) < 1e-9)
    assert(math.abs(v("building_fraction") - 0.10) < 1e-9)
    assert(math.abs(v("low_vegetation_fraction") - 0.15) < 1e-9)
    assert(math.abs(v("undefined_fraction")) < 1e-9)
  }
}
