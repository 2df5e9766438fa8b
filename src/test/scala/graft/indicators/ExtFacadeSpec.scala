package graft.indicators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.fixtures.GeoFixture
import graft.index.CellGrid

/** extendedFreeFacadeFraction vs the reference golden
  * (RsuIndicatorsTests.groovy:439-456: rsu1, buildings 1-5 + 35, buffer 30
  * -> 0.177). contiguity/total_facade_length come from the fixture's input
  * columns (data_for_tests.sql:36-70). */
class ExtFacadeSpec extends SparkTestBase {
  import spark.implicits._

  test("reference golden: extended free facade fraction 0.177; SVF = 1 - fraction") {
    val attrs = Seq( // (id_build, total_facade_length, contiguity)
      (1, 64.0, 0.0), (2, 26.0, 0.0), (3, 50.0, 0.0),
      (4, 54.0, 0.18518518518518517), (5, 46.0, 0.09057971014492754),
      (35, Double.NaN, Double.NaN)).toDF("id_build", "total_facade_length", "contiguity")
    val b = GeoFixture.buildingDf(spark)
      .where($"id_build" < 6 || $"id_build" === 35)
      .join(attrs, "id_build")
      .withColumn("total_facade_length",
        when(isnan($"total_facade_length"), lit(null)).otherwise($"total_facade_length"))
      .withColumn("contiguity", when(isnan($"contiguity"), lit(null)).otherwise($"contiguity"))
    val rsu1 = GeoFixture.rsuDf(spark).where($"id_rsu" === 1)
    val out = RsuIndicators.extendedFreeFacadeFraction(b, rsu1, 30.0, CellGrid.fixture, 8)
      .head()
    assert(math.round(out.getAs[Double]("extended_free_facade_fraction") * 1000) / 1000.0 == 0.177)
    val svf = RsuIndicators.groundSkyViewFactorSimplified(b, rsu1, 30.0, CellGrid.fixture, 8).head()
    assert(math.abs(svf.getAs[Double]("ground_sky_view_factor")
      - (1.0 - out.getAs[Double]("extended_free_facade_fraction"))) < 1e-12)
  }
}
