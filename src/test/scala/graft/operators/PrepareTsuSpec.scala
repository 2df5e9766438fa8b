package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.fixtures.GeoFixture
import graft.index.CellGrid
import graft.geom.{Geo, GeoFunctions => G}

/**
 * prepareTSUData (SpatialUnits.groovy:171-364) on the reference SQL fixture
 * layers (data_for_tests.sql road/veget/hydro). Hand-computed goldens:
 *  - roads 1-5 pass the filter (zindex=0, type highway, no tunnel); road 6
 *    (zindex=-1, no crossing) drops;
 *  - veget 4+5 overlap -> one contact cluster; low sum = high sum = 5000,
 *    so with surface_vegetation=2500 ONE low union (v5: 50x100, boundary
 *    300) and ONE high union (v4: 100x50, boundary 300) survive; isolated
 *    v1/v2/v3 (areas 6/25/50) fail the threshold;
 *  - hydro 2 (50x50 = 2500 >= 2500, boundary 200) survives; hydro 1 (40)
 *    drops.
 * (The reference's own 237-face golden runs on large geojson extracts that
 * are test-resource binaries — not ported; the per-branch semantics are
 * covered here and by the geo_tsu_prepare DuckDB oracle.)
 */
class PrepareTsuSpec extends SparkTestBase {

  private val grid = CellGrid.fixture

  test("prepareTSUData: filters, contact clusters, thresholds on the fixture") {
    val zone = GeoFixture.rsuDf(spark) // bounding zone: union not needed; use a box
      .limit(1).select(G.stMakeBox(lit(-20.0), lit(-20.0), lit(1200.0), lit(1200.0)).as("the_geom"))
    val road = GeoFixture.roadDf(spark).withColumn("tunnel", lit(0))
    val prepared = SpatialUnits.prepareTSUData(
      zone, Some(road), None, Some(GeoFixture.vegetDf(spark)),
      Some(GeoFixture.hydroDf(spark)), None, None,
      surfaceVegetation = 2500.0, surfaceHydro = 2500.0, surfaceUrbanAreas = 10000.0,
      grid, 10)

    val rows = prepared.select(G.stLength(col("the_geom")).as("len")).collect().map(_.getDouble(0))
    // 1 zone + 5 roads + 2 veget unions + 1 hydro = 9 lines
    assert(rows.length == 9)
    // veget unions: v5 (50x100) and v4 (100x50) both have boundary 300
    assert(rows.count(_ == 300.0) == 2)
    // hydro 2: 50x50 boundary
    assert(rows.count(_ == 200.0) == 1)
    // zone box boundary
    assert(rows.count(_ == 2 * (1220.0 + 1220.0)) == 1)
    // road lengths: road 1 is vertical 70 long
    assert(rows.count(_ == 70.0) == 1)
  }

  test("prepareTSUData + createTSU chain polygonizes deterministically") {
    val zone = spark.range(1)
      .select(G.stMakeBox(lit(0.0), lit(-20.0), lit(180.0), lit(70.0)).as("the_geom"))
    val road = GeoFixture.roadDf(spark).withColumn("tunnel", lit(0))
    val prepared = SpatialUnits.prepareTSUData(
      zone, Some(road), None, None, None, None, None,
      surfaceVegetation = 10000.0, surfaceHydro = 2500.0, surfaceUrbanAreas = 10000.0,
      grid, 10).withColumn("id_zone", lit(1))
    val tsu = SpatialUnits.createTSU(prepared, "id_zone", "the_geom")
    val n1 = tsu.count()
    val n2 = SpatialUnits.createTSU(prepared, "id_zone", "the_geom").count()
    assert(n1 > 1 && n1 == n2) // zone box cut by roads 1-4 into multiple faces
    // ids dense from 1, deterministic ordering
    val ids = tsu.select("id_rsu").collect().map(_.getInt(0)).sorted
    assert(ids.toSeq == (1 to n1.toInt))
  }
}
