package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.fixtures.GeoFixture
import graft.geom.{GeoFunctions => G}

/** createTSU vs the reference golden: fixture roads 1-4 polygonize into 9
  * faces (SpatialUnitsTests.groovy:68-76). */
class SpatialUnitsSpec extends SparkTestBase {
  import spark.implicits._

  test("fixture roads 1-4 -> 9 TSU faces") {
    val roads = GeoFixture.roadDf(spark).where($"id_road" < 5)
      .select(lit(1).as("id_zone"), $"the_geom")
    val tsu = SpatialUnits.createTSU(roads, "id_zone", "the_geom")
    assert(tsu.count() == 9)
    // ids are dense 1..9 and deterministic
    assert(tsu.select("id_rsu").as[Int].collect().sorted.toSeq == (1 to 9))
  }

  test("sprawl family is zone-independent: two zones == each zone run separately") {
    // two copies of a small urban scenario, zone 2 offset by 10000 in x so
    // geometry can never interact across zones; per-zone results must equal
    // the single-zone run (ids in zone 2 continue after zone 1's)
    def gi(zone: Int, xOff: Double) = {
      val cells = Tiling.makeGrid(spark, xOff, 0, xOff + 200, 100, 10, 10)
      val urban = col("id_col").between(1, 8) && col("id_row").between(2, 7)
      cells.withColumn("lcz_primary", when(urban, 1).otherwise(101))
        .withColumn("id_zone", lit(zone))
    }
    val both = gi(1, 0).unionByName(gi(2, 10000))
    val sprawl = SpatialUnits.computeSprawlAreas(both, "id_zone", "lcz_primary", 15.0)
    val solo = SpatialUnits.computeSprawlAreas(gi(1, 0), "id_zone", "lcz_primary", 15.0)
    val z1 = sprawl.where($"id_zone" === 1)
      .select($"id", round(G.stArea($"the_geom"), 6).as("a")).collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    val s1 = solo.select($"id", round(G.stArea($"the_geom"), 6).as("a")).collect().map(r => (r.getInt(0), r.getDouble(1))).toSet
    assert(z1 == s1)
    val z2 = sprawl.where($"id_zone" === 2).select("id").as[Int].collect().sorted.toSeq
    assert(z2.head == s1.size + 1) // dense ids continue across zones
    val inv = SpatialUnits.inversePolygonsLayer(sprawl, "id_zone")
    assert(inv.where($"id_zone" === 1).count() == inv.where($"id_zone" === 2).count())
  }

  test("grid mesh polygonizes into exact unit faces") {
    val wkts = (0 to 3).map(i => s"LINESTRING(${i * 20} 0, ${i * 20} 60)") ++
      (0 to 3).map(j => s"LINESTRING(0 ${j * 20}, 60 ${j * 20})")
    val lines = wkts.toDF("wkt").select(lit(1).as("id_zone"), G.stGeomFromWkt($"wkt").as("the_geom"))
    val tsu = SpatialUnits.createTSU(lines, "id_zone", "the_geom")
      .withColumn("area", round(G.stArea($"the_geom"), 2))
    assert(tsu.count() == 9)
    assert(tsu.select("area").as[Double].collect().forall(_ == 400.0))
  }
}
