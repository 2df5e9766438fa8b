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
