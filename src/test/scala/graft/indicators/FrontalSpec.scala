package graft.indicators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid
import graft.operators.SpatialJoin

/** frontalAreaIndexDistribution vs the reference goldens
  * (RsuIndicatorsTests.groovy:771-804). */
class FrontalSpec extends SparkTestBase {
  import spark.implicits._

  test("reference goldens: rsu1 h0_5/h50_61 d30_60, rsu4 sliver, rsu5 zero") {
    val b = Seq(
      (1, "POLYGON((-50 -50, 50 -50, 50 50, -50 50, -50 -50))", 3.0),
      (2, "POLYGON((50 -50, 150 -50, 150 50, 50 50, 50 -50))", 21.0),
      (3, "POLYGON((50 50, 100 50, 100 150, 50 150, 50 50))", 60.0))
      .toDF("id_build", "wkt", "height_wall")
      .withColumn("the_geom", G.stGeomFromWkt($"wkt")).drop("wkt")
    val r = Seq(
      (1, "POLYGON((0 0, 100 0, 100 100, 0 100, 0 0))"),
      (2, "POLYGON((100 0, 200 0, 200 100, 100 100, 100 0))"),
      (3, "POLYGON((0 100, 100 100, 100 200, 0 200, 0 100))"),
      (4, "POLYGON((100 100, 200 100, 200 200, 100 200, 100 100))"),
      (5, "POLYGON((200 200, 300 200, 300 300, 200 300, 200 200))"))
      .toDF("id_rsu", "wkt")
      .withColumn("the_geom", G.stGeomFromWkt($"wkt")).drop("wkt")
    val corr = SpatialJoin.intersectsJoin(b, "the_geom",
      r.select($"id_rsu", $"the_geom".as("__rgeom")), "__rgeom", CellGrid.fixture, 8)
      .select("id_build", "id_rsu", "the_geom", "height_wall")
    val out = RsuIndicators.frontalAreaIndexDistribution(corr, r)
      .collect().map(x => x.get(0).toString.toInt -> x).toMap
    def v(id: Int, n: String) = out(id).getAs[Double](n)
    assert(math.abs(v(1, "frontal_area_index_h0_5_d30_60") - 0.00566) < 1e-5)
    assert(math.abs(v(1, "frontal_area_index_h50_61_d30_60") - 0.00321) < 1e-5)
    assert(math.abs(v(4, "frontal_area_index_h50_61_d30_60") - 0.00321) < 1e-5)
    assert(v(5, "frontal_area_index_h0_5_d30_60") == 0.0)
  }
}
