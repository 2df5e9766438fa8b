package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkTestBase}
import graft.geom.{Geo, GeoFunctions => G}
import graft.index.CellGrid
import graft.fixtures.GeoFixture

/** Cell-equijoin operators vs a brute-force JTS oracle on the reference
  * fixture geometries (data_for_tests.sql) — the candidates+refinement path
  * must agree exactly with the naive cross product. */
class SpatialJoinSpec extends SparkTestBase {
  val grid = CellGrid.fixture
  val Res = 10

  lazy val buildings = GeoFixture.buildings.map { case (id, _, _, _, wkt, _, _, _, _) => (id, Geo.fromWkt(wkt)) }
  lazy val rsus = GeoFixture.rsus.map { case (id, wkt, _, _, _) => (id, Geo.fromWkt(wkt)) }

  test("pointInPolygon matches brute-force JTS for random points") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val pts = (1 to 2000).map(i => (i.toLong, rnd.nextDouble() * 120 - 40, rnd.nextDouble() * 120 - 40))
    val expected = (for {
      (pid, x, y) <- pts
      (rid, geom) <- rsus if geom.contains(Geo.point(x, y))
    } yield (pid, rid)).toSet
    val ptsDf = pts.toDF("pid", "x", "y")
    val rsuDf = GeoFixture.rsuDf(spark).select($"id_rsu", $"the_geom")
    val got = SpatialJoin.pointInPolygon(ptsDf, "x", "y", rsuDf, "the_geom", grid, Res)
      .select($"pid", $"id_rsu").as[(Long, Int)].collect().toSet
    assert(got == expected)
  }

  test("pointInPolygon salted shuffle path agrees with broadcast path") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val pts = (1 to 500).map(i => (i.toLong, rnd.nextDouble() * 60, rnd.nextDouble() * 60 - 15)).toDF("pid", "x", "y")
    val rsuDf = GeoFixture.rsuDf(spark).select($"id_rsu", $"the_geom")
    val a = SpatialJoin.pointInPolygon(pts, "x", "y", rsuDf, "the_geom", grid, Res,
      broadcastPolys = true).select("pid", "id_rsu").as[(Long, Int)].collect().toSet
    val b = SpatialJoin.pointInPolygon(pts, "x", "y", rsuDf, "the_geom", grid, Res,
      broadcastPolys = false, salts = 4).select("pid", "id_rsu").as[(Long, Int)].collect().toSet
    assert(a == b)
  }

  test("intersectsJoin (building x building) matches brute force, no duplicate pairs") {
    import spark.implicits._
    val expected = (for {
      (ia, ga) <- buildings; (ib, gb) <- buildings
      if ia != ib && ga.intersects(gb)
    } yield (ia, ib)).toSet
    val b = GeoFixture.buildingDf(spark).select($"id_build", $"the_geom")
    val b2 = b.select($"id_build".as("id_b"), $"the_geom".as("geom_b"))
    val got = SpatialJoin.intersectsJoin(b, "the_geom", b2, "geom_b", grid, Res)
      .where($"id_build" =!= $"id_b")
      .select($"id_build", $"id_b").as[(Int, Int)].collect()
    assert(got.length == got.toSet.size, "reference-point dedup must emit each pair once")
    assert(got.toSet == expected)
  }

  test("assignMaxOverlap building->block reproduces the fixture correlation") {
    import spark.implicits._
    // every building whose id_block is set must be assigned to that block
    val expected = GeoFixture.blockBuildCorr.map(_.swap).toMap // id_build -> id_block
    val b = GeoFixture.buildingDf(spark).select($"id_build", $"the_geom")
      .where($"id_build".isin(expected.keys.toSeq: _*))
    val blocks = GeoFixture.blockDf(spark)
    val got = SpatialJoin.assignMaxOverlap(b, "id_build", "the_geom", blocks, "id_block", "the_geom", grid, Res)
      .as[(Int, Int)].collect().toMap
    assert(got == expected)
  }

  test("minDistanceWithin matches brute force (bounded, with default)") {
    import spark.implicits._
    val maxD = 100.0
    val expected = buildings.map { case (id, ga) =>
      val ds = buildings.filter(_._1 != id).map(_._2.distance(ga)).filter(_ <= maxD)
      id -> (if (ds.isEmpty) maxD else ds.min)
    }.toMap
    val b = GeoFixture.buildingDf(spark).select($"id_build", $"the_geom")
    val got = SpatialJoin.minDistanceWithin(b, "id_build", "the_geom",
        b.select($"id_build".as("tid"), $"the_geom".as("tgeom")), "tgeom",
        maxD, maxD, grid, Res, excludeSelfId = Some("tid"))
      .select($"id_build", $"min_distance").as[(Int, Double)].collect().toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (id, d) => assert(math.abs(got(id) - d) < 1e-9, s"id=$id") }
  }

  test("zonalAreaStats fractions: veget areas inside rsu 14") {
    import spark.implicits._
    val rsuDf = GeoFixture.rsuDf(spark).select($"id_rsu", $"the_geom")
    val veg = GeoFixture.vegetDf(spark)
    val out = Tiling.zonalAreaStats(rsuDf, "id_rsu", "the_geom", veg, "the_geom",
      "height_class", Seq("low", "high"), grid, Res)
    val row = out.where($"id_rsu" === 14).select("area_fraction_low", "area_fraction_high").head()
    // veget 1 (low, 1x6 at y 98..104) clips to 1x4 inside rsu14: 4/2500 = 0.0016
    // veget 2 (5x5 high) fully inside rsu14 (2500): 25/2500 = 0.01
    // veget 3 (10x5 high) half inside rsu14 (x 45..55 clipped at 50): 25/2500 = 0.01
    assert(math.abs(row.getDouble(0) - 0.0016) < 1e-12)
    assert(math.abs(row.getDouble(1) - 0.02) < 1e-12)
  }
}
