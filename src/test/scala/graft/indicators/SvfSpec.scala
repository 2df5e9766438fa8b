package graft.indicators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.Geo
import graft.index.CellGrid

/** Exact-SVF kernel goldens: Halton radical inverses, single-wall hand
  * case, and the n=0 point-on-surface fallback of the sampling stage. */
class SvfSpec extends SparkTestBase {
  import spark.implicits._

  test("radical inverses") {
    assert(Svf.radical2(1) == 0.5 && Svf.radical2(2) == 0.25 && Svf.radical2(3) == 0.75)
    assert(math.abs(Svf.radical3(1) - 1.0 / 3) < 1e-15)
    assert(math.abs(Svf.radical3(3) - 1.0 / 9) < 1e-15)
  }

  test("svfAtPoint: single wall, hand-computed") {
    // point at origin; square wall [10,20]x[-5,5], h=10; 4 cardinal rays.
    // East ray crosses x=10 at t=10 -> sin^2 = 100/(100+100) = 0.5; the far
    // wall (x=20, t=20, sin^2=0.2) loses the max; N/W/S rays miss.
    val wall = Geo.toWkb(Geo.box(10, -5, 20, 5))
    val svf = Svf.svfAtPoint(0, 0, Seq((wall, 10.0)), Svf.directions(4), 100.0)
    assert(math.abs(svf - (1.0 - 0.5 / 4)) < 1e-12)
    // ray length cuts the obstruction off
    val svfShort = Svf.svfAtPoint(0, 0, Seq((wall, 10.0)), Svf.directions(4), 5.0)
    assert(svfShort == 1.0)
  }

  test("deterministic sampling is reproducible and interior-only") {
    val poly = Geo.toWkb(Geo.box(0, 0, 50, 50))
    val p1 = Svf.deterministicPoints(poly, 20)
    val p2 = Svf.deterministicPoints(poly, 20)
    assert(p1.toSeq == p2.toSeq && p1.length == 20)
    assert(p1.forall { case (x, y) => x > 0 && x < 50 && y > 0 && y < 50 })
  }

  test("groundSkyViewFactor: empty-building RSU averages to 1.0") {
    val rsu = Seq((1, Geo.toWkb(Geo.box(0, 0, 100, 100)))).toDF("id_rsu", "the_geom")
    val bld = Seq.empty[(Array[Byte], Double)].toDF("the_geom", "height_wall")
    val out = Svf.groundSkyViewFactor(rsu, bld, CellGrid.fixture, 10,
      pointDensity = 0.002, rayLength = 100.0, numberOfDirection = 8)
    val r = out.collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(r.toSeq == Seq((1, 1.0))) // no walls in range -> no scored points -> 1
  }
}
