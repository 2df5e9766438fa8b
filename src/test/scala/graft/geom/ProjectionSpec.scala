package graft.geom

import org.scalatest.funsuite.AnyFunSuite

/** UTM (Karney-Krüger 6th-order) invariants: published quarter meridian,
  * central-meridian anchors, scale factor k0, and forward/inverse
  * round-trips at sub-micrometre accuracy. */
class ProjectionSpec extends AnyFunSuite {

  test("rectifying radius reproduces the published WGS84 quarter meridian") {
    // 10001965.7293 m is the standard published value (e.g. NGA TR8350.2)
    assert(math.abs(Projection.RectA * math.Pi / 2 - 10001965.7293) < 1e-3)
  }

  test("central meridian anchors: equator origin and k0 scale") {
    val (e0, n0) = Projection.utmForward(3.0, 0.0, 31, north = true)
    assert(math.abs(e0 - 500000.0) < 1e-6 && math.abs(n0) < 1e-6)
    // scale along the central meridian is k0 = 0.9996: numeric derivative
    val (_, nA) = Projection.utmForward(3.0, 45.0, 31, north = true)
    val (_, nB) = Projection.utmForward(3.0, 45.0 + 1e-5, 31, north = true)
    // meridian radius of curvature at 45 deg (closed form)
    val e2 = 0.0066943799901413165
    val m45 = 6378137.0 * (1 - e2) / math.pow(1 - e2 * math.pow(math.sin(math.toRadians(45)), 2), 1.5)
    val dN = (nB - nA) / math.toRadians(1e-5)
    assert(math.abs(dN / m45 - 0.9996) < 1e-6)
  }

  test("forward/inverse round-trip over the zone") {
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val lon = 0.5 + rnd.nextDouble() * 5.0   // zone 31: [0, 6]
      val lat = -80 + rnd.nextDouble() * 160.0
      val north = lat >= 0
      val (e, n) = Projection.utmForward(lon, lat, 31, north)
      val (lon2, lat2) = Projection.utmInverse(e, n, 31, north)
      assert(math.abs(lon2 - lon) < 1e-9, s"lon $lon lat $lat")
      assert(math.abs(lat2 - lat) < 1e-9, s"lon $lon lat $lat")
    }
  }

  test("utmZone picks the standard zone") {
    assert(Projection.utmZone(3.0) == 31 && Projection.utmZone(-73.9) == 18
      && Projection.utmZone(-180.0) == 1 && Projection.utmZone(179.99) == 60)
  }
}
