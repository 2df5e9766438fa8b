package graft.indicators

import org.apache.spark.sql.Row
import graft.SparkTestBase
import graft.fixtures.GeoFixture

/** Goldens from the reference's identifyLczTypeTest
  * (TypologyClassificationTests.groovy:54-93). */
class LczSpec extends SparkTestBase {

  lazy val out: Map[Int, Row] =
    Lcz.identifyLczType(GeoFixture.lczIndicsDf(spark), GeoFixture.rsuAllIndicsLczDf(spark))
      .collect().map(r => r.getAs[Int]("id_rsu") -> r).toMap

  private def primary(id: Int) = out(id).getAs[Int]("lcz_primary")
  private def uniq(id: Int) = out(id).getAs[Double]("lcz_uniqueness_value")

  test("all 20 RSUs classified, primary != secondary") {
    assert(out.size == 20)
    out.values.foreach { r =>
      val p = r.getAs[Int]("lcz_primary")
      val s = r.get(r.fieldIndex("lcz_secondary"))
      if (s != null) assert(p != s.asInstanceOf[Int])
    }
  }

  test("urban goldens: rsu1 -> LCZ1 dist 0; rsu2 -> LCZ5; rsu20 -> LCZ4") {
    assert(primary(1) == 1)
    assert(out(1).getAs[Double]("min_distance") == 0.0)
    assert(primary(2) == 5)
    assert(out(2).getAs[Double]("min_distance") > 0)
    assert(out(2).getAs[Double]("lcz_equality_value") < 1)
    assert(primary(20) == 4) // same as rsu1 but avg_nb_lev 8.8 < 10 masks LCZ1
  }

  test("rural goldens with uncertainty formulas") {
    assert(primary(3) == 107)
    assert(out(3).get(out(3).fieldIndex("lcz_secondary")) == null)
    assert(primary(4) == 102)
    assert(math.abs(uniq(4) - (0.25 + 0.25 + 0.25 * 0.7 / 0.9 + 0.25 * 0.2 / (1 - 0.2 - 0.1) / 0.35)) < 0.001)
    assert(primary(5) == 101)
    assert(math.abs(uniq(5) - (1.5 / 10 + 8.0 / 9) / 2) < 0.001)
    assert(primary(6) == 104)
    assert(math.abs(uniq(6) - (0.25 + 0.25 + 0.5 * 0.5 / 0.9)) < 0.001)
    assert(primary(7) == 105)
    assert(math.abs(uniq(7) - (0.25 + 0.25 + 0.5 * 0.35 / 0.9)) < 0.001)
    assert(primary(18) == 107)
    assert(math.abs(uniq(18) - (0.25 + 0.25 + 0.5 * 0.899 / 0.9)) < 0.001)
  }

  test("industrial/commercial golden: rsu19 -> LCZ8") {
    assert(primary(19) == 8)
    assert(math.abs(uniq(19) - 0.08 / 0.67) < 0.001)
  }
}
