package graft.lake

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.Geo

class PagesSpec extends SparkTestBase {

  test("pages synthesis is deterministic and text survives html round-trip byte-identically") {
    import spark.implicits._
    val p1 = Pages.synth(spark, 2000)
    val p2 = Pages.synth(spark, 2000)
    // determinism: same content both runs
    assert(p1.select("url", "text").except(p2.select("url", "text")).isEmpty)
    // the north-rule invariant: extracted text == text, byte-for-byte, per url
    val bad = p1.withColumn("ex", Pages.extractText($"html"))
      .where($"ex".isNull || encode($"ex", "UTF-8") =!= encode($"text", "UTF-8"))
      .count()
    assert(bad == 0)
  }

  test("footprint extraction yields valid polygons for the expected fraction") {
    import spark.implicits._
    val p = Pages.synth(spark, 1000)
      .withColumn("fp", Pages.extractFootprintWkt($"html"))
    val n = p.where($"fp".isNotNull).count()
    assert(n == 300) // i % 10 < 3
    val wkts = p.where($"fp".isNotNull).select("fp").as[String].collect()
    wkts.foreach { w => val g = Geo.fromWkt(w); assert(g.isValid && g.getArea > 0) }
  }

  test("geocode is stable and lands in the fixture window") {
    import spark.implicits._
    val g = Pages.geocode(Pages.synth(spark, 1000))
    val mm = g.agg(min("x"), max("x"), min("y"), max("y")).head()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) < 55.1)
    assert(mm.getDouble(2) >= -15.1 && mm.getDouble(3) < 40.1)
    // hotspot skew: ~20% of points in the 2x2 hotspot cell
    val hot = g.where($"x" >= 29 && $"x" <= 31 && $"y" >= 29 && $"y" <= 31).count()
    assert(hot >= 180 && hot <= 220)
  }
}
