package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{GeoFunctions => G}

/**
 * BDTopo v2 building path end-to-end on the reference's REAL sample commune
 * (shapefiles → loading merge → formatting), asserting the reference's own
 * formatting invariants (bdtopo InputDataFormattingTest: no zero
 * heights/levels, types always set, zindex in range, no empty geometries).
 */
class BdTopoSpec extends SparkTestBase {

  private val dir =
    "/root/reference/bdtopo/src/test/resources/org/orbisgis/geoclimate/bdtopo/v2/sample_12174"

  test("load + format the sample commune's buildings") {
    val raw = BdTopo.loadBuildings(spark, dir).withColumn("id_zone", lit(1))
    // three BATI layers merged; HAUTEUR>=0 drops nothing here (all present)
    assert(raw.count() == 10481 + 655 + 66) // indifferencie + industriel + remarquable
    val out = BdTopo.formatBuildingLayer(raw, "id_zone").localCheckpoint()
    val n = out.count()
    assert(n > 10000)
    // reference invariants (InputDataFormattingTest v2 :100-103)
    assert(out.where(col("height_wall") === 0 || col("height_roof") === 0
      || col("nb_lev") === 0).count() == 0)
    assert(out.where(col("type").isNull || col("main_use").isNull).count() == 0)
    assert(out.where(!col("zindex").between(-4, 4)).count() == 0)
    assert(out.where(G.stIsEmpty(col("the_geom"))).count() == 0)
    assert(out.where(col("height_roof") < col("height_wall")).count() == 0)
    // dictionary applied: the indifferencie mass is residential; the
    // industrial layer's NATURE values map through the dictionary
    val types = out.groupBy("type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types("residential") > 10000)
    assert(types.keySet.exists(t => t != "residential"))
    // ids dense 1..n
    assert(out.agg(min("id_build"), max("id_build")).head() match {
      case r => r.getInt(0) == 1 && r.getInt(1) == n.toInt
    })
    // zero-HAUTEUR buildings are estimated at their type's default level
    val est = out.where(col("estimated")).count()
    assert(est > 0 && est < n)
  }
}
