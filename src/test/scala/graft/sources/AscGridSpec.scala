package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid
import graft.indicators.BuildingIndicators

/** ESRI ASCII grid reader vs the engine's own writer + hand-built files. */
class AscGridSpec extends SparkTestBase {

  private def write(content: String): String = {
    val f = java.nio.file.Files.createTempFile("asc-spec", ".asc")
    java.nio.file.Files.write(f, content.getBytes("UTF-8"))
    f.toString
  }

  test("corner-form grid: cells, order, geometry, nodata skipped") {
    val path = write(
      """ncols 3
        |nrows 2
        |xllcorner 10
        |yllcorner 20
        |cellsize 5
        |nodata_value -9999
        |1.5 -9999 3.25
        |4 5 -9999
        |""".stripMargin)
    val rows = AscGrid.readAsc(spark, path)
      .select(col("id_pop"), col("pop"),
        G.stX(G.stCentroid(col("the_geom"))).as("cx"),
        G.stY(G.stCentroid(col("the_geom"))).as("cy"))
      .orderBy("id_pop").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // top row first (y = 25..30 band), nodata cells skipped, PK sequential
    assert(rows.toSeq == Seq(
      (1, 1.5, 12.5, 27.5), (2, 3.25, 22.5, 27.5),
      (3, 4.0, 12.5, 22.5), (4, 5.0, 17.5, 22.5)))
  }

  test("center-form header shifts the origin by half a cell") {
    val path = write(
      """ncols 2
        |nrows 1
        |xllcenter 1
        |yllcenter 1
        |cellsize 2
        |7 8
        |""".stripMargin)
    val rows = AscGrid.readAsc(spark, path)
      .select(G.stX(G.stCentroid(col("the_geom"))).as("cx"),
        G.stY(G.stCentroid(col("the_geom"))).as("cy"))
      .orderBy("cx").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1.0, 1.0), (3.0, 1.0)))
  }

  test("round-trip through Tiling.writeAsc and into buildingPopulation") {
    import spark.implicits._
    val vals = Seq((1, 1, 100.0), (2, 1, 200.0), (1, 2, 400.0))
      .toDF("id_col", "id_row", "pop") // (2,2) missing -> nodata pad
    val path = java.nio.file.Files.createTempFile("asc-rt", ".asc").toString
    graft.operators.Tiling.writeAsc(vals, "pop", path, 0.0, 0.0, 50.0, 2, 2)
    val zones = AscGrid.readAsc(spark, path)
    assert(zones.count() == 3) // padded nodata cell dropped
    // population disaggregation consumes the asc zones directly
    val b = Seq((1L, 5.0, 5.0, 10.0, 10.0, 2), (2L, 60.0, 5.0, 70.0, 15.0, 1))
      .toDF("id_build", "x0", "y0", "x1", "y1", "nb_lev")
      .select(col("id_build"), G.stMakeBox(col("x0"), col("y0"), col("x1"), col("y1"))
        .as("the_geom"), col("nb_lev"), lit("residential").as("main_use"))
    val popped = BuildingIndicators.buildingPopulation(b, zones,
      Seq("residential"), CellGrid.fixture, 10)
      .orderBy("id_build").collect().map(r => (r.getLong(0), r.getDouble(1)))
    // each building alone in its zone receives the full zone population
    assert(popped.toSeq == Seq((1L, 100.0), (2L, 200.0)))
  }
}
