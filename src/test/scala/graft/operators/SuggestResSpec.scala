package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid

class SuggestResSpec extends SparkTestBase {
  import spark.implicits._
  private val grid = CellGrid.fixture

  test("suggestRes sizes cells to the layer's geometry scale") {
    def layer(sz: Double) = Seq.tabulate(500)(i => (i * 10.0, i * 7.0 % 300))
      .toDF("x", "y")
      .withColumn("g", G.stMakeBox($"x", $"y", $"x" + sz, $"y" + sz))
    val small = SpatialJoin.suggestRes(layer(2.0), "g", grid, 1.0)
    val large = SpatialJoin.suggestRes(layer(100.0), "g", grid, 1.0)
    assert(small > large)                      // finer cells for smaller geometries
    assert(grid.cellSize(small) >= 2.0 * 2 * 0.5)  // cells not absurdly small
    assert(grid.cellSize(small) <= 2.0 * 2 * 2)    // ~2x median extent
    assert(grid.cellSize(large) >= 100.0 && grid.cellSize(large) <= 400.0)
  }
}
