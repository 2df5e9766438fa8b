package graft.operators

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** ASC raster sink: header, row order (id_row DESC), fixed-point values,
  * -9999 nodata holes (WorkflowUtilities.groovy:168-215 semantics). */
class AscSpec extends SparkTestBase {
  import spark.implicits._

  test("rasterize + writeAsc round-trip") {
    val pts = Seq((2.0, 2.0, 1.5), (7.0, 2.0, 2.5), (2.0, 7.0, 4.0), (2.5, 7.5, 1.0))
      .toDF("x", "y", "v")
    val tiles = Tiling.rasterizePoints(pts, "x", "y", 0, 0, 5, 5,
      Seq(sum($"v").as("sv")))
    val path = Files.createTempDirectory("asc").resolve("g_sv.asc").toString
    Tiling.writeAsc(tiles, "sv", path, 0, 0, 5, nCols = 2, nRows = 2)
    val lines = scala.io.Source.fromFile(path).getLines().toSeq
    assert(lines.take(6) == Seq("ncols 2", "nrows 2", "xllcorner 0.0",
      "yllcorner 0.0", "cellsize 5.0", "nodata_value -9999"))
    // reference byte format: every value followed by ONE space before the
    // newline (WorkflowUtilities.groovy:206-215)
    assert(lines(6) == "5.000 -9999 ")  // top row (id_row 2): (1,2)=4+1, (2,2) empty
    assert(lines(7) == "1.500 2.500 ")  // bottom row (id_row 1)
  }
}
