package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geom.{GeoFunctions => G}

/**
 * ESRI ASCII grid (.asc) source — the WorldPop population import
 * (reference worldpoptools/WorldPopExtract.groovy:80-115 `importAscGrid`,
 * which delegates to H2GIS's AscReaderDriver): header (ncols/nrows/
 * xllcorner|xllcenter/yllcorner|yllcenter/cellsize/nodata_value) + row-major
 * values starting at the TOP row. Every data cell becomes one polygon row
 * `(id_pop, pop, the_geom)` — the reference's (PK, Z, THE_GEOM) renamed —
 * with PK numbering the data cells in read order (top row first, left to
 * right) and nodata cells skipped.
 *
 * Scale shape: one .asc file is a bounded raster (the reference reads it
 * through a single JDBC connection too), so the header+values parse is
 * driver-side; the cell table is then parallelized and every downstream
 * consumer (buildingPopulation / gridPopulation) is a distributed
 * cell-equijoin. Web-scale population data stays in the lake as parquet —
 * .asc is the reference's exchange format, supported for parity.
 */
object AscGrid {

  final case class Header(nCols: Int, nRows: Int, xll: Double, yll: Double,
                          cellSize: Double, noData: Double)

  def parseHeader(lines: Iterator[String]): (Header, Iterator[String]) = {
    var nCols = -1; var nRows = -1
    var xll = Double.NaN; var yll = Double.NaN
    var xCenter = false; var yCenter = false
    var cell = Double.NaN; var noData = -9999.0
    var headerDone = false
    val buffered = lines.buffered
    while (!headerDone && buffered.hasNext) {
      val parts = buffered.head.trim.split("\\s+")
      if (parts.length == 2 && parts(0).head.isLetter) {
        buffered.next()
        parts(0).toLowerCase match {
          case "ncols" => nCols = parts(1).toInt
          case "nrows" => nRows = parts(1).toInt
          case "xllcorner" => xll = parts(1).toDouble
          case "yllcorner" => yll = parts(1).toDouble
          case "xllcenter" => xll = parts(1).toDouble; xCenter = true
          case "yllcenter" => yll = parts(1).toDouble; yCenter = true
          case "cellsize" => cell = parts(1).toDouble
          case "nodata_value" => noData = parts(1).toDouble
          case other => throw new IllegalArgumentException(s"unknown asc header key $other")
        }
      } else headerDone = true
    }
    require(nCols > 0 && nRows > 0 && !cell.isNaN && !xll.isNaN && !yll.isNaN,
      "incomplete asc header")
    if (xCenter) xll -= cell / 2
    if (yCenter) yll -= cell / 2
    (Header(nCols, nRows, xll, yll, cell, noData), buffered)
  }

  /**
   * Read an .asc file into `(id_pop INT, pop DOUBLE, the_geom)`.
   * id_pop = 1-based rank of the data cell in read order (top row first),
   * matching the reference's PK; nodata cells are skipped.
   */
  def readAsc(spark: SparkSession, path: String): DataFrame = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    val rows = try {
      val (h, rest) = parseHeader(src.getLines())
      val values = rest.flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
        .map(_.toDouble).toArray
      require(values.length == h.nCols * h.nRows,
        s"expected ${h.nCols * h.nRows} values, got ${values.length}")
      var id = 0
      val out = Seq.newBuilder[(Int, Double, Double, Double, Double, Double)]
      var i = 0
      while (i < values.length) {
        val v = values(i)
        if (v != h.noData) {
          id += 1
          val r = i / h.nCols          // 0-based from the TOP row
          val c = i % h.nCols
          val x0 = h.xll + c * h.cellSize
          val y0 = h.yll + (h.nRows - 1 - r) * h.cellSize
          out += ((id, v, x0, y0, x0 + h.cellSize, y0 + h.cellSize))
        }
        i += 1
      }
      out.result()
    } finally src.close()
    import spark.implicits._
    rows.toDF("id_pop", "pop", "__x0", "__y0", "__x1", "__y1")
      .select(col("id_pop"), col("pop"),
        G.stMakeBox(col("__x0"), col("__y0"), col("__x1"), col("__y1")).as("the_geom"))
  }
}
