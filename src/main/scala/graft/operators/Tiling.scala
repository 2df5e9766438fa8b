package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid

/**
 * Grid / tiling + raster<->vector zonal aggregation — the reference's
 * `createGrid` (ST_MakeGrid — SpatialUnits.groovy:563-567) and
 * `upperScaleAreaStatistics` pivot zonal stats (GenericIndicators.groovy:
 * 997-1124) + grid rasterization (WorkflowGeoIndicators.groovy:1732-2227).
 *
 * Scale notes: tile assignment for POINTS is pure Catalyst column math
 * (floor division — codegen'd, no UDF, no explode, no shuffle) so a 10^12-row
 * pages table rasterizes in one map stage + one hash aggregate. Polygon
 * zonal stats go through the cell-equijoin candidates with the contains
 * fast path (no intersection computed for fully-contained geometries).
 */
object Tiling {

  /** Scale-adaptive slice count for a generated table of `n` rows: ~64k
    * cells per task (a city grid stays 1 task; a 10^8-cell national grid
    * still fans out), capped at 4x the cluster parallelism. The default
    * `spark.range` slicing (defaultParallelism) costs 32 near-empty tasks
    * per scan of a 9-cell fixture grid — guide §2.2/§6: partition count
    * must follow data volume, not a host constant. */
  private def rangeSlices(spark: SparkSession, n: Long): Int =
    math.min(math.max(1L, (n + 65535L) / 65536L),
      4L * spark.sparkContext.defaultParallelism).toInt

  /** Rectangular grid as a DataFrame(id_grid, id_col, id_row, the_geom WKB).
    * Generated distributed via `spark.range` — no driver-side loop. */
  def makeGrid(spark: SparkSession, x0: Double, y0: Double, x1: Double, y1: Double,
               dx: Double, dy: Double): DataFrame = {
    val nCols = math.ceil((x1 - x0) / dx).toLong
    val nRows = math.ceil((y1 - y0) / dy).toLong
    spark.range(0, nCols * nRows, 1, rangeSlices(spark, nCols * nRows)).toDF("id_grid")
      .withColumn("id_col", (col("id_grid") % nCols).cast("int") + 1)
      .withColumn("id_row", (col("id_grid") / nCols).cast("int") + 1)
      .withColumn("the_geom", G.stMakeBox(
        lit(x0) + (col("id_col") - 1) * lit(dx), lit(y0) + (col("id_row") - 1) * lit(dy),
        lit(x0) + col("id_col") * lit(dx),       lit(y0) + col("id_row") * lit(dy)))
  }

  /** Grid by CELL COUNTS (the reference createGrid `rowCol=true` mode,
    * WorkflowOSM.groovy:606-615 / WorkflowGeoIndicators:2272-2288): exactly
    * `nCols` × `nRows` cells tiling the envelope; cell size = extent/count. */
  def makeGridByCount(spark: SparkSession, x0: Double, y0: Double,
                      x1: Double, y1: Double, nCols: Long, nRows: Long): DataFrame = {
    require(nCols > 0 && nRows > 0, "grid counts must be positive")
    val dx = (x1 - x0) / nCols
    val dy = (y1 - y0) / nRows
    spark.range(0, nCols * nRows, 1, rangeSlices(spark, nCols * nRows)).toDF("id_grid")
      .withColumn("id_col", (col("id_grid") % nCols).cast("int") + 1)
      .withColumn("id_row", (col("id_grid") / nCols).cast("int") + 1)
      .withColumn("the_geom", G.stMakeBox(
        lit(x0) + (col("id_col") - 1) * lit(dx), lit(y0) + (col("id_row") - 1) * lit(dy),
        lit(x0) + col("id_col") * lit(dx),       lit(y0) + col("id_row") * lit(dy)))
  }

  /** Tile coordinates of a point — pure Catalyst (codegen'd; the hot path for
    * the pages table). 1-based like the reference grid. */
  def tileCol(x: Column, x0: Double, dx: Double): Column =
    floor((x - lit(x0)) / lit(dx)).cast("long") + 1L
  def tileRow(y: Column, y0: Double, dy: Double): Column =
    floor((y - lit(y0)) / lit(dy)).cast("long") + 1L

  /** Assign each point row its (id_col,id_row) tile and aggregate —
    * raster<->vector zonal aggregation, point mode. `aggs` run per tile. */
  def rasterizePoints(points: DataFrame, xCol: String, yCol: String,
                      x0: Double, y0: Double, dx: Double, dy: Double,
                      aggs: Seq[Column]): DataFrame =
    points
      .withColumn("id_col", tileCol(col(xCol), x0, dx))
      .withColumn("id_row", tileRow(col(yCol), y0, dy))
      .groupBy("id_col", "id_row").agg(aggs.head, aggs.tail: _*)

  /**
   * ESRI ASCII raster sink — the reference's `saveToAscGrid`
   * (WorkflowUtilities.groovy:168-215): header + values ordered id_row DESC
   * then id_col ASC, 3-decimal fixed point, nulls/missing cells → -9999.
   * The raster is bounded (ncols×nrows), so one driver-side write is the
   * right shape; web-scale output stays in the lake as parquet tiles and
   * only final rasters render to .asc.
   */
  def writeAsc(gridValues: DataFrame, valueCol: String, path: String,
               xll: Double, yll: Double, cellSize: Double,
               nCols: Int, nRows: Int): Unit = {
    val cells = gridValues
      .select(col("id_col").cast("int"), col("id_row").cast("int"),
        col(valueCol).cast("double"))
      .collect()
      .map(r => ((r.getInt(0), r.getInt(1)), if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val sb = new StringBuilder()
    sb.append(s"ncols $nCols\nnrows $nRows\nxllcorner $xll\nyllcorner $yll\n")
    sb.append(s"cellsize $cellSize\nnodata_value -9999\n")
    // byte format matches the reference's saveToAscGrid writer: every value
    // is followed by ONE space, then the newline (WorkflowUtilities.groovy:
    // 206-215 appends `value + " "` and breaks at id_col == ncols). One
    // deliberate divergence, documented: cells absent from the table are
    // PADDED with -9999 — the reference only emits rows present, which
    // produces a ragged (non-rectangular) raster when cells are missing;
    // padding is required for a well-formed ESRI ASCII grid.
    for (row <- nRows to 1 by -1) {
      (1 to nCols).foreach { c =>
        val v = cells.get((c, row)).flatten match {
          case Some(v) => new java.math.BigDecimal(v)
            .setScale(3, java.math.RoundingMode.HALF_UP).toPlainString
          case None => "-9999"
        }
        sb.append(v).append(' ')
      }
      sb.append('\n')
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /**
   * Zonal area stats with pivot (reference upperScaleAreaStatistics):
   * for each zone, the area of each class of `lower` geometries inside it,
   * as a fraction of zone area; zones with nothing keep 0 fractions.
   *
   * @param classValues explicit pivot values (reference discovers them with
   *        SELECT DISTINCT at runtime — GenericIndicators.groovy:1035-1039;
   *        we take them as a parameter to keep the plan deterministic and
   *        one-pass, SURVEY §1.3).
   */
  /** @param emptyAsNull reference `upperScaleAreaStatistics` semantics
    *   (GenericIndicators.groovy:1092-1112): a zone with NO intersecting
    *   lower geometry keeps NULL fractions (left-join null), while a zone
    *   that intersects anything gets explicit 0s for absent classes —
    *   downstream distribution characterization maps the all-null rows to
    *   'unknown' defaults. */
  def zonalAreaStats(zones: DataFrame, zoneId: String, zoneGeom: String,
                     lower: DataFrame, lowGeom: String, classCol: String,
                     classValues: Seq[String], grid: CellGrid, res: Int,
                     prefix: String = "area_fraction_",
                     broadcastLower: Boolean = false,
                     emptyAsNull: Boolean = false): DataFrame = {
    val cand = SpatialJoin.candidates(
      zones.select(col(zoneId), col(zoneGeom)), zoneGeom,
      lower.select(col(lowGeom).as("__lgeom"), col(classCol).as("__cls")), "__lgeom",
      grid, res, broadcastB = broadcastLower)
    val areas = cand
      .withColumn("__ia", G.stIntersectionArea(col(zoneGeom), col("__lgeom")))
      .where(col("__ia") > 0)
      .groupBy(col(zoneId))
      .pivot("__cls", classValues)
      .agg(sum(col("__ia")))
    val renamed = classValues.foldLeft(areas) { (df, v) =>
      df.withColumnRenamed(v, s"$prefix$v")
    }.withColumn("__present", lit(1))
    val out = zones.join(renamed, Seq(zoneId), "left")
    classValues.foldLeft(out) { (df, v) =>
      df.withColumn(s"$prefix$v",
        if (emptyAsNull)
          when(col("__present").isNull, lit(null).cast("double"))
            .otherwise(coalesce(col(s"$prefix$v"), lit(0.0)) / G.stArea(col(zoneGeom)))
        else coalesce(col(s"$prefix$v"), lit(0.0)) / G.stArea(col(zoneGeom)))
    }.drop("__present")
  }
}
