package graft.indicators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.geom.{GeoFunctions => G}

/**
 * Block-scale indicators — Spark re-expression of the reference's
 * BlockIndicators.groovy (blocks = connected clusters of buildings).
 */
object BlockIndicators {

  /** hole area / block area — BlockIndicators.groovy:44-66
    * (golden: sum over fixture blocks = 3/47). */
  def holeAreaDensity(block: DataFrame): DataFrame =
    block.select(col("id_block"),
      (G.stHolesArea(col("the_geom")) / G.stArea(col("the_geom"))).as("hole_area_density"))

  /** SUM(contiguity·facade_len·h_wall)/SUM(volume)^(2/3) per block —
    * BlockIndicators.groovy:87-122 (golden: block 4 -> 0.51195).
    * Input: buildings with `volume` and `contiguity` columns. */
  def netCompactness(buildingWithVolumeContiguity: DataFrame): DataFrame =
    buildingWithVolumeContiguity
      .groupBy("id_block")
      .agg((sum(col("contiguity") *
          (G.stPerimeter(col("the_geom")) + G.stHolesPerim(col("the_geom"))) *
          col("height_wall")) / pow(sum(col("volume")), 2.0 / 3.0)).as("net_compactness"))

  /** ST_AREA(ST_HOLES(block)) − SUM(ST_AREA(ST_HOLES(building))) per block —
    * BlockIndicators.groovy:150-181. Inputs: buildings (with id_block) and
    * the block table. */
  def closingness(building: DataFrame, block: DataFrame): DataFrame =
    building.select(col("id_block"), G.stHolesArea(col("the_geom")).as("bu_holes"))
      .join(block.select(col("id_block"), G.stHolesArea(col("the_geom")).as("bl_holes")), "id_block")
      .groupBy("id_block")
      .agg((first(col("bl_holes")) - sum(col("bu_holes"))).as("closingness"))
}
