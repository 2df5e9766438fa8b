package graft.indicators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid
import graft.operators.SpatialJoin

/**
 * Population indicators — PopulationIndicators.groovy: table formatting
 * (:40-70) and the multi-scale population chain (:82-163) distributing
 * population counts building → RSU → grid.
 */
object PopulationIndicators {

  /**
   * formatPopulationTable (:40-70): keep the population columns, repair
   * geometries, optionally restrict to rows intersecting the zone, and mint
   * `id_pop`. The reference numbers rows with physical ROWNUM
   * (nondeterministic under parallel scans); ids here are minted over
   * centroid (x, y) order — deterministic, same contract as the engine's
   * other id minting.
   */
  def formatPopulationTable(population: DataFrame, popColumns: Seq[String],
                            zone: Option[DataFrame],
                            grid: CellGrid, res: Int): DataFrame = {
    val repaired = population.select(
      (G.stMakeValid(col("the_geom")).as("the_geom") +: popColumns.map(col)): _*)
    val filtered = zone match {
      case Some(z) =>
        SpatialJoin.intersectsJoin(
          repaired.withColumnRenamed("the_geom", "__pg"), "__pg",
          z.select(col("the_geom").as("__zg")), "__zg", grid, res)
          .drop("__zg").withColumnRenamed("__pg", "the_geom")
          .dropDuplicates() // a row intersecting several zone parts stays once
      case None => repaired
    }
    // Dense ids over global (cx, cy) order WITHOUT a data-scale global
    // window (the per-key rank + cumulative-offset pattern the engine's
    // other minting paths use — SpatialUnits.mintIds, OsmLayers:152). The
    // partition key is the centroid's x-BAND (one grid-cell wide): a band is
    // a monotone function of cx, so concatenating bands in band order
    // reproduces the EXACT global (cx, cy) lexicographic ids the old global
    // window minted; in-band ranks run partitioned, and the offsets window
    // covers only #occupied-bands rows (metadata-scale, not data-scale).
    val band = grid.cellSize(res)
    val withC = filtered
      .withColumn("__cx", G.stX(G.stCentroid(col("the_geom"))))
      .withColumn("__cy", G.stY(G.stCentroid(col("the_geom"))))
      .withColumn("__kx", floor(col("__cx") / band).cast("long"))
      .localCheckpoint() // ranks + offsets both read it
    val ranked = withC.withColumn("__rk", row_number().over(
      Window.partitionBy(col("__kx")).orderBy(col("__cx"), col("__cy"))))
    val offsets = withC.groupBy(col("__kx")).agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__kx")).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__kx"), col("__off"))
    ranked.join(offsets, Seq("__kx"))
      .withColumn("id_pop", (col("__off") + col("__rk")).cast("int"))
      .drop("__cx", "__cy", "__kx", "__rk", "__off")
  }

  /**
   * multiScalePopulation (:82-163): distribute each population column to
   * three scales —
   *  - building: [[BuildingIndicators.buildingPopulation]] per column
   *    (zone counts split over residential floor area);
   *  - RSU: per-RSU sums of the building values (the reference's
   *    unweightedOperationFromLowerScale SUM with `sum_` prefix);
   *  - grid: the building-share split — each building's population spread
   *    over the grid cells it intersects proportionally to intersection
   *    area over the BUILDING's area (`sum(pop·inter/area_building)` per
   *    cell, :116-150), cells touching no building keep NULL.
   *
   * @param building needs id_build, the_geom, nb_lev, main_use (+ id_rsu
   *                 when `rsu` is given)
   * @return (building with population columns, per-RSU sums, per-cell sums)
   */
  def multiScalePopulation(population: DataFrame, popColumns: Seq[String],
                           building: DataFrame, rsu: Option[DataFrame],
                           gridCells: Option[DataFrame],
                           residentialUses: Seq[String],
                           grid: CellGrid, res: Int): (DataFrame, Option[DataFrame], Option[DataFrame]) = {
    require(popColumns.nonEmpty, "set a list of population columns") // :161
    val withPop = popColumns.foldLeft(building) { (b, c) =>
      b.join(BuildingIndicators.buildingPopulation(b,
          population.select(col("id_pop"), col("the_geom"), col(c).as("pop")),
          residentialUses, grid, res)
          .withColumnRenamed("pop", c),
        Seq("id_build"))
    }.localCheckpoint() // feeds the RSU sums AND the grid split
    val rsuPop = rsu.map { r =>
      val aggs = popColumns.map(c => sum(col(c)).as(s"sum_$c"))
      r.join(withPop.groupBy("id_rsu").agg(aggs.head, aggs.tail: _*),
        Seq("id_rsu"), "left")
    }
    val gridPop = gridCells.map { cells =>
      val inter = SpatialJoin.candidates(
          cells.select(col("id_grid"), col("the_geom")), "the_geom",
          withPop.select((col("the_geom").as("__bg") +:
            G.stArea(col("the_geom")).as("__ab") +: popColumns.map(col)): _*),
          "__bg", grid, res, broadcastB = false)
        .where(G.stIntersects(col("the_geom"), col("__bg")))
        .withColumn("__ia", G.stIntersectionArea(col("the_geom"), col("__bg")))
      val aggs = popColumns.map(c =>
        sum(col(c) * col("__ia") / col("__ab")).as(s"sum_$c"))
      cells.join(inter.groupBy("id_grid").agg(aggs.head, aggs.tail: _*),
        Seq("id_grid"), "left")
    }
    (withPop, rsuPop, gridPop)
  }
}
