package graft.indicators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid
import graft.operators.SpatialJoin

/**
 * Grid-scale indicators — Spark re-expression of the reference's
 * GridIndicators.groovy: the multiscale LOD pyramid with weighted mode
 * (GridIndicators.groovy:126-280), the 8-neighbor lookup
 * (:155-166, 238-254 — there correlated scalar subqueries per neighbor;
 * here ONE shifted-key equi-join), and the sliding-window count
 * (:450-496 — there a row/col BETWEEN range self-join; here an
 * influence-explode + hash aggregate, which stays an equi-join/shuffle
 * at 10^12-cell scale instead of a nested-loop range join).
 */
object GridIndicators {

  /** The reference's LOD-mode tiebreak weights (GridIndicators.groovy:199-206
    * `weight_lcz` CASE): urban LCZ 1-10 keep their value; rural remap
    * 105->11, 107->12, 106->13, 101->14, 102->15, 103/104->16. SMALLER
    * weight wins count ties (ORDER BY count DESC, ..., weight_lcz), so low
    * urban classes beat rural — pinned by the reference's own
    * multiscaleLCZGridTest golden (center block: 4x LCZ2 vs 4x LCZ104 ties
    * to 2). */
  val ReferenceLczWeights: Map[Int, Int] =
    (1 to 10).map(v => v -> v).toMap ++
      Map(105 -> 11, 107 -> 12, 106 -> 13, 101 -> 14, 102 -> 15, 103 -> 16, 104 -> 16)

  /** Warm/cool LCZ class sets (GridIndicators.groovy:175-183, 231-236). */
  val WarmLcz: Seq[Int] = (1 to 10) :+ 105
  val CoolLcz: Seq[Int] = Seq(101, 102, 103, 104, 106, 107)

  /**
   * LOD-`level` aggregation: grid cells collapse 3^level × 3^level into one
   * LOD cell (lod_row = ⌊(id_row−1)/3^level⌋ — GridIndicators.groovy:210-214);
   * per LOD cell the modal `lczCol` value is picked with the reference's
   * tiebreak: count DESC, then priority weight ASC, then value ASC
   * (`distinct on … order by count desc, weight` — :217-229).
   */
  def lodMode(cells: DataFrame, lczCol: String, weights: Map[Int, Int], level: Int): DataFrame = {
    val f = math.pow(3, level).toInt
    // one map-literal lookup (not a folded CaseWhen chain — codegen assembly
    // is quadratic in branches); unmapped classes fall back to their own
    // value, the reference's `ELSE LCZ_PRIMARY` (GridIndicators.groovy:206).
    // try_element_at, not element_at: under Spark 4 ANSI mode a map-key miss
    // THROWS, which would make the coalesce fallback unreachable for any
    // class outside the mapped 17 on an arbitrary caller-supplied grid.
    val weightExpr = coalesce(
      try_element_at(typedLit(weights), col(lczCol).cast("int")), col(lczCol))
    val counts = cells
      // NULL-classified cells are not modal candidates (the reference's
      // WHERE LCZ_PRIMARY IS NOT NULL, GridIndicators.groovy:197-208)
      .where(col(lczCol).isNotNull)
      .withColumn("lod_row", floor((col("id_row") - 1) / f).cast("long"))
      .withColumn("lod_col", floor((col("id_col") - 1) / f).cast("long"))
      .groupBy("lod_row", "lod_col", lczCol)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("__w", weightExpr)
    val win = Window.partitionBy("lod_row", "lod_col")
      .orderBy(desc("cnt"), col("__w"), col(lczCol))
    counts.withColumn("__rn", row_number().over(win)).where(col("__rn") === 1)
      .select(col("lod_row"), col("lod_col"), col(lczCol).as("lcz_mode"), col("cnt"))
  }

  /** Warm/cool cell counts per LOD cell (the reference's LCZ_WARM_LOD_i /
    * LCZ_COOL_LOD_i correlated subqueries, GridIndicators.groovy:231-236 —
    * here one hash aggregate). */
  def lodWarmCool(cells: DataFrame, lczCol: String, level: Int): DataFrame = {
    val f = math.pow(3, level).toInt
    cells
      .withColumn("lod_row", floor((col("id_row") - 1) / f).cast("long"))
      .withColumn("lod_col", floor((col("id_col") - 1) / f).cast("long"))
      .groupBy("lod_row", "lod_col")
      .agg(sum(when(col(lczCol).isin(WarmLcz: _*), 1).otherwise(0)).as("lcz_warm"),
        sum(when(col(lczCol).isin(CoolLcz: _*), 1).otherwise(0)).as("lcz_cool"))
  }

  /**
   * 8-neighbor aggregate: for every cell, stats over the up-to-8 existing
   * neighbors. The reference runs 8 correlated scalar subqueries per row
   * (GridIndicators.groovy:238-254); we explode each cell into its 8
   * neighbor positions (a Generator — no shuffle) and hash-aggregate, so the
   * whole lookup is ONE equi-join-shaped aggregation.
   */
  def neighborStats(cells: DataFrame, valueCol: String): DataFrame = {
    val offs = for { dr <- -1 to 1; dc <- -1 to 1 if dr != 0 || dc != 0 } yield (dr, dc)
    val offArr = array(offs.map { case (dr, dc) =>
      struct(lit(dr).as("dr"), lit(dc).as("dc")) }: _*)
    val contrib = cells
      .select(col("id_row"), col("id_col"), col(valueCol), explode(offArr).as("o"))
      .select((col("id_row") + col("o.dr")).as("id_row"),
        (col("id_col") + col("o.dc")).as("id_col"), col(valueCol))
    val agg = contrib.groupBy("id_row", "id_col")
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    cells.select("id_row", "id_col").join(agg, Seq("id_row", "id_col"), "left")
      .select(col("id_row"), col("id_col"),
        coalesce(col("__n"), lit(0L)).as("n_neighbors"),
        coalesce(col("__s"), lit(0L)).as("sum_neighbors"))
  }

  private val NeighborDirs: Seq[(String, Int, Int)] = Seq(
    ("n", 1, 0), ("ne", 1, 1), ("e", 0, 1), ("se", -1, 1),
    ("s", -1, 0), ("sw", -1, -1), ("w", 0, -1), ("nw", 1, -1))

  /** One-shuffle 8-direction neighbor pivot: every source cell contributes
    * its value to each neighbor position tagged with the direction it is
    * SEEN FROM there; a pivot materializes the 8 columns. Replaces the
    * reference's 8 correlated subqueries per row with one equi-join-shaped
    * aggregation. */
  private def neighborPivot(src: DataFrame, rowC: String, colC: String,
                            valC: String, outName: String => String): DataFrame = {
    val offArr = array(NeighborDirs.map { case (d, dr, dc) =>
      struct(lit(d).as("d"), lit(dr).as("dr"), lit(dc).as("dc")) }: _*)
    val contrib = src
      .select(col(rowC), col(colC), col(valC), explode(offArr).as("o"))
      // a cell at (r, c) IS the "<d>" neighbor of the cell at (r-dr, c-dc):
      // push the value there so the pivot reads like the reference's
      // "value at (a.row+dr, a.col+dc)" correlated subqueries
      .select((col(rowC) - col("o.dr")).as(rowC), (col(colC) - col("o.dc")).as(colC),
        col("o.d").as("__d"), col(valC))
    val pivoted = contrib.groupBy(rowC, colC)
      .pivot("__d", NeighborDirs.map(_._1)).agg(first(col(valC)))
    NeighborDirs.foldLeft(pivoted) { case (df, (d, _, _)) =>
      df.withColumnRenamed(d, outName(d))
    }
  }

  /**
   * multiscaleLCZGrid (GridIndicators.groovy:126-280): the LOD pyramid of a
   * classified grid. Per input cell: the 8 base-level neighbor LCZ values
   * (`lcz_primary_<dir>`), the warm count over self+neighbors (`lcz_warm`),
   * and for every level i in 1..nbLevels the reference's display indices
   * (`id_row_lod_i` = ⌊(id_row−1)/3^i⌋+1; `id_col_lod_i` carries the
   * reference's per-level offset quirk, +i−1 — replicated verbatim), the
   * modal LCZ of the 3^i×3^i block (`lcz_primary_lod_i`, weight tiebreak =
   * [[lodMode]]; the reference's 103-vs-104 equal-weight tie is
   * nondeterministic DISTINCT ON — fixed here by value ASC), the per-block
   * warm/cool base-cell counts (`lcz_warm_lod_i` / `lcz_cool_lod_i`), and
   * the 8 LOD-neighbor modal values and warm counts
   * (`lcz_primary_<dir>_lod_i`, `lcz_warm_<dir>_lod_i`).
   *
   * Every stage is a hash aggregate or an equi-join on (row, col) keys —
   * the reference's per-row correlated subqueries never appear.
   */
  def multiscaleLczGrid(cells: DataFrame, lczCol: String = "lcz_primary",
                        nbLevels: Int = 1): DataFrame = {
    require(nbLevels >= 1 && nbLevels < 10,
      "the number of levels must be between 1 and 10") // reference bounds
    val base = cells.localCheckpoint() // read by every level + the base pivot
    val baseNb = neighborPivot(base.select("id_row", "id_col", lczCol),
      "id_row", "id_col", lczCol, d => s"${lczCol}_$d")
    val warmCols = (col(lczCol) +: NeighborDirs.map { case (d, _, _) =>
      col(s"${lczCol}_$d") }).map(c =>
      when(c.isin(WarmLcz: _*), 1).otherwise(0))
    var out = base.join(baseNb, Seq("id_row", "id_col"), "left")
      .withColumn("lcz_warm", warmCols.reduce(_ + _))
    for (i <- 1 to nbLevels) {
      val f = math.pow(3, i).toInt
      val mode = lodMode(base, lczCol, ReferenceLczWeights, i)
        .withColumnRenamed("lcz_mode", s"${lczCol}_lod_$i").drop("cnt")
      val warm = lodWarmCool(base, lczCol, i)
        .withColumnRenamed("lcz_warm", s"lcz_warm_lod_$i")
        .withColumnRenamed("lcz_cool", s"lcz_cool_lod_$i")
      val level = mode.join(warm, Seq("lod_row", "lod_col")).localCheckpoint()
      val levelNb = neighborPivot(
        level.select(col("lod_row"), col("lod_col"), col(s"${lczCol}_lod_$i")),
        "lod_row", "lod_col", s"${lczCol}_lod_$i", d => s"${lczCol}_${d}_lod_$i")
      val levelWarmNb = neighborPivot(
        level.select(col("lod_row"), col("lod_col"), col(s"lcz_warm_lod_$i")),
        "lod_row", "lod_col", s"lcz_warm_lod_$i", d => s"lcz_warm_${d}_lod_$i")
      val full = level
        .join(levelNb, Seq("lod_row", "lod_col"), "left")
        .join(levelWarmNb, Seq("lod_row", "lod_col"), "left")
      out = out
        .withColumn("lod_row", floor((col("id_row") - 1) / f).cast("long"))
        .withColumn("lod_col", floor((col("id_col") - 1) / f).cast("long"))
        .join(full, Seq("lod_row", "lod_col"), "left")
        // reference display indices (:146-152; the id_col offset grows by
        // one per level — quirk replicated)
        .withColumn(s"id_row_lod_$i", (col("lod_row") + 1).cast("int"))
        .withColumn(s"id_col_lod_$i", (col("lod_col") + (i - 1)).cast("int"))
        .drop("lod_row", "lod_col")
    }
    out
  }

  /**
   * Grid population disaggregation (GridIndicators.groovy:45-109): each
   * population zone's counts are split across the grid cells it intersects,
   * weighted by intersection area over the zone's TOTAL intersected area;
   * cells outside every zone keep NULL (the reference's LEFT JOIN).
   * One cell-equijoin + two hash aggregates — no correlated subqueries.
   */
  def gridPopulation(gridCells: DataFrame, population: DataFrame,
                     popColumns: Seq[String], grid: CellGrid, res: Int): DataFrame = {
    val popSel = population.select(
      (col("id_pop") +: col("the_geom").as("__pgeom") +:
        popColumns.map(c => col(c).as(s"__p_$c"))): _*)
    val inter = SpatialJoin.candidates(
        gridCells.select(col("id_grid"), col("the_geom")), "the_geom",
        popSel, "__pgeom", grid, res, broadcastB = false)
      .where(G.stIntersects(col("__pgeom"), col("the_geom")))
      .withColumn("area_rsu", G.stIntersectionArea(col("__pgeom"), col("the_geom")))
      .select(col("id_grid") +: col("id_pop") +: col("area_rsu") +:
        popColumns.map(c => col(s"__p_$c")): _*)
    val zoneArea = inter.groupBy("id_pop").agg(sum("area_rsu").as("__sum_area"))
    val aggs = popColumns.map(c =>
      sum(col("area_rsu") * col(s"__p_$c") / col("__sum_area")).as(c))
    val shares = inter.join(zoneArea, "id_pop")
      .groupBy("id_grid")
      .agg(aggs.head, aggs.tail: _*)
    gridCells.join(shares, Seq("id_grid"), "left")
  }

  /**
   * Distance of each grid cell (centroid inside a polygon) to that polygon's
   * boundary — GridIndicators.groovy:293-329, there a driver-side Groovy
   * double loop with per-row JDBC batch inserts over an IndexedFacetDistance;
   * here ONE cell-equijoin point-in-polygon join + a boundary-distance
   * expression (set-based, no row-at-a-time IO).
   */
  def gridDistances(polygons: DataFrame, gridCells: DataFrame,
                    grid: CellGrid, res: Int): DataFrame = {
    val cells = gridCells.select(col("id_grid"),
      G.stX(G.stCentroid(col("the_geom"))).as("__cx"),
      G.stY(G.stCentroid(col("the_geom"))).as("__cy"))
    SpatialJoin.pointInPolygon(cells, "__cx", "__cy",
        polygons.select(col("the_geom").as("__pg")), "__pg", grid, res)
      .select(col("id_grid"),
        G.stDistance(G.stToMultiLine(col("__pg")),
          G.stPoint(col("__cx"), col("__cy"))).as("distance"))
  }

  /**
   * TARGET-schema grid export (GridIndicators.groovy:382-448): recombines
   * the grid fraction columns into the TARGET landcover bands — roof =
   * building fraction (+ high-veg-over-building superposition), Veg = high
   * vegetation (+ its other superpositions), conc = impervious + rail +
   * undefined, plus road/watr/dry/irr and the H/W morphometrics. FID is a
   * dense serial over (ID_ROW DESC, ID_COL ASC) — the reference orders by
   * ID_ROW DESC only (insertion-ordered ties); the extra ID_COL key makes
   * ids deterministic. A bounded raster export, like writeAsc — the global
   * window is over one zone's grid, not data-scale.
   */
  def formatGrid4Target(gridIndicators: DataFrame,
                        superpositions: Map[String, Seq[String]]): DataFrame = {
    val highVeg = superpositions.getOrElse("high_vegetation", Seq.empty)
    val roofCol = highVeg.filter(_ == "building")
      .foldLeft(col("building_fraction")) { (acc, s) =>
        acc + col(s"high_vegetation_${s}_fraction")
      }
    val vegCol = highVeg.filter(v => v != "building")
      .foldLeft(col("high_vegetation_fraction")) { (acc, s) =>
        acc + col(s"high_vegetation_${s}_fraction")
      }
    gridIndicators
      .withColumn("fid", row_number().over(
        Window.orderBy(desc("id_row"), col("id_col"))))
      .select(col("the_geom"), col("id_col"), col("id_row"), col("fid"),
        roofCol.as("roof"),
        col("road_fraction").as("road"),
        col("water_permanent_fraction").as("watr"),
        (col("impervious_fraction") + col("rail_fraction") + col("undefined_fraction")).as("conc"),
        vegCol.as("veg"),
        col("low_vegetation_fraction").as("dry"),
        lit(0.0).as("irr"),
        col("avg_height_roof_area_weighted").as("h"),
        col("street_width").as("w"))
  }

  /**
   * Multi-size warm-window counts (GridIndicators.groovy:450-496
   * `gridCountCellsWarm`): for every cell and every window size, how many
   * OTHER cells exist within Chebyshev distance `size` and how many of them
   * are warm LCZ. The reference runs one range self-join per size; here each
   * size is one influence-explode + hash aggregate (equi-join shaped), and
   * the per-size results join on id_grid like the reference's joinTables.
   */
  def gridCountCellsWarm(cells: DataFrame, lczCol: String,
                         windowSizes: Seq[Int]): DataFrame = {
    require(windowSizes.nonEmpty && windowSizes.min >= 1 && windowSizes.max < 10,
      "window sizes must be in [1, 10) cells") // reference bounds
    val base = cells.select(col("id_grid"), col("id_row"), col("id_col"), col(lczCol))
    val perSize = windowSizes.distinct.sorted.map { size =>
      val offs = for { dr <- -size to size; dc <- -size to size if dr != 0 || dc != 0 }
        yield (dr, dc)
      val offArr = array(offs.map { case (dr, dc) =>
        struct(lit(dr).as("dr"), lit(dc).as("dc")) }: _*)
      val contrib = base
        .select(col("id_row"), col("id_col"), col(lczCol), explode(offArr).as("o"))
        .select((col("id_row") + col("o.dr")).as("id_row"),
          (col("id_col") + col("o.dc")).as("id_col"), col(lczCol))
      val agg = contrib.groupBy("id_row", "id_col")
        .agg(count(lit(1)).as(s"count_cells_$size"),
          sum(when(col(lczCol).isin(WarmLcz: _*), 1).otherwise(0)).as(s"count_warm_$size"))
      base.select("id_grid", "id_row", "id_col").join(agg, Seq("id_row", "id_col"))
        .select(col("id_grid"), col(s"count_cells_$size"), col(s"count_warm_$size"))
    }
    perSize.reduce(_.join(_, Seq("id_grid")))
  }

  /**
   * Sliding-window count: per cell, how many cells within Chebyshev distance
   * `size` (the (2·size+1)² window, self included) satisfy `pred`. The
   * reference's `id_row BETWEEN a.id_row±size` range self-join
   * (GridIndicators.groovy:450-496) becomes influence-explode: each matching
   * cell contributes +1 to every position of its window, then one hash
   * aggregate — equi-join shaped, skew-free, no nested loop.
   */
  def slidingWindowCount(cells: DataFrame, pred: Column, size: Int,
                         outCol: String = "window_count"): DataFrame = {
    val offs = for { dr <- -size to size; dc <- -size to size } yield (dr, dc)
    val offArr = array(offs.map { case (dr, dc) =>
      struct(lit(dr).as("dr"), lit(dc).as("dc")) }: _*)
    val contrib = cells.where(pred)
      .select(col("id_row"), col("id_col"), explode(offArr).as("o"))
      .select((col("id_row") + col("o.dr")).as("id_row"),
        (col("id_col") + col("o.dc")).as("id_col"))
    val agg = contrib.groupBy("id_row", "id_col").agg(count(lit(1)).as("__n"))
    cells.select("id_row", "id_col").join(agg, Seq("id_row", "id_col"), "left")
      .select(col("id_row"), col("id_col"), coalesce(col("__n"), lit(0L)).as(outCol))
  }
}
