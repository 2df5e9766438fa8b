package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid

/**
 * Connected components over a spatial contact graph — the engine's
 * replacement for H2GIS `ST_ConnectedComponents` used by the reference to
 * build blocks from touching buildings (SpatialUnits.groovy:377-457).
 *
 * Algorithm: iterative minimum-label propagation PLUS pointer-jumping path
 * compression (each round also rewrites component := label(component), the
 * hash-to-min idea of Rastogi et al. / large-star-small-star), so convergence
 * is O(log diameter) rounds instead of O(diameter) — the difference between
 * ~7 and ~1000 shuffles on a percolated city-scale contact graph. Labels are
 * checkpointed (localCheckpoint) every round to truncate lineage.
 */
object ConnectedComponents {

  /** @param edges (src, dst) pairs, any direction; vertices with no edge
    *        keep their own label.
    * @return (id, component) where component = min vertex id reachable. */
  def run(vertices: DataFrame, idCol: String, edges: DataFrame,
          srcCol: String, dstCol: String, maxIter: Int = 50): DataFrame = {
    // materialized once — every label-propagation round joins against it;
    // without this the upstream edge discovery (a spatial join) re-runs
    // per round
    val sym = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .unionAll(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = vertices.select(col(idCol).as("id"), col(idCol).cast("long").as("component"))
      .localCheckpoint()
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate label for each vertex = min over neighbours' labels ∪ own
      val nbr = sym.join(labels, sym("dst") === labels("id"))
        .groupBy(sym("src").as("id")).agg(min("component").as("nbr_component"))
      val stepped = labels.join(nbr, Seq("id"), "left")
        .select(col("id"), col("component").as("old"),
          least(col("component"), coalesce(col("nbr_component"), col("component"))).as("component"))
        .localCheckpoint()
      // pointer-jumping: component := label(component) (labels are vertex
      // ids). The jump deliberately reads THIS round's stepped labels (the
      // "fresh" jump), which costs a second materialization per round.
      // Round-7 A/B (GRAFT_CC_DEBUG round counts on the blocks / TSU-veg /
      // TSU-water fixture graphs): jumping through the PREVIOUS round's
      // checkpointed labels (classic parent-pointer, 1 materialization per
      // round) adds +1 round on the chain-shaped graphs (2→3, 3→4), and a
      // DOUBLE stale jump still loses one graph (3→4) — an extra round
      // re-runs the edge⋈labels aggregation, which dominates a label-set
      // materialization at scale, so the fresh jump stays.
      val ptr = stepped.select(col("id").as("__cid"), col("component").as("__cc"))
      val compressed = stepped.join(ptr, stepped("component") === ptr("__cid"), "left")
        .select(col("id"), col("old"),
          least(col("component"), coalesce(col("__cc"), col("component"))).as("component"))
        .localCheckpoint()
      converged = compressed.where(col("component") =!= col("old")).isEmpty
      labels = compressed.drop("old")
      iter += 1
    }
    if (sys.env.contains("GRAFT_CC_DEBUG")) println(s"CC_ROUNDS $iter")
    labels
  }

  /**
   * Blocks from buildings (reference createBlocks, SpatialUnits.groovy:377-457):
   * components of the building-intersects graph, one merged geometry per
   * block. The block id IS the component label (the min building id of the
   * block) — already stable and deterministic, and minted with ZERO extra
   * shuffles. The reference mints dense serials via `row_number() over ()`;
   * a global `Window.orderBy` replica would funnel every distinct component
   * (≈ building count at city scale) through ONE partition, so we keep the
   * stable label instead (ids are unique + deterministic, just not dense —
   * callers needing dense ids zipWithIndex the distinct labels).
   */
  def createBlocks(buildingIn: DataFrame, grid: CellGrid, res: Int): DataFrame = {
    val building = buildingIn.select(col("id_build"), col("the_geom"))
    val a = building
    val b = building.select(col("id_build").as("id_b"), col("the_geom").as("geom_b"))
    val edges = SpatialJoin.intersectsJoin(a, "the_geom", b, "geom_b", grid, res)
      .where(col("id_build") < col("id_b"))
      .select(col("id_build").as("src"), col("id_b").as("dst"))
    val comp = run(building.select("id_build"), "id_build", edges, "src", "dst")
    val withComp = building.join(comp.withColumnRenamed("id", "id_build"), "id_build")
    withComp
      .groupBy(col("component").as("id_block"))
      .agg(G.st_union_agg(col("the_geom")).as("the_geom"),
        collect_list(col("id_build")).as("id_builds"))
  }
}
