package graft

import org.apache.spark.sql.functions._
import graft.fixtures.GeoFixture
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid
import graft.indicators.{BuildingIndicators, GenericIndicators}
import graft.operators.{ConnectedComponents, SpatialJoin, SpatialUnits}

/**
 * The reference's computeAllGeoIndicators chain (WorkflowGeoIndicators.
 * groovy:1237-1373; SURVEY §3.3) composed end-to-end from this engine's
 * operators on the SQL fixture layers:
 *
 *   prepareTSUData -> createTSU -> createBlocks -> spatial join relations
 *   -> building indicators -> RSU-scale aggregation.
 *
 * Asserts structural integrity (every in-zone building lands in exactly one
 * TSU, ids dense, RSU aggregates cover every TSU) and determinism (two runs
 * produce identical outputs) — the "a user could run their workflow here"
 * evidence, complementing the per-operator golden tests.
 */
class WorkflowChainSpec extends SparkTestBase {

  private val grid = CellGrid.fixture

  private def runChain() = {
    val zone = spark.range(1)
      .select(lit(1).as("id_zone"),
        G.stMakeBox(lit(-20.0), lit(-20.0), lit(180.0), lit(70.0)).as("the_geom"))
    val road = GeoFixture.roadDf(spark).withColumn("tunnel", lit(0))
    // 1-2. mesh + polygonize
    val prepared = SpatialUnits.prepareTSUData(
      zone, Some(road), None, Some(GeoFixture.vegetDf(spark)),
      Some(GeoFixture.hydroDf(spark)), None, None,
      surfaceVegetation = 2500.0, surfaceHydro = 2500.0, surfaceUrbanAreas = 10000.0,
      grid, 10).withColumn("id_zone", lit(1))
    val tsu = SpatialUnits.createTSU(prepared, "id_zone", "the_geom")
      .localCheckpoint()
    // buildings inside the zone box (fixture also has far-away rows)
    val building = GeoFixture.buildingDf(spark)
      .where(G.stX(G.stCentroid(col("the_geom"))) < 500)
      .select("id_build", "the_geom", "height_wall", "height_roof", "nb_lev")
      .localCheckpoint()
    // 3. blocks
    val blocks = ConnectedComponents.createBlocks(building, grid, 10)
    // 4. building -> TSU relation (max-overlap, the reference default)
    val rel = SpatialJoin.assignMaxOverlap(building, "id_build", "the_geom",
      tsu.select(col("id_rsu"), col("the_geom")), "id_rsu", "the_geom", grid, 10)
    // 5. building indicators
    val bsize = BuildingIndicators.sizeProperties(building)
    // 6. RSU-scale aggregation of a building indicator
    val lower = bsize.join(rel, "id_build")
    val rsuAgg = GenericIndicators.unweightedOperationFromLowerScale(
      lower.select(col("id_rsu"), col("volume"), col("id_build")),
      tsu.select(col("id_rsu")), "id_rsu", "id_build",
      Map("volume" -> Seq(GenericIndicators.OpAvg, GenericIndicators.OpSum)))
    (tsu, blocks, rel, rsuAgg)
  }

  test("chain composes: every in-zone building in exactly one TSU, aggregates total") {
    val (tsu, blocks, rel, rsuAgg) = runChain()
    val nTsu = tsu.count()
    assert(nTsu > 1)
    // dense deterministic TSU ids
    val ids = tsu.select("id_rsu").collect().map(_.getInt(0)).sorted
    assert(ids.toSeq == (1 to nTsu.toInt))
    // every building with positive overlap assigned exactly once
    val nB = rel.count()
    assert(nB == rel.select("id_build").distinct().count())
    assert(nB > 0)
    // blocks partition their buildings
    val blockMembers = blocks.select(explode(col("id_builds"))).count()
    assert(blockMembers > 0 && blocks.count() > 0)
    // RSU aggregate covers every TSU row (right-join default semantics)
    assert(rsuAgg.count() == nTsu)
    // total volume is preserved through the aggregation
    val sumDirect = rsuAgg.agg(sum("sum_volume")).head().getDouble(0)
    assert(sumDirect > 0)
  }

  test("chain is deterministic across runs") {
    val (tsu1, _, rel1, agg1) = runChain()
    val (tsu2, _, rel2, agg2) = runChain()
    assert(tsu1.select("id_rsu").collect().map(_.getInt(0)).sorted.toSeq ==
      tsu2.select("id_rsu").collect().map(_.getInt(0)).sorted.toSeq)
    def relSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(relSet(rel1) == relSet(rel2))
    def aggMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(aggMap(agg1) == aggMap(agg2))
  }
}
