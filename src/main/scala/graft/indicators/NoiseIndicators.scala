package graft.indicators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Ground acoustic absorption — the reference's NoiseIndicators.groovy:61-108:
 * the ground layer (priority overlay), minus building/road atoms, each atom
 * given its CNOSSOS G coefficient from the type lookup
 * (ground_acoustic_absorption.json, verbatim — DATA). The reference's
 * driver-side row loop with per-row INSERTs becomes one projection.
 */
object NoiseIndicators {

  val DefaultG = 0.0
  // ground_acoustic_absorption.json "g"
  val GCoefficients: Map[String, Double] = Map(
    "asphalt" -> 0.0, "water" -> 0.0, "low_vegetation" -> 0.7,
    "high_vegetation" -> 1.0, "impervious" -> 0.1, "tree" -> 1.0, "wood" -> 1.0,
    "forest" -> 1.0, "tree_row" -> 1.0, "hedge" -> 0.7, "mangrove" -> 0.2,
    "orchard" -> 0.8, "banana_plants" -> 0.8, "farmland" -> 0.7, "scrub" -> 0.7,
    "grass" -> 0.7, "grassland" -> 0.7, "heath" -> 0.7, "park" -> 0.7,
    "meadow" -> 0.7, "vineyard" -> 0.8, "sugar_cane" -> 0.8, "garden" -> 0.7,
    "marsh" -> 0.4, "saltmarsh" -> 0.9)
  // ground_acoustic_absorption.json "layer_priorities"
  val LayerPriorities: Seq[String] =
    Seq("building", "road", "water", "high_vegetation", "low_vegetation", "impervious")

  /** Attach G to ground atoms, excluding building/road atoms like the
    * reference's filter. Input: groundLayer output (id_rsu, area, layer, type). */
  def groundAcousticAbsorption(ground: DataFrame): DataFrame = {
    val g: Column = GCoefficients.foldLeft(lit(null).cast("double")) {
      case (acc, (t, v)) => when(col("type") === t, v).otherwise(acc)
    }
    ground
      .where(!col("layer").isin("building", "road"))
      .withColumn("g", coalesce(g, lit(DefaultG)))
  }
}
