package graft.indicators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Road traffic enrichment — the reference's `build_road_traffic`
 * (RoadIndicators.groovy:56-262): OSM road types mapped to the Tool-4.5
 * traffic classes, default CNOSSOS flows per period (day 12h / evening 4h /
 * night 8h) split by direction (one-way → half), speeds defaulted per class,
 * CNOSSOS pavement ids from the surface tag. Parameter tables are the
 * reference's roadTrafficParams.json verbatim (DATA, not code). The
 * reference runs a driver-side row loop with per-row INSERTs; here the whole
 * enrichment is one codegen'd projection.
 */
object RoadIndicators {

  // roadTrafficParams.json "road_types"
  val RoadTypes: Seq[(String, Seq[String])] = Seq(
    "Motorway" -> Seq("motorway", "motorway_link"),
    "Trunk roads" -> Seq("trunk", "trunk_link"),
    "Main roads" -> Seq("primary", "primary_link"),
    "Small main roads" -> Seq("secondary", "secondary_link", "highway", "highway_link"),
    "Collecting roads" -> Seq("tertiary", "tertiary_link"),
    "Service roads" -> Seq("residential", "roundabout", "unclassified"),
    "Dead-end roads" -> Seq("service", "living_street"))

  // roadTrafficParams.json "maxspeed"
  val MaxSpeed: Map[String, Int] = Map(
    "Motorway" -> 130, "Trunk roads" -> 110, "Main roads" -> 80,
    "Small main roads" -> 80, "Collecting roads" -> 50,
    "Service roads" -> 30, "Dead-end roads" -> 30)

  /** (day_nb_vh, ev_nb_vh, night_nb_vh, day_%hv, ev_%hv, night_%hv,
    * day_%lv, ev_%lv, night_%lv) — roadTrafficParams.json "flow_data". */
  val FlowData: Map[String, (Int, Int, Int, Double, Double, Double, Double, Double, Double)] = Map(
    "Motorway" -> (26103, 7458, 3729, 0.25, 0.35, 0.45, 0.75, 0.65, 0.55),
    "Trunk roads" -> (17936, 3826, 2152, 0.2, 0.2, 0.2, 0.8, 0.8, 0.8),
    "Main roads" -> (7124, 1069, 712, 0.2, 0.15, 0.1, 0.8, 0.85, 0.9),
    "Small main roads" -> (1400, 400, 200, 0.15, 0.1, 0.05, 0.85, 0.9, 0.95),
    "Collecting roads" -> (700, 200, 100, 0.1, 0.06, 0.03, 0.9, 0.94, 0.97),
    "Service roads" -> (350, 100, 50, 0.05, 0.02, 0.01, 0.95, 0.98, 0.99),
    "Dead-end roads" -> (175, 50, 25, 0.02, 0.01, 0.0, 0.98, 0.99, 1.0))

  // roadTrafficParams.json "pavements" (subset keys present in OSM surfaces)
  val Pavements: Map[String, String] = Map(
    "asphalt" -> "NL05", "concrete" -> "NL08", "wood" -> "NL08", "grass" -> "NL08",
    "sand" -> "NL08", "earth" -> "NL08", "ground" -> "NL08", "sett" -> "NL08",
    "mud" -> "NL08", "dirt" -> "NL08", "unpaved" -> "NL08", "compacted" -> "NL08",
    "gravel" -> "NL08", "fine_gravel" -> "NL08", "paved" -> "NL10",
    "paving_stones" -> "NL10", "cobblestone" -> "NL10", "metal" -> "NL08", "pebblestone" -> "NL08")
  val DefaultPavement = "NL05"

  private val DayH = 12; private val EvH = 4; private val NightH = 8 // flow_periods

  /** Math.round'ed vehicles/hour (day_lv, day_hv, night_lv, night_hv, ev_lv,
    * ev_hv) — RoadIndicators.groovy:218-243; halved for one-way (dir 1/2). */
  def perHour(roadType: String, halved: Boolean): (Long, Long, Long, Long, Long, Long) = {
    val (d, e, n, dHv, eHv, nHv, dLv, eLv, nLv) = FlowData(roadType)
    val f = if (halved) 2.0 else 1.0
    (math.round(d * dLv / DayH / f), math.round(d * dHv / DayH / f),
      math.round(n * nLv / NightH / f), math.round(n * nHv / NightH / f),
      math.round(e * eLv / EvH / f), math.round(e * eHv / EvH / f))
  }

  /**
   * Enrich a road table with traffic columns. Input needs id_road, type,
   * maxspeed (−1 = unknown), direction (1/2 one-way, 3 bidirectional,
   * anything else → zero flows), surface (nullable). Roads whose type is
   * excluded ('track','path','cycleway','steps') or unmapped are dropped,
   * like the reference.
   */
  def buildRoadTraffic(road: DataFrame): DataFrame = {
    val typeToClass: Column = RoadTypes.foldRight(lit(null).cast("string")) {
      case ((cls, vals), acc) => when(col("type").isin(vals: _*), cls).otherwise(acc)
    }
    val base = road
      .where(!col("type").isin("track", "path", "cycleway", "steps"))
      .withColumn("road_type", typeToClass)
      .where(col("road_type").isNotNull)
    val speed = when(col("maxspeed") === -1,
      MaxSpeed.foldLeft(lit(null).cast("int")) { case (acc, (cls, v)) =>
        when(col("road_type") === cls, v).otherwise(acc)
      }).otherwise(col("maxspeed"))
    val pavement = coalesce(
      Pavements.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
        when(col("surface") === k, v).otherwise(acc)
      }, lit(DefaultPavement))
    def flows(idx: Int): Column = {
      val halvedC = RoadTypes.foldLeft(lit(null).cast("long")) { case (acc, (cls, _)) =>
        when(col("road_type") === cls, perHour(cls, halved = true).productElement(idx).asInstanceOf[Long]).otherwise(acc)
      }
      val fullC = RoadTypes.foldLeft(lit(null).cast("long")) { case (acc, (cls, _)) =>
        when(col("road_type") === cls, perHour(cls, halved = false).productElement(idx).asInstanceOf[Long]).otherwise(acc)
      }
      when(col("direction").isin(1, 2), halvedC)
        .when(col("direction") === 3, fullC)
        .otherwise(lit(0L))
    }
    base.select(
      col("id_road").cast("string").as("id_source"),
      col("road_type"), col("type").as("source_road_type"),
      col("surface"), col("direction"),
      lit(null).cast("double").as("slope"),
      pavement.as("pavement"),
      flows(0).as("day_lv_hour"), flows(1).as("day_hv_hour"),
      speed.as("day_lv_speed"), speed.as("day_hv_speed"),
      flows(2).as("night_lv_hour"), flows(3).as("night_hv_hour"),
      speed.as("night_lv_speed"), speed.as("night_hv_speed"),
      flows(4).as("ev_lv_hour"), flows(5).as("ev_hv_hour"),
      speed.as("ev_lv_speed"), speed.as("ev_hv_speed"))
  }
}
