package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geom.{GeoFunctions => G}

/**
 * BDTopo v2 building path — loading (BDTopoV2Workflow.groovy:105-122 +
 * InputDataLoading.groovy:220-236: the three BATI shapefiles merged with
 * HAUTEUR>=0, force2D + makeValid, BATI_INDIFFERENCIE typed 'Résidentiel')
 * and formatting (bdtopo InputDataFormatting.groovy:41-375: the NATURE→
 * (type, use) dictionary, height fill rules, formatHeightsAndNbLevels with
 * the BDTopo level table, nb_lev>0 gate, polygon parts with area>1).
 * Dictionaries transcribed verbatim from the reference source.
 */
object BdTopo {

  /** NATURE/type string → (feature type, main use) — types_uses_dictionnary. */
  val TypeDictionary: Map[String, (String, String)] = Map(
    "Bâtiment agricole" -> ("farm_auxiliary", "agricultural"),
    "Bâtiment commercial" -> ("commercial", "commercial"),
    "Bâtiment industriel" -> ("industrial", "industrial"),
    "Serre" -> ("greenhouse", "agricultural"),
    "Silo" -> ("silo", "agricultural"),
    "Aérogare" -> ("aeroway", "transport"),
    "Arc de triomphe" -> ("monument", "heritage"),
    "Arène ou théâtre antique" -> ("monument", "monument"),
    "Bâtiment religieux divers" -> ("religious", "religious"),
    "Bâtiment sportif" -> ("sports_centre", "sport"),
    "Chapelle" -> ("chapel", "religious"),
    "Château" -> ("castle", "heritage"),
    "Eglise" -> ("church", "religious"),
    "Fort, blockhaus, casemate" -> ("military", "military"),
    "Gare" -> ("train_station", "transport"),
    "Mairie" -> ("townhall", "government"),
    "Monument" -> ("monument", "monument"),
    "Péage" -> ("toll_booth", "transport"),
    "Préfecture" -> ("government", "government"),
    "Sous-préfecture" -> ("government", "government"),
    "Tour, donjon, moulin" -> ("historic", "heritage"),
    "Moulin à vent" -> ("historic", "heritage"),
    "Tour, donjon" -> ("historic", "heritage"),
    "Tribune" -> ("grandstand", "entertainment_arts_culture"),
    "Résidentiel" -> ("residential", "residential"),
    "Agricole" -> ("agricultural", "agricultural"),
    "Commercial et services" -> ("commercial", "commercial"),
    "Industriel" -> ("industrial", "industrial"),
    "Religieux" -> ("religious", "religious"),
    "Sportif" -> ("sport", "sport"),
    "Annexe" -> ("annex", "building"),
    "Industriel, agricole ou commercial" -> ("commercial", "commercial"),
    "Bâtiment" -> ("undefined", "undefined"),
    "Industrie lourde" -> ("industrial", "industrial"))

  /** building type → default levels — building_type_level. */
  val TypeLevel: Map[String, Int] = Map("building" -> 1, "undefined" -> 1, "house" -> 1, "detached" -> 1, "residential" -> 1, "apartments" -> 1, "bungalow" -> 0, "historic" -> 0, "monument" -> 0, "ruins" -> 0, "castle" -> 1, "agricultural" -> 0, "farm" -> 0, "farm_auxiliary" -> 0, "barn" -> 0, "greenhouse" -> 0, "silo" -> 0, "commercial" -> 2, "industrial" -> 0, "sport" -> 0, "sports_centre" -> 0, "grandstand" -> 0, "transport" -> 0, "train_station" -> 0, "toll_booth" -> 0, "toll" -> 0, "terminal" -> 0, "airport_terminal" -> 0, "healthcare" -> 1, "education" -> 1, "entertainment_arts_culture" -> 0, "sustenance" -> 1, "military" -> 0, "religious" -> 0, "chapel" -> 0, "church" -> 0, "government" -> 1, "townhall" -> 1, "office" -> 1, "emergency" -> 0, "hotel" -> 2, "hospital" -> 2, "parking" -> 1, "slight_construction" -> 0, "water_tower" -> 0, "fortress" -> 0, "abbey" -> 0, "cathedral" -> 0, "mosque" -> 0, "musalla" -> 0, "temple" -> 0, "synagogue" -> 0, "shrine" -> 0, "place_of_worship" -> 0, "wayside_shrine" -> 0, "swimming_pool" -> 0, "fitness_centre" -> 1, "horse_riding" -> 0, "ice_rink" -> 0, "pitch" -> 0, "stadium" -> 0, "track" -> 0, "sports_hall" -> 0, "ammunition" -> 0, "bunker" -> 0, "barracks" -> 1, "casemate" -> 0, "station" -> 0, "government_office" -> 1, "stable" -> 0, "sty" -> 0, "cowshed" -> 0, "digester" -> 0, "farmhouse" -> 0, "bank" -> 1, "bureau_de_change" -> 0, "boat_rental" -> 0, "car_rental" -> 0, "internet_cafe" -> 0, "kiosk" -> 0, "money_transfer" -> 0, "market" -> 0, "marketplace" -> 0, "pharmacy" -> 0, "post_office" -> 1, "retail" -> 0, "shop" -> 0, "store" -> 0, "supermarket" -> 0, "warehouse" -> 0, "factory" -> 0, "gas" -> 0, "heating_station" -> 0, "oil_mill" -> 0, "oil" -> 0, "wellsite" -> 0, "well_cluster" -> 0, "grain_silo" -> 0, "villa" -> 1, "dormitory" -> 1, "condominium" -> 1, "sheltered_housing" -> 0, "workers_dormitory" -> 0, "terrace" -> 1, "transportation" -> 0, "hangar" -> 0, "tower" -> 1, "control_tower" -> 0, "aeroway" -> 1, "roundhouse" -> 0, "social_facility" -> 1, "college" -> 1, "kindergarten" -> 0, "school" -> 0, "university" -> 1, "cinema" -> 1, "arts_centre" -> 0, "brothel" -> 1, "casino" -> 0, "community_centre" -> 0, "conference_centre" -> 1, "events_venue" -> 1, "exhibition_centre" -> 0, "gambling" -> 0, "music_venue" -> 0, "nightclub" -> 0, "planetarium" -> 0, "social_centre" -> 0, "studio" -> 0, "theatre" -> 0, "library" -> 1, "museum" -> 0, "aquarium" -> 0, "gallery" -> 0, "information" -> 0, "restaurant" -> 0, "bar" -> 0, "cafe" -> 0, "fast_food" -> 0, "ice_cream" -> 0, "pub" -> 0, "attraction" -> 0)

  /**
   * Load the building layer from a BDTopo v2 commune directory: the three
   * BATI shapefiles unioned to (the_geom, id_source, height_wall, type)
   * with the reference's HAUTEUR >= 0 null-excluding filter (SQL
   * three-valued: a missing HAUTEUR drops the row).
   */
  def loadBuildings(spark: SparkSession, dir: String): DataFrame = {
    def layer(name: String, typeCol: Column): DataFrame =
      Shapefile.read(spark, s"$dir/$name.shp").select(
        G.stMakeValid(col("the_geom")).as("the_geom"),
        Shapefile.attr("id").as("id_source"),
        Shapefile.attr("hauteur").try_cast("double").as("height_wall"),
        typeCol.as("type"))
        .where(col("height_wall") >= 0)
    layer("BATI_INDIFFERENCIE", lit("Résidentiel"))
      .unionByName(layer("BATI_INDUSTRIEL", Shapefile.attr("nature")))
      .unionByName(layer("BATI_REMARQUABLE", Shapefile.attr("nature")))
  }

  /**
   * Format loaded buildings into the abstract model: dictionary type/use
   * (default building/building; MAIN_USE is null at loading so the
   * type-only branch applies), height_roof filled from height_wall when
   * absent, formatHeightsAndNbLevels repair, nb_lev > 0 gate, polygon
   * parts with area > 1, zindex 0. Ids dense per zone.
   */
  def formatBuildingLayer(raw: DataFrame, zoneId: String,
                          hLevMin: Double = 3.0): DataFrame = {
    val ft = element_at(typedLit(TypeDictionary.view.mapValues(_._1).toMap), col("type"))
    val fu = element_at(typedLit(TypeDictionary.view.mapValues(_._2).toMap), col("type"))
    val typed = raw.select(col(zoneId), col("id_source"), col("the_geom"),
      coalesce(ft, lit("building")).as("ftype"),
      when(col("type").isNotNull, coalesce(fu, lit("building")))
        .otherwise("building").as("main_use"),
      coalesce(col("height_wall"), lit(0.0)).as("__hw0"))
      .withColumn("__hr0", when(col("__hw0") =!= 0, col("__hw0")).otherwise(lit(0.0)))
      .withColumn("__fh", OsmFormatting.formatHeights(col("__hw0"), col("__hr0"),
        lit(0), hLevMin, col("ftype"), TypeLevel))
      .where(col("__fh.nb_lev") > 0)
    val parts = typed
      .select(col(zoneId), col("id_source"),
        posexplode(G.stExplode(col("the_geom"))).as(Seq("__part", "the_geom")),
        col("__fh.height_wall").as("height_wall"),
        col("__fh.height_roof").as("height_roof"),
        col("__fh.nb_lev").as("nb_lev"),
        col("ftype").as("type"), col("main_use"),
        col("__fh.estimated").as("estimated"))
      .where(G.stDimension(col("the_geom")) === 2 && G.stArea(col("the_geom")) > 1)
      .withColumn("zindex", lit(0))
    OsmLayers.denseIds(parts, zoneId, Seq(col("id_source"), col("__part")), "id_build")
      .select(col(zoneId), col("the_geom"), col("id_build"), col("id_source"),
        col("height_wall"), col("height_roof"), col("nb_lev"),
        col("type"), col("main_use"), col("zindex"), col("estimated"))
  }
}
