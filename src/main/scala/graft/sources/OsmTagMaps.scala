package graft.sources

/**
 * OSM tag-to-model mapping tables — the DATA of the reference's
 * buildingParams/roadParams/railParams/vegetParams/imperviousParams/
 * urbanAreasParams JSONs (osm/src/main/resources/org/orbisgis/geoclimate/
 * osm/), transcribed verbatim (generated from the JSONs; entry ORDER is
 * semantic — getTypeAndUse/getTypeValue take the FIRST matching entry,
 * InputDataFormatting.groovy:851-894, 1020-1049). Pure lookup data, not
 * code: the engine compiles these into first-match rule matchers and the
 * oracle emitter compiles the same structures into SQL.
 *
 * Rule shape: (targetType[, mainUse], Seq(tagColumn -> matchValues)).
 * A value starting with "! " is the reference's negation form (matches any
 * non-null value different from it). Rules over tag columns absent from the
 * input are skipped, like the reference's columnNames.contains gate (this
 * preserves its quirks, e.g. the dead `historic_building` key vs the
 * `historic:building` column).
 */
object OsmTagMaps {

  /** building type rules: (type, use, tag conditions) — buildingParams.json `type`. */
  val buildingType: Seq[(String, String, Seq[(String, Seq[String])])] = Seq(
    ("terminal", "transport", Seq(("aeroway", Seq("terminal")), ("amenity", Seq("terminal")), ("building", Seq("terminal")))),
    ("airport_terminal", "transport", Seq(("aeroway", Seq("terminal")), ("amenity", Seq("terminal")), ("building", Seq("terminal")))),
    ("parking", "transport", Seq(("building", Seq("parking")))),
    ("train_station", "transport", Seq(("building", Seq("train_station")), ("railway", Seq("train_station")), ("public_transport", Seq("train_station")), ("amenity", Seq("train_station")))),
    ("station", "transport", Seq(("building", Seq("station")), ("railway", Seq("station")), ("public_transport", Seq("station")))),
    ("toll", "transport", Seq(("barrier", Seq("toll_booth")), ("building", Seq("toll_booth")))),
    ("shelter", "transport", Seq(("shelter_type", Seq("public_transport")))),
    ("transportation", "transport", Seq(("building", Seq("transportation")))),
    ("hangar", "transport", Seq(("aeroway", Seq("hangar")))),
    ("tower", "transport", Seq(("aeroway", Seq("tower")))),
    ("bunker", "transport", Seq(("aeroway", Seq("bunker")))),
    ("control_tower", "transport", Seq(("aeroway", Seq("control_tower")))),
    ("aeroway", "transport", Seq(("aeroway", Seq("building")))),
    ("roundhouse", "transport", Seq(("railway", Seq("roundhouse")))),
    ("monument", "monument", Seq(("building", Seq("monument")), ("historic", Seq("monument")), ("leisure", Seq("monument")), ("monument", Seq("yes")))),
    ("chapel", "religious", Seq(("building", Seq("chapel")), ("amenity", Seq("chapel")), ("place_of_worship", Seq("chapel")))),
    ("church", "religious", Seq(("building", Seq("church")), ("amenity", Seq("church")), ("place_of_worship", Seq("church")))),
    ("castle", "heritage", Seq(("building", Seq("castle")))),
    ("fortress", "heritage", Seq(("building", Seq("fortress")))),
    ("religious", "religious", Seq(("building", Seq("religious")), ("amenity", Seq("religious")))),
    ("abbey", "religious", Seq(("building", Seq("abbey")), ("amenity", Seq("abbey")))),
    ("cathedral", "religious", Seq(("building", Seq("cathedral")), ("amenity", Seq("cathedral")))),
    ("mosque", "religious", Seq(("building", Seq("mosque")), ("amenity", Seq("mosque")))),
    ("musalla", "religious", Seq(("building", Seq("musalla")), ("amenity", Seq("musalla")))),
    ("temple", "religious", Seq(("building", Seq("temple")), ("amenity", Seq("temple")))),
    ("synagogue", "religious", Seq(("building", Seq("synagogue")), ("amenity", Seq("synagogue")))),
    ("shrine", "religious", Seq(("building", Seq("shrine")), ("amenity", Seq("shrine")))),
    ("place_of_worship", "religious", Seq(("building", Seq("place_of_worship")), ("amenity", Seq("place_of_worship")))),
    ("wayside_shrine", "religious", Seq(("building", Seq("wayside_shrine")), ("amenity", Seq("wayside_shrine")))),
    ("swimming_pool", "sport", Seq(("building", Seq("swimming_pool")), ("leisure", Seq("swimming_pool")), ("amenity", Seq("swimming_pool")))),
    ("fitness_centre", "sport", Seq(("building", Seq("fitness_centre")), ("leisure", Seq("fitness_centre")), ("amenity", Seq("fitness_centre")))),
    ("horse_riding", "sport", Seq(("building", Seq("horse_riding")), ("leisure", Seq("horse_riding")), ("amenity", Seq("horse_riding")))),
    ("ice_rink", "sport", Seq(("building", Seq("ice_rink")), ("leisure", Seq("ice_rink")), ("amenity", Seq("ice_rink")))),
    ("pitch", "sport", Seq(("building", Seq("pitch")), ("leisure", Seq("pitch")), ("amenity", Seq("pitch")))),
    ("stadium", "sport", Seq(("building", Seq("stadium")), ("leisure", Seq("stadium")), ("amenity", Seq("stadium")))),
    ("track", "sport", Seq(("building", Seq("track")), ("leisure", Seq("track")), ("amenity", Seq("track")))),
    ("sports_centre", "sport", Seq(("building", Seq("sports_centre")), ("leisure", Seq("sports_centre")), ("amenity", Seq("sports_centre")))),
    ("sports_hall", "sport", Seq(("building", Seq("sports_hall")), ("leisure", Seq("sports_hall")), ("amenity", Seq("sports_hall")))),
    ("ammunition", "military", Seq(("military", Seq("ammunition")), ("building", Seq("ammunition")))),
    ("bunker", "military", Seq(("military", Seq("bunker")), ("building", Seq("bunker")))),
    ("barracks", "military", Seq(("military", Seq("barracks")), ("building", Seq("barracks")))),
    ("casemate", "military", Seq(("military", Seq("office")))),
    ("shelter", "military", Seq(("military", Seq("shelter")))),
    ("office", "military", Seq(("military", Seq("office")), ("office", Seq("military")))),
    ("military", "military", Seq(("building", Seq("military")))),
    ("townhall", "government", Seq(("amenity", Seq("townhall")), ("building", Seq("townhall")))),
    ("government", "government", Seq(("building", Seq("government", "public")))),
    ("government_office", "government", Seq(("building", Seq("government_office")), ("office", Seq("government")))),
    ("historic", "historic", Seq(("building", Seq("historic")), ("historic", Seq()), ("historic_building", Seq("! no")))),
    ("grandstand", "entertainment_arts_culture", Seq(("building", Seq("grandstand")), ("leisure", Seq("grandstand")), ("amenity", Seq("grandstand")), ("grandstand", Seq("yes")))),
    ("farm_auxiliary", "agricultural", Seq(("building", Seq("farm_auxiliary")))),
    ("barn", "agricultural", Seq(("building", Seq("barn")))),
    ("stable", "agricultural", Seq(("building", Seq("stable")))),
    ("sty", "agricultural", Seq(("building", Seq("sty")))),
    ("cowshed", "agricultural", Seq(("building", Seq("cowshed")))),
    ("greenhouse", "agricultural", Seq(("building", Seq("greenhouse")), ("amenity", Seq("greenhouse")), ("industrial", Seq("greenhouse")))),
    ("agricultural", "agricultural", Seq(("building", Seq("agricultural")), ("agricultural", Seq("building")))),
    ("farm", "agricultural", Seq(("building", Seq("farm")))),
    ("farmhouse", "agricultural", Seq(("building", Seq("farmhouse")))),
    ("grain_silo", "agricultural", Seq(("building", Seq("grain_silo")), ("man_made", Seq("grain_silo")))),
    ("silo", "agricultural", Seq(("building", Seq("silo")), ("man_made", Seq("silo")))),
    ("bank", "commercial", Seq(("building", Seq("bank")), ("amenity", Seq("bank")))),
    ("bureau_de_change", "commercial", Seq(("building", Seq("bureau_de_change")), ("amenity", Seq("bureau_de_change")))),
    ("boat_rental", "commercial", Seq(("building", Seq("boat_rental")), ("amenity", Seq("boat_rental")))),
    ("car_rental", "commercial", Seq(("building", Seq("car_rental")), ("amenity", Seq("car_rental")))),
    ("commercial", "commercial", Seq(("building", Seq("commercial")), ("amenity", Seq("commercial")))),
    ("internet_cafe", "commercial", Seq(("building", Seq("internet_cafe")), ("amenity", Seq("internet_cafe")))),
    ("kiosk", "commercial", Seq(("building", Seq("kiosk")), ("amenity", Seq("kiosk")))),
    ("money_transfer", "commercial", Seq(("building", Seq("money_transfer")), ("amenity", Seq("money_transfer")))),
    ("market", "commercial", Seq(("building", Seq("market")), ("amenity", Seq("market")))),
    ("marketplace", "commercial", Seq(("building", Seq("marketplace")), ("amenity", Seq("marketplace")))),
    ("pharmacy", "commercial", Seq(("building", Seq("pharmacy")), ("amenity", Seq("pharmacy")))),
    ("post_office", "commercial", Seq(("building", Seq("post_office")), ("amenity", Seq("post_office")))),
    ("retail", "commercial", Seq(("building", Seq("retail")), ("amenity", Seq("retail")))),
    ("shop", "commercial", Seq(("building", Seq("shop")), ("amenity", Seq("shop")))),
    ("store", "commercial", Seq(("building", Seq("store")), ("amenity", Seq("store")))),
    ("supermarket", "commercial", Seq(("building", Seq("supermarket")), ("amenity", Seq("supermarket")))),
    ("warehouse", "commercial", Seq(("building", Seq("warehouse")), ("amenity", Seq("warehouse")))),
    ("restaurant", "commercial", Seq(("amenity", Seq("restaurant")), ("building", Seq("restaurant")), ("shop", Seq("restaurant")))),
    ("bar", "commercial", Seq(("amenity", Seq("bar")), ("building", Seq("bar")), ("shop", Seq("bar")))),
    ("cafe", "commercial", Seq(("amenity", Seq("cafe")), ("building", Seq("cafe")), ("shop", Seq("cafe")))),
    ("fast_food", "commercial", Seq(("amenity", Seq("fast_food")), ("building", Seq("fast_food")), ("shop", Seq("fast_food")))),
    ("ice_cream", "commercial", Seq(("amenity", Seq("ice_cream")), ("building", Seq("ice_cream")), ("shop", Seq("ice_cream")))),
    ("pub", "commercial", Seq(("amenity", Seq("pub")), ("building", Seq("pub")), ("shop", Seq("pub")))),
    ("industrial", "industrial", Seq(("building", Seq("industrial")))),
    ("factory", "industrial", Seq(("building", Seq("factory")), ("industrial", Seq("factory")), ("amenity", Seq("factory")))),
    ("warehouse", "industrial", Seq(("industrial", Seq("warehouse")))),
    ("digester", "industrial", Seq(("building", Seq("digester")))),
    ("gas", "industrial", Seq(("industrial", Seq("gas")))),
    ("heating_station", "industrial", Seq(("industrial", Seq("heating_station")))),
    ("oil_mill", "industrial", Seq(("industrial", Seq("oil_mill")))),
    ("oil", "industrial", Seq(("industrial", Seq("oil")))),
    ("wellsite", "industrial", Seq(("industrial", Seq("wellsite")))),
    ("well_cluster", "industrial", Seq(("industrial", Seq("well_cluster")))),
    ("refinery", "industrial", Seq(("industrial", Seq("refinery")))),
    ("house", "residential", Seq(("building", Seq("house")), ("house", Seq("residential")), ("amenity", Seq("house")))),
    ("detached", "residential", Seq(("building", Seq("detached")), ("house", Seq("detached")))),
    ("apartments", "residential", Seq(("building", Seq("apartments")), ("residential", Seq("apartments")), ("amenity", Seq("apartments")), ("apartments", Seq("yes")))),
    ("bungalow", "residential", Seq(("building", Seq("bungalow")), ("house", Seq("bungalow")), ("amenity", Seq("bungalow")))),
    ("residential", "residential", Seq(("building", Seq("residential")), ("residential", Seq("building")), ("amenity", Seq("residential")))),
    ("villa", "residential", Seq(("building", Seq("villa")))),
    ("dormitory", "residential", Seq(("building", Seq("dormitory")), ("residential", Seq("dormitory")))),
    ("condominium", "residential", Seq(("building", Seq("condominium")), ("residential", Seq("condominium")))),
    ("sheltered_housing", "residential", Seq(("building", Seq("sheltered_housing")), ("residential", Seq("sheltered_housing")))),
    ("workers_dormitory", "residential", Seq(("building", Seq("workers_dormitory")), ("residential", Seq("workers_dormitory")))),
    ("terrace", "residential", Seq(("building", Seq("terrace")), ("residential", Seq("terrace")))),
    ("ruins", "heritage", Seq(("building", Seq("ruins")), ("ruins", Seq("ruins")))),
    ("shelter", "shelter", Seq(("amenity", Seq("shelter")))),
    ("healthcare", "healthcare", Seq(("amenity", Seq("healthcare")), ("building", Seq("healthcare")))),
    ("social_facility", "healthcare", Seq(("amenity", Seq("social_facility")))),
    ("hospital", "healthcare", Seq(("building", Seq("hospital")))),
    ("education", "education", Seq(("amenity", Seq("education")), ("building", Seq("education")))),
    ("college", "education", Seq(("amenity", Seq("college")), ("building", Seq("college")), ("education", Seq("college")))),
    ("kindergarten", "education", Seq(("amenity", Seq("kindergarten")), ("building", Seq("kindergarten")), ("education", Seq("kindergarten")))),
    ("school", "education", Seq(("amenity", Seq("school")), ("building", Seq("school")), ("education", Seq("school")))),
    ("university", "education", Seq(("amenity", Seq("university")), ("building", Seq("university")), ("education", Seq("university")))),
    ("research_institute", "education", Seq(("amenity", Seq("research_institute")), ("building", Seq("research_institute")))),
    ("cinema", "entertainment_arts_culture", Seq(("amenity", Seq("cinema")), ("building", Seq("cinema")))),
    ("arts_centre", "entertainment_arts_culture", Seq(("amenity", Seq("arts_centre")), ("building", Seq("arts_centre")))),
    ("brothel", "entertainment_arts_culture", Seq(("amenity", Seq("brothel")), ("building", Seq("brothel")))),
    ("casino", "entertainment_arts_culture", Seq(("amenity", Seq("casino")), ("building", Seq("casino")))),
    ("community_centre", "entertainment_arts_culture", Seq(("amenity", Seq("community_centre")), ("building", Seq("community_centre")))),
    ("conference_centre", "entertainment_arts_culture", Seq(("amenity", Seq("conference_centre")), ("building", Seq("conference_centre")))),
    ("events_venue", "entertainment_arts_culture", Seq(("amenity", Seq("events_venue")), ("building", Seq("events_venue")))),
    ("exhibition_centre", "entertainment_arts_culture", Seq(("amenity", Seq("exhibition_centre")), ("building", Seq("exhibition_centre")))),
    ("gambling", "entertainment_arts_culture", Seq(("amenity", Seq("gambling")), ("building", Seq("gambling")))),
    ("music_venue", "entertainment_arts_culture", Seq(("amenity", Seq("music_venue")), ("building", Seq("music_venue")))),
    ("nightclub", "entertainment_arts_culture", Seq(("amenity", Seq("nightclub")), ("building", Seq("nightclub")))),
    ("planetarium", "entertainment_arts_culture", Seq(("amenity", Seq("planetarium")), ("building", Seq("planetarium")))),
    ("social_centre", "entertainment_arts_culture", Seq(("amenity", Seq("social_centre")), ("building", Seq("social_centre")))),
    ("studio", "entertainment_arts_culture", Seq(("amenity", Seq("studio")), ("building", Seq("studio")))),
    ("theatre", "entertainment_arts_culture", Seq(("amenity", Seq("theatre")), ("building", Seq("theatre")))),
    ("library", "entertainment_arts_culture", Seq(("amenity", Seq("library")), ("building", Seq("library")))),
    ("museum", "entertainment_arts_culture", Seq(("tourism", Seq("museum")))),
    ("aquarium", "entertainment_arts_culture", Seq(("tourism", Seq("aquarium")))),
    ("gallery", "entertainment_arts_culture", Seq(("tourism", Seq("gallery")))),
    ("information", "entertainment_arts_culture", Seq(("tourism", Seq("information")))),
    ("office", "office", Seq(("building", Seq("office")), ("amenity", Seq("office")))),
    ("emergency", "emergency", Seq(("building", Seq("fire_station")))),
    ("hotel", "tourism", Seq(("building", Seq("hotel")), ("tourism", Seq("hotel")))),
    ("attraction", "tourism", Seq(("tourism", Seq("attraction")))),
    ("slight_construction", "slight_construction", Seq(("wall", Seq("no")))),
    ("water_tower", "service", Seq(("man_made", Seq("water_tower")))),
    ("undefined", "undefined", Seq(("building", Seq("yes")))),
    ("hut", "building", Seq(("building", Seq("hut")))),
    ("cabin", "residential", Seq(("building", Seq("cabin")))),
    ("shed", "building", Seq(("building", Seq("shed")))),
    ("tower", "tower", Seq(("building", Seq("tower")))),
    ("garage", "garage", Seq(("building", Seq("garages", "garage")))),
    ("civic", "civic", Seq(("building", Seq("civic")))),
    ("service", "industrial", Seq(("building", Seq("service")))),
    ("manufacture", "industrial", Seq(("building", Seq("manufacture")))),
    ("storage_tank", "industrial", Seq(("building", Seq("storage_tank")))),
    ("slurry_tank", "industrial", Seq(("building", Seq("slurry_tank")))))

  /** building default levels per type — buildingParams.json `level`. */
  val buildingLevel: Map[String, Int] = Map("building" -> 1, "undefined" -> 1, "house" -> 1, "detached" -> 1, "residential" -> 1, "apartments" -> 1, "bungalow" -> 0, "historic" -> 0, "monument" -> 0, "ruins" -> 0, "castle" -> 1, "agricultural" -> 0, "farm" -> 0, "farm_auxiliary" -> 0, "barn" -> 0, "greenhouse" -> 0, "silo" -> 0, "commercial" -> 2, "industrial" -> 0, "sport" -> 0, "sports_centre" -> 0, "grandstand" -> 0, "transport" -> 0, "train_station" -> 0, "toll_booth" -> 0, "toll" -> 0, "terminal" -> 0, "airport_terminal" -> 0, "healthcare" -> 1, "education" -> 1, "entertainment_arts_culture" -> 0, "sustenance" -> 1, "military" -> 0, "religious" -> 0, "chapel" -> 0, "church" -> 0, "government" -> 1, "townhall" -> 1, "office" -> 1, "emergency" -> 0, "hotel" -> 2, "hospital" -> 2, "parking" -> 1, "slight_construction" -> 0, "water_tower" -> 0, "fortress" -> 0, "abbey" -> 0, "cathedral" -> 0, "mosque" -> 0, "musalla" -> 0, "temple" -> 0, "synagogue" -> 0, "shrine" -> 0, "place_of_worship" -> 0, "wayside_shrine" -> 0, "swimming_pool" -> 0, "fitness_centre" -> 1, "horse_riding" -> 0, "ice_rink" -> 0, "pitch" -> 0, "stadium" -> 0, "track" -> 0, "sports_hall" -> 0, "ammunition" -> 0, "bunker" -> 0, "barracks" -> 1, "casemate" -> 0, "station" -> 0, "government_office" -> 1, "stable" -> 0, "sty" -> 0, "cowshed" -> 0, "digester" -> 0, "farmhouse" -> 0, "bank" -> 1, "bureau_de_change" -> 0, "boat_rental" -> 0, "car_rental" -> 0, "internet_cafe" -> 0, "kiosk" -> 0, "money_transfer" -> 0, "market" -> 0, "marketplace" -> 0, "pharmacy" -> 0, "post_office" -> 1, "retail" -> 0, "shop" -> 0, "store" -> 0, "supermarket" -> 0, "warehouse" -> 0, "factory" -> 0, "gas" -> 0, "heating_station" -> 0, "oil_mill" -> 0, "oil" -> 0, "wellsite" -> 0, "well_cluster" -> 0, "grain_silo" -> 0, "villa" -> 1, "dormitory" -> 1, "condominium" -> 1, "sheltered_housing" -> 0, "workers_dormitory" -> 0, "terrace" -> 1, "transportation" -> 0, "hangar" -> 0, "tower" -> 1, "control_tower" -> 0, "aeroway" -> 1, "roundhouse" -> 0, "social_facility" -> 1, "college" -> 1, "kindergarten" -> 0, "school" -> 0, "university" -> 1, "cinema" -> 1, "arts_centre" -> 0, "brothel" -> 1, "casino" -> 0, "community_centre" -> 0, "conference_centre" -> 1, "events_venue" -> 1, "exhibition_centre" -> 0, "gambling" -> 0, "music_venue" -> 0, "nightclub" -> 0, "planetarium" -> 0, "social_centre" -> 0, "studio" -> 0, "theatre" -> 0, "library" -> 1, "museum" -> 0, "aquarium" -> 0, "gallery" -> 0, "information" -> 0, "restaurant" -> 0, "bar" -> 0, "cafe" -> 0, "fast_food" -> 0, "ice_cream" -> 0, "pub" -> 0, "attraction" -> 0, "refinery" -> 0, "hut" -> 0, "cabin" -> 0, "shed" -> 0, "garage" -> 0, "civic" -> 1, "service" -> 0, "manufacture" -> 0, "storage_tank" -> 0, "slurry_tank" -> 0)

  /** building:use synonym table (main-use override) — buildingParams.json `building:use`. */
  val buildingUse: Seq[(String, Seq[String])] = Seq(
    ("education", Seq("education", "school", "university", "research", "educational", "kindergarten")),
    ("commercial", Seq("retail", "fast_food", "shop", "car_wash", "restaurant", "warehouse", "boat_storage", "foodservice", "marketplace")),
    ("industrial", Seq("storage", "car_repair", "car", "depot", "chemical", "factory")),
    ("residential", Seq("apartments", "residental", "residence", "residentail", "house", "detached", "dormitory", "accommodation", "semidetached_house")),
    ("religious", Seq("church", "place_of_worship")),
    ("entertainment_arts_culture", Seq("exhibition", "museum", "auditorium", "arts_centre", "cultural", "leisure")),
    ("office", Seq()),
    ("agricultural", Seq("equestrian", "barn", "forestry", "greenhouse")),
    ("garage", Seq("garages")),
    ("sport", Seq()),
    ("healthcare", Seq("medical", "hospital")),
    ("government", Seq()),
    ("tourism", Seq("hotel")),
    ("civic", Seq()),
    ("transport", Seq("transportation", "railway", "carpark", "service", "parking")),
    ("shelter", Seq()),
    ("military", Seq()))

  /** road type rules — roadParams.json `type`. */
  val roadType: Seq[(String, Seq[(String, Seq[String])])] = Seq(
    ("cycleway", Seq(("highway", Seq("cycleway")), ("cycleway", Seq("track")), ("bicycle_road", Seq("yes")))),
    ("ferry", Seq(("route", Seq("ferry")))),
    ("footway", Seq(("highway", Seq("footway")))),
    ("highway", Seq(("highway", Seq("road", "raceway", "escape")), ("cyclestreet", Seq("yes")))),
    ("highway_link", Seq(("highway", Seq("motorway_link", "motorway_junction", "trunk_link", "primary_link", "secondary_link", "tertiary_link", "junction")))),
    ("motorway", Seq(("highway", Seq("motorway")))),
    ("path", Seq(("highway", Seq("path", "bridleway")))),
    ("primary", Seq(("highway", Seq("primary")))),
    ("residential", Seq(("highway", Seq("residential", "living_street")))),
    ("secondary", Seq(("highway", Seq("secondary")))),
    ("steps", Seq(("highway", Seq("steps")))),
    ("tertiary", Seq(("highway", Seq("tertiary")))),
    ("track", Seq(("highway", Seq("track")))),
    ("trunk", Seq(("highway", Seq("trunk")))),
    ("unclassified", Seq(("highway", Seq("unclassified")))),
    ("pedestrian", Seq(("highway", Seq("pedestrian")))),
    ("service", Seq(("highway", Seq("service")))),
    ("aeroway", Seq(("aeroway", Seq("taxiway")))))

  /** road surface rules — roadParams.json `surface`. */
  val roadSurface: Seq[(String, Seq[(String, Seq[String])])] = Seq(
    ("unpaved", Seq(("surface", Seq("unpaved", "grass_paver", "artificial_turf")))),
    ("asphalt", Seq(("surface", Seq("asphalt")))),
    ("paved", Seq(("surface", Seq("paved")))),
    ("ground", Seq(("surface", Seq("ground", "dirt", "earth", "clay")))),
    ("gravel", Seq(("surface", Seq("gravel", "fine_gravel", "gravel_turf")))),
    ("concrete", Seq(("surface", Seq("concrete", "concrete:lanes", "concrete:plates", "cement")))),
    ("grass", Seq(("surface", Seq("grass")))),
    ("compacted", Seq(("surface", Seq("compacted")))),
    ("sand", Seq(("surface", Seq("sand")))),
    ("cobblestone", Seq(("surface", Seq("cobblestone", "paving_stones", "sett", "unhewn_cobblestone")))),
    ("wood", Seq(("surface", Seq("wood", "woodchips")))),
    ("pebblestone", Seq(("surface", Seq("pebblestone")))),
    ("mud", Seq(("surface", Seq("mud")))),
    ("metal", Seq(("surface", Seq("metal")))),
    ("water", Seq(("surface", Seq("water")))))

  /** default width per road type — roadParams.json `width`. */
  val roadWidth: Map[String, Double] = Map("highway" -> 8.0, "motorway" -> 24.0, "trunk" -> 16.0, "primary" -> 10.0, "secondary" -> 10.0, "tertiary" -> 8.0, "residential" -> 8.0, "unclassified" -> 3.0, "track" -> 2.0, "path" -> 1.0, "footway" -> 1.0, "cycleway" -> 1.0, "steps" -> 1.0, "highway_link" -> 8.0, "roundabout" -> 4.0, "ferry" -> 0.0, "pedestrian" -> 3.0, "service" -> 3.0, "aeroway" -> 18.0)

  /** bridge tag values mapped to crossing='bridge' — roadParams.json `crossing`. */
  val roadCrossingBridge: Seq[String] = Seq("yes", "aqueduct", "cantilever", "covered", "low_water_crossing", "movable", "trestle", "viaduct")

  /** rail type rules — railParams.json `type`. */
  val railType: Seq[(String, Seq[(String, Seq[String])])] = Seq(
    ("highspeed", Seq(("highspeed", Seq("yes")))),
    ("rail", Seq(("railway", Seq("rail", "light_rail", "narrow_gauge")))),
    ("service_track", Seq(("service", Seq("yard", "siding", "spur", "crossover")))),
    ("disused", Seq(("railway", Seq("disused")))),
    ("funicular", Seq(("railway", Seq("funicular")))),
    ("subway", Seq(("railway", Seq("subway")))),
    ("tram", Seq(("railway", Seq("tram")))))

  /** rail bridge values — railParams.json `crossing`. */
  val railCrossingBridge: Seq[String] = Seq("yes", "aqueduct", "cantilever", "covered", "low_water_crossing", "movable", "trestle", "viaduct")

  /** vegetation type rules — vegetParams.json `type`. */
  val vegetType: Seq[(String, Seq[(String, Seq[String])])] = Seq(
    ("farmland", Seq(("landuse", Seq("farmland")))),
    ("wood", Seq(("landcover", Seq("trees")), ("natural", Seq("wood")))),
    ("meadow", Seq(("landuse", Seq("meadow")), ("wetland", Seq("wet_meadow")))),
    ("forest", Seq(("landuse", Seq("forest")))),
    ("scrub", Seq(("natural", Seq("scrub")), ("landcover", Seq("scrub")), ("landuse", Seq("scrub")))),
    ("grass", Seq(("natural", Seq("grass")), ("leisure", Seq("golf_course")), ("landuse", Seq("village_green", "grass")), ("surface", Seq("grass")), ("tourism", Seq("camp_site")), ("sport", Seq("soccer", "rugby", "horse_racing")))),
    ("grassland", Seq(("landcover", Seq("grass", "grassland")), ("natural", Seq("grassland")), ("vegetation", Seq("grassland")), ("landuse", Seq("grassland")))),
    ("heath", Seq(("natural", Seq("heath")))),
    ("park", Seq(("leisure", Seq("park")), ("landuse", Seq("recreation_ground")))),
    ("garden", Seq(("leisure", Seq("garden")), ("landuse", Seq("allotments")))),
    ("mangrove", Seq(("wetland", Seq("mangrove")))),
    ("orchard", Seq(("landuse", Seq("orchard")))),
    ("plant_nursery", Seq(("landuse", Seq("plant_nursery")))),
    ("vineyard", Seq(("landuse", Seq("vineyard")), ("vineyard", Seq("! no")))),
    ("banana_plants", Seq(("trees", Seq("banana_plants")), ("crop", Seq("banana")))),
    ("sugar_cane", Seq(("produce", Seq("sugar_cane")), ("crop", Seq("sugar_cane")))),
    ("marsh", Seq(("wetland", Seq("marsh")))),
    ("saltmarsh", Seq(("wetland", Seq("saltmarsh")))),
    ("wetland", Seq(("landuse", Seq("wetland")), ("natural", Seq("wetland")))),
    ("pitch", Seq(("leisure", Seq("pitch")))))

  /** vegetation type -> height class (low/high) — vegetParams.json `class`. */
  val vegetClass: Map[String, String] = Map("farmland" -> "low", "wood" -> "high", "forest" -> "high", "scrub" -> "low", "grass" -> "low", "grassland" -> "low", "heath" -> "low", "park" -> "low", "meadow" -> "low", "mangrove" -> "high", "orchard" -> "high", "vineyard" -> "low", "banana_plants" -> "high", "sugar_cane" -> "low", "garden" -> "low", "marsh" -> "low", "saltmarsh" -> "low", "wetland" -> "low", "plant_nursery" -> "low")

  /** impervious type rules (type:use keys) — imperviousParams.json `type`. */
  val imperviousType: Seq[(String, String, Seq[(String, Seq[String])])] = Seq(
    ("parking", "parking", Seq(("amenity", Seq("parking", "bicycle_parking", "car_sharing", "parking_place")), ("highway", Seq("rest_area")))),
    ("platform", "platform", Seq(("railway", Seq("platform")))),
    ("aeroway", "aeroway", Seq(("area:aeroway", Seq("runway")), ("aeroway", Seq("apron")))),
    ("power", "power", Seq(("power", Seq("plant", "substation")))),
    ("sport", "sport", Seq(("leisure", Seq("pitch")))),
    ("pedestrian", "pedestrian", Seq(("highway", Seq("pedestrian")))))

  /** urban-areas type rules (type:use keys) — urbanAreasParams.json `type`. */
  val urbanType: Seq[(String, String, Seq[(String, Seq[String])])] = Seq(
    ("education", "education", Seq(("landuse", Seq("education")))),
    ("university", "university", Seq(("amenity", Seq("university")))),
    ("research_institute", "research_institute", Seq(("amenity", Seq("research_institute")))),
    ("school", "school", Seq(("amenity", Seq("school")))),
    ("commercial", "commercial", Seq(("landuse", Seq("commercial")))),
    ("retail", "retail", Seq(("landuse", Seq("retail")))),
    ("residential", "residential", Seq(("landuse", Seq("residential")))),
    ("industrial", "industrial", Seq(("landuse", Seq("industrial")), ("power", Seq("plant", "substation")))),
    ("port", "port", Seq(("landuse", Seq("port")))),
    ("refinery", "refinery", Seq(("industrial", Seq("refinery")))),
    ("government", "government", Seq(("landuse", Seq("institutional")))),
    ("community_centre", "community_centre", Seq(("amenity", Seq("community_centre")))),
    ("military", "military", Seq(("landuse", Seq("military")))),
    ("railway", "railway", Seq(("landuse", Seq("railway")))),
    ("farmyard", "farmyard", Seq(("landuse", Seq("farmyard")))),
    ("healthcare", "healthcare", Seq(("healthcare", Seq("hospital")))),
    ("religious", "religious", Seq(("landuse", Seq("religious")))),
    ("garage", "garage", Seq(("landuse", Seq("garages")))))
}
