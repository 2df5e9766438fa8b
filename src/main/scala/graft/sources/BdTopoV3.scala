package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid
import graft.operators.SpatialJoin

/**
 * BDTopo V3 loading path — the layer/column dictionary of
 * bdtopo/InputDataLoading.groovy:346-738 (`loadV3`) re-expressed as
 * DataFrame transformations over raw V3 tables (BATIMENT,
 * troncon_de_route, troncon_de_voie_ferree, surface_hydrographique,
 * zone_de_vegetation, terrain_de_sport, construction_surfacique,
 * equipement_de_transport, zone_d_activite_ou_d_interet,
 * piste_d_aerodrome, cimetiere, limite_terre_mer). Each output layer
 * carries the reference's column surface; the downstream abstract-model
 * formatting is the SAME dictionary pipeline as V2 ([[BdTopo]]).
 *
 * The reference clips every layer to the commune envelope expanded by
 * `distance` — here the zone filter is the cell-equijoin intersects join
 * (scale shape identical to every other layer filter in this engine).
 */
object BdTopoV3 {

  final case class Layers(building: DataFrame, road: DataFrame, rail: DataFrame,
                          water: DataFrame, vegetation: DataFrame,
                          impervious: DataFrame, urbanAreas: DataFrame,
                          coastline: Option[DataFrame], zone: DataFrame)

  /** zone_d_activite CATEGORIE/NATURE → abstract type
    * (InputDataLoading.groovy:640-668). */
  def activityType(categorie: Column, nature: Column): Column = {
    val govNatures = Seq("Administration centrale de l'Etat",
      "Aire d'accueil des gens du voyage", "Autre service déconcentré de l'Etat",
      "Borne", "Capitainerie", "Caserne de pompiers", "Divers public ou administratif",
      "Etablissement extraterritorial", "Etablissement pénitentiaire",
      "Hôtel de collectivité", "Hôtel de département", "Hôtel de région", "Mairie",
      "Maison forestière", "Palais de justice", "Police", "Poste", "Préfecture",
      "Préfecture de région", "Siège d'EPCI", "Sous-préfecture")
    val milNatures = Seq("Borne frontière", "Camp militaire non clos", "Caserne",
      "Caserne de pompiers", "Champ de tir", "Enceinte militaire", "Gendarmerie",
      "Ouvrage militaire", "Surveillance maritime")
    val comNatures = Seq("Divers commercial", "Marché")
    val indNatures = Seq("Aquaculture", "Carrière", "Centrale électrique",
      "Déchèterie", "Divers agricole", "Divers industriel", "Elevage", "Mine",
      "Usine", "Zone industrielle")
    when(categorie === "Administratif ou militaire" &&
        nature.isInCollection(govNatures), "government")
      .when(categorie === "Administratif ou militaire" &&
        nature.isInCollection(milNatures), "military")
      .when(categorie === "Science et enseignement", "education")
      .when(categorie === "Santé", "healthcare")
      .when(categorie === "Culture et loisirs", "entertainment_arts_culture")
      .when(categorie === "Transport", "transport")
      .when(categorie === "Industriel et commercial" &&
        nature.isInCollection(comNatures), "commercial")
      .when(categorie === "Industriel et commercial" &&
        nature.isInCollection(indNatures), "industrial")
      .when(categorie === "Gestion des eaux", "industrial")
      .when(categorie === "Sport", "sport")
      .when(categorie === "Religieux", "religious")
      .otherwise("unknown")
  }

  /** Restrict a layer to rows intersecting the expanded zone envelope. */
  private def clip(layer: DataFrame, zoneExt: DataFrame,
                   grid: CellGrid, res: Int): DataFrame =
    SpatialJoin.intersectsJoin(
      layer.withColumnRenamed("the_geom", "__lg"), "__lg",
      zoneExt.select(col("the_geom").as("__zg")), "__zg", grid, res)
      .drop("__zg").withColumnRenamed("__lg", "the_geom")
      .dropDuplicates("id") // a layer row intersecting several zone parts stays once

  /**
   * Prepare the V3 layers for a commune. Input tables carry the raw V3
   * columns (lower-cased): batiment(id, the_geom, nature, usage1, nb_etages,
   * hauteur, z_min_toit, z_max_toit), troncon_de_route(id, the_geom,
   * largeur, nature, pos_sol, sens, importance, cl_admin, nat_restr,
   * nb_voies), troncon_de_voie_ferree(id, the_geom, nature, pos_sol,
   * nb_voies), surface_hydrographique(id, the_geom, nature, pos_sol,
   * persistanc), zone_de_vegetation(id, the_geom, nature),
   * terrain_de_sport(id, the_geom, nature, nat_detail),
   * construction_surfacique / equipement_de_transport / piste_d_aerodrome /
   * cimetiere(id, the_geom, nature), zone_d_activite_ou_d_interet(id,
   * the_geom, categorie, nature, fictif), limite_terre_mer(id, the_geom,
   * niveau). Missing layers: pass an empty DataFrame with that schema.
   */
  def loadV3(commune: DataFrame, // (the_geom, code_insee)
             batiment: DataFrame, tronconDeRoute: DataFrame,
             tronconDeVoieFerree: DataFrame, surfaceHydrographique: DataFrame,
             zoneDeVegetation: DataFrame, terrainDeSport: DataFrame,
             constructionSurfacique: DataFrame, equipementDeTransport: DataFrame,
             zoneDActivite: DataFrame, pisteDAerodrome: DataFrame,
             cimetiere: DataFrame, limiteTerreMer: Option[DataFrame],
             distance: Double, grid: CellGrid, res: Int): Layers = {
    val zone = commune.select(col("the_geom"), col("code_insee").as("id_zone"))
    val zoneExt = zone.select(G.stExpand(col("the_geom"), lit(distance)).as("the_geom"))
      .localCheckpoint() // every layer clip probes it

    // 3. building (:556-575)
    val building = clip(batiment, zoneExt, grid, res).select(
      G.stMakeValid(col("the_geom")).as("the_geom"),
      col("id").as("id_source"),
      col("hauteur").cast("double").as("height_wall"),
      when(col("z_max_toit").isNotNull && col("z_min_toit").isNotNull,
        col("z_max_toit") - col("z_min_toit") + col("hauteur"))
        .otherwise(lit(null)).cast("double").as("height_roof"),
      when(col("nature") === "Indifférenciée" && col("usage1") =!= "Indifférencié", col("usage1"))
        .when(col("nature") === "Indifférenciée" && col("usage1") === "Indifférencié", "Bâtiment")
        .when(col("nature") === "Industriel, agricole ou commercial" &&
          col("usage1") =!= "Indifférencié", col("usage1"))
        .otherwise(col("nature")).as("type"),
      when(col("usage1") === "Indifférencié" && col("nature") === "Indifférenciée", "Bâtiment")
        .when(col("usage1") === "Indifférencié" && col("nature") =!= "Indifférenciée", col("nature"))
        .otherwise(col("usage1")).as("main_use"),
      col("nb_etages").cast("int").as("nb_lev"))

    // 4. road (:578-600): underground (-4..-1) dropped; Pont crossing
    val road = clip(tronconDeRoute, zoneExt, grid, res)
      .where(!col("pos_sol").isin("-4", "-3", "-2", "-1"))
      .select(col("the_geom"), col("id").as("id_source"),
        col("largeur").cast("double").as("width"),
        when(col("nat_restr") === "Piste cyclable", col("nat_restr"))
          .otherwise(col("nature")).as("type"),
        when(col("pos_sol") === "Gué ou radier", 0)
          .otherwise(col("pos_sol").cast("int")).as("zindex"),
        when(col("pos_sol").isin("1", "2", "3", "4"), "Pont")
          .when(col("pos_sol") === "Gué ou radier", col("pos_sol"))
          .otherwise(lit(null)).as("crossing"),
        when(col("sens") === "Double sens", "Double")
          .when(col("sens") === "Sens direct", "Direct")
          .when(col("sens") === "Sens inverse", "Inverse")
          .otherwise(lit(null)).as("direction"),
        when(col("importance").isin("1", "2", "3", "4", "5", "6"),
          col("importance").cast("int")).otherwise(lit(null)).as("rank"),
        col("cl_admin").as("admin_scale"), col("nb_voies"))

    // 5. rail (:603-611): width = 1.435 per track (0 tracks -> one)
    val rail = clip(tronconDeVoieFerree, zoneExt, grid, res)
      .where(col("pos_sol").cast("int") >= 0)
      .select(col("the_geom"), col("id").as("id_source"),
        col("nature").as("type"), col("pos_sol").cast("int").as("zindex"),
        when(col("pos_sol").isin("1", "2", "3", "4"), "Pont")
          .otherwise(lit(null)).as("crossing"),
        when(col("nb_voies") === 0, 1.435).otherwise(lit(1.435) * col("nb_voies"))
          .as("width"))

    // 6. water (:614-628): nature exclusions + REGIME + swimming pools
    val hydroExcluded = Seq("Conduit buse", "Conduit forcé", "Marais", "Glacier névé")
    val water = clip(surfaceHydrographique, zoneExt, grid, res)
      .where(col("pos_sol").cast("int") >= 0 && !col("nature").isInCollection(hydroExcluded))
      .select(G.stMakeValid(col("the_geom")).as("the_geom"),
        col("id").as("id_source"), lit(0).as("zindex"), col("nature").as("type"),
        when(col("persistanc") === "Permanent", col("persistanc"))
          .otherwise("Intermittent").as("regime"))
      .unionByName(clip(terrainDeSport, zoneExt, grid, res)
        .where(col("nature") === "Bassin de natation")
        .select(G.stMakeValid(col("the_geom")).as("the_geom"),
          col("id").as("id_source"), lit(0).as("zindex"), col("nature").as("type"),
          lit("Permanent").as("regime")))

    // 7. vegetation (:631-650): vegetation zones + grass runways +
    //    football/rugby pitches + marshes
    def vegPart(df: DataFrame, typeCol: Column, pred: Column) =
      clip(df, zoneExt, grid, res).where(pred)
        .select(G.stMakeValid(col("the_geom")).as("the_geom"),
          col("id").as("id_source"), typeCol.as("type"), lit(0).as("zindex"))
    val vegetation =
      vegPart(zoneDeVegetation, col("nature"), lit(true))
        .unionByName(vegPart(pisteDAerodrome, col("nature"), col("nature") === "Piste en herbe"))
        .unionByName(vegPart(terrainDeSport, col("nat_detail"),
          col("nat_detail").isin("Terrain de football", "Terrain de rugby")))
        .unionByName(vegPart(surfaceHydrographique, col("nature"),
          col("pos_sol").cast("int") >= 0 && col("nature") === "Marais"))

    // 8. urban areas (:653-676): typed activity zones, non-fictitious,
    //    clipped to the zone (contains fast path), unknown dropped
    val activity = SpatialJoin.candidates(
        zoneExt.select(col("the_geom").as("__zg")), "__zg",
        zoneDActivite.where(col("fictif") === "Non")
          .withColumnRenamed("the_geom", "__ag"), "__ag", grid, res)
      .where(G.stIntersects(col("__zg"), col("__ag")))
      .withColumn("the_geom",
        when(G.stContains(col("__zg"), col("__ag")), col("__ag"))
          .otherwise(G.stMakeValid(G.stCollectionExtractPolygons(
            G.stIntersection(col("__ag"), col("__zg"))))))
      .select(col("the_geom"), col("id"),
        activityType(col("categorie"), col("nature")).as("type"))
      .localCheckpoint() // urban areas + impervious both read it
    // ST_EXPLODE (InputDataLoading.groovy:672-676): one row per single-part
    // polygon of the clipped activity geometry, id_urban = the per-source-row
    // 1-based part index (H2GIS EXPLOD_ID) — downstream formatting
    // (removeOverlaps/withinToHoles) operates per row, so multi-part results
    // must split here to keep row counts and per-part semantics aligned.
    val urbanAreas = activity.where(col("type") =!= "unknown")
      .select(posexplode(G.stExplode(col("the_geom"))).as(Seq("__i", "the_geom")),
        col("id").as("id_source"), col("type"))
      .select(col("the_geom"), col("id_source"), col("type"),
        (col("__i") + 1).cast("int").as("id_urban"))

    // 9. impervious (:681-707)
    def impPart(df: DataFrame, typeV: Column, pred: Column) =
      clip(df, zoneExt, grid, res).where(pred)
        .select(G.stMakeValid(col("the_geom")).as("the_geom"),
          col("id").as("id_source"), typeV.as("type"))
    val impervious =
      impPart(terrainDeSport, lit("sport"),
          !col("nat_detail").isin("Terrain de football", "Terrain de rugby"))
        .unionByName(impPart(constructionSurfacique, lit("building"),
          col("nature").isin("Barrage", "Ecluse", "Dalle")))
        .unionByName(impPart(equipementDeTransport, lit("transport"), lit(true)))
        .unionByName(activity.where(col("type") =!= "unknown")
          .select(col("the_geom"), col("id").as("id_source"), col("type")))
        // reference quirk replicated: the cimetiere branch is the ONLY
        // impervious part without the zone_extended clip
        // (InputDataLoading.groovy:698-699 selects straight FROM $cimetiere)
        .unionByName(cimetiere.select(col("the_geom"),
          col("id").as("id_source"), lit("cemetery").as("type")))
        .unionByName(impPart(pisteDAerodrome, lit("transport"),
          col("nature") === "Piste en dur"))

    // 10. coastline (:710-719): highest-water lines only
    val coastline = limiteTerreMer.map(l =>
      clip(l, zoneExt, grid, res).where(col("niveau") === "Plus hautes eaux")
        .select(G.stMakeValid(col("the_geom")).as("the_geom"),
          col("id").as("id_source")))

    Layers(building, road, rail, water, vegetation, impervious, urbanAreas,
      coastline, zone)
  }
}
