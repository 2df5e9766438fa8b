package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid

/**
 * BDTopo V3 loading dictionary vs the reference SQL
 * (bdtopo/InputDataLoading.groovy:346-738). The driver testdata carries no
 * V3 sample, so the gate is reference-golden behavior on a literal scene
 * exercising every CASE branch.
 */
class BdTopoV3Spec extends SparkTestBase {

  private val grid = CellGrid.fixture
  private def box(x0: Double, y0: Double, w: Double, h: Double) =
    G.stMakeBox(lit(x0), lit(y0), lit(x0 + w), lit(y0 + h))

  private def empty(cols: (String, String)*): DataFrame = {
    val df0 = spark.range(0)
    cols.foldLeft(df0.toDF()) { case (df, (n, t)) =>
      df.withColumn(n, lit(null).cast(t))
    }.withColumn("the_geom", box(0, 0, 1, 1)).where(lit(false))
  }

  private def commune = spark.range(1).select(
    box(0, 0, 100, 100).as("the_geom"), lit("12174").as("code_insee"))

  private def load(batiment: DataFrame = empty("id" -> "string", "nature" -> "string",
                     "usage1" -> "string", "nb_etages" -> "int", "hauteur" -> "double",
                     "z_min_toit" -> "double", "z_max_toit" -> "double"),
                   route: DataFrame = empty("id" -> "string", "largeur" -> "double",
                     "nature" -> "string", "pos_sol" -> "string", "sens" -> "string",
                     "importance" -> "string", "cl_admin" -> "string",
                     "nat_restr" -> "string", "nb_voies" -> "int"),
                   rail: DataFrame = empty("id" -> "string", "nature" -> "string",
                     "pos_sol" -> "string", "nb_voies" -> "int"),
                   hydro: DataFrame = empty("id" -> "string", "nature" -> "string",
                     "pos_sol" -> "string", "persistanc" -> "string"),
                   veget: DataFrame = empty("id" -> "string", "nature" -> "string"),
                   sport: DataFrame = empty("id" -> "string", "nature" -> "string",
                     "nat_detail" -> "string"),
                   constr: DataFrame = empty("id" -> "string", "nature" -> "string"),
                   transp: DataFrame = empty("id" -> "string", "nature" -> "string"),
                   activite: DataFrame = empty("id" -> "string", "categorie" -> "string",
                     "nature" -> "string", "fictif" -> "string"),
                   piste: DataFrame = empty("id" -> "string", "nature" -> "string"),
                   cimetiere: DataFrame = empty("id" -> "string", "nature" -> "string"),
                   mer: Option[DataFrame] = None) =
    BdTopoV3.loadV3(commune, batiment, route, rail, hydro, veget, sport,
      constr, transp, activite, piste, cimetiere, mer, 1000.0, grid, 10)

  test("building: type/main_use CASE logic and height_roof from Z toit") {
    import spark.implicits._
    val bat = Seq(
      // (id, nature, usage1, nb_etages, hauteur, z_min, z_max)
      ("b1", "Indifférenciée", "Indifférencié", 2, 6.0, Some(10.0), Some(14.0)),
      ("b2", "Indifférenciée", "Résidentiel", 3, 9.0, None, None),
      ("b3", "Industriel, agricole ou commercial", "Commercial et services", 1, 4.0, Some(0.0), Some(5.0)),
      ("b4", "Eglise", "Religieux", 1, 12.0, None, None))
      .toDF("id", "nature", "usage1", "nb_etages", "hauteur", "z_min_toit", "z_max_toit")
      .withColumn("the_geom", box(10, 10, 10, 10))
    val out = load(batiment = bat).building
      .select("id_source", "type", "main_use", "height_wall", "height_roof")
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)))).toMap
    assert(out("b1") == (("Bâtiment", "Bâtiment", 6.0, Some(10.0)))) // 14-10+6
    assert(out("b2") == (("Résidentiel", "Résidentiel", 9.0, None)))
    assert(out("b3") == (("Commercial et services", "Commercial et services", 4.0, Some(9.0))))
    assert(out("b4") == (("Eglise", "Religieux", 12.0, None)))
  }

  test("road: underground dropped, Pont crossing, direction + rank mapping") {
    import spark.implicits._
    def line(x: Int) = s"LINESTRING($x 0, $x 50)"
    val roads = Seq(
      ("r1", 5.0, "Route à 2 chaussées", "0", "Double sens", "3", "Départemental", null),
      ("r2", 3.0, "Route empierrée", "2", "Sens direct", "9", null, null),
      ("r3", 2.0, "Sentier", "-1", "Sens inverse", "1", null, null), // dropped
      ("r4", 2.0, "Route empierrée", "Gué ou radier", null, null, null, "Piste cyclable"))
      .toDF("id", "largeur", "nature", "pos_sol", "sens", "importance", "cl_admin", "nat_restr")
      .withColumn("nb_voies", lit(1))
      .withColumn("the_geom", G.stGeomFromWkt(lit(line(5))))
    val out = load(route = roads).road
      .select("id_source", "type", "zindex", "crossing", "direction", "rank")
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getInt(2),
        Option(r.getString(3)), Option(r.getString(4)),
        if (r.isNullAt(5)) None else Some(r.getInt(5)))).toMap
    assert(!out.contains("r3"))
    assert(out("r1") == (("Route à 2 chaussées", 0, None, Some("Double"), Some(3))))
    assert(out("r2") == (("Route empierrée", 2, Some("Pont"), Some("Direct"), None)))
    assert(out("r4") == (("Piste cyclable", 0, Some("Gué ou radier"), None, None)))
  }

  test("rail width = 1.435 per track; water regime + nature exclusions") {
    import spark.implicits._
    val rails = Seq(("t1", "Voie ferrée principale", "0", 2), ("t2", "LGV", "1", 0))
      .toDF("id", "nature", "pos_sol", "nb_voies")
      .withColumn("the_geom", G.stGeomFromWkt(lit("LINESTRING(0 0, 50 0)")))
    val r = load(rail = rails).rail.select("id_source", "width", "crossing")
      .collect().map(x => x.getString(0) -> (x.getDouble(1), Option(x.getString(2)))).toMap
    assert(r("t1") == ((2.87, None)))
    assert(r("t2") == ((1.435, Some("Pont"))))
    val hydros = Seq(("h1", "Ecoulement naturel", "0", "Permanent"),
      ("h2", "Plan d'eau", "0", "Inconnue"),
      ("h3", "Marais", "0", "Permanent"), // excluded from water, included in veget
      ("h4", "Conduit buse", "0", "Permanent")) // excluded
      .toDF("id", "nature", "pos_sol", "persistanc")
      .withColumn("the_geom", box(20, 20, 5, 5))
    val pools = Seq(("s1", "Bassin de natation", "x"))
      .toDF("id", "nature", "nat_detail").withColumn("the_geom", box(30, 30, 2, 2))
    val layers = load(hydro = hydros, sport = pools)
    val w = layers.water.select("id_source", "regime").collect()
      .map(x => x.getString(0) -> x.getString(1)).toMap
    assert(w == Map("h1" -> "Permanent", "h2" -> "Intermittent", "s1" -> "Permanent"))
    assert(layers.vegetation.select("id_source").collect().map(_.getString(0)).toSet
      == Set("h3")) // the marsh lands in vegetation
  }

  test("activity dictionary feeds urban areas AND impervious; cemetery/piste included") {
    import spark.implicits._
    val act = Seq(
      ("a1", "Administratif ou militaire", "Mairie", "Non"),
      ("a2", "Administratif ou militaire", "Caserne", "Non"),
      ("a3", "Science et enseignement", "Université", "Non"),
      ("a4", "Industriel et commercial", "Usine", "Non"),
      ("a5", "Industriel et commercial", "Marché", "Non"),
      ("a6", "Autre", "X", "Non"),       // unknown -> dropped
      ("a7", "Sport", "Stade", "Oui"))   // fictif -> dropped
      .toDF("id", "categorie", "nature", "fictif")
      .withColumn("the_geom", box(40, 40, 8, 8))
    val cim = Seq(("c1", "Cimetière")).toDF("id", "nature")
      .withColumn("the_geom", box(60, 60, 4, 4))
    val piste = Seq(("p1", "Piste en dur"), ("p2", "Piste en herbe"))
      .toDF("id", "nature").withColumn("the_geom", box(70, 70, 6, 6))
    val layers = load(activite = act, cimetiere = cim, piste = piste)
    val ua = layers.urbanAreas.select("id_source", "type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ua == Map("a1" -> "government", "a2" -> "military",
      "a3" -> "education", "a4" -> "industrial", "a5" -> "commercial"))
    val imp = layers.impervious.select("id_source", "type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(imp("c1") == "cemetery" && imp("p1") == "transport")
    assert(!imp.contains("p2")) // grass runway is vegetation, not impervious
    assert(layers.vegetation.select("id_source").collect().map(_.getString(0)).toSet
      == Set("p2"))
  }
}
