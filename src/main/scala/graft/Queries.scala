package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.geom.{GeoFunctions => G}
import graft.index.CellGrid
import graft.operators.{SpatialJoin, Tiling}
import graft.fixtures.GeoFixture

/**
 * Driver-verified query surface: each entry pairs a Spark implementation
 * (running the engine's real operators) with an exact ANSI-SQL oracle that
 * DuckDB evaluates over the same parquet inputs (see SparkEntry).
 *
 * Design rules for exact hash equality with the oracle:
 *  - outputs are integers/strings, or doubles produced by the *identical*
 *    sequence of IEEE ops on both engines (sqrt/floor/division of the same
 *    operands) — never order-dependent double accumulations;
 *  - money sums go through `round(x*100) as BIGINT` cents;
 *  - synthetic geometry (points from doc_id) uses pure integer LCG math that
 *    both engines evaluate identically;
 *  - point-in-polygon boundary semantics = strict interior on both sides
 *    (JTS `contains` <=> strict inequalities on rectangle bounds).
 */
object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The engine's index grid for fixture-plane data. Res 10 → 32-unit cells,
    * comparable to the 50-100 unit fixture zones. */
  private val grid = CellGrid.fixture
  private val Res = 10

  // ---- deterministic geocode of documents (pure Catalyst, codegen'd) ------
  private def docPoints(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(
      col("doc_id"), col("n_chars"),
      ((col("doc_id") * 1103515245L + 12345L) % 2147483648L % 55000L).cast("double") / 1000.0 as "x",
      (((col("doc_id") * 69069L + 1L) % 2147483648L % 55000L).cast("double") / 1000.0 - 15.0) as "y")

  private val docPointsSql =
    """pts AS (SELECT doc_id, n_chars,
      |  CAST((doc_id * 1103515245 + 12345) % 2147483648 % 55000 AS DOUBLE) / 1000.0 AS x,
      |  CAST((doc_id * 69069 + 1) % 2147483648 % 55000 AS DOUBLE) / 1000.0 - 15.0 AS y
      |FROM documents)""".stripMargin

  /** Fixture RSU rectangles as (id_rsu, xmin, ymin, xmax, ymax) SQL VALUES —
    * every rsu_test geometry is axis-aligned, so the oracle can express
    * point-in-polygon / overlap with plain arithmetic. */
  private val rsuRectsSql =
    """rsu(id_rsu, xmin, ymin, xmax, ymax) AS (VALUES
      | (1, 0.0, 0.0, 50.0, 40.0), (2, 50.0, 0.0, 55.0, 30.0), (3, 0.0, -15.0, 25.0, 0.0),
      | (4, 1000.0, 1000.0, 1100.0, 1100.0), (5, 1100.0, 1000.0, 1200.0, 1100.0),
      | (6, 1200.0, 1000.0, 1300.0, 1100.0), (7, 1000.0, 1100.0, 1100.0, 1200.0),
      | (8, 1100.0, 1100.0, 1200.0, 1200.0), (9, 1200.0, 1100.0, 1300.0, 1200.0),
      | (10, 1000.0, 1200.0, 1100.0, 1300.0), (11, 1100.0, 1200.0, 1200.0, 1300.0),
      | (12, 1200.0, 1200.0, 1300.0, 1300.0), (13, 1400.0, 1400.0, 1500.0, 1500.0),
      | (14, 0.0, 100.0, 50.0, 150.0), (15, 0.0, 99.0, 50.0, 100.0),
      | (16, 0.0, -150.0, 50.0, -100.0), (17, 1500.0, 1500.0, 1600.0, 1600.0),
      | (18, 10000.0, 10000.0, 10100.0, 10100.0))""".stripMargin

  private val knnSites: Seq[(Int, Double, Double)] =
    Seq((1, 10.0, 10.0), (2, 30.0, 20.0), (3, 50.0, 0.0), (4, 5.0, -10.0), (5, 40.0, 35.0), (6, 25.0, -5.0))

  // =========================================================================
  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // -- relational baseline (unweightedOperationFromLowerScale analogue:
    //    SUM/AVG/COUNT hash aggregate — GenericIndicators.groovy:57-125) ----
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity")).as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_price_cents"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // -- multi-table id join + agg + top-k (DataUtils.groovy:40-87 joinTables
    //    + SURVEY §2.6 top-k) ----------------------------------------------
    "q2_join_topk" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long")).as("revenue_cents"),
          count(lit(1)).as("cnt"))
        .orderBy(desc("revenue_cents"))
    }),

    // -- window/top-1-per-group (the decorrelated ORDER BY ... LIMIT 1 —
    //    SpatialUnits.groovy:500-511 -> max_by, SURVEY §4) ------------------
    "q3_window_top1" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))
      o.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"))
        .orderBy("o_custkey")
    }),

    // -- left anti join (reference NOT IN subquery — RsuIndicators.groovy:494) --
    "q4_anti_join" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").where(col("o_totalprice") > 400000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy("c_custkey")
    }),

    // -- tile assignment of geocoded points: pure-Catalyst rasterization
    //    (ST_MakeGrid + grid rasterize — SpatialUnits.groovy:563-567) -------
    "geo_tile_assign" -> ((s, dir) => {
      Tiling.rasterizePoints(docPoints(s, dir), "x", "y", 0.0, 0.0, 10.0, 10.0,
          Seq(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars")))
        .orderBy("id_col", "id_row")
    }),

    // -- point-in-polygon join via cell-equijoin + prepared refinement
    //    (the engine's core spatial join, SURVEY §2.3 / north rule) ---------
    "geo_pip_join" -> ((s, dir) => {
      val rsu = GeoFixture.rsuDf(s).select("id_rsu", "the_geom")
      SpatialJoin.pointInPolygon(docPoints(s, dir), "x", "y", rsu, "the_geom", grid, Res)
        .select(col("doc_id"), col("id_rsu").cast("long").as("id_rsu"))
        .orderBy("doc_id")
    }),

    // -- raster<->vector zonal aggregation over the pip join ----------------
    "geo_zonal_stats" -> ((s, dir) => {
      val rsu = GeoFixture.rsuDf(s).select("id_rsu", "the_geom")
      SpatialJoin.pointInPolygon(docPoints(s, dir), "x", "y", rsu, "the_geom", grid, Res)
        .groupBy(col("id_rsu").cast("long").as("id_rsu"))
        .agg(count(lit(1)).as("cnt"), sum(col("n_chars")).as("sum_chars"))
        .orderBy("id_rsu")
    }),

    // -- max-overlap tile assignment (decorrelated top-1 by ST_AREA(ST_INTERSECTION)
    //    — SpatialUnits.groovy:479-527 mode (b)) ----------------------------
    "geo_maxoverlap_assign" -> ((s, dir) => {
      val foot = docPoints(s, dir).select(col("doc_id"),
        G.stMakeBox(col("x"), col("y"), col("x") + 2.0, col("y") + 2.0).as("fp"))
      val rsu = GeoFixture.rsuDf(s).select("id_rsu", "the_geom")
      SpatialJoin.assignMaxOverlap(foot, "doc_id", "fp", rsu, "id_rsu", "the_geom", grid, Res)
        .select(col("doc_id"), col("id_rsu").cast("long").as("id_rsu"))
        .orderBy("doc_id")
    }),

    // -- bounded min-distance kNN (k-ring expansion — BuildingIndicators.groovy:304-432) --
    "geo_knn_mindist" -> ((s, dir) => {
      import s.implicits._
      val sites = knnSites.toDF("site_id", "sx", "sy")
        .select(G.stPoint(col("sx"), col("sy")).as("sgeom"))
      val pts = docPoints(s, dir)
        .withColumn("pgeom", G.stPoint(col("x"), col("y")))
      SpatialJoin.minDistanceWithin(pts, "doc_id", "pgeom", sites, "sgeom",
          maxDist = 30.0, defaultDist = 100.0, grid, Res)
        // JTS point distance uses Math.hypot (1 ulp off plain sqrt); round to
        // make the oracle comparison representation-stable.
        .select(col("doc_id"), round(col("min_distance"), 3).as("min_distance"))
        .orderBy("doc_id")
    }),

    // -- exact deduplication (hash groupBy on full text) --------------------
    "dedup_exact" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy("text")
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
        .select("doc_id", "dup_cnt")
        .orderBy("doc_id")
    }),

    // -- text analysis: token count + length + whitespace ratio ------------
    "text_stats" -> ((s, dir) => {
      t(s, dir, "documents").select(
          col("doc_id"),
          size(split(col("text"), " ", -1)).cast("long").as("n_tokens"),
          length(col("text")).cast("long").as("len_chars"),
          (length(col("text")) - length(regexp_replace(col("text"), " ", ""))).cast("long").as("n_spaces"))
        .orderBy("doc_id")
    }))

  // =========================================================================
  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q2_join_topk" ->
      """SELECT c_mktsegment,
        |  CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS cnt
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY revenue_cents DESC""".stripMargin,
    "q3_window_top1" ->
      """SELECT o_custkey, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q4_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)
        |ORDER BY c_custkey""".stripMargin,
    "geo_tile_assign" ->
      s"""WITH $docPointsSql
        |SELECT CAST(floor(x / 10.0) AS BIGINT) + 1 AS id_col,
        |       CAST(floor(y / 10.0) AS BIGINT) + 1 AS id_row,
        |       count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM pts GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "geo_pip_join" ->
      s"""WITH $docPointsSql, $rsuRectsSql
        |SELECT doc_id, CAST(id_rsu AS BIGINT) AS id_rsu FROM pts JOIN rsu
        |ON x > xmin AND x < xmax AND y > ymin AND y < ymax
        |ORDER BY doc_id""".stripMargin,
    "geo_zonal_stats" ->
      s"""WITH $docPointsSql, $rsuRectsSql
        |SELECT CAST(id_rsu AS BIGINT) AS id_rsu, count(*) AS cnt, CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM pts JOIN rsu ON x > xmin AND x < xmax AND y > ymin AND y < ymax
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "geo_maxoverlap_assign" ->
      s"""WITH $docPointsSql, $rsuRectsSql,
        |ov AS (SELECT doc_id, id_rsu,
        |    greatest(0.0, least(x + 2.0, xmax) - greatest(x, xmin))
        |  * greatest(0.0, least(y + 2.0, ymax) - greatest(y, ymin)) AS ia
        |  FROM pts JOIN rsu ON x + 2.0 > xmin AND x < xmax AND y + 2.0 > ymin AND y < ymax)
        |SELECT doc_id, CAST(id_rsu AS BIGINT) AS id_rsu FROM (
        |  SELECT doc_id, id_rsu, row_number() OVER (PARTITION BY doc_id ORDER BY ia DESC, id_rsu DESC) AS rn
        |  FROM ov WHERE ia > 0) WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    "geo_knn_mindist" -> {
      val sitesSql = knnSites.map { case (i, x, y) => s"($i, $x, $y)" }.mkString(", ")
      s"""WITH $docPointsSql, sites(site_id, sx, sy) AS (VALUES $sitesSql),
        |d AS (SELECT doc_id, sqrt((x - sx)*(x - sx) + (y - sy)*(y - sy)) AS d
        |  FROM pts CROSS JOIN sites)
        |SELECT p.doc_id, round(coalesce(m.md, 100.0), 3) AS min_distance
        |FROM pts p LEFT JOIN (SELECT doc_id, min(d) AS md FROM d WHERE d <= 30.0 GROUP BY 1) m
        |ON p.doc_id = m.doc_id ORDER BY p.doc_id""".stripMargin
    },
    "dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_cnt FROM documents
        |GROUP BY text ORDER BY doc_id""".stripMargin,
    "text_stats" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) AS BIGINT) AS len_chars,
        |  CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS n_spaces
        |FROM documents ORDER BY doc_id""".stripMargin)
}
