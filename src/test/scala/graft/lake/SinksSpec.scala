package graft.lake

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.geom.Geo

/** GeoJSON FeatureCollection sink: structure parses back, geometry types and
  * coordinates round-trip, properties preserved. */
class SinksSpec extends SparkTestBase {
  import spark.implicits._

  test("writeGeoJson round-trips geometry + properties") {
    val rows = Seq(
      (1, "a", Geo.toWkb(Geo.box(0, 0, 10, 5))),
      (2, "b\"q", Geo.toWkb(Geo.point(2.5, 7.5))),
      (3, null, Geo.toWkb(Geo.fromWkt("LINESTRING(0 0, 3 4)"))))
      .toDF("id", "name", "the_geom").orderBy("id")
    val path = Files.createTempDirectory("gj").resolve("out.geojson").toString
    Sinks.writeGeoJson(rows, "the_geom", path)
    val txt = new String(Files.readAllBytes(java.nio.file.Paths.get(path)))
    // parse with the JVM's own JSON-ish checks via spark
    val parsed = spark.read.json(Seq(txt).toDS())
    assert(parsed.select("type").head().getString(0) == "FeatureCollection")
    val feats = parsed.select(explode(col("features")).as("f"))
      .select(col("f.geometry.type").as("gt"), col("f.properties.id").as("id"),
        col("f.properties.name").as("name"))
      .orderBy("id").collect()
    assert(feats.map(_.getString(0)).toSeq == Seq("Polygon", "Point", "LineString"))
    assert(feats.map(_.getLong(1)).toSeq == Seq(1L, 2L, 3L))
    assert(feats(1).getString(2) == "b\"q" && feats(2).isNullAt(2))
    assert(txt.contains("[2.5,7.5]")) // point coordinates verbatim
  }

  test("writeGeoJson emits valid JSON for control chars and non-finite doubles") {
    val rows = Seq(
      (1, "line\nbreak\ttabctl", Double.NaN),
      (2, "plain", Double.PositiveInfinity),
      (3, "x", 1.5))
      .toDF("id", "name", "score").orderBy("id")
      .withColumn("the_geom", lit(Geo.toWkb(Geo.point(1, 2))))
    val path = Files.createTempDirectory("gj2").resolve("out.geojson").toString
    Sinks.writeGeoJson(rows, "the_geom", path)
    val txt = new String(Files.readAllBytes(java.nio.file.Paths.get(path)))
    // must parse as strict JSON (control chars escaped, NaN/Inf -> null)
    val parsed = spark.read.option("mode", "FAILFAST").json(Seq(txt).toDS())
    val feats = parsed.select(explode(col("features")).as("f"))
      .select(col("f.properties.id").as("id"), col("f.properties.name").as("name"),
        col("f.properties.score").as("score"))
      .orderBy("id").collect()
    assert(feats(0).getString(1) == "line\nbreak\ttabctl")
    assert(feats(0).isNullAt(2) && feats(1).isNullAt(2))
    assert(feats(2).getDouble(2) == 1.5)
  }

  test("saveLayers routes geometry tables to GeoJSON+parquet, plain to CSV") {
    import spark.implicits._
    import graft.geom.{GeoFunctions => G}
    val dir = java.nio.file.Files.createTempDirectory("layers-out").toString
    val geomDf = Seq((1, 0.0), (2, 10.0)).toDF("id", "x")
      .select(col("id"), G.stPoint(col("x"), col("x")).as("the_geom"))
    val plainDf = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val written = Sinks.saveLayers(Map("pts" -> geomDf, "stats" -> plainDf), dir)
    assert(written("pts").exists(_.endsWith(".geojson")))
    assert(written("pts").exists(_.endsWith(".parquet")))
    assert(written("stats").head.endsWith(".csv"))
    val gj = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/pts.geojson")), "UTF-8")
    assert(gj.contains("\"FeatureCollection\"") && gj.contains("[10.0,10.0]"))
    assert(spark.read.parquet(s"$dir/pts.parquet").count() == 2)
    assert(spark.read.option("header", "true").csv(s"$dir/stats.csv").count() == 2)
  }
}
