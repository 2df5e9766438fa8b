package graft.lake

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.locationtech.jts.geom._
import graft.geom.Geo

/**
 * File sinks for geometry tables — the reference's `saveTablesAsFiles`
 * (DataUtils.groovy:101-131) writes geometry tables to FlatGeobuf/GeoJSON
 * and plain tables to CSV. Here: GeoJSON (FeatureCollection, RFC 7946) is
 * written from scratch over the WKB column; CSV and Parquet are the
 * std Spark writers; FlatGeobuf is N/A by design (a flatbuffers container —
 * the lake-native interchange format is parquet).
 *
 * The GeoJSON writer is DISTRIBUTED up to the final concatenation: each
 * partition serializes its features; only the bounded final file assembly
 * is driver-side (same shape as writeAsc — a raster/file export, not a
 * data-scale operator).
 */
object Sinks {

  private def coords(cs: Seq[Coordinate]): String =
    cs.map(c => s"[${c.x},${c.y}]").mkString("[", ",", "]")

  /** RFC 7946 geometry member for the JTS types the engine produces. */
  def geometryJson(g: Geometry): String = g match {
    case p: Point => s"""{"type":"Point","coordinates":[${p.getX},${p.getY}]}"""
    case l: LineString =>
      s"""{"type":"LineString","coordinates":${coords(l.getCoordinates.toSeq)}}"""
    case p: Polygon =>
      val rings = (Seq(p.getExteriorRing) ++
        (0 until p.getNumInteriorRing).map(p.getInteriorRingN))
        .map(r => coords(r.getCoordinates.toSeq)).mkString("[", ",", "]")
      s"""{"type":"Polygon","coordinates":$rings}"""
    case mp: MultiPolygon =>
      val polys = (0 until mp.getNumGeometries)
        .map(i => geometryJson(mp.getGeometryN(i)))
        .map(j => j.substring(j.indexOf("\"coordinates\":") + 14, j.length - 1))
        .mkString("[", ",", "]")
      s"""{"type":"MultiPolygon","coordinates":$polys}"""
    case ml: MultiLineString =>
      val lines = (0 until ml.getNumGeometries)
        .map(i => coords(ml.getGeometryN(i).getCoordinates.toSeq)).mkString("[", ",", "]")
      s"""{"type":"MultiLineString","coordinates":$lines}"""
    case gc: GeometryCollection =>
      val geoms = (0 until gc.getNumGeometries).map(i => geometryJson(gc.getGeometryN(i)))
        .mkString("[", ",", "]")
      s"""{"type":"GeometryCollection","geometries":$geoms}"""
  }

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case s: String => "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x" // all control chars — bare they make the file invalid JSON
      case c => c.toString
    } + "\""
    case b: Boolean => b.toString
    case d: Double if d.isNaN || d.isInfinite => "null" // JSON has no non-finite numbers
    case f: Float if f.isNaN || f.isInfinite => "null"
    case n => n.toString
  }

  /**
   * Write a DataFrame with a WKB geometry column as one GeoJSON
   * FeatureCollection file; all other columns become feature properties.
   * Features are ordered by the DataFrame's current ordering.
   * Serialization is distributed; the driver streams partitions to the file
   * one at a time via `toLocalIterator` (driver memory = one partition's
   * features, never the whole dataset).
   */
  def writeGeoJson(df: DataFrame, geomCol: String, path: String): Unit = {
    val props = df.schema.fieldNames.filterNot(_ == geomCol)
    val features = df.select(
        (col(geomCol) +: props.toSeq.map(col)): _*)
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val g = Geo.fromWkb(r.getAs[Array[Byte]](0))
          val ps = props.zipWithIndex.map { case (p, i) =>
            s""""$p":${jsonValue(r.get(i + 1))}"""
          }.mkString(",")
          s"""{"type":"Feature","geometry":${geometryJson(g)},"properties":{$ps}}"""
        }
      }(org.apache.spark.sql.Encoders.STRING)
    val w = java.nio.file.Files.newBufferedWriter(java.nio.file.Paths.get(path),
      java.nio.charset.StandardCharsets.UTF_8)
    try {
      w.write("""{"type":"FeatureCollection","features":[""")
      var first = true
      val it = features.toLocalIterator()
      while (it.hasNext) {
        if (!first) w.write(",")
        w.write(it.next()); first = false
      }
      w.write("]}")
    } finally w.close()
  }

  /**
   * saveTablesAsFiles (DataUtils.groovy:101-131): write each named layer
   * under `dir/<name>.<ext>` — geometry tables (a `the_geom` column) as
   * GeoJSON (the fgb stand-in) plus a parquet twin (the lake-native
   * format the reference's FlatGeobuf plays for them), plain tables as
   * CSV with header. Returns name → written paths.
   */
  def saveLayers(layers: Map[String, DataFrame], dir: String,
                 geomCol: String = "the_geom"): Map[String, Seq[String]] = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    layers.map { case (name, df) =>
      if (df.columns.contains(geomCol)) {
        val gj = s"$dir/$name.geojson"
        writeGeoJson(df, geomCol, gj)
        val pq = s"$dir/$name.parquet"
        df.write.mode("overwrite").parquet(pq)
        name -> Seq(gj, pq)
      } else {
        val csv = s"$dir/$name.csv"
        df.write.mode("overwrite").option("header", "true").csv(csv)
        name -> Seq(csv)
      }
    }
  }
}
