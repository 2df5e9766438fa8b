package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.locationtech.jts.algorithm.Orientation
import org.locationtech.jts.geom.{Coordinate, Geometry, LinearRing}
import graft.geom.Geo

/**
 * From-scratch ESRI shapefile source — the BDTopo input path the reference
 * reads through H2GIS's SHP driver (bdtopo/BDTopoV2Workflow.groovy; sample
 * commune layers under bdtopo/src/test/resources). Parses .shp geometry
 * records (Point/PolyLine/Polygon incl. the Z/M variants, whose Z/M
 * sections are skipped) and the sibling .dbf attribute table (C/N/F/L/D
 * fields as trimmed strings) into a DataFrame of
 * `(the_geom WKB, attrs Map[String,String])`.
 *
 * Distribution model: one shapefile is one record stream (the format has no
 * internal split points without the .shx sidecar), so parsing is one task
 * per FILE via Spark's binaryFile source — a BDTopo departement ships many
 * layer/tile files, which is where the parallelism lives. Ring semantics:
 * clockwise rings are shells, counter-clockwise rings are holes assigned to
 * the first shell containing their first vertex (the ESRI spec rule).
 */
object Shapefile {

  /** Read one layer: `path` is the .shp; the .dbf is the sibling file. */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val dbfPath = path.replaceAll("(?i)\\.shp$", ".dbf")
    val shp = spark.read.format("binaryFile").load(path)
      .select(col("content").as("shp"))
    val dbf = spark.read.format("binaryFile").load(dbfPath)
      .select(col("content").as("dbf"))
    shp.crossJoin(dbf) // one row each: a layer is a single (shp, dbf) pair
      .flatMap { row =>
        val geoms = parseShp(row.getAs[Array[Byte]]("shp"))
        val attrs = parseDbf(row.getAs[Array[Byte]]("dbf"))
        geoms.zipAll(attrs, null: Array[Byte], Map.empty[String, String])
          .filter(_._1 != null)
      }
      .toDF("the_geom", "attrs")
  }

  /** One attribute as a typed column: `attr(df, "hauteur").cast("double")`. */
  def attr(name: String) = element_at(col("attrs"), name)

  // ---- .shp geometry records ----------------------------------------------

  private[sources] def parseShp(b: Array[Byte]): Seq[Array[Byte]] = {
    val le = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val be = ByteBuffer.wrap(b).order(ByteOrder.BIG_ENDIAN)
    require(be.getInt(0) == 9994, "not a shapefile (bad magic)")
    val out = Seq.newBuilder[Array[Byte]]
    var off = 100
    while (off + 8 <= b.length) {
      val contentWords = be.getInt(off + 4)
      val c = off + 8 // content start
      val shapeType = le.getInt(c)
      val g: Geometry = shapeType match {
        case 0 => null // null shape
        case 1 | 11 | 21 => // Point / PointZ / PointM
          Geo.point(le.getDouble(c + 4), le.getDouble(c + 12))
        case 3 | 13 | 23 | 5 | 15 | 25 => // PolyLine* / Polygon* (Z/M tail skipped)
          val numParts = le.getInt(c + 36)
          val numPoints = le.getInt(c + 40)
          val partsOff = c + 44
          val ptsOff = partsOff + 4 * numParts
          val parts = Array.tabulate(numParts)(i => le.getInt(partsOff + 4 * i))
          val bounds = parts :+ numPoints
          val rings = Array.tabulate(numParts) { i =>
            Array.tabulate(bounds(i + 1) - bounds(i)) { j =>
              val p = ptsOff + 16 * (bounds(i) + j)
              new Coordinate(le.getDouble(p), le.getDouble(p + 8))
            }
          }
          if (shapeType == 3 || shapeType == 13 || shapeType == 23) {
            val lines = rings.filter(_.length >= 2).map(Geo.factory.createLineString)
            if (lines.length == 1) lines(0) else Geo.factory.createMultiLineString(lines)
          } else assemblePolygons(rings)
        case t => throw new IllegalArgumentException(s"unsupported shape type $t")
      }
      if (g != null) out += Geo.toWkb(g) else out += null
      off = c + contentWords * 2
    }
    out.result()
  }

  /** ESRI ring rule: CW = shell, CCW = hole in the shell containing it. */
  private def assemblePolygons(rings: Array[Array[Coordinate]]): Geometry = {
    val closed = rings.filter(r => r.length >= 4 && r.head.equals2D(r.last))
      .map(Geo.factory.createLinearRing)
    val (holes, shells) = closed.partition(r => Orientation.isCCW(r.getCoordinateSequence))
    val shellPolys = shells.map(s => (s, Geo.factory.createPolygon(s)))
    val holesByShell = holes.groupBy { h =>
      val p = Geo.factory.createPoint(h.getCoordinateN(0))
      shellPolys.indexWhere(_._2.covers(p))
    }
    val polys = shellPolys.zipWithIndex.map { case ((shell, _), i) =>
      Geo.factory.createPolygon(shell,
        holesByShell.getOrElse(i, Array.empty[LinearRing]))
    }
    val orphan = holesByShell.getOrElse(-1, Array.empty[LinearRing])
      .map(h => Geo.factory.createPolygon(h.getCoordinates.reverse)) // hole with no shell: standalone
    val all = polys ++ orphan
    if (all.length == 1) all(0) else Geo.factory.createMultiPolygon(all)
  }

  // ---- .dbf attribute records ---------------------------------------------

  private[sources] def parseDbf(b: Array[Byte]): Seq[Map[String, String]] = {
    val le = ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN)
    val nRec = le.getInt(4)
    val headerSize = le.getShort(8) & 0xffff
    val recordSize = le.getShort(10) & 0xffff
    // field descriptors: 32 bytes each until the 0x0D terminator
    val fields = Iterator.from(0)
      .map(i => 32 + 32 * i)
      .takeWhile(o => o < headerSize && b(o) != 0x0D)
      .map { o =>
        val name = new String(b.slice(o, o + 11).takeWhile(_ != 0), "ISO-8859-1")
        (name, b(o + 16) & 0xff)
      }.toArray
    (0 until nRec).map { i =>
      val base = headerSize + i.toLong * recordSize
      var o = base.toInt + 1 // deletion flag byte
      fields.iterator.map { case (name, len) =>
        val v = new String(b.slice(o, o + len), "ISO-8859-1").trim
        o += len
        name -> v
      }.filter(_._2.nonEmpty).toMap
    }
  }
}
