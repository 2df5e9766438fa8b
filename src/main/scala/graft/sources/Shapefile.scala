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

  // ---- writer ------------------------------------------------------------

  /**
   * Write a layer as .shp/.shx/.dbf (the ESRI triplet the reader consumes;
   * reference counterpart: H2GIS's SHPDriverFunction used by the BDTopo
   * save paths). Shape type is derived from the first geometry (Point=1,
   * PolyLine=3, Polygon=5); polygon rings follow the ESRI rule (shells CW,
   * holes CCW). Attributes: StringType → 'C' (width = max byte length),
   * integral types → 'N' width 18. The shapefile format itself is a
   * single-stream container with a 2 GiB hard limit and 32-bit record
   * numbers — a BOUNDED per-layer export (same class as writeAsc), so the
   * layer is collected on the driver; scale lives in writing many layer
   * files in parallel, not inside one file.
   *
   * @param path the .shp path; .shx/.dbf are written as siblings
   */
  def write(df: DataFrame, geomCol: String, path: String): Unit = {
    val attrs = df.schema.fields.filterNot(_.name == geomCol)
    val rows = df.select((col(geomCol) +: attrs.toSeq.map(f => col(f.name))): _*).collect()
    val geoms = rows.map(r => Option(r.getAs[Array[Byte]](0)).map(Geo.fromWkb).orNull)
    val present = geoms.filter(_ != null)
    require(present.nonEmpty, "cannot derive a shape type from an empty layer")
    val shapeType = present.head match {
      case _: org.locationtech.jts.geom.Point => 1
      case _: org.locationtech.jts.geom.LineString
         | _: org.locationtech.jts.geom.MultiLineString => 3
      case _: org.locationtech.jts.geom.Polygon
         | _: org.locationtech.jts.geom.MultiPolygon => 5
      case g => throw new IllegalArgumentException(s"unsupported geometry ${g.getGeometryType}")
    }

    // per-record geometry content (without the 8-byte record header)
    def le(n: Int): ByteBuffer = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    def ringsOf(g: Geometry): Seq[Array[Coordinate]] = g match {
      case p: org.locationtech.jts.geom.Polygon =>
        val shell = p.getExteriorRing.getCoordinates
        val cw = if (Orientation.isCCW(p.getExteriorRing.getCoordinateSequence)) shell.reverse else shell
        val holes = (0 until p.getNumInteriorRing).map { i =>
          val h = p.getInteriorRingN(i)
          if (Orientation.isCCW(h.getCoordinateSequence)) h.getCoordinates else h.getCoordinates.reverse
        }
        cw +: holes
      case l: org.locationtech.jts.geom.LineString => Seq(l.getCoordinates)
      case m => (0 until m.getNumGeometries).flatMap(i => ringsOf(m.getGeometryN(i)))
    }
    def content(g: Geometry): Array[Byte] = g match {
      case null => le(4).putInt(0).array() // null shape keeps attr alignment
      case p: org.locationtech.jts.geom.Point =>
        le(20).putInt(1).putDouble(p.getX).putDouble(p.getY).array()
      case g2 =>
        val parts = ringsOf(g2)
        val nPts = parts.map(_.length).sum
        val env = g2.getEnvelopeInternal
        val b = le(44 + 4 * parts.length + 16 * nPts)
        b.putInt(shapeType)
        b.putDouble(env.getMinX).putDouble(env.getMinY)
        b.putDouble(env.getMaxX).putDouble(env.getMaxY)
        b.putInt(parts.length).putInt(nPts)
        parts.scanLeft(0)(_ + _.length).dropRight(1).foreach(i => b.putInt(i))
        parts.foreach(_.foreach(c => b.putDouble(c.x).putDouble(c.y)))
        b.array()
    }
    val contents = geoms.map(content)
    val shpLen = 100 + contents.map(8 + _.length).sum
    val shp = ByteBuffer.allocate(shpLen)
    val shx = ByteBuffer.allocate(100 + 8 * contents.length)
    def header(buf: ByteBuffer, fileLen: Int): Unit = {
      buf.order(ByteOrder.BIG_ENDIAN).putInt(9994)
      (0 until 5).foreach(_ => buf.putInt(0))
      buf.putInt(fileLen / 2).order(ByteOrder.LITTLE_ENDIAN).putInt(1000).putInt(shapeType)
      val e = new org.locationtech.jts.geom.Envelope()
      present.foreach(g => e.expandToInclude(g.getEnvelopeInternal))
      buf.putDouble(e.getMinX).putDouble(e.getMinY).putDouble(e.getMaxX).putDouble(e.getMaxY)
      buf.putDouble(0).putDouble(0).putDouble(0).putDouble(0) // Z/M ranges
    }
    header(shp, shpLen); header(shx, shx.capacity())
    var off = 100
    contents.zipWithIndex.foreach { case (c, i) =>
      shx.order(ByteOrder.BIG_ENDIAN).putInt(off / 2).putInt(c.length / 2)
      shp.order(ByteOrder.BIG_ENDIAN).putInt(i + 1).putInt(c.length / 2)
      shp.put(c)
      off += 8 + c.length
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path), shp.array())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path.replaceAll("(?i)\\.shp$", ".shx")), shx.array())

    // ---- .dbf: dBASE III header + fixed-width records ---------------------
    import org.apache.spark.sql.types._
    def fieldBytes(v: Any, tpe: DataType, len: Int): Array[Byte] = {
      val s = v match {
        case null => ""
        case x => x.toString
      }
      val raw = s.getBytes("ISO-8859-1").take(len)
      val out = Array.fill[Byte](len)(' ')
      tpe match {
        case _: NumericType => // right-justified
          System.arraycopy(raw, 0, out, len - raw.length, raw.length)
        case _ => System.arraycopy(raw, 0, out, 0, raw.length)
      }
      out
    }
    // width = widest rendered value (numeric too — a 19-digit long would
    // silently truncate at the classic fixed 18)
    val widths = attrs.zipWithIndex.map { case (f, i) =>
      val w = math.max(1, rows.iterator.map(r =>
        Option(r.get(i + 1)).map(_.toString.getBytes("ISO-8859-1").length).getOrElse(0)).max)
      f.dataType match {
        case _: NumericType => math.max(w, 1)
        case _ => w
      }
    }
    val recordSize = 1 + widths.sum
    val headerSize = 32 + 32 * attrs.length + 1
    val dbf = ByteBuffer.allocate(headerSize + rows.length * recordSize + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0x03.toByte).put(95.toByte).put(7.toByte).put(26.toByte) // fixed date: deterministic bytes
    dbf.putInt(rows.length).putShort(headerSize.toShort).putShort(recordSize.toShort)
    dbf.position(32)
    attrs.zip(widths).foreach { case (f, w) =>
      val name = f.name.getBytes("ISO-8859-1").take(10)
      val d = Array.fill[Byte](32)(0)
      System.arraycopy(name, 0, d, 0, name.length)
      d(11) = f.dataType match { case _: NumericType => 'N'; case _ => 'C' }
      d(16) = w.toByte
      dbf.put(d)
    }
    dbf.put(0x0D.toByte)
    rows.foreach { r =>
      dbf.put(' '.toByte) // not deleted
      attrs.zip(widths).zipWithIndex.foreach { case ((f, w), i) =>
        dbf.put(fieldBytes(r.get(i + 1), f.dataType, w))
      }
    }
    dbf.put(0x1A.toByte)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path.replaceAll("(?i)\\.shp$", ".dbf")), dbf.array())
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
