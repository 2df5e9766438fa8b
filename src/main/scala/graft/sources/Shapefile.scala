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
   * PolyLine=3, Polygon=5) and every other geometry must map to the SAME
   * type (a mixed-family layer would silently emit records inconsistent
   * with the declared type — validated and thrown instead); polygon rings
   * follow the ESRI rule (shells CW, holes CCW). Attributes: StringType →
   * 'C' (width = max byte length, dBASE 'C' cap 254), numeric types → 'N'
   * with the decimal-count descriptor byte set to the widest rendered
   * fraction (strict DBF readers treat decimal-count-0 'N' as integer).
   *
   * The shapefile format is a single-stream container with a 2 GiB hard
   * limit and 32-bit record numbers — a BOUNDED per-layer export; scale
   * lives in writing many layer files in parallel, not inside one file.
   * Driver MEMORY is bounded tighter than the format bound: the layer is
   * never collected — pass 1 streams rows (`toLocalIterator`) to size the
   * headers (count, widths, envelope, total content length), pass 2
   * streams again writing the three files record by record, so the driver
   * holds one partition's rows at a time.
   *
   * @param path the .shp path; .shx/.dbf are written as siblings
   */
  def write(df: DataFrame, geomCol: String, path: String): Unit = {
    val attrs = df.schema.fields.filterNot(_.name == geomCol)
    val proj = df.select((col(geomCol) +: attrs.toSeq.map(f => col(f.name))): _*)
      .persist() // both streaming passes must see the SAME materialized rows
    try writeStreaming(proj, attrs, path)
    finally proj.unpersist()
  }

  private def shapeTypeOf(g: Geometry): Int = g match {
    case _: org.locationtech.jts.geom.Point => 1
    case _: org.locationtech.jts.geom.LineString
       | _: org.locationtech.jts.geom.MultiLineString => 3
    case _: org.locationtech.jts.geom.Polygon
       | _: org.locationtech.jts.geom.MultiPolygon => 5
    case g => throw new IllegalArgumentException(s"unsupported geometry ${g.getGeometryType}")
  }

  private def writeStreaming(proj: DataFrame,
                             attrs: Array[org.apache.spark.sql.types.StructField],
                             path: String): Unit = {
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
    def contentLen(g: Geometry): Long = g match {
      case null => 4L // null shape keeps attr alignment
      case _: org.locationtech.jts.geom.Point => 20L
      case g2 =>
        val parts = ringsOf(g2)
        44L + 4L * parts.length + 16L * parts.map(_.length.toLong).sum
    }
    // narrow import: spark.sql.types also exposes a `Geometry` (Spark 4.1 ST
    // types) that would shadow the JTS Geometry under a wildcard
    import org.apache.spark.sql.types.NumericType
    def render(v: Any): String = if (v == null) "" else v.toString

    // ---- pass 1: stream the rows once to size every header ----------------
    //      (record count, shape type + family validation, layer envelope,
    //       total geometry content bytes, per-field widths + decimal counts)
    var n = 0L
    var totalContent = 0L
    var shapeType = 0 // 0 = not yet derived
    val env = new org.locationtech.jts.geom.Envelope()
    val widths = Array.fill(attrs.length)(1)
    val fracs = Array.fill(attrs.length)(0)
    val isNum = attrs.map(_.dataType match { case _: NumericType => true; case _ => false })
    val it1 = proj.toLocalIterator()
    while (it1.hasNext) {
      val r = it1.next()
      val g = Option(r.getAs[Array[Byte]](0)).map(Geo.fromWkb).orNull
      if (g != null) {
        val t = shapeTypeOf(g)
        if (shapeType == 0) shapeType = t
        else require(t == shapeType,
          s"mixed geometry families in one layer: shape type $t after $shapeType " +
            s"(record ${n + 1}, ${g.getGeometryType}) — a shapefile holds ONE family")
        env.expandToInclude(g.getEnvelopeInternal)
      }
      totalContent += contentLen(g)
      var i = 0
      while (i < attrs.length) {
        val s = render(r.get(i + 1))
        val b = s.getBytes("ISO-8859-1").length
        if (b > widths(i)) widths(i) = b
        if (isNum(i)) { // widest rendered fraction -> dbf decimal-count byte
          val dot = s.lastIndexOf('.')
          if (dot >= 0 && s.length - dot - 1 > fracs(i)) fracs(i) = s.length - dot - 1
        }
        i += 1
      }
      n += 1
    }
    require(shapeType != 0, "cannot derive a shape type from an empty layer")
    attrs.zip(widths).foreach { case (f, w) =>
      require(w <= 254, // dBASE descriptor length is ONE byte ('C' caps at 254);
        // a wider value would wrap the byte and misalign every later field
        s"dbf field '${f.name}' needs width $w > 254 — not representable in dBASE III")
    }
    val shpLen = 100L + 8L * n + totalContent
    require(shpLen <= Int.MaxValue,
      s"layer exceeds the shapefile 2 GiB container limit ($shpLen bytes) — split into multiple files")

    def content(g: Geometry): Array[Byte] = g match {
      case null => le(4).putInt(0).array()
      case p: org.locationtech.jts.geom.Point =>
        le(20).putInt(1).putDouble(p.getX).putDouble(p.getY).array()
      case g2 =>
        val parts = ringsOf(g2)
        val nPts = parts.map(_.length).sum
        val e = g2.getEnvelopeInternal
        val b = le(44 + 4 * parts.length + 16 * nPts)
        b.putInt(shapeType)
        b.putDouble(e.getMinX).putDouble(e.getMinY)
        b.putDouble(e.getMaxX).putDouble(e.getMaxY)
        b.putInt(parts.length).putInt(nPts)
        parts.scanLeft(0)(_ + _.length).dropRight(1).foreach(i => b.putInt(i))
        parts.foreach(_.foreach(c => b.putDouble(c.x).putDouble(c.y)))
        b.array()
    }
    def header(fileLen: Long): Array[Byte] = {
      val buf = ByteBuffer.allocate(100)
      buf.order(ByteOrder.BIG_ENDIAN).putInt(9994)
      (0 until 5).foreach(_ => buf.putInt(0))
      buf.putInt((fileLen / 2).toInt).order(ByteOrder.LITTLE_ENDIAN).putInt(1000).putInt(shapeType)
      buf.putDouble(env.getMinX).putDouble(env.getMinY).putDouble(env.getMaxX).putDouble(env.getMaxY)
      buf.putDouble(0).putDouble(0).putDouble(0).putDouble(0) // Z/M ranges
      buf.array()
    }
    def fieldBytes(v: Any, numeric: Boolean, len: Int): Array[Byte] = {
      val raw = render(v).getBytes("ISO-8859-1").take(len)
      val out = Array.fill[Byte](len)(' ')
      if (numeric) System.arraycopy(raw, 0, out, len - raw.length, raw.length) // right-justified
      else System.arraycopy(raw, 0, out, 0, raw.length)
      out
    }
    val recordSize = 1 + widths.sum
    val headerSize = 32 + 32 * attrs.length + 1
    require(recordSize <= 0xFFFF, s"dbf record size $recordSize exceeds the 16-bit header field")

    // ---- pass 2: stream again, writing the three files record by record ---
    import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
    def open(p: String) =
      new DataOutputStream(new BufferedOutputStream(new FileOutputStream(p)))
    val shpOut = open(path)
    val shxOut = open(path.replaceAll("(?i)\\.shp$", ".shx"))
    val dbfOut = open(path.replaceAll("(?i)\\.shp$", ".dbf"))
    try {
      shpOut.write(header(shpLen))
      shxOut.write(header(100L + 8L * n))
      val dh = ByteBuffer.allocate(headerSize).order(ByteOrder.LITTLE_ENDIAN)
      dh.put(0x03.toByte).put(95.toByte).put(7.toByte).put(26.toByte) // fixed date: deterministic bytes
      dh.putInt(n.toInt).putShort(headerSize.toShort).putShort(recordSize.toShort)
      dh.position(32)
      attrs.indices.foreach { i =>
        val name = attrs(i).name.getBytes("ISO-8859-1").take(10)
        val d = Array.fill[Byte](32)(0)
        System.arraycopy(name, 0, d, 0, name.length)
        d(11) = if (isNum(i)) 'N' else 'C'
        d(16) = widths(i).toByte
        if (isNum(i)) d(17) = fracs(i).toByte // decimal count: 0 means integer to strict readers
        dh.put(d)
      }
      dh.put(0x0D.toByte)
      dbfOut.write(dh.array())
      var off = 100L
      var rec = 0
      val it2 = proj.toLocalIterator()
      while (it2.hasNext) {
        val r = it2.next()
        val c = content(Option(r.getAs[Array[Byte]](0)).map(Geo.fromWkb).orNull)
        shxOut.writeInt((off / 2).toInt); shxOut.writeInt(c.length / 2) // big-endian
        shpOut.writeInt(rec + 1); shpOut.writeInt(c.length / 2)
        shpOut.write(c)
        off += 8 + c.length
        dbfOut.write(' '.toInt) // not deleted
        var i = 0
        while (i < attrs.length) {
          dbfOut.write(fieldBytes(r.get(i + 1), isNum(i), widths(i)))
          i += 1
        }
        rec += 1
      }
      dbfOut.write(0x1A)
    } finally { shpOut.close(); shxOut.close(); dbfOut.close() }
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
