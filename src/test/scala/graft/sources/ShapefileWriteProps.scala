package graft.sources

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.locationtech.jts.geom.Geometry
import graft.SparkTestBase
import graft.geom.Geo

/**
 * ScalaCheck property for the from-scratch shapefile WRITER against the
 * from-scratch READER (bytes only, no Spark): arbitrary rectangle unions
 * (multi-polygons, holes from containment, shared edges) survive the
 * .shp record round trip topologically intact — write enforces the ESRI
 * CW-shell/CCW-hole rule, read reassembles holes by containment, and the
 * raw IEEE coordinates ride the file unchanged.
 */
class ShapefileWriteProps extends SparkTestBase {

  private val coord = Gen.choose(-500, 500)
  private val size = Gen.choose(1, 120)
  private val rectGen = for { x <- coord; y <- coord; w <- size; h <- size }
    yield Geo.box(x, y, x + w, y + h): Geometry

  /** Union of 1-6 rectangles, minus 0-2 rectangles — polygons with shared
    * edges, multiple parts, and genuine holes. */
  private val polyGen: Gen[Geometry] = for {
    adds <- Gen.nonEmptyListOf(rectGen).map(_.take(6))
    subs <- Gen.listOf(rectGen).map(_.take(2))
  } yield {
    val u = adds.reduce(_.union(_))
    subs.foldLeft(u)(_.difference(_))
  }

  private def roundTripShp(gs: Seq[Geometry]): Seq[Geometry] = {
    // drive the writer's record encoder + main header directly via write()'s
    // file output, then parse with the reader's parseShp
    val tmp = java.nio.file.Files.createTempDirectory("graft_shp_prop")
    val p = s"$tmp/g.shp"
    try {
      import spark.implicits._
      val df = gs.zipWithIndex.map { case (g, i) => (Geo.toWkb(g), i) }
        .toDF("the_geom", "k")
      Shapefile.write(df, "the_geom", p)
      Shapefile.parseShp(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p))).map(Geo.fromWkb)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.delete)
    }
  }

  test("dbf attributes round-trip (random strings + longs, per-column widths)") {
    // reader contract: values come back TRIMMED and empty strings drop out
    // of the attrs map — generate printable Latin-1 strings without
    // leading/trailing blanks and non-degenerate numbers
    val cell = Gen.nonEmptyListOf(Gen.choose(33.toChar, 126.toChar))
      .map(_.mkString.take(40))
    val rowGen = for { s <- cell; n <- Gen.choose(-1000000000000L, 1000000000000L) }
      yield (s, n)
    val p = Prop.forAll(Gen.nonEmptyListOf(rowGen).map(_.take(20))) { rows =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_dbf_prop")
      try {
        import spark.implicits._
        val df = rows.zipWithIndex.map { case ((s, n), i) =>
          (Geo.toWkb(Geo.point(i, i)), s, n) }.toDF("the_geom", "s", "n")
        Shapefile.write(df, "the_geom", s"$tmp/a.shp")
        val back = Shapefile.read(spark, s"$tmp/a.shp")
          .select(Shapefile.attr("s"), Shapefile.attr("n").cast("long"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
        back == rows.sorted
      } finally {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(r.passed, r.status.toString)
  }

  test("polygon layers round-trip topologically equal (random rect unions)") {
    val p = Prop.forAll(Gen.nonEmptyListOf(polyGen).map(_.take(4))) { gs0 =>
      val gs = gs0.filter(g => !g.isEmpty && g.getArea > 0)
      gs.isEmpty || {
        val back = roundTripShp(gs)
        back.size == gs.size && gs.zip(back).forall { case (a, b) =>
          // topological equality: ring orientation may be normalized by the
          // writer, but point sets (incl. holes) must match exactly
          a.getArea == b.getArea && a.equalsTopo(b)
        }
      }
    }
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(r.passed, r.status.toString)
  }
}
