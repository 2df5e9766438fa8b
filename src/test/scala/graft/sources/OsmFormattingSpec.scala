package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Height-tag parsing goldens incl. the unit grammar and hostile inputs
  * (InputDataFormatting.groovy:904-993 semantics; the "1/2" fraction form
  * the reference regex admits but its parseFloat would throw on degrades to
  * 0 here — documented divergence). */
class OsmFormattingSpec extends SparkTestBase {
  import spark.implicits._

  private def parse(vals: Seq[String]): Seq[Double] = {
    val df = vals.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "h")
    df.select(col("i"), OsmFormatting.heightRoof(col("h")).as("m"))
      .orderBy("i").collect().map(_.getDouble(1)).toSeq
  }

  test("height grammar: bare, m, foot, feet, inches, feet-inches, junk") {
    val got = parse(Seq("12", "12.5 m", "4 foot", "33'", "5''", "12'6''", "n/a", "", "1/2"))
    assert(got(0) == 12.0)
    assert(got(1) == 12.5)
    assert(math.abs(got(2) - 4 * 0.3048) < 1e-12)
    assert(math.abs(got(3) - 33 * 12 * 0.0254) < 1e-12)
    assert(math.abs(got(4) - 5 * 0.0254) < 1e-12)
    assert(math.abs(got(5) - (12 * 12 + 6) * 0.0254) < 1e-12) // 3.81
    assert(got(6) == 0.0 && got(7) == 0.0)
    assert(got(8) == 0.0) // fraction form: degrade, never NULL/throw
  }

  test("wall/levels/repair cascade") {
    val df = Seq((1, 10.0, "2.5", "3", null: String, "residential")).toDF(
      "id", "hr", "rh", "bl", "rl", "type")
    val hw = OsmFormatting.heightWall(col("hr"), col("rh"))
    val nl = OsmFormatting.nbLevels(col("bl"), col("rl"))
    val out = df.select(OsmFormatting.formatHeights(hw, col("hr"), nl, 3.0,
        col("type"), Map("residential" -> 1)).as("f"))
      .select("f.height_wall", "f.height_roof", "f.nb_lev", "f.estimated").head()
    assert(out.getDouble(0) == 7.5 && out.getDouble(1) == 10.0
      && out.getInt(2) == 3 && !out.getBoolean(3))
    // all-zero row estimates from the type default
    val est = Seq((1, "x", "house")).toDF("id", "h", "type")
      .select(OsmFormatting.formatHeights(
        OsmFormatting.heightWall(OsmFormatting.heightRoof(col("h")), lit(null).cast("string")),
        OsmFormatting.heightRoof(col("h")),
        OsmFormatting.nbLevels(lit(null).cast("string"), lit(null).cast("string")),
        3.0, col("type"), Map("house" -> 2)).as("f"))
      .select("f.height_wall", "f.nb_lev", "f.estimated").head()
    assert(est.getDouble(0) == 6.0 && est.getInt(1) == 2 && est.getBoolean(2))
  }
}
