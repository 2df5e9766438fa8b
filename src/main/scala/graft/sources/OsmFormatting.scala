package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * OSM raw-tag formatting — the height/level parsing of the reference's
 * InputDataFormatting (osm/InputDataFormatting.groovy:76, 904-993) and the
 * height-consistency rules of WorkflowGeoIndicators.groovy:2353-2398,
 * re-expressed as pure Catalyst column logic (the reference is a per-row
 * Groovy loop with JDBC batch inserts — here one codegen'd projection).
 *
 * Numeric parsing follows Groovy `isFloat/parseFloat` via try_cast: a tag
 * that fails to parse behaves as absent. Values compute in double (the
 * reference's float32 storage is a schema detail, not semantics).
 */
object OsmFormatting {

  /** The reference's height regex (InputDataFormatting.groovy:76), verbatim:
    * value + optional unit tokens (m, foot, ', ''). */
  val HeightPattern: String =
    "((?:\\d+\\/|(?:\\d+|^|\\s)\\.)?\\d+)\\s*([^\\s\\d+\\-.,:;^\\/]+(?:\\^\\d+(?:$|(?=[\\s:;\\/])))?(?:\\/[^\\s\\d+\\-.,:;^\\/]+(?:\\^\\d+(?:$|(?=[\\s:;\\/])))?)*)?"

  private def nn(c: Column): Column = when(c === "", lit(null)).otherwise(c)

  /**
   * getHeightRoof (InputDataFormatting.groovy:921-961): parse an OSM height
   * string to metres. One match: bare number or unit in {m, foot, ', ''};
   * two matches: feet'inches'' (×12, +inches, ×0.0254); otherwise 0.
   */
  def heightRoof(height: Column): Column = {
    val nums = regexp_extract_all(height, lit(HeightPattern), lit(1))
    val units = regexp_extract_all(height, lit(HeightPattern), lit(2))
    val n1 = element_at(nums, 1).try_cast("double")
    val u1 = lower(nn(element_at(units, 1)))
    val n2 = element_at(nums, 2).try_cast("double")
    val u2 = nn(element_at(units, 2))
    val twoMatches =
      (coalesce(when(n1.isNotNull, n1 * 12), lit(0.0))
        + coalesce(when(u2 === "''", n2), lit(0.0))) * 0.0254
    val oneMatch =
      when(u1.isNull, n1)
        .when(u1 === "m", n1)
        .when(u1 === "foot", n1 * 0.3048)
        .when(u1 === "'", n1 * 12 * 0.0254)
        .when(u1 === "''", n1 * 0.0254)
        .otherwise(lit(0.0))
    // coalesce: a numeric group the double parser rejects (e.g. the "1/2"
    // fraction form the regex admits) degrades to 0 instead of NULL — the
    // reference would throw NumberFormatException here; degrading is the
    // deliberate robust divergence
    coalesce(
      when(height.isNull || height === "" || size(nums) === 0, lit(0.0))
        .when(size(nums) >= 2, twoMatches)
        .otherwise(oneMatch),
      lit(0.0))
  }

  /** getHeightWall (InputDataFormatting.groovy:904-914): roof height minus a
    * parseable roof:height when smaller, else 0; roof height when the tag is
    * absent/unparseable. */
  def heightWall(heightRoof: Column, roofHeightTag: Column): Column = {
    val rh = roofHeightTag.try_cast("double")
    when(rh.isNotNull, when(rh < heightRoof, heightRoof - rh).otherwise(lit(0.0)))
      .otherwise(heightRoof)
  }

  /** getNbLevels (InputDataFormatting.groovy:983-993). */
  def nbLevels(bLev: Column, rLev: Column): Column = {
    val b = bLev.try_cast("double")
    val r = rLev.try_cast("double")
    when(b.isNotNull, when(r.isNotNull, b + r).otherwise(b)).otherwise(lit(0.0)).cast("int")
  }

  /**
   * formatHeightsAndNbLevels (WorkflowGeoIndicators.groovy:2353-2398):
   * fills/repairs (wall, roof, levels) with h_lev_min and the per-type
   * default level map; returns struct(height_wall, height_roof, nb_lev,
   * estimated).
   */
  def formatHeights(hw0: Column, hr0: Column, nl0: Column, hLevMin: Double,
                    buildingType: Column, levelMap: Map[String, Int]): Column = {
    // One compact kernel UDF, not a Column cascade: the struct's four field
    // extractions each re-inline the whole cascade (SimplifyExtractValueOps),
    // and inside the building formatter's projection that pushed the
    // generated method past the 64KB codegen limit — silent interpreted
    // fallback, ~5x slower. The UDF runs the IDENTICAL IEEE op sequence
    // (int*double products, floor/ max) so oracle parity is unchanged;
    // inputs are non-null by construction (heightRoof/heightWall/nbLevels
    // coalesce to 0).
    val f = udf { (hw: Double, hr: Double, nl: Int, typ: String) =>
      def floorLev(h: Double): Int = math.max(math.floor(h / hLevMin), 1.0).toInt
      if (hw != 0 && hr != 0 && nl != 0) (hw, hr, nl, false)
      else if (hw == 0 && hr == 0 && nl == 0) {
        val nld = levelMap.getOrElse(typ, 1)
        (nld * hLevMin, nld * hLevMin, nld, true)
      }
      else if (hw == 0 && hr == 0) (nl * hLevMin, nl * hLevMin, nl, false)
      else if (hw == 0) (hr, hr, if (nl == 0) floorLev(hr) else nl, false)
      else if (hw == hr) (hw, hr, if (nl == 0) floorLev(hw) else nl, false)
      else if (hw > hr) (hw, hw, if (nl == 0) floorLev(hw) else nl, false)
      else (hw, hr, if (nl == 0) floorLev(hr) else nl, false)
    }
    // asNondeterministic: an OPTIMIZATION fence, not a semantic statement —
    // the kernel is pure, but left pushable, the `nb_lev > 0` row filter
    // gets substituted through it and re-inlines the full height/type
    // pipeline into the predicate (measured 1.1 MB of generated code for
    // one stage -> 64KB-limit interpreted fallback)
    f.asNondeterministic()(hw0, hr0, nl0, buildingType)
      .cast("struct<height_wall:double,height_roof:double,nb_lev:int,estimated:boolean>")
  }
}
