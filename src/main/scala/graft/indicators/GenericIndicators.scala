package graft.indicators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.geom.{GeoFunctions => G}

/**
 * Scale-transfer aggregations — Spark re-expression of the reference's
 * GenericIndicators.groovy. All are single hash aggregates (partial+final
 * map-side combine for free) followed by a left join back to the upper
 * table so empty upper units keep 0 defaults (the reference's RIGHT JOIN +
 * COALESCE idiom).
 */
object GenericIndicators {

  sealed trait UnweightedOp
  case object OpSum extends UnweightedOp
  case object OpAvg extends UnweightedOp
  case object OpGeomAvg extends UnweightedOp
  case object OpStd extends UnweightedOp
  case object OpDens extends UnweightedOp
  case object OpNbDens extends UnweightedOp

  /**
   * Per-upper-unit SUM / AVG / STD / GEOM_AVG (= EXP(AVG(LOG x))) / DENS
   * (SUM/upper-area) / NB_DENS (COUNT/upper-area) over a lower-scale column,
   * keeping empty upper units with 0 — GenericIndicators.groovy:57-125.
   *
   * @param vars map of lower-scale column -> operations
   */
  def unweightedOperationFromLowerScale(lower: DataFrame, upper: DataFrame,
                                        idUp: String, idLow: String,
                                        vars: Map[String, Seq[UnweightedOp]]): DataFrame = {
    val aggs: Seq[Column] = vars.toSeq.flatMap { case (v, ops) =>
      ops.map {
        case OpSum     => sum(col(v).cast("double")).as(s"sum_$v")
        case OpAvg     => avg(col(v).cast("double")).as(s"avg_$v")
        case OpStd     => stddev_pop(col(v).cast("double")).as(s"std_$v")
        case OpGeomAvg => exp(avg(log(col(v).cast("double")))).as(s"geom_avg_$v")
        case OpDens    => sum(col(v).cast("double")).as(s"__dsum_$v")
        case OpNbDens  => count(col(idLow)).as(s"__ncnt_$v")
      }
    }
    val grouped = lower.groupBy(col(idUp)).agg(aggs.head, aggs.tail: _*)
    val joined = upper.join(grouped, Seq(idUp), "left")
    val out = vars.toSeq.flatMap { case (v, ops) =>
      ops.map {
        case OpSum     => coalesce(col(s"sum_$v"), lit(0.0)).as(s"sum_$v")
        case OpAvg     => coalesce(col(s"avg_$v"), lit(0.0)).as(s"avg_$v")
        case OpStd     => coalesce(col(s"std_$v"), lit(0.0)).as(s"std_$v")
        case OpGeomAvg => coalesce(col(s"geom_avg_$v"), lit(0.0)).as(s"geom_avg_$v")
        case OpDens    => coalesce(col(s"__dsum_$v") / G.stArea(col("the_geom")), lit(0.0)).as(s"${v}_density")
        case OpNbDens  => coalesce(col(s"__ncnt_$v") / G.stArea(col("the_geom")), lit(0.0)).as(s"${v}_number_density")
      }
    }
    joined.select(col(idUp) +: out: _*)
  }

  /**
   * Weighted mean and weighted std per upper unit —
   * GenericIndicators.groovy:148-212. The reference materializes the mean in
   * a temp table then rescans for the std; we fuse to ONE aggregate pass via
   * the algebraic identity std² = Σw·v²/Σw − μ² (same result, half the
   * shuffles — SURVEY §2.4).
   *
   * @param varsWeights (variable, weight) pairs
   */
  def weightedAggregatedStatistics(lower: DataFrame, upper: DataFrame, idUp: String,
                                   varsWeights: Seq[(String, String)]): DataFrame = {
    val aggs = varsWeights.flatMap { case (v, w) =>
      Seq(sum(col(v) * col(w)).as(s"__sw_${v}_$w"),
        sum(col(v) * col(v) * col(w)).as(s"__sww_${v}_$w"),
        sum(col(w)).as(s"__w_${v}_$w"))
    }
    val grouped = lower.groupBy(col(idUp)).agg(aggs.head, aggs.tail: _*)
    val joined = upper.select(idUp).join(grouped, Seq(idUp), "left")
    val out = varsWeights.flatMap { case (v, w) =>
      val sw = col(s"__sw_${v}_$w"); val sww = col(s"__sww_${v}_$w"); val sumw = col(s"__w_${v}_$w")
      val mean = sw / sumw
      Seq(
        when(sumw.isNull || sumw === 0, 0.0).otherwise(coalesce(mean, lit(0.0)))
          .as(s"avg_${v}_${w}_weighted"),
        when(sumw.isNull || sumw === 0, 0.0)
          .otherwise(coalesce(sqrt(greatest(sww / sumw - mean * mean, lit(0.0))), lit(0.0)))
          .as(s"std_${v}_${w}_weighted"))
    }
    joined.select(col(idUp) +: out: _*)
  }

  /**
   * Area fraction per type group (+optional floor-area fraction), remainder
   * folded into *_undefined — GenericIndicators.groovy:697-800. Pure
   * CASE-WHEN aggregate: one pass.
   *
   * @param areaTypes map fractionName -> accepted `type` values
   */
  def typeProportion(lower: DataFrame, upper: DataFrame, idField: String, typeField: String,
                     areaTypes: Map[String, Seq[String]],
                     floorAreaTypes: Map[String, Seq[String]] = Map.empty): DataFrame = {
    val area = G.stArea(col("the_geom"))
    val floorArea = area * col("nb_lev")
    val aggs =
      Seq(sum(area).as("__area")) ++
      areaTypes.map { case (name, compo) =>
        sum(when(col(typeField).isin(compo: _*), area)).as(s"__a_$name") }.toSeq ++
      (if (floorAreaTypes.nonEmpty) Seq(sum(floorArea).as("__farea")) else Nil) ++
      floorAreaTypes.map { case (name, compo) =>
        sum(when(col(typeField).isin(compo: _*), floorArea)).as(s"__f_$name") }.toSeq
    val grouped = lower.groupBy(col(idField)).agg(aggs.head, aggs.tail: _*)
    val joined = upper.select(idField).join(grouped, Seq(idField), "left")

    def fractions(names: Iterable[String], tot: Column, pfx: String, outPfx: String): Seq[Column] =
      names.toSeq.map { name =>
        when(tot.isNull || tot === 0, 0.0)
          .otherwise(coalesce(col(s"$pfx$name") / tot, lit(0.0)))
          .as(s"$outPfx$name")
      }
    val areaCols = fractions(areaTypes.keys, col("__area"), "__a_", "area_fraction_")
    val floorCols = fractions(floorAreaTypes.keys, col("__farea"), "__f_", "floor_area_fraction_")
    // fold the unexplained remainder into *_undefined when requested
    // (GenericIndicators.groovy:766-778)
    val withFracs = joined.select(col(idField) +: (areaCols ++ floorCols): _*)
    def foldUndefined(df: DataFrame, keys: Iterable[String], pfx: String): DataFrame = {
      val undefCols = keys.filter(k => k == "undefined" || k == "undefined_lcz").map(k => s"$pfx$k")
      if (undefCols.isEmpty) df
      else {
        val total = keys.map(k => col(s"$pfx$k")).reduce(_ + _)
        undefCols.foldLeft(df) { (d, uc) =>
          d.withColumn(uc, when(total < 1.0, lit(1.0) - total + col(uc)).otherwise(col(uc)))
        }
      }
    }
    foldUndefined(foldUndefined(withFracs, areaTypes.keys, "area_fraction_"),
      floorAreaTypes.keys, "floor_area_fraction_")
  }

  /**
   * Building direction distribution + characterization —
   * GenericIndicators.groovy:291-411 (golden: block 4 → equality 4/12,
   * main direction ang97_5, uniqueness 6/50):
   * per building, the minimum rectangle's minimum diameter gives the short
   * axis (LEN_L, ANG_L) and the π/2-rotated axis (LEN_H = building area /
   * LEN_L, ANG_H); lengths bucketed by rounded azimuth degree into
   * `angleRangeSize`° classes (nested CASE: ANG_L wins the bucket); per
   * upper unit the distribution is characterized (Perkins equality,
   * two-largest uniqueness, extremum bucket name); empty units → -1 /
   * "unknown" (reference defaults).
   */
  def buildingDirectionDistribution(building: DataFrame, upper: DataFrame, idUp: String,
                                    angleRangeSize: Int = 15): DataFrame = {
    require(180 % angleRangeSize == 0 && 180 / angleRangeSize > 1)
    val nb = 180 / angleRangeSize
    val props = udf { (wkb: Array[Byte]) =>
      val g = graft.geom.Geo.fromWkb(wkb)
      val rect = graft.geom.Geo.minimumRectangle(g)
      val diam = new org.locationtech.jts.algorithm.MinimumDiameter(rect).getDiameter
      val cs = diam.getCoordinates
      val lenL = diam.getLength
      val lenH = g.getArea / lenL
      val angL360 = math.round(math.toDegrees(
        graft.geom.Geo.azimuth(cs(0).x, cs(0).y, cs(1).x, cs(1).y))).toDouble
      // ST_ROTATE(geom, pi/2) is a CCW rotation; azimuth is translation-
      // invariant so rotate the direction vector: (dx,dy) -> (-dy,dx)
      val dx = cs(1).x - cs(0).x; val dy = cs(1).y - cs(0).y
      val angH360 = math.round(math.toDegrees(
        graft.geom.Geo.azimuth(0, 0, -dy, dx))).toDouble
      // reference quirk replicated: >=180 for ANG_L but strict >180 for ANG_H
      val angL = if (angL360 >= 180) angL360 - 180 else angL360
      val angH = if (angH360 > 180) angH360 - 180 else angH360
      (lenL, lenH, angL, angH)
    }
    val p = building.select(col(idUp), props(col("the_geom")).as("__p"))
      .select(col(idUp), col("__p._1").as("__len_l"), col("__p._2").as("__len_h"),
        col("__p._3").as("__ang_l"), col("__p._4").as("__ang_h"))
    def name(b: Int): String = {
      val center = b * angleRangeSize + angleRangeSize / 2.0
      "ang" + f"$center%.1f".replace('.', '_') // Groovy float toString keeps one decimal
    }
    val buckets = (0 until nb).map { b =>
      val lo = b * angleRangeSize; val hi = lo + angleRangeSize
      sum(when(col("__ang_l") >= lo && col("__ang_l") < hi, col("__len_l"))
        .otherwise(when(col("__ang_h") >= lo && col("__ang_h") < hi, col("__len_h"))
          .otherwise(0.0))).as(name(b))
    }
    val names = (0 until nb).map(name)
    val dist = p.groupBy(col(idUp)).agg(buckets.head, buckets.tail: _*)
    val joined = upper.select(idUp).join(dist, Seq(idUp), "left")
    val arr = array(names.map(col): _*)
    val tot = aggregate(arr, lit(0.0), (a, x) => a + x)
    val sorted = array_sort(arr)
    val x1 = element_at(sorted, -1); val x2 = element_at(sorted, -2)
    val mx = greatest(names.map(col): _*)
    val mainDir = coalesce(names.map(n => when(col(n) === mx, lit(n))) :+ lit("unknown"): _*)
    joined.select(col(idUp),
      when(col(names.head).isNull, lit("unknown")).otherwise(mainDir)
        .as("main_building_direction"),
      when(col(names.head).isNull, -1.0)
        .otherwise(aggregate(arr, lit(0.0), (a, x) => a + least(x, tot / nb)) / tot)
        .as("building_direction_equality"),
      when(col(names.head).isNull, -1.0)
        .otherwise(abs(x1 - x2) / (x1 + x2))
        .as("building_direction_uniqueness"))
  }

  /**
   * Per-row distribution characterization over an array of bucket values —
   * GenericIndicators.groovy:448-646, there a Groovy row-loop + JDBC batch
   * insert; here pure Catalyst higher-order functions (no row-at-a-time IO):
   * - uniqueness: |x1−x2|/(x1+x2) of the two largest buckets
   * - equality  : Perkins Skill Score vs uniform = Σ min(x_i, Σx/n)/Σx
   * - extremum  : index of the max bucket (deterministic: first max)
   */
  /**
   * Distribution characterization over pivot COLUMNS with primary AND
   * secondary extremum — the `keep2ndCol=true, keepColVal=true` shape the
   * grid-LCZ aggregation uses (GenericIndicators.groovy:448-646 via
   * WorkflowGeoIndicators.groovy:1785-1830). Reference semantics:
   *  - rows where the distribution columns are NULL (upper units with no
   *    lower geometry) default to equality/uniqueness/extremum_val = -1 and
   *    extremum cols = 'unknown';
   *  - the Groovy sorts the row map ASC by value with a STABLE sort, then
   *    takes the last two entries: ties resolve to the LATER column in
   *    pivot order. (The reference's pivot order itself comes from a
   *    SELECT DISTINCT — nondeterministic in H2 — so we fix it to the
   *    caller's `cols` order, the correspondence-map order for LCZ.)
   * Implemented per-row in Catalyst: array_sort over (value, index) structs
   * reproduces the stable ascending sort exactly.
   *
   * @return idCol, equality_value, uniqueness_value, extremum_col,
   *         extremum_col2, extremum_val
   */
  def distributionCharacterizationCols(df: DataFrame, cols: Seq[String],
                                       idCol: String): DataFrame = {
    val n = cols.length
    require(n >= 2, "need at least two distribution columns")
    val entries = array(cols.zipWithIndex.map { case (c, i) =>
      struct(col(c).cast("double").as("v"), lit(i).as("i"))
    }: _*)
    // stable ascending by value: (v, i) lexicographic == Groovy stable sort
    val sorted = array_sort(entries)
    val tot = aggregate(sorted, lit(0.0), (acc, e) => acc + e.getField("v"))
    val x1 = element_at(sorted, -1).getField("v")
    val x2 = element_at(sorted, -2).getField("v")
    val i1 = element_at(sorted, -1).getField("i")
    val i2 = element_at(sorted, -2).getField("i")
    val names = array(cols.map(lit): _*)
    val anyNull = cols.map(col(_).isNull).reduce(_ || _)
    df.select(
      col(idCol),
      // all-zero rows: the Groovy inserts NULL, and the final outer
      // COALESCE(x, -1) turns it into -1 just like missing rows
      when(anyNull || tot === 0, -1.0)
        .otherwise(aggregate(sorted, lit(0.0),
          (acc, e) => acc + least(e.getField("v"), tot / n)) / tot)
        .as("equality_value"),
      when(anyNull || x1 + x2 === 0, -1.0)
        .otherwise(abs(x1 - x2) / (x1 + x2)).as("uniqueness_value"),
      when(anyNull, "unknown").otherwise(element_at(names, i1 + 1)).as("extremum_col"),
      when(anyNull, "unknown").otherwise(element_at(names, i2 + 1)).as("extremum_col2"),
      when(anyNull, -1.0).otherwise(x1).as("extremum_val"))
  }

  def distributionCharacterization(df: DataFrame, arrayCol: String, idCol: String): DataFrame = {
    val arr = col(arrayCol)
    val tot = aggregate(arr, lit(0.0), (acc, x) => acc + x)
    val n = size(arr)
    val sorted = array_sort(arr) // ascending
    val x1 = element_at(sorted, -1) // max
    val x2 = element_at(sorted, -2)
    df.select(
      col(idCol),
      when(tot === 0, lit(null)).otherwise(
        aggregate(arr, lit(0.0), (acc, x) => acc + least(x, tot / n)) / tot).as("equality_value"),
      when(x1 + x2 === 0, lit(0.0)).otherwise(abs(x1 - x2) / (x1 + x2)).as("uniqueness_value"),
      expr(s"array_position($arrayCol, array_max($arrayCol))").cast("int").as("extremum_index"))
  }
}
