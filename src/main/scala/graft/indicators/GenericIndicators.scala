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
   * Per-row distribution characterization over an array of bucket values —
   * GenericIndicators.groovy:448-646, there a Groovy row-loop + JDBC batch
   * insert; here pure Catalyst higher-order functions (no row-at-a-time IO):
   * - uniqueness: |x1−x2|/(x1+x2) of the two largest buckets
   * - equality  : Perkins Skill Score vs uniform = Σ min(x_i, Σx/n)/Σx
   * - extremum  : index of the max bucket (deterministic: first max)
   */
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
